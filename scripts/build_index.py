#!/usr/bin/env python
"""Cluster build entry point.

    spark-submit --py-files ferret_spark.zip scripts/build_index.py \
        --input  <parquet/iceberg path of (repo,path,commit,lang,content)> \
        --output <index path> \
        [--field content=standard --field lang=keyword] \
        [--id-cols repo,path,commit] [--seg-size 4096] [--salt-buckets 64] \
        [--synthetic N]   # generate the deterministic FIXTURES corpus instead

Resumable: re-running after a failure skips completed stages (manifest).
Produce the --py-files artifact with
``python -c "from ferret_spark.session import package_zip; print(package_zip('.'))"``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs without --py-files: resolve the package from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="corpus parquet path")
    ap.add_argument("--output", required=True, help="index output path")
    ap.add_argument(
        "--field",
        action="append",
        default=None,
        help="field=analyzer (repeatable); default content=standard",
    )
    ap.add_argument("--id-cols", default="repo,path,commit")
    ap.add_argument("--doc-id-col", default=None)
    ap.add_argument("--seg-size", type=int, default=4096)
    ap.add_argument("--salt-buckets", type=int, default=64)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument(
        "--source-format",
        default="parquet",
        choices=("parquet", "iceberg", "table"),
        help="parquet path (default), iceberg path (needs the Iceberg "
        "runtime jar + catalog conf on the cluster), or a catalog "
        "table name",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ferret-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ferret_spark.segments import SegmentIndexBuilder, read_manifest

    fields = args.field or ["content=standard"]
    field_config = dict(f.split("=", 1) for f in fields)

    if args.synthetic:
        from ferret_spark.fixtures import synth_corpus_df

        corpus = synth_corpus_df(spark, args.synthetic, num_partitions=64)
    else:
        assert args.input, "--input or --synthetic required"
        if args.source_format == "parquet":
            corpus = spark.read.parquet(args.input)
        elif args.source_format == "iceberg":
            # catalog-less path load; snapshot/branch selection via the
            # standard Iceberg read options on the submit conf
            corpus = spark.read.format("iceberg").load(args.input)
        else:  # table: resolved through the session catalog (Iceberg or
            # any other table provider the cluster configures)
            corpus = spark.read.table(args.input)

    t0 = time.time()
    builder = SegmentIndexBuilder(
        spark,
        args.output,
        field_config,
        seg_size=args.seg_size,
        salt_buckets=args.salt_buckets,
    )
    idx = builder.build(
        corpus,
        id_cols=tuple(args.id_cols.split(",")) if not args.doc_id_col else None,
        doc_id_col=args.doc_id_col,
    )
    wall = time.time() - t0
    manifest = {
        s: {k: v for k, v in m.items() if k in ("rows", "bytes", "elapsed_sec")}
        for s, m in read_manifest(spark, args.output).items()
    }
    print(
        json.dumps(
            {
                "n_docs": idx.n_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(idx.n_docs / wall, 2),
                "stages": manifest,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

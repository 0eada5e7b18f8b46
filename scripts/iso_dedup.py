"""Noop-sink isolation of the dedup family stages at the measurement SF
(guide §1.4): shingle materialization, bucket build, pair stages, minhash
signatures, LSH pairs, and per-round CC loop walls.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sfgen/sf1.0 python scripts/iso_dedup.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sfgen/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from ferret_spark.session import get_spark
    from ferret_spark import pipeline as P
    from pyspark.sql import functions as F

    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS * 2),
        app_name="iso-dedup",
    )
    spark.sparkContext.setLogLevel("ERROR")

    def t(label, fn):
        t0 = time.time()
        r = fn()
        print(f"{label}: {time.time()-t0:.2f}s", flush=True)
        return r

    # 1. shingle scan materialization (cold then warm count)
    ex = P._shingle_rows(spark, SF_DIR)
    t("shingles materialize (count)", lambda: ex.count())
    print("shingle rows:", ex.count())
    t("shingles warm noop", lambda: noop(ex))

    # 2. ngram buckets
    buckets = (
        ex.groupBy("s").agg(F.collect_list("doc_id").alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= P.SHINGLE_DF_CAP))
    )
    t("buckets noop", lambda: noop(buckets))
    stats = buckets.select(
        F.count("*").alias("n"),
        F.sum(F.size("ids")).alias("tot"),
        F.max(F.size("ids")).alias("mx"),
        F.sum(F.size("ids") * (F.size("ids") - 1) / 2).alias("rawpairs"),
    ).collect()[0]
    print("bucket stats:", stats.asDict())

    # 3. full ngram query
    t("ngram full (collect)", lambda: P.dedup_ngram_jaccard(spark, SF_DIR).collect())

    # 4. minhash signatures
    sig = P.minhash_signatures(spark, SF_DIR)
    t("signatures noop", lambda: noop(sig))

    # 5. LSH pairs
    pairs = P.dedup_minhash_lsh(spark, SF_DIR)
    n_pairs = t("lsh pairs collect", lambda: pairs.count())
    print("lsh pairs:", n_pairs)

    # 6. clusters with per-round prints
    t0 = time.time()
    P.dedup_clusters(spark, SF_DIR).collect()
    print(f"clusters full: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()

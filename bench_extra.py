#!/usr/bin/env python
"""Round-7 optimization harness (guide §1): per-query timing of the
driver-contract queries with job labels, optional plan capture, and a
query-name filter. Mirrors bench.py's contract phase methodology
(full-width session, .collect() timed) without touching the frozen
bench.py. Usage:

  python bench_extra.py                       # all queries, one pass
  python bench_extra.py ft_highlight pp_...   # subset
  FERRET_XB_REPS=3 python bench_extra.py ...  # repeats (min reported)
  FERRET_XB_PLANS=plans/r07 FERRET_XB_SUFFIX=_before python bench_extra.py ...
                                              # dump explain("formatted")

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("FERRET_XB_REPS", "1"))
PLANS_DIR = os.environ.get("FERRET_XB_PLANS", "")
SUFFIX = os.environ.get("FERRET_XB_SUFFIX", "")


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from ferret_spark.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=max(8, CPUS * 2),
        app_name="ferret-bench-extra",
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = [n for n in sys.argv[1:] if not n.startswith("-")] or sorted(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    out: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in names:
        walls = []
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} [rep {r}]")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.collect()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = min(walls)
        samples[name] = walls
        print(f"{name}: {walls}", file=sys.stderr, flush=True)
        if PLANS_DIR:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(PLANS_DIR, f"{name}{SUFFIX}.txt"), "w"
            ) as f:
                f.write(plan)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "cpus": CPUS,
                "reps": REPS,
                "queries": out,
                "samples": samples,
                "total": round(sum(out.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""SparkSession helper with scale-appropriate defaults."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


_ZIP_CACHE: str | None = None


def package_zip(out_dir: str | None = None) -> str:
    """Zip the ferret_spark package for shipping to executors — the
    ``spark-submit --py-files`` artifact (north_rule deployment mode).
    Also used by get_spark via addPyFile so UDF closures resolve their
    module imports on executor Python workers in any deploy mode.

    Byte-deterministic (fixed timestamps, sorted entries) so repeated
    addPyFile calls — e.g. two sequential sessions in one bench process —
    never trip Spark's same-name-different-content check."""
    global _ZIP_CACHE
    if _ZIP_CACHE is not None and os.path.exists(_ZIP_CACHE):
        return _ZIP_CACHE
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out_dir = out_dir or tempfile.mkdtemp(prefix="ferret_spark_pyfiles_")
    zpath = os.path.join(out_dir, "ferret_spark.zip")
    entries = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in files:
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                rel = os.path.join("ferret_spark", os.path.relpath(full, pkg_dir))
                entries.append((rel, full))
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel, full in sorted(entries):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel, date_time=(2000, 1, 1, 0, 0, 0))
            zf.writestr(info, data)
    _ZIP_CACHE = zpath
    return zpath


def _builder_spark(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "ferret_spark",
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("FERRET_SHUFFLE_PARTITIONS", str(min(int(cpus) * 2, 64)))
    )
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE partition coalescing collapses our small-but-CPU-heavy Python
        # stages (applyInPandas inversion/merge) to a handful of tasks —
        # measured 2-6x slowdowns at local[32] — so it's off by default;
        # re-enable for IO-heavy cluster runs with FERRET_AQE=1
        .config(
            "spark.sql.adaptive.enabled",
            "true" if os.environ.get("FERRET_AQE") == "1" else "false",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow everywhere: pandas UDFs and mapInArrow are the hot path
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("FERRET_DRIVER_MEM", "8g"))
        # Arrow batches live in the JVM's DIRECT pool (netty arenas),
        # which defaults to the heap size; local[32] runs 32 concurrent
        # Arrow-heavy tasks in ONE JVM, and long query-log runs fragment
        # the arenas — 8g OOMed a 128-query segment_batch_search leg at
        # 2M docs. On a real cluster each executor JVM brings its own
        # pool, so this is purely a single-JVM local-mode ceiling.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:MaxDirectMemorySize="
            + os.environ.get("FERRET_DIRECT_MEM", "24g"),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def get_spark(
    master: str | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "ferret_spark",
) -> SparkSession:
    spark = _builder_spark(master, shuffle_partitions, app_name)
    # ship the package to executor Python workers (UDF closures reference
    # ferret_spark.* modules); same artifact spark-submit --py-files takes
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already shipped to this context
    return spark

"""SparkSession construction tuned for the Mallard-on-Spark engine.

Single place that owns session configuration so every entry point
(tests, bench, driver contract) gets the same tuned session:
AQE on (runtime re-planning + skew-join handling), Arrow transfer on
(fast Pandas-UDF / toPandas paths), UTC session timezone (parity with
DuckDB's naive-UTC timestamps), shuffle partitions sized to cores
rather than the 200 default.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _export_pythonpath() -> None:
    """Make the package importable on executor Python workers.

    Pandas-UDF / mapInPandas closures pickle classes by reference;
    the worker process must be able to ``import mallard_spark``. In
    local mode workers inherit the driver JVM's environment, so
    prepending the repo root to PYTHONPATH before the JVM starts is
    enough. (``ship_package`` covers sessions we didn't create.)
    """
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + pp if pp else "")
        )


def ship_package(spark: SparkSession) -> None:
    """addPyFile a zip of mallard_spark so ANY session (including one
    created by an external harness) can run our Pandas-UDF closures
    on its workers. Idempotent per SparkContext."""
    sc = spark.sparkContext
    if getattr(sc, "_mallard_shipped", False):
        return
    pkg_dir = os.path.join(_REPO_ROOT, "mallard_spark")
    zpath = os.path.join("/tmp", "mallard_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, _REPO_ROOT))
    sc.addPyFile(zpath)
    sc._mallard_shipped = True


def get_spark(
    app_name: str = "mallard_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we
    default to ``local[N]`` with N from ``SPARK_GRAFT_CPUS`` (default
    all cores).
    """
    _export_pythonpath()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 10k-row default Arrow batches make task overhead dominate
        # mapInPandas/mapInArrow on fast transforms; 64k-row batches
        # are still only a few MB each at typical row widths.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or os.cpu_count() or 32),
        )
        # 32 MB scan splits (round 12): the default 128 MB bin-packs
        # this workload's ~11 MB parquet files into a handful of scan
        # tasks, under-parallelizing decode on 32 cores — measured
        # paired at both scales: q1@sf10 2.48 -> 1.90 s, a 6-query
        # sf0.1 subset 4.86 -> 3.80 s. On a 1000-executor cluster the
        # same setting yields ~3M scan tasks per 100 TB — fine for
        # Spark's scheduler (decode-bound scans want small splits;
        # AQE coalesces post-shuffle) — and it remains a plain conf
        # override for deployments that prefer larger splits.
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.ui.enabled", "false")
        # Spark 4.1 ships the ANSI TIME type behind a flag; DuckDB
        # clients use TIME columns, so the engine enables it (round 9
        # — closes the CREATE TABLE ... TIME refusal). Purely
        # additive: no existing type changes behavior.
        .config("spark.sql.timeType.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # serving-path collects (toArrow fast path, wire benchmarks)
        # legitimately move GB-scale Arrow data through the driver; the
        # 1g default aborts them long before driver memory is at risk
        .config("spark.driver.maxResultSize", "8g")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Readers for the test-data star schema (and generic sources).

Parquet is the default scan path: Catalyst pushes filters and prunes
columns at the file-source level (check with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``).
At 100 TB these tables would be directory-partitioned (e.g.
``orders/o_orderdate_month=...``) and bucketed on their join keys;
the loaders here read whatever layout the path holds — partition
pruning comes free from the path structure.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Per-session plan cache: building a scan DataFrame costs a parquet
# footer read + a handful of py4j round trips (~80 ms on this box);
# multi-table queries pay it per table and the bench pays it per run.
# DataFrames are immutable plan handles, so handing the same one out
# is safe; keying the OUTER map weakly by session means a stopped
# session's entries vanish with it (no stale-JVM handles).
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

# The driver-generated star schema (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor —
# at TPC-H semantics region/nation are constant-size; supplier/part/
# customer grow with SF but stay orders of magnitude under the fact
# tables. Used by plans/ to decide broadcast hints.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` is nanosecond-precision parquet, which Spark's
    vectorized reader rejects; we read it as a raw long (runtime
    legacy conf, so this works under ANY caller-provided session)
    and expose BOTH ``ts`` (µs timestamp, for date functions) and
    ``ts_ns`` (exact nanos, for order-sensitive logic — gaps,
    as-of ordering — where µs truncation could diverge from an
    ns-precision engine).
    """
    # timestamp semantics must match the (naive-UTC) DuckDB oracle no
    # matter what session the caller hands us — re-asserted on EVERY
    # call (cache hits included): a host app may reset the session tz
    # between calls, and expressions built after load_table resolve
    # against the tz at analysis time.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    per_session = _TABLE_CACHE.setdefault(spark, {})
    cached = per_session.get((sf_dir, name))
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    # Shared scan relation (round 11, VERDICT r10 item #4): with
    # spark.mallard.scanCache=memory|disk the plan handle is also
    # PERSISTED, so every query over the table after the first reads
    # decoded columnar blocks instead of re-decoding parquet. This is
    # the serving model the reference itself uses — flight_server.py
    # loads data INTO DuckDB native tables once and serves all queries
    # from its buffer pool; re-decoding parquet per query was this
    # engine's asymmetry, not DuckDB's floor. Off by default: an
    # ETL-style one-pass job gains nothing and pays storage memory.
    # At cluster scale the same switch is the hot-table cache
    # (executor storage memory / spill-to-local-disk); cold tables
    # stay pure scans with pushdown intact.
    try:
        mode = (spark.conf.get("spark.mallard.scanCache", "off") or "off").lower()
    except Exception:  # pragma: no cover - locked-down conf
        mode = "off"
    if mode in ("memory", "disk", "true", "on"):
        from pyspark import StorageLevel

        df = df.persist(
            StorageLevel.DISK_ONLY if mode == "disk"
            else StorageLevel.MEMORY_AND_DISK
        )
    per_session[(sf_dir, name)] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":  # ns-precision source
            return df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if dict(df.dtypes).get("ts") == "timestamp_ntz":
            # µs NTZ source: reinterpret as instant — exact under the
            # forced-UTC session tz, and keeps the ts schema identical
            # across ns-long / µs-NTZ / µs-LTZ source layouts.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df.withColumn("ts_ns", F.unix_micros("ts") * 1000)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)

"""Sinks: parquet/csv/json writers with the layouts that matter at scale.

At 100 TB the write-time layout decides query cost:
- ``write_partitioned``: directory partitioning → partition pruning
  for any filter on the partition column.
- ``write_bucketed``: hash-bucketing on the join key → later joins
  and aggregations on that key are shuffle-free (Spark reads bucket
  metadata from the table catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (bucket pruning + shuffle-free joins)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table_name)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (built-in columnar alternative; same pushdown story)."""
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def compact_parquet(
    spark, src_path: str, dst_path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Rewrite a parquet dataset into ~``target_file_bytes`` files.

    The small-files problem is the top operational issue of a 100 TB
    lake: a streaming sink or over-parallel job leaves thousands of
    KB-sized files, and every later scan pays per-file open/footer
    cost. Compaction = one distributed read + repartition to
    ceil(total_bytes / target) + rewrite; returns the output file
    count. Sizing uses the actual on-disk bytes (from the file
    index), not a row-count guess, so compression ratio is respected.
    """
    import math

    df = spark.read.parquet(src_path)
    total = _dir_bytes(src_path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    out = spark.read.parquet(dst_path)
    assert out.schema == df.schema
    return n_files


def _dir_bytes(path: str) -> int:
    """Total bytes of data files under ``path`` (local filesystem)."""
    import os

    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if not f.startswith(("_", "."))
        )
    return total


def write_training_shards(
    df: DataFrame, shards: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Materialize the training layout: join docs to their
    ``shard_assignment`` (shard_id, pos) and write ONE directory per
    shard, rows laid out in pos order within each file.

    ``partitionBy(shard_id)`` + ``sortWithinPartitions`` after a
    shard-keyed repartition gives each shard exactly one sorted file
    — the layout a data loader consumes sequentially. Scales as one
    hash exchange (the same one shard_assignment already implies).
    """
    joined = df.join(shards, "doc_id")
    (
        joined.repartition("shard_id")
        .sortWithinPartitions("shard_id", "pos")
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(path)
    )


def write_zorder(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered rewrite (OPTIMIZE ZORDER BY (x, y)):
    quantize both columns to 12-bit grids, interleave to Morton
    codes, range-partition on the code and sort within partitions —
    every output file then covers a small min-max RANGE of BOTH
    columns, so parquet footer stats skip files for filters on
    either one (`layout_zorder_report` quantifies the effect).

    ``repartitionByRange`` samples the code distribution to build
    balanced ranges — the same mechanism a real OPTIMIZE job uses;
    no global sort, no driver involvement.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mallard_spark.operators.layout import _Z_EXPR, Z_Q

    def quant(col: str, lo: str, hi: str) -> str:
        """Type-aware 12-bit quantization (integers, dates,
        timestamps, and floats/decimals are all common Z-order
        dimensions; DIV alone only handles integers)."""
        dt = df.schema[col].dataType
        if isinstance(dt, T.DateType):
            return f"(datediff({col}, {lo}) * {Z_Q}) DIV (datediff({hi}, {lo}) + 1)"
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # NTZ needs a cast for unix_millis; session TZ is pinned
            # UTC so the cast is a pure reinterpretation. MILLIS, not
            # micros: (delta_micros * 4096) overflows int64 for
            # ranges wider than ~71 years; millis buys 71,000 years
            # and 12-bit buckets never need sub-ms resolution.
            def um(c: str) -> str:
                return f"unix_millis(cast({c} as timestamp))"

            return (
                f"(({um(col)} - {um(lo)}) * {Z_Q})"
                f" DIV ({um(hi)} - {um(lo)} + 1)"
            )
        if isinstance(dt, (T.FractionalType, T.DecimalType)):
            return (
                f"least({Z_Q - 1}, cast(floor((({col}) - {lo}) * {Z_Q}"
                f" / (({hi}) - ({lo}) + 1e-12)) as bigint))"
            )
        if isinstance(dt, T.IntegralType):
            return f"(({col} - {lo}) * {Z_Q}) DIV ({hi} - {lo} + 1)"
        raise TypeError(
            f"write_zorder: column {col!r} has unsupported type {dt}; "
            f"supported: integral, float/decimal, date, timestamp"
        )

    b = df.agg(
        F.min(col_x).alias("xmin"),
        F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"),
        F.max(col_y).alias("ymax"),
    )
    coded = (
        df.crossJoin(F.broadcast(b))
        .withColumn("qx", F.expr(quant(col_x, "xmin", "xmax")))
        .withColumn("qy", F.expr(quant(col_y, "ymin", "ymax")))
        .withColumn("__z", F.expr(_Z_EXPR))
        .drop("xmin", "xmax", "ymin", "ymax", "qx", "qy")
    )
    (
        coded.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )

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

from pyspark.sql import DataFrame, SparkSession

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
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)

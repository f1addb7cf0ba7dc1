"""Data-management operators: CDC / SCD2 merge emulation.

Spark without Delta/Iceberg has no MERGE INTO; the equivalent is the
classic anti-join + semi-join + union pattern (old rows closed, new
versions opened, untouched rows passed through). Emulated here over
the customer dim with a deterministic synthetic update batch so the
whole merge is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

D = "decimal(12,2)"


@query(
    "scd2_merge",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, CAST(CAST(c_acctbal AS DECIMAL(12,2)) + CAST(100 AS DECIMAL(12,2)) AS DOUBLE) AS new_bal
      FROM customer WHERE c_acctbal > 5000.0
    )
    SELECT c.c_custkey, CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal,
           TRUE AS is_current, 1 AS version
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c.c_custkey, CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS DOUBLE),
           FALSE, 1
    FROM customer c WHERE EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, new_bal, TRUE, 2 FROM updates
    """,
)
def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 MERGE emulation: close updated rows, open new versions.

    The update batch is derived deterministically (acctbal > 5000 →
    +100) so the merge result has a plain-SQL oracle. At 100 TB this
    runs as two broadcast/semi joins + a union — no full rewrite of
    untouched partitions when the dim is partitioned by update date.
    """
    cust = load_table(spark, sf_dir, "customer")
    updates = cust.filter(F.col("c_acctbal") > 5000.0).select(
        "c_custkey",
        (F.col("c_acctbal").cast(D) + F.lit(100).cast(D)).cast("double").alias("new_bal"),
    )
    upd_keys = updates.select("c_custkey")
    bal = F.col("c_acctbal").cast(D).cast("double")
    untouched = cust.join(upd_keys, "c_custkey", "left_anti").select(
        "c_custkey",
        bal.alias("bal"),
        F.lit(True).alias("is_current"),
        F.lit(1).alias("version"),
    )
    closed = cust.join(upd_keys, "c_custkey", "left_semi").select(
        "c_custkey",
        bal.alias("bal"),
        F.lit(False).alias("is_current"),
        F.lit(1).alias("version"),
    )
    opened = updates.select(
        "c_custkey",
        F.col("new_bal").alias("bal"),
        F.lit(True).alias("is_current"),
        F.lit(2).alias("version"),
    )
    return untouched.unionByName(closed).unionByName(opened)


@query(
    "grouped_rank_pandas",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (PARTITION BY l_suppkey
                              ORDER BY l_quantity, l_orderkey, l_linenumber) AS qty_rank
    FROM lineitem
    """,
)
def grouped_rank_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group Pandas UDAF (applyInPandas) with an exact oracle.

    Demonstrates the grouped-map path — each supplier's rows arrive as
    one Arrow-backed pandas frame — on a computation whose output is
    INTEGER ranks over a unique sort key, so the Python path is
    oracle-checkable bit-for-bit (float outputs from pandas would not
    be). The SQL-window form is the production plan; this is the
    escape hatch pattern for logic Spark can't express.
    """
    import pandas as pd

    from mallard_spark.session import ship_package

    ship_package(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"
    )

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["l_quantity", "l_orderkey", "l_linenumber"], kind="mergesort"
        ).reset_index(drop=True)
        out["qty_rank"] = range(1, len(out) + 1)
        return out[["l_suppkey", "l_orderkey", "l_linenumber", "qty_rank"]]

    return li.groupBy("l_suppkey").applyInPandas(
        rank_group,
        schema="l_suppkey long, l_orderkey long, l_linenumber int, qty_rank long",
    )


@query(
    "supplier_trend",
    oracle="""
    SELECT l_suppkey,
           round(CAST(regr_slope(l_quantity, EXTRACT(year FROM l_shipdate)) AS DOUBLE), 6) AS qty_slope,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def supplier_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in linear-regression aggregate: per-supplier quantity trend
    by ship year (regr_slope exists in both engines; inputs are small
    integers so the double sums agree within the 6-dp rounding)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.round(
            F.expr("regr_slope(l_quantity, year(l_shipdate))").cast("double"), 6
        ).alias("qty_slope"),
        F.count("*").alias("n_rows"),
    )

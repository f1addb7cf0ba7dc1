"""Bucketed-table variants of the fact-fact joins.

At 100 TB the lineitem⋈orders shuffle IS the cost of q3/q18-style
queries. Writing both facts bucketed on orderkey at ingest time
(``sources.writers.write_bucketed``) makes the join shuffle-free:
Spark's bucketed scan exposes ``hashpartitioning(orderkey)`` directly
from the file layout, so the join needs no Exchange, and the
downstream groupBy on (l_orderkey, ...) reuses the same partitioning.

These variants register the bucketed tables once per (warehouse, SF)
— a one-time ingest cost, amortized across every subsequent query on
the key — then run the same logical q3/q18 plans over them. The
oracles are the plain q3/q18 oracles: bucketing must never change a
result, only the physical plan (tests/test_plans.py asserts ZERO
hash-partition exchanges in both plans, and bench.py carries
q3_bucketed next to q3 so the delta is measured, not assumed).

Reference parity: the reference keeps all tables inside single-node
DuckDB where every join is local (/root/reference/flight_server.py
:388-400 ingests into DuckDB tables); bucketing is the distributed
equivalent of "the data is already laid out for this join".
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.plans.fixedpoint import fx_double, ulong, urev
from mallard_spark.plans.relational import D, REV_SQL, _rev
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table
from mallard_spark.sources.writers import write_bucketed

N_BUCKETS = 16


def _sf_key(sf_dir: str) -> str:
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return re.sub(r"[^A-Za-z0-9]", "_", base)


def _clear_stale_location(spark: SparkSession, table: str) -> None:
    """A managed table's directory can outlive the (in-memory) catalog
    entry across sessions; saveAsTable refuses to reuse it. Remove it
    when the catalog has no such table."""
    import shutil
    from urllib.parse import urlparse

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = urlparse(warehouse).path or warehouse
    shutil.rmtree(f"{path.rstrip('/')}/{table.lower()}", ignore_errors=True)


def ensure_bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Create (once) lineitem/orders as bucketed managed tables,
    bucketed and sorted on their orderkey. Returns the table names."""
    key = _sf_key(sf_dir)
    li_name = f"bkt_{key}_lineitem"
    ord_name = f"bkt_{key}_orders"
    if not spark.catalog.tableExists(li_name):
        _clear_stale_location(spark, li_name)
        write_bucketed(
            load_table(spark, sf_dir, "lineitem"),
            li_name,
            "l_orderkey",
            n_buckets=N_BUCKETS,
            sort_col="l_orderkey",
        )
    if not spark.catalog.tableExists(ord_name):
        _clear_stale_location(spark, ord_name)
        write_bucketed(
            load_table(spark, sf_dir, "orders"),
            ord_name,
            "o_orderkey",
            n_buckets=N_BUCKETS,
            sort_col="o_orderkey",
        )
    return li_name, ord_name


@query(
    "q3_bucketed",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({REV_SQL}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3_shipping_priority over orderkey-bucketed fact tables:
    same answer, zero shuffle (the join consumes the bucket layout,
    the groupBy reuses the join's partitioning, the top-10 is a
    TakeOrdered, not a global sort)."""
    li_name, ord_name = ensure_bucketed_facts(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.table(ord_name).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = spark.table(li_name).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # round 11: per-order bounded group -> int64 fixed-point revenue
    # (plans.fixedpoint; same rationale as q3_shipping_priority)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(urev()).alias("rev_u"))
        .select(
            "l_orderkey",
            fx_double("rev_u", 4).alias("revenue"),
            "o_orderdate",
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q18_bucketed",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18_large_volume_customer over bucketed facts: the HAVING
    pre-aggregate, the semi-join, the fact join AND the final groupBy
    all run inside the bucket partitioning — zero exchanges."""
    li_name, ord_name = ensure_bucketed_facts(spark, sf_dir)
    li = spark.table(li_name)
    # round 11: per-order bounded groups -> int64 fixed-point sums
    # (plans.fixedpoint; same rationale as q18_large_volume_customer)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(ulong("l_quantity")).alias("q_u"))
        .filter(F.col("q_u") > 300 * 100)
        .select("l_orderkey")
    )
    orders = spark.table(ord_name)
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(ulong("l_quantity")).alias("q_u"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", fx_double("q_u", 2).alias("total_qty"),
        )
    )

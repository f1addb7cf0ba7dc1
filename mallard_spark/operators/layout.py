"""Data-layout optimization: Z-order (Morton-curve) clustering.

At 100 TB the difference between a fast and a slow table is mostly
LAYOUT: parquet readers skip whole files/row-groups via min-max
statistics, and min-max only helps when writers cluster the data.
A single-column sort gives perfect skipping on one column and none
on any other; a Z-order (interleaved-bit) sort trades a little of
each for useful skipping on ALL participating columns — the
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

``layout_zorder_report`` measures that trade exactly: it lays the
fact table out both ways (date-sorted vs Z-ordered over
(partkey, shipdate)), cuts each layout into equal "files", and
reports the average per-file min-max SPAN of each dimension in
integer ppm of the full range — small span = effective skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

Z_BITS = 12  # 12 bits/dim -> 24-bit Morton codes
Z_Q = 1 << Z_BITS
N_FILES = 64


_Z_EXPR = (
    "aggregate(transform(sequence(0, {b} - 1), i -> "
    " (shiftleft(shiftright(qx, i) & 1, 2 * i + 1)"
    "  + shiftleft(shiftright(qy, i) & 1, 2 * i))), "
    " cast(0 as bigint), (a, x) -> a + x)"
).format(b=Z_BITS)

_Z_SQL = (
    "list_sum(list_transform(range(0, {b}), i -> "
    " (((qx >> i) & 1) << (2 * i + 1)) + (((qy >> i) & 1) << (2 * i))))"
).format(b=Z_BITS)


def _report_sql() -> str:
    return f"""
    WITH li AS (
      SELECT l_partkey AS x,
             CAST(l_shipdate AS DATE) AS d,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    b AS (
      SELECT MIN(x) AS xmin, MAX(x) AS xmax,
             MIN(d) AS dmin, MAX(d) AS dmax,
             COUNT(*) AS n
      FROM li
    ),
    q AS (
      SELECT ((x - xmin) * {Z_Q}) // (xmax - xmin + 1) AS qx,
             ((d - dmin) * {Z_Q}) // (dmax - dmin + 1) AS qy,
             l_orderkey, l_linenumber,
             (n + {N_FILES} - 1) // {N_FILES} AS rpf
      FROM li, b
    ),
    z AS (
      SELECT qx, qy, rpf, {_Z_SQL} AS zval,
             l_orderkey, l_linenumber
      FROM q
    ),
    zfiles AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY zval, l_orderkey, l_linenumber) - 1)
               // rpf AS f,
             qx, qy
      FROM z
    ),
    dfiles AS (
      SELECT (ROW_NUMBER() OVER (ORDER BY qy, qx, l_orderkey, l_linenumber) - 1)
               // rpf AS f,
             qx, qy
      FROM z
    ),
    zstat AS (
      SELECT f, MAX(qx) - MIN(qx) + 1 AS sx, MAX(qy) - MIN(qy) + 1 AS sy
      FROM zfiles GROUP BY f
    ),
    dstat AS (
      SELECT f, MAX(qx) - MIN(qx) + 1 AS sx, MAX(qy) - MIN(qy) + 1 AS sy
      FROM dfiles GROUP BY f
    )
    SELECT 'zorder' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(sx) * 1000000 // ({Z_Q} * COUNT(*)) AS BIGINT)
               AS avg_x_span_ppm,
           CAST(SUM(sy) * 1000000 // ({Z_Q} * COUNT(*)) AS BIGINT)
               AS avg_y_span_ppm
    FROM zstat
    UNION ALL
    SELECT 'datesort', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(sx) * 1000000 // ({Z_Q} * COUNT(*)) AS BIGINT),
           CAST(SUM(sy) * 1000000 // ({Z_Q} * COUNT(*)) AS BIGINT)
    FROM dstat
    ORDER BY layout
    """


@query("layout_zorder_report", oracle=_report_sql())
def layout_zorder_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order vs single-column-sort layout comparison on the fact
    table: quantize (partkey, shipdate) to {Z_BITS}-bit grids,
    interleave to Morton codes, cut both layouts into {N_FILES}
    equal "files", and report each layout's average per-file min-max
    span per dimension in integer ppm of the full range. Z-order
    shows BOTH spans small (multi-column skipping); the date sort
    shows a tiny date span and a full-range partkey span — the
    quantified argument for ZORDER on a 100 TB table.

    Determinism: quantization, Morton interleave, file assignment and
    spans are all exact integer arithmetic off one bounds aggregate;
    row order ties break on (orderkey, linenumber).

    Shape at 100 TB: bounds are one tiny aggregate broadcast back;
    the Morton code is a pure map. The ROW_NUMBER here is the
    measurement harness, not the layout mechanism — a real writer
    range-partitions on zval (repartitionByRange) and sorts within
    partitions, which is exactly how OPTIMIZE ZORDER executes; the
    per-file stats this report predicts are what the parquet footers
    would then contain.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("x"),
        F.col("l_shipdate").cast("date").alias("d"),
        "l_orderkey",
        "l_linenumber",
    )
    b = li.agg(
        F.min("x").alias("xmin"),
        F.max("x").alias("xmax"),
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
        F.count("*").alias("n"),
    )
    q = li.crossJoin(F.broadcast(b)).select(
        F.expr(f"((x - xmin) * {Z_Q}) DIV (xmax - xmin + 1)").alias("qx"),
        F.expr(f"(datediff(d, dmin) * {Z_Q}) DIV (datediff(dmax, dmin) + 1)").alias(
            "qy"
        ),
        "l_orderkey",
        "l_linenumber",
        F.expr(f"(n + {N_FILES} - 1) DIV {N_FILES}").alias("rpf"),
    )
    z = q.withColumn("zval", F.expr(_Z_EXPR))
    wz = Window.orderBy("zval", "l_orderkey", "l_linenumber")
    wd = Window.orderBy("qy", "qx", "l_orderkey", "l_linenumber")
    zfiles = z.withColumn("rn", F.row_number().over(wz)).select(
        F.expr("(rn - 1) DIV rpf").alias("f"), "qx", "qy"
    )
    dfiles = z.withColumn("rn", F.row_number().over(wd)).select(
        F.expr("(rn - 1) DIV rpf").alias("f"), "qx", "qy"
    )

    def stat(files: DataFrame, label: str) -> DataFrame:
        per = files.groupBy("f").agg(
            (F.max("qx") - F.min("qx") + 1).alias("sx"),
            (F.max("qy") - F.min("qy") + 1).alias("sy"),
        )
        return per.agg(
            F.lit(label).alias("layout"),
            F.count("*").cast("long").alias("n_files"),
            F.expr(f"cast(sum(sx) * 1000000 DIV ({Z_Q} * count(*)) as bigint)").alias(
                "avg_x_span_ppm"
            ),
            F.expr(f"cast(sum(sy) * 1000000 DIV ({Z_Q} * count(*)) as bigint)").alias(
                "avg_y_span_ppm"
            ),
        )

    return stat(zfiles, "zorder").unionByName(stat(dfiles, "datesort")).orderBy(
        "layout"
    )

"""Mergeable sketch operators with deterministic, oracle-checkable
error bounds: a count-min sketch (frequency estimation under a fixed
memory budget) and a fixed-bucket mergeable quantile histogram.

Reference parity: the reference engine (DuckDB behind Arrow Flight)
answers these with exact scans; at 100 TB the point of a sketch is
that the PARTIAL is the persisted artifact — cells / bucket counts
merge associatively across partitions, days, or streams without
re-touching raw data. Both operators here are built from exact
integer arithmetic on md5-derived hashes (functions.hashing), so a
DuckDB oracle reproduces every cell bit-for-bit — the estimates are
approximate, the SKETCH ITSELF is deterministic.

Companions: `hll_union_partitioned` (mergeable distinct sketch),
`heavy_hitters_topk` (bounded top-k with exact bounds),
`approx_quantiles_value` (Spark's own percentile_approx, rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mallard_spark.functions.hashing import md5_long, md5_long_sql
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

# ------------------------------------------------ count-min sketch

CMS_D = 3  # hash rows
CMS_W = 64  # columns per row — deliberately small so collisions (and
# the overcount ≥ 0 guarantee) are actually exercised at test SFs


def _cms_col_sql(d_expr: str) -> str:
    return (
        md5_long_sql(
            f"'cms' || CAST({d_expr} AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)"
        )
        + f" % {CMS_W}"
    )


@query(
    "cms_topk_estimate",
    oracle=f"""
    WITH kc AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    ), cells AS (
      SELECT t.d, {_cms_col_sql("t.d")} AS col,
             CAST(SUM(cnt) AS BIGINT) AS cell
      FROM kc, UNNEST([0, 1, 2]) t(d)
      GROUP BY 1, 2
    ), top AS (
      SELECT user_id, cnt FROM kc
      ORDER BY cnt DESC, user_id LIMIT 10
    ), probes AS (
      SELECT k.user_id, k.cnt, t.d, {_cms_col_sql("t.d")} AS col
      FROM top k, UNNEST([0, 1, 2]) t(d)
    )
    SELECT p.user_id,
           CAST(p.cnt AS BIGINT) AS true_cnt,
           MIN(c.cell) AS est_cnt,
           MIN(c.cell) - p.cnt AS overcount
    FROM probes p JOIN cells c ON c.d = p.d AND c.col = p.col
    GROUP BY p.user_id, p.cnt
    ORDER BY true_cnt DESC, p.user_id
    """,
)
def cms_topk_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode–Muthukrishnan): frequency estimates
    for the event stream's keys from a FIXED {CMS_D}×{CMS_W} integer
    cell grid, evaluated against the exact counts for the true top-10
    users. CMS guarantees est ≥ true (`overcount` ≥ 0 — asserted in
    tests) with overshoot bounded by colliding mass; the undersized
    width here forces real collisions so the bound arithmetic is
    exercised, not vacuous.

    Scale shape: cells are built from the per-key count table (one
    partial-combined exchange — the same shuffle an exact count pays;
    at stream scale the identical cells fall out of summing (d, col)
    increments directly, no key table, because cell = Σ counts of
    colliding keys either way). The cell grid is ≤ {CMS_D}·{CMS_W}
    rows at ANY corpus size — the persisted/mergeable artifact — and
    the probe join broadcasts 10×{CMS_D} rows against it.
    """
    ev = load_table(spark, sf_dir, "events")
    kc = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    d = F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("d")
    col = (
        md5_long(
            F.concat(
                F.lit("cms"),
                F.col("d").cast("string"),
                F.lit("|"),
                F.col("user_id").cast("string"),
            )
        )
        % CMS_W
    ).alias("col")
    cells = (
        kc.select("user_id", "cnt", d)
        .select("user_id", "cnt", "d", col)
        .groupBy("d", "col")
        .agg(F.sum("cnt").cast("long").alias("cell"))
    )
    top = kc.orderBy(F.desc("cnt"), "user_id").limit(10)
    probes = top.select("user_id", "cnt", d).select("user_id", "cnt", "d", col)
    return (
        F.broadcast(probes)
        .join(cells, ["d", "col"])
        .groupBy("user_id", "cnt")
        .agg(F.min("cell").alias("est_cnt"))
        .select(
            "user_id",
            F.col("cnt").cast("long").alias("true_cnt"),
            "est_cnt",
            (F.col("est_cnt") - F.col("cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.desc("true_cnt"), "user_id")
    )


# ------------------------------------- mergeable quantile histogram

QH_BUCKET_CENTS = 1000  # $10 buckets → deterministic error < $10
QH_QUANTILES = (50, 90, 99)


@query(
    "quantile_histogram_merge",
    oracle=f"""
    WITH v AS (
      SELECT event_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), partials AS (
      -- the persisted per-day sketch: (day, bucket, cnt)
      SELECT day, cents // {QH_BUCKET_CENTS} AS bucket, COUNT(*) AS cnt
      FROM v GROUP BY 1, 2
    ), merged AS (
      SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM partials GROUP BY bucket
    ), cum AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket) AS cum,
             SUM(cnt) OVER (ORDER BY bucket) - cnt AS cum_before
      FROM merged
    ), n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM merged),
    targets AS (
      SELECT t.q, (n_total * t.q + 99) // 100 AS rk, n_total
      FROM n, UNNEST([50, 90, 99]) t(q)
    ), est AS (
      SELECT t.q, t.rk, t.n_total,
             MIN(c.bucket) AS qbucket
      FROM targets t JOIN cum c ON c.cum >= t.rk
      GROUP BY 1, 2, 3
    ), exact AS (
      SELECT e.q, e.rk, e.n_total, e.qbucket, v.cents,
             ROW_NUMBER() OVER (PARTITION BY e.q
                                ORDER BY v.cents, v.event_id) AS rn
      FROM est e JOIN v ON v.cents // {QH_BUCKET_CENTS} = e.qbucket
    )
    SELECT x.q AS q, x.n_total,
           CAST(x.qbucket * {QH_BUCKET_CENTS} AS BIGINT) AS est_lo_cents,
           CAST(x.cents AS BIGINT) AS exact_cents,
           CAST(x.cents - x.qbucket * {QH_BUCKET_CENTS} AS BIGINT) AS err_cents
    FROM exact x
    JOIN cum c ON c.bucket = x.qbucket
    WHERE x.rn = x.rk - c.cum_before
    ORDER BY q
    """,
)
def quantile_histogram_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch: fixed ${QH_BUCKET_CENTS/100:.0f}
    integer-cent buckets, per-day partial histograms merged into
    global p50/p90/p99 estimates WITHOUT re-touching raw rows — the
    t-digest/DDSketch role with a deterministic (not probabilistic)
    guarantee: the true quantile lies in the reported bucket, so
    error < one bucket width by construction. The report carries the
    exact quantile next to the estimate (0 ≤ err_cents <
    {QH_BUCKET_CENTS}, asserted in tests); the exact arm is computed
    the cheap way — per-bucket rank refinement over ONLY the 3 target
    buckets, never a global sort of the stream.

    Scale shape: partials are one (day, bucket) partial-combined
    aggregate (the artifact a 100 TB deployment persists per
    partition); the merge and the cumulative window run over the
    BUCKET table (≤ value-range/width rows, corpus-size-independent);
    the exact refinement scans only rows hashing to the 3 estimated
    buckets via a broadcast semi-join.
    """
    ev = load_table(spark, sf_dir, "events")
    v = qh_cents(ev)
    partials = qh_partials(v)
    return qh_report(v, partials)


def qh_cents(ev: DataFrame) -> DataFrame:
    """(event_id, day, cents) projection — ONE definition for the
    batch operator and the streaming monitor."""
    return ev.select(
        "event_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
    )


def qh_partials(v: DataFrame) -> DataFrame:
    """The persisted per-day sketch: (day, bucket, cnt)."""
    return v.groupBy(
        "day", F.expr(f"cents div {QH_BUCKET_CENTS}").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def qh_report(v: DataFrame, partials: DataFrame) -> DataFrame:
    """Merge partial histograms → quantile estimates + exact-arm
    refinement — shared by the batch operator and the streaming
    monitor (which maintains the partials incrementally)."""
    merged = partials.groupBy("bucket").agg(F.sum("cnt").cast("long").alias("cnt"))
    wc = Window.orderBy("bucket")
    cum = merged.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        (F.sum("cnt").over(wc) - F.col("cnt")).alias("cum_before"),
    )
    n = merged.agg(F.sum("cnt").cast("long").alias("n_total"))
    qs = F.explode(F.array(*[F.lit(q) for q in QH_QUANTILES])).alias("q")
    targets = n.select("n_total", qs).select(
        "q",
        F.expr("(n_total * q + 99) div 100").alias("rk"),
        "n_total",
    )
    est = (
        F.broadcast(targets)
        .join(cum, F.col("cum") >= F.col("rk"))
        .groupBy("q", "rk", "n_total")
        .agg(F.min("bucket").alias("qbucket"))
    )
    exact = (
        v.join(
            F.broadcast(est),
            F.expr(f"cents div {QH_BUCKET_CENTS}") == F.col("qbucket"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("q").orderBy("cents", "event_id")
            ),
        )
    )
    return (
        exact.join(
            F.broadcast(cum.select("bucket", "cum_before")),
            F.col("bucket") == F.col("qbucket"),
        )
        .filter(F.col("rn") == F.col("rk") - F.col("cum_before"))
        .select(
            F.col("q").cast("long").alias("q"),
            "n_total",
            (F.col("qbucket") * QH_BUCKET_CENTS).cast("long").alias("est_lo_cents"),
            F.col("cents").cast("long").alias("exact_cents"),
            (F.col("cents") - F.col("qbucket") * QH_BUCKET_CENTS)
            .cast("long")
            .alias("err_cents"),
        )
        .orderBy("q")
    )

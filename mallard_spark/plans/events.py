"""Event / time-series analytics over the `events` table.

Windowed aggregation, gap sessionization, funnel, cohort retention,
JSON prop extraction, and an as-of join — the batch half of the
streaming story (streaming/windows.py runs the same windowed agg
through Structured Streaming and must produce identical results).

Scale notes: every query here is a single hash-shuffle on
``user_id`` (or none); sessionization and as-of both use window
functions over that one partitioning, so at 100 TB they are one
shuffle + sorted-within-partition scans — no driver-side state, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mallard_spark.functions.hashing import md5_long_sql
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

DV = "decimal(12,2)"  # events.value is a 2-decimal money-like double


@query(
    "ev_hourly_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour, event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ev_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed aggregation by event type (batch).

    Round 11: reformulated as a two-level aggregate — group by
    (hour, type, user) first (map-side partials collapse duplicate
    combinations before the shuffle), then reduce per (hour, type):
    COUNT(user_id) over the per-user groups IS the exact distinct
    count without Spark's countDistinct Expand (which doubles every
    input row), and the money sum runs as int64 fixed-point
    (plans.fixedpoint), final reduce in DECIMAL(38).

    Round 12 (ADVICE r11): the per-(h,t,u) long sum's int64 bound is
    data-dependent — |unscaled| < 1e12 (the DECIMAL(12,2) schema
    bound), so a group WRAPS only at >= ~9.2e6 rows, i.e. one user
    emitting 2,500 events/sec for a full hour. Re-keying phase 1 by
    (partition-id, sub-bucket) like fx_two_phase makes the bound
    structural but measured +75% at sf10 (1.27 -> 2.25 s paired,
    calm — the 5-key hash map is the cost), so the plan instead
    GUARDS: phase 2 checks the per-group row count and raises a
    NAMED error at >= 9e6 rows (count and sum come from the same
    aggregate; the wrapped value never surfaces) pointing at the
    fx_two_phase re-keying as the escape hatch. Silent-wrong is
    impossible; the hot path stays at the 2-key cost.
    Bit-identical to the plain countDistinct + SUM(DECIMAL)
    formulation over the full sf10 replica.
    """
    from mallard_spark.plans.fixedpoint import fx_double, ulong

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type", "user_id"
    ).agg(
        F.count("*").alias("__c"),
        F.sum(ulong("value")).alias("__v_u"),
    )
    guarded = F.when(
        F.col("__c") < 9_000_000, F.col("__v_u")
    ).otherwise(
        F.expr(
            "CAST(raise_error('ev_hourly_agg: a (hour, event_type, "
            "user_id) group exceeds the int64-safe row count for the "
            "fixed-point money sum — re-key the per-user phase with "
            "fx_two_phase partition sub-buckets "
            "(plans/fixedpoint.py)') AS LONG)"
        )
    )
    return per_user.groupBy("hour", "event_type").agg(
        F.sum("__c").alias("n_events"),
        F.count("user_id").alias("n_users"),
        fx_double(
            F.sum(guarded.cast("decimal(38,0)")), 2
        ).alias("total_value"),
    )


@query(
    "ev_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_s
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap): lag + running sum.

    One shuffle on user_id; both windows share the same partitioning
    and sort, so Catalyst plans a single Window exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    # order and gap on exact nanos (ts_ns) — µs truncation must not
    # be allowed to flip an ordering or a gap comparison
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap = F.col("ts_ns") - F.lag("ts_ns").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000_000), 1).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("new_session").over(run))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DV)).cast("double").alias("session_value"),
            (
                F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
            ).alias("duration_s"),
        )
    )


@query(
    "ev_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts >= s.s_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_signup_click,
           (SELECT COUNT(*) FROM p) AS n_full_funnel
    """,
)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """signup → click → purchase ordered funnel (staged min-timestamp joins)."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    # 1-row aggregates: hint them broadcast explicitly (codebase
    # convention) instead of relying on AQE to discover the size
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(F.broadcast(c.agg(F.count("*").alias("n_signup_click"))))
        .crossJoin(F.broadcast(p.agg(F.count("*").alias("n_full_funnel"))))
    )


@query(
    "ev_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    )
    SELECT f.cohort_day,
           COUNT(DISTINCT f.user_id) AS n_users,
           COUNT(DISTINCT CASE WHEN a.day = f.cohort_day + INTERVAL 1 DAY THEN a.user_id END) AS d1,
           COUNT(DISTINCT CASE WHEN a.day = f.cohort_day + INTERVAL 7 DAY THEN a.user_id END) AS d7
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_day
    """,
)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention (D1 / D7)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = ev.select("user_id", day.alias("day")).distinct()
    j = firsts.join(activity, "user_id")
    return j.groupBy("cohort_day").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(
            F.when(F.col("day") == F.col("cohort_day") + F.expr("INTERVAL 1 DAY"), F.col("user_id"))
        ).alias("d1"),
        F.countDistinct(
            F.when(F.col("day") == F.col("cohort_day") + F.expr("INTERVAL 7 DAY"), F.col("user_id"))
        ).alias("d7"),
    )


@query(
    "ev_top_users",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 10
    """,
)
def ev_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by exact total value (unique tiebreak on user_id)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast(DV)).cast("double").alias("total_value"),
            F.count("*").alias("n_events"),
        )
        .orderBy(F.desc("total_value"), "user_id")
        .limit(10)
    )


@query(
    "ev_json_props",
    oracle="""
    SELECT event_type,
           CAST(SUM(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
           MAX(json_extract_string(props, '$.k')::BIGINT) AS max_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON prop extraction + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.max(k).alias("max_k"), F.count("*").alias("n")
    )


@query(
    "ev_value_histogram",
    oracle="""
    SELECT event_type,
           CASE WHEN value < 0.0 THEN 0
                WHEN value >= 500.0 THEN 11
                ELSE CAST(FLOOR(value / (500.0 - 0.0) * 10) AS BIGINT) + 1 END AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def ev_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed histogram of event values per type (width_bucket;
    DuckDB 1.0 has no width_bucket, so the oracle spells out the
    same bucket arithmetic)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.width_bucket("value", F.lit(0.0), F.lit(500.0), F.lit(10)).alias("bucket"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "ev_lead_lag",
    oracle="""
    SELECT event_id, user_id, event_type,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           date_diff('second', ts, LEAD(ts) OVER w) AS secs_to_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ev_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event neighbors (lead/lag) + seconds-to-next-event.

    Ordering on exact ts_ns (µs truncation must not reorder); the
    time delta is second-floored, which is truncation-safe.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias(
            "secs_to_next"
        ),
    )


@query(
    "ev_zscore_anomalies",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v,
             sqrt(CAST(SUM(CAST(value AS DECIMAL(12,4)) * CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)
                  - (CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
                    * (CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))) AS std_v
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           round((value - mean_v) / std_v, 6) AS zscore
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((value - mean_v) / std_v) > 2.5
    """,
)
def ev_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: |z| > 2.5 per event type.

    Mean and E[x²] aggregate in exact decimal (a plain double
    variance is partitioning-order-dependent); the z arithmetic is
    then fixed-order IEEE, stable across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    sq = F.col("value").cast("decimal(12,4)") * F.col("value").cast("decimal(12,4)")
    stats = ev.groupBy(F.col("event_type").alias("s_type")).agg(
        (F.sum(F.col("value").cast(DV)).cast("double") / F.count("*")).alias("mean_v"),
        F.sqrt(
            F.sum(sq).cast("double") / F.count("*")
            - (F.sum(F.col("value").cast(DV)).cast("double") / F.count("*"))
            * (F.sum(F.col("value").cast(DV)).cast("double") / F.count("*"))
        ).alias("std_v"),
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        ev.join(F.broadcast(stats), ev.event_type == F.col("s_type"))
        .filter(F.abs(z) > 2.5)
        .select("event_id", "event_type", F.round(z, 6).alias("zscore"))
    )


@query(
    "ev_asof_join",
    oracle="""
    WITH orders_d AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, o.o_orderkey
    FROM events e
    ASOF LEFT JOIN orders_d o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event ↔ the latest order at-or-before its time.

    Spark has no native ASOF JOIN; the scalable pattern is the
    union-and-window merge: tag both streams, sort once within a
    shared (key, time) partitioning, and carry the last-seen order
    key forward with ``last(..., ignorenulls=True)``. One shuffle,
    no Python, no per-key driver loop — holds at 100 TB where a
    pd.merge_asof-per-group would need the whole key group in one
    pandas frame.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    orders_d = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    ev_side = ev.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        "user_id",
        F.lit(None).cast("long").alias("ord_key"),
    )
    ord_side = orders_d.select(
        F.col("o_custkey").cast("long").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("long").alias("user_id"),
        F.col("o_orderkey").alias("ord_key"),
    )
    merged = ev_side.unionByName(ord_side)
    # order rows sort before events at equal t => "at-or-before" (>=)
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("o_orderkey", F.last("ord_key", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select("event_id", "user_id", "o_orderkey")
    )


@query(
    "ev_range_join",
    oracle="""
    SELECT p.event_id, COUNT(*) AS n_clicks,
           CAST(SUM(CAST(c.value AS DECIMAL(12,2))) AS DOUBLE) AS click_value
    FROM events p
    JOIN events c
      ON c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
     AND c.event_type = 'click'
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
)
def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure time-range join (no equi key): clicks in the hour before
    each purchase.

    A naive inequality join is a broadcast-nested-loop — O(n·m) and
    dead at scale. The scalable pattern is bucketed range join:
    quantize time into buckets as wide as the range (1 h), explode
    the probe side into the <=2 buckets its window overlaps, then
    equi-join on the bucket and re-filter the exact range. Each
    (purchase, click) pair can match in only one bucket (the click's
    own), so no dedup step is needed. Turns the nested loop into one
    hash join whose fan-out is bounded by range/bucket_width + 1 —
    this is how Flink/Timescale interval joins stay linear.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        (F.unix_timestamp("ts") / 3600).cast("long").alias("bucket"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", F.col("ts").alias("p_ts"))
        # window [p_ts - 1h, p_ts) overlaps the bucket of (p_ts - 1h)
        # and the bucket of p_ts
        .withColumn(
            "bucket",
            F.explode(
                F.array_distinct(
                    F.array(
                        ((F.unix_timestamp("p_ts") - 3600) / 3600).cast("long"),
                        (F.unix_timestamp("p_ts") / 3600).cast("long"),
                    )
                )
            ),
        )
    )
    return (
        purchases.join(clicks, "bucket")
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .groupBy("event_id")
        .agg(
            F.count("*").alias("n_clicks"),
            F.sum(F.col("c_value").cast(DV)).cast("double").alias("click_value"),
        )
    )


@query(
    "ev_rollup_cascade",
    oracle="""
    SELECT 'minute' AS grain, date_trunc('minute', ts) AS bucket_ts,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'hour', date_trunc('hour', ts),
           COUNT(*), CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'day', date_trunc('day', ts),
           COUNT(*), CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
    FROM events GROUP BY 2
    """,
)
def ev_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: minute rollup
    from raw, hour rollup from MINUTE PARTIALS, day rollup from HOUR
    PARTIALS.

    Only the minute level scans the events table; coarser grains
    re-aggregate the (much smaller) finer aggregate — the
    TimescaleDB/Druid rollup-cascade pattern. Counts and decimal sums
    are mergeable partials, so the cascade is exact (that's why the
    schema carries count+sum, not avg or distinct). At 100 TB the
    raw scan happens once instead of three times, and each cascade
    step shuffles only pre-aggregated rows.
    """
    from mallard_spark.functions.exec import materialize

    ev = load_table(spark, sf_dir, "events")
    minute = (
        ev.groupBy(F.date_trunc("minute", "ts").alias("bucket_ts"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DV)).alias("value_partial"),
        )
    )
    # store the finest-grain aggregate (the "continuous aggregate"):
    # without a barrier Catalyst clones the minute subplan into every
    # union branch and the raw table is scanned three times
    minute = materialize(minute, "ev_rollup_cascade_minute")
    hour = (
        minute.groupBy(F.date_trunc("hour", "bucket_ts").alias("bucket_ts"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_partial").alias("value_partial"),
        )
    )
    day = (
        hour.groupBy(F.date_trunc("day", "bucket_ts").alias("bucket_ts"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_partial").alias("value_partial"),
        )
    )

    def finish(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket_ts",
            "n_events",
            F.col("value_partial").cast("double").alias("total_value"),
        )

    return (
        finish(minute, "minute")
        .unionByName(finish(hour, "hour"))
        .unionByName(finish(day, "day"))
    )


@query("approx_quantiles_value", oracle=None)  # sketch output: rows-only
def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) next to the
    exact interpolated percentiles, with the realized error.

    percentile_approx is the 100 TB path — mergeable fixed-size
    sketches, one pass, no full sort; the exact variant shuffles the
    whole column per group. Emitting both + abs error makes the
    accuracy/cost trade-off inspectable (rows-only: sketch internals
    are engine-specific, so there is no cross-engine value oracle).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("approx"),
            F.expr("percentile(value, array(0.5D, 0.95D, 0.99D))").alias("exact"),
        )
        .select(
            "event_type",
            F.round(F.col("approx")[0], 6).alias("p50_approx"),
            F.round(F.col("exact")[0], 6).alias("p50_exact"),
            F.round(F.col("approx")[2], 6).alias("p99_approx"),
            F.round(F.col("exact")[2], 6).alias("p99_exact"),
            F.round(F.abs(F.col("approx")[0] - F.col("exact")[0]), 6).alias("p50_err"),
        )
        .orderBy("event_type")
    )


@query(
    "ev_gap_fill",
    oracle="""
    WITH agg AS (
      SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
      FROM agg GROUP BY 1
    ), spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS bucket_ts
      FROM bounds
    )
    SELECT s.event_type, s.bucket_ts,
           COALESCE(a.n_events, 0) AS n_events,
           LAST_VALUE(a.total_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
           a.bucket_ts IS NULL AS is_gap
    FROM spine s LEFT JOIN agg a
      ON s.event_type = a.event_type AND s.bucket_ts = a.bucket_ts
    """,
)
def ev_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-fill: dense minute spine + LOCF interpolation
    (TimescaleDB ``time_bucket_gapfill`` + ``locf`` semantics).

    The minute aggregate is materialized once (it feeds both the
    bounds computation and the fill join — without the barrier Spark
    would scan the raw table twice). The spine is generated
    per-group with ``sequence``/``explode`` — its size is bounded by
    the TIME SPAN, not the data volume, so it stays tiny at 100 TB.
    The LOCF window partitions by event_type; at production
    cardinality (many series ids) that parallelizes across the
    cluster — for very few series over very long spans you'd chunk
    the window by (series, day) and stitch the chunk boundaries.
    """
    from mallard_spark.functions.exec import materialize

    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("bucket_ts"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DV)).cast("double").alias("total_value"),
        )
    )
    agg = materialize(agg, "ev_gap_fill_agg")
    spine = (
        agg.groupBy("event_type")
        .agg(F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr("sequence(lo, hi, interval 1 minute)")).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(agg, ["event_type", "bucket_ts"], "left")
    return joined.select(
        "event_type",
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("total_value", ignorenulls=True).over(w).alias("locf_value"),
        F.col("n_events").isNull().alias("is_gap"),
    )


@query(
    "ev_ohlc",
    oracle="""
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           first(value ORDER BY ts, event_id) AS open_v,
           MAX(value) AS high_v, MIN(value) AS low_v,
           last(value ORDER BY ts, event_id) AS close_v,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume
    FROM events GROUP BY 1, 2
    """,
)
def ev_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars per hour per event type.

    open/close are order-sensitive "first/last by time" aggregates —
    expressed as min/max over a (ts, event_id, value) struct, which
    is a plain partially-aggregable hash aggregate (one shuffle,
    map-side combine) instead of a window + row_number + filter
    (shuffle + full sort). event_id is the unique tiebreaker so the
    pick is deterministic across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_ts"))
        .agg(
            first_s.getField("value").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            last_s.getField("value").alias("close_v"),
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DV)).cast("double").alias("volume"),
        )
    )


@query(
    "ev_m4_downsample",
    oracle="""
    SELECT event_type,
           date_trunc('minute', ts) AS bucket_ts,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           MIN(value) AS min_v,
           first(ts ORDER BY value ASC, ts ASC, event_id ASC) AS min_v_ts,
           MAX(value) AS max_v,
           first(ts ORDER BY value DESC, ts DESC, event_id DESC) AS max_v_ts,
           COUNT(*) AS n_events
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY 1, 2
    """,
)
def ev_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling: per pixel-bucket keep the four
    extreme points (first/last ts, min/max value with their
    timestamps) — the error-free line-chart reduction (Jugel et al.,
    VLDB'14). Billions of points collapse to 4·#buckets rows in ONE
    partially-aggregable hash aggregate; argmin/argmax are min/max
    over (value, ts, event_id) structs (unique tiebreaker, engine-
    portable), never a window sort.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    vmin = F.min(F.struct("value", "ts", "event_id"))
    # max over (value, inverted-order ts/event) picks the LAST max —
    # mirror of the oracle's ORDER BY value DESC, ts DESC, event DESC
    vmax = F.max(F.struct("value", "ts", "event_id"))
    return (
        ev.groupBy("event_type", F.date_trunc("minute", "ts").alias("bucket_ts"))
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            vmin.getField("value").alias("min_v"),
            vmin.getField("ts").alias("min_v_ts"),
            vmax.getField("value").alias("max_v"),
            vmax.getField("ts").alias("max_v_ts"),
            F.count("*").alias("n_events"),
        )
    )


@query(
    "ev_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS day
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
    FROM daily ORDER BY day
    """,
)
def ev_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-dashboard
    staple. A naive per-day COUNT(DISTINCT user ≤ day) is O(days ×
    users); the first-seen trick is one groupBy(user), one tiny
    groupBy(day), and a running sum over #days rows only (the global
    window never sees user-level data).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


@query(
    "json_funcs_parity",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           json_extract_string(props, '$.k')::BIGINT AS k_int,
           json_extract_string(props, '$.missing') AS missing_v,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys
    FROM events
    WHERE event_id % 11 = 0
    """,
)
def json_funcs_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar surface (get_json_object / typed extraction /
    missing-key NULLs / key enumeration) value-checked across
    engines. All JVM-side expressions over the raw string column —
    the path a semi-structured 100 TB event log takes before
    schema-on-read materialization.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 11 == 0)
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_v"),
        k.isNotNull().alias("has_k"),
        F.size(F.json_object_keys("props")).cast("long").alias("n_keys"),
    )


@query(
    "ev_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           COUNT(*) AS n_transitions,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6)
               AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
)
def ev_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (the user-journey model behind next-action prediction
    and funnel design). One window shuffle on user_id for the lag,
    one partial-combined count per (prev, next) pair, and the
    row-normalization window runs over the #types² matrix only —
    never the event log.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n_transitions"))
    wn = Window.partitionBy("prev_type")
    return (
        counts.withColumn(
            "p_next",
            F.round(
                F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(wn),
                6,
            ),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "ev_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type,
             round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 6) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
      FROM events e JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type,
             round(CAST(quantile_cont(absdev, 0.5) AS DOUBLE), 6) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           MIN(d.med) AS med,
           MIN(a.mad) AS mad,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN d.absdev > 4.4478 * a.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def ev_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag
    events with |x − median| > 3·1.4826·MAD per type — unlike
    ev_zscore_anomalies, one wild value cannot drag the threshold
    (median/MAD have 50% breakdown vs the mean/stddev's 0%).
    Two exact-percentile aggregates with the per-type stats broadcast
    back between passes; med/MAD are rounded once at 6 dp so the
    flag comparison is the same IEEE expression on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("absdev")
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(absdev, 0.5)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("absdev") > 4.4478 * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "ev_pit_features",
    oracle="""
    WITH labels AS (
      SELECT event_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ), hist AS (
      SELECT l.event_id, l.user_id,
             COUNT(c.ts) AS n_prior,
             CAST(SUM(CASE WHEN c.event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_prior_clicks,
             CAST(SUM(CASE WHEN c.event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_prior_errors,
             CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(12,2))), 0) AS DOUBLE)
                 AS prior_value,
             COALESCE(date_diff('second', MAX(c.ts), MAX(l.p_ts)), -1)
                 AS secs_since_last
      FROM labels l
      LEFT JOIN events c
        ON c.user_id = l.user_id
       AND c.ts >= l.p_ts - INTERVAL 1 HOUR AND c.ts < l.p_ts
      GROUP BY l.event_id, l.user_id
    )
    SELECT event_id, user_id, CAST(n_prior AS BIGINT) AS n_prior,
           n_prior_clicks, n_prior_errors, prior_value, secs_since_last
    FROM hist
    """,
)
def ev_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature generation (the feature-store
    join): for every purchase label, aggregate the SAME user's events
    STRICTLY BEFORE the label time (trailing 1 h) — counts by type,
    spend, and recency — with zero future leakage by construction
    (the range is half-open at the label).

    Scale shape: the naive inequality join is a nested loop; here the
    history side carries (user_id, hour-bucket) and labels explode
    into their ≤2 overlapping buckets, so it is ONE equi-join on
    (user, bucket) + exact refilter (ev_range_join's linearization,
    tightened by the user key). Labels with no history are restored
    by a left join back onto the label set (count 0, recency −1).
    """
    ev = load_table(spark, sf_dir, "events")
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    hist = ev.select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.col("event_type").alias("c_type"),
        F.col("value").alias("c_value"),
        (F.unix_timestamp("ts") / 3600).cast("long").alias("bucket"),
    )
    probes = labels.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    ((F.unix_timestamp("p_ts") - 3600) / 3600).cast("long"),
                    (F.unix_timestamp("p_ts") / 3600).cast("long"),
                )
            )
        ),
    )
    matched = (
        probes.join(hist, ["user_id", "bucket"])
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .groupBy("event_id", "user_id")
        .agg(
            F.count("*").alias("n_prior"),
            F.sum(F.when(F.col("c_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("n_prior_clicks"),
            F.sum(F.when(F.col("c_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("n_prior_errors"),
            F.sum(F.col("c_value").cast(DV)).cast("double").alias("prior_value"),
            (F.unix_timestamp(F.max("p_ts")) - F.unix_timestamp(F.max("c_ts"))).alias(
                "secs_since_last"
            ),
        )
    )
    return labels.join(matched, ["event_id", "user_id"], "left").select(
        "event_id",
        "user_id",
        F.coalesce("n_prior", F.lit(0)).alias("n_prior"),
        F.coalesce("n_prior_clicks", F.lit(0)).alias("n_prior_clicks"),
        F.coalesce("n_prior_errors", F.lit(0)).alias("n_prior_errors"),
        F.coalesce("prior_value", F.lit(0.0)).alias("prior_value"),
        F.coalesce("secs_since_last", F.lit(-1)).alias("secs_since_last"),
    )


@query(
    "ev_holt_forecast",
    oracle="""
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ), ordered AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS i
      FROM hourly
    ), sz AS (
      SELECT event_type, MAX(i) AS n FROM ordered GROUP BY event_type
    ), holt AS (
      -- DuckDB 1.0's list_reduce mis-evaluates struct accumulators
      -- past 2 elements, so the oracle folds via recursive CTE
      -- (bounded by #hours per type)
      SELECT event_type, 1 AS i, v AS l, CAST(0 AS DOUBLE) AS t
      FROM ordered WHERE i = 1
      UNION ALL
      SELECT h.event_type, h.i + 1,
             (o.v + h.l + h.t) / CAST(2 AS DOUBLE),
             ((o.v + h.l + h.t) / CAST(2 AS DOUBLE) - h.l + h.t)
               / CAST(2 AS DOUBLE)
      FROM holt h JOIN ordered o
        ON o.event_type = h.event_type AND o.i = h.i + 1
    )
    SELECT f.event_type, CAST(s.n AS BIGINT) AS n_hours,
           round(f.l, 6) AS level, round(f.t, 6) AS trend,
           round(f.l + f.t, 6) AS forecast_next
    FROM holt f JOIN sz s ON s.event_type = f.event_type AND f.i = s.n
    ORDER BY f.event_type
    """,
)
def ev_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear exponential smoothing (α=β=½) over the hourly
    value series per event type, emitting the final level/trend and
    the one-step forecast — the classic capacity-planning smoother.

    The fold is sequential BY DEFINITION, so it runs over the tiny
    per-type hourly array (the corpus-sized work is the hourly
    aggregate); α=½ makes every smoothing step an exact binary
    halving, and both engines fold the same doubles in the same
    order, so the state is bit-deterministic before the final
    6-dp rounding.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.sum(F.col("value").cast(DV)).cast("double").alias("v"))
    series = hourly.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(h, v))), x -> x.v)").alias(
            "vs"
        )
    )
    folded = series.select(
        "event_type",
        F.size("vs").cast("long").alias("n_hours"),
        F.expr(
            "aggregate("
            " slice(vs, 2, size(vs) - 1),"
            " named_struct('l', vs[0], 't', cast(0.0 as double)),"
            " (acc, y) -> named_struct("
            "   'l', (y + acc.l + acc.t) / 2.0D,"
            "   't', ((y + acc.l + acc.t) / 2.0D - acc.l + acc.t) / 2.0D))"
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_hours",
        F.round(F.col("st.l"), 6).alias("level"),
        F.round(F.col("st.t"), 6).alias("trend"),
        F.round(F.col("st.l") + F.col("st.t"), 6).alias("forecast_next"),
    ).orderBy("event_type")


@query(
    "ev_changepoint_cusum",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, h, cents,
             ROW_NUMBER() OVER w AS i,
             SUM(cents) OVER (PARTITION BY event_type ORDER BY h
                              ROWS UNBOUNDED PRECEDING) AS csum
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), tot AS (
      SELECT event_type, CAST(MAX(i) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM cum GROUP BY event_type
    ), scored AS (
      SELECT c.event_type, c.h, c.i,
             t.n * c.csum - c.i * t.total AS s_scaled
      FROM cum c JOIN tot t USING (event_type)
    )
    SELECT event_type,
           first(h ORDER BY abs(s_scaled) DESC, i ASC) AS change_hour,
           CAST(first(i ORDER BY abs(s_scaled) DESC, i ASC) AS BIGINT) AS change_idx,
           CAST(MAX(abs(s_scaled)) AS BIGINT) AS max_dev_scaled
    FROM scored GROUP BY event_type ORDER BY event_type
    """,
)
def ev_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the hour where
    the cumulative deviation from the series mean peaks — the
    standard single-changepoint estimator for monitoring level
    shifts. Scaled through by n (Sᵢ·n = n·cumsumᵢ − i·total) so the
    whole statistic is EXACT int64 on integer cents — no float mean,
    no tolerance, fully value-oracled.
    One hourly aggregate, one per-type running-sum window over
    #hours rows, one argmax (min over (−|S|, i) struct).
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(F.col("value").cast(DV) * 100).cast("long").alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    cum = hourly.withColumn("i", F.row_number().over(w)).withColumn(
        "csum", F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    tot = cum.groupBy("event_type").agg(
        F.max("i").cast("long").alias("n"), F.sum("cents").alias("total")
    )
    scored = cum.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "h",
        "i",
        (F.col("n") * F.col("csum") - F.col("i") * F.col("total")).alias("s_scaled"),
    )
    best = F.min(F.struct(-F.abs(F.col("s_scaled")), F.col("i"), F.col("h")))
    return (
        scored.groupBy("event_type")
        .agg(
            best.getField("h").alias("change_hour"),
            best.getField("i").cast("long").alias("change_idx"),
            F.max(F.abs("s_scaled")).alias("max_dev_scaled"),
        )
        .orderBy("event_type")
    )


@query(
    "ev_autocorr_lag24",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           COUNT(*) AS n_pairs,
           ROUND(corr(a.v, b.v), 6) AS autocorr_24h
    FROM hourly a JOIN hourly b
      ON b.event_type = a.event_type AND b.h = a.h + INTERVAL 24 HOURS
    GROUP BY a.event_type ORDER BY a.event_type
    """,
)
def ev_autocorr_lag24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-seasonality check: Pearson autocorrelation of the hourly
    series against itself shifted 24 h (high ⇒ strong diurnal cycle —
    the test that decides whether capacity models need a seasonal
    term). Self-join on the shifted hour key is an equi-join;
    corr follows the repo's round-6 contract (corr_price_quantity
    precedent).
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.sum(F.col("value").cast(DV)).cast("double").alias("v")
    )
    a = hourly.select("event_type", "h", F.col("v").alias("va"))
    b = hourly.select(
        "event_type",
        (F.col("h") - F.expr("INTERVAL 24 HOURS")).alias("h"),
        F.col("v").alias("vb"),
    )
    return (
        a.join(b, ["event_type", "h"])
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.corr("va", "vb"), 6).alias("autocorr_24h"),
        )
        .orderBy("event_type")
    )


@query(
    "ev_funnel_windowed",
    oracle="""
    WITH signups AS (
      SELECT user_id, MIN(ts) AS su_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), converted AS (
      SELECT s.user_id, s.su_ts,
             CASE WHEN EXISTS (
               SELECT 1 FROM events p
               WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
                 AND p.ts >= s.su_ts AND p.ts < s.su_ts + INTERVAL 24 HOURS
             ) THEN 1 ELSE 0 END AS conv
      FROM signups s
    )
    SELECT date_trunc('day', su_ts) AS cohort_day,
           COUNT(*) AS n_signups,
           CAST(SUM(conv) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(conv) AS DOUBLE) / COUNT(*), 6) AS conversion_rate
    FROM converted GROUP BY 1 ORDER BY cohort_day
    """,
)
def ev_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-BOUND funnel conversion: of each day's first-time
    signups, what fraction purchased within 24 HOURS of signing up —
    the windowed conversion metric (ev_funnel's order-only funnel
    can't distinguish a day-1 activation from a month-later one).
    The existence probe is a left-semi join on user_id with the
    window refilter — one equi-join, no inequality nested loop.
    """
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("su_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    converted_users = (
        signups.join(purchases, "user_id")
        .filter(
            (F.col("p_ts") >= F.col("su_ts"))
            & (F.col("p_ts") < F.col("su_ts") + F.expr("INTERVAL 24 HOURS"))
        )
        .select("user_id")
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    return (
        signups.join(converted_users, "user_id", "left")
        .select(
            F.date_trunc("day", "su_ts").alias("cohort_day"),
            F.coalesce("conv", F.lit(0)).alias("conv"),
        )
        .groupBy("cohort_day")
        .agg(
            F.count("*").alias("n_signups"),
            F.sum("conv").cast("long").alias("n_converted"),
            F.round(F.sum("conv").cast("double") / F.count("*"), 6).alias(
                "conversion_rate"
            ),
        )
        .orderBy("cohort_day")
    )


@query(
    "ev_sequence_match",
    oracle="""
    WITH seqs AS (
      SELECT user_id,
             string_agg(CASE event_type WHEN 'signup' THEN 's'
                                        WHEN 'click' THEN 'c'
                                        WHEN 'view' THEN 'v'
                                        WHEN 'purchase' THEN 'p'
                                        ELSE 'e' END, '' ORDER BY ts, event_id)
                 AS seq
      FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN regexp_matches(seq, 's.*c.*p') THEN 1 ELSE 0 END)
                AS BIGINT) AS m_signup_click_purchase,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'p.*p') THEN 1 ELSE 0 END)
                AS BIGINT) AS m_repeat_purchase,
           CAST(SUM(CASE WHEN regexp_matches(seq, '^v') THEN 1 ELSE 0 END)
                AS BIGINT) AS m_view_first,
           CAST(SUM(CASE WHEN regexp_matches(seq, 'e{3}') THEN 1 ELSE 0 END)
                AS BIGINT) AS m_error_burst
    FROM seqs
    """,
)
def ev_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (ClickHouse sequenceMatch /
    MATCH_RECOGNIZE-lite): encode each user's time-ordered events as
    a character string and count users matching behavioral regexes —
    signup→…→click→…→purchase, repeat purchase, view-first entry,
    3-error bursts. The encode is one groupBy(user) with an ordered
    fold (sort_array over (ts, event_id, char) structs); every
    pattern then costs a codegen'd regex over a per-user string,
    not another pass over the event log.
    """
    ev = load_table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
    )
    seqs = (
        ev.select("user_id", F.struct("ts", "event_id", ch.alias("ch")).alias("x"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "concat_ws('', transform(array_sort(collect_list(x)), s -> s.ch))"
            ).alias("seq")
        )
    )
    def m(pat):
        return F.sum(F.when(F.col("seq").rlike(pat), 1).otherwise(0)).cast("long")
    return seqs.agg(
        F.count("*").alias("n_users"),
        m("s.*c.*p").alias("m_signup_click_purchase"),
        m("p.*p").alias("m_repeat_purchase"),
        m("^v").alias("m_view_first"),
        m("e{3}").alias("m_error_burst"),
    )


@query(
    "ev_drift_psi",
    oracle="""
    WITH binned AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 'ref' ELSE 'cur' END AS period,
             LEAST(CAST(FLOOR(value / 5.0) AS BIGINT), 9) AS bin
      FROM events
    ), counts AS (
      SELECT event_type, bin,
             CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM binned GROUP BY event_type, bin
    ), tot AS (
      SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
      FROM counts GROUP BY event_type
    ), terms AS (
      SELECT c.event_type, c.bin,
             CAST(ROUND(
               (CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + 10)
                - CAST(c.n_cur + 1 AS DOUBLE) / (t.t_cur + 10))
               * ln((CAST(c.n_ref + 1 AS DOUBLE) / (t.t_ref + 10))
                    / (CAST(c.n_cur + 1 AS DOUBLE) / (t.t_cur + 10)))
               * 1000000) AS BIGINT) AS psi_micro
      FROM counts c JOIN tot t USING (event_type)
    )
    SELECT event_type,
           COUNT(*) AS n_bins,
           CAST(SUM(psi_micro) AS DOUBLE) / 1000000.0 AS psi,
           CAST(SUM(psi_micro) AS DOUBLE) / 1000000.0 > 0.1 AS drifted
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
)
def ev_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor: compare the value
    distribution of the first half of the window (reference) vs the
    rest (current) per event type over fixed bins, with Laplace
    smoothing — the standard "did the feature distribution move"
    alarm (PSI > 0.1 = investigate, > 0.25 = act).

    Determinism: each bin's PSI term is rounded ONCE to integer
    micro-units (the term set is #types × 10 bins), so the sum and
    the alarm threshold are exact int64 — the alarm can never
    flicker across engines or partitionings.
    """
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "ref")
        .otherwise("cur")
        .alias("period"),
        F.least(F.floor(F.col("value") / 5.0).cast("long"), F.lit(9)).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).cast("long").alias("n_ref"),
        F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).cast("long").alias("n_cur"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + 10)
    q = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + 10)
    terms = counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        F.round((p - q) * F.log(p / q) * 1_000_000).cast("long").alias("psi_micro"),
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.count("*").alias("n_bins"),
            (F.sum("psi_micro").cast("double") / 1_000_000.0).alias("psi"),
            ((F.sum("psi_micro").cast("double") / 1_000_000.0) > 0.1).alias("drifted"),
        )
        .orderBy("event_type")
    )


@query(
    "hll_union_partitioned",
    oracle="""
    WITH per_day AS (
      SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id) AS exact_day
      FROM events GROUP BY 1
    )
    SELECT COUNT(*) AS n_days,
           CAST(SUM(exact_day) AS BIGINT) AS sum_day_distinct,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_total,
           TRUE AS merged_within_5pct
    FROM per_day
    """,
)
def hll_union_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE-sketch distinct counting (Apache DataSketches HLL via
    hll_sketch_agg / hll_union_agg): build one sketch PER DAY, union
    the day sketches, and estimate total distinct users without ever
    re-touching the raw data — the pattern that makes daily distinct
    rollups composable into arbitrary date ranges at 100 TB (exact
    COUNT DISTINCT cannot merge; sketches can).

    The oracle pins the exact per-day and total distincts plus the
    assertion that the merged estimate lands within 5% of exact
    (lgConfigK=12 ⇒ ~1.6% rse; 5% is a hard bound, not a tolerance
    fudge — the estimate itself is engine-specific, which is why the
    CHECK is oracled rather than the raw estimate).
    """
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"),
        F.countDistinct("user_id").alias("exact_day"),
    )
    merged = per_day.agg(
        F.count("*").alias("n_days"),
        F.sum("exact_day").alias("sum_day_distinct"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
    )
    exact_total = ev.agg(F.countDistinct("user_id").alias("exact_total"))
    return merged.crossJoin(F.broadcast(exact_total)).select(
        "n_days",
        "sum_day_distinct",
        "exact_total",
        (
            F.abs(F.col("est_total") - F.col("exact_total"))
            * 100
            <= F.col("exact_total") * 5
        ).alias("merged_within_5pct"),
    )


# Benford expected shares, precomputed ONCE in Python and injected as
# literals into BOTH engines' plans: log10(1 + 1/d) in ppm. Computing
# the expectation inside each engine would put two libm log10's and a
# rounding boundary between them; a literal cannot diverge.
_BENFORD_PPM = {d: round(__import__("math").log10(1 + 1 / d) * 1_000_000) for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE digit " + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()) + " END"
)


@query(
    "ev_benford_report",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM events
      WHERE CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) > 0
    ), digits AS (
      SELECT CAST(regexp_extract(CAST(c AS VARCHAR), '[1-9]') AS BIGINT) AS digit
      FROM cents
    ), counted AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ), tot AS (SELECT SUM(n) AS total FROM counted)
    SELECT digit, n,
           CAST((n * 1000000) // tot.total AS BIGINT) AS obs_ppm,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm
    FROM counted, tot ORDER BY digit
    """,
)
def ev_benford_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of the event value stream: observed
    first-significant-digit shares vs the log10(1+1/d) expectation —
    the standard fraud/integrity screen for money-like columns.

    The digit is taken from the INTEGER cents rendering (decimal
    cast → bigint → string), never from a double's string form —
    integer-to-string is identical on every engine while double
    formatting is not. Shares are integer ppm (n·10⁶ // total) and
    the Benford expectation is a Python-precomputed literal, so the
    whole report is exact int64. One scan, one 9-group aggregate,
    one broadcast total.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        (F.col("value").cast(DV) * 100).cast("long").alias("c")
    ).filter(F.col("c") > 0)
    counted = (
        cents.select(
            F.regexp_extract(F.col("c").cast("string"), "[1-9]", 0)
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = counted.agg(F.sum("n").alias("total"))
    return (
        counted.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("(n * 1000000) div total").cast("long").alias("obs_ppm"),
            F.expr(_BENFORD_CASE).cast("long").alias("benford_ppm"),
        )
        .orderBy("digit")
    )


@query(
    "ev_seasonality_profile",
    oracle="""
    WITH base AS (
      SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      FROM events
    ), cell AS (
      SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(c) AS BIGINT) AS sum_cents
      FROM base GROUP BY dow, hod
    ), tot AS (SELECT SUM(sum_cents) AS total FROM cell)
    SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
           n_events, sum_cents,
           CAST((sum_cents * 1000000) // tot.total AS BIGINT) AS share_ppm
    FROM cell, tot ORDER BY dow, hod
    """,
)
def ev_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day seasonality grid: event counts,
    exact cent mass, and each cell's integer-ppm share of total —
    the load-shape profile behind capacity planning and
    anomaly-baseline selection. (Deviation scoring composes with
    ``ev_zscore_anomalies``; this op owns the grid.) One scan, one
    168-cell aggregate, one broadcast total; all int64.

    DOW parity: Spark's ``dayofweek`` is Sunday=1..Saturday=7,
    DuckDB's is Sunday=0..Saturday=6 — the oracle shifts by one.
    """
    ev = load_table(spark, sf_dir, "events")
    cell = (
        ev.select(
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
            (F.col("value").cast(DV) * 100).cast("long").alias("c"),
        )
        .groupBy("dow", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("c").cast("long").alias("sum_cents"),
        )
    )
    tot = cell.agg(F.sum("sum_cents").alias("total"))
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("dow").cast("long").alias("dow"),
            F.col("hod").cast("long").alias("hod"),
            "n_events",
            "sum_cents",
            F.expr("(sum_cents * 1000000) div total").cast("long").alias("share_ppm"),
        )
        .orderBy("dow", "hod")
    )


HH_BUCKETS = 32  # content-addressed merge buckets (partition stand-ins)
HH_PER_BUCKET = 8  # partial top-m retained per bucket
HH_TOPK = 10


def heavy_hitters_oracle_sql() -> str:
    """ONE oracle definition for the batch operator and the streaming
    monitor (they already share `hh_merge` on the engine side)."""
    return f"""
    WITH c AS (
      SELECT {md5_long_sql("CAST(user_id AS VARCHAR)")} % {HH_BUCKETS} AS b, user_id,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), top AS (
      SELECT b, user_id, cnt FROM (
        SELECT b, user_id, cnt,
               ROW_NUMBER() OVER (PARTITION BY b
                                  ORDER BY cnt DESC, user_id) AS rk
        FROM c
      ) WHERE rk <= {HH_PER_BUCKET}
    ), cut AS (
      -- what a missing key could have hidden below the bucket's cut:
      -- the m-th retained count, or 0 when nothing was dropped
      SELECT t.b,
             CASE WHEN (SELECT COUNT(*) FROM c WHERE c.b = t.b) > {HH_PER_BUCKET}
                  THEN MIN(t.cnt) ELSE 0 END AS cutoff
      FROM top t GROUP BY t.b
    ), tot AS (
      SELECT CAST(SUM(cutoff) AS BIGINT) AS total_cut FROM cut
    ), agg AS (
      SELECT t.user_id,
             CAST(SUM(t.cnt) AS BIGINT) AS lower_bound,
             CAST(SUM(u.cutoff) AS BIGINT) AS present_cut
      FROM top t JOIN cut u ON u.b = t.b
      GROUP BY t.user_id
    )
    SELECT user_id, lower_bound,
           CAST(lower_bound + (total_cut - present_cut) AS BIGINT) AS upper_bound
    FROM agg, tot
    ORDER BY lower_bound DESC, user_id LIMIT {HH_TOPK}
    """


@query("heavy_hitters_topk", oracle=heavy_hitters_oracle_sql())
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed heavy hitters with DETERMINISTIC error bounds —
    the skew-diagnosis / hot-key mining primitive (SURVEY round-5
    candidate; complements `skew_key_report`, which profiles known
    join keys). The stream is split into HH_BUCKETS content-addressed
    buckets (md5 of the key — partitioning-invariant stand-ins for
    physical partitions), each bucket keeps only its exact top-m
    counts, and the merge sees HH_BUCKETS x m rows regardless of key
    cardinality. For every reported key: `lower_bound` = mass
    actually observed in retained partials, `upper_bound` adds each
    non-reporting bucket's retention cutoff — the classical
    distributed top-k guarantee, exact integers on both engines.

    Scale shape: one partial-combined groupBy on (bucket, key) (the
    same exchange a plain per-key count pays), one window over the
    KEY table (not the event stream), then bounded merge arithmetic
    on 32 x 8 rows with the 32-row cutoff table broadcast. No
    full-key-table global sort: the final top-10 is a
    TakeOrderedAndProject over the bounded candidate set.
    """
    from mallard_spark.functions.hashing import md5_long

    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.select(
            (md5_long(F.col("user_id").cast("string")) % HH_BUCKETS).alias("b"),
            "user_id",
        )
        .groupBy("b", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return hh_merge(c)


def hh_merge(c: DataFrame) -> DataFrame:
    """Bounded heavy-hitter merge over a (b, user_id, cnt) counts
    table — ONE definition shared by the batch operator and the
    streaming monitor (which maintains the counts incrementally)."""
    w = Window.partitionBy("b").orderBy(F.desc("cnt"), "user_id")
    ranked = c.select(
        "b",
        "user_id",
        "cnt",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("b")).alias("nk"),
    )
    top = ranked.filter(F.col("rk") <= HH_PER_BUCKET)
    cut = top.groupBy("b").agg(
        F.when(F.max("nk") > HH_PER_BUCKET, F.min("cnt"))
        .otherwise(F.lit(0))
        .alias("cutoff")
    )
    tot = cut.agg(F.sum("cutoff").cast("long").alias("total_cut"))
    agg = (
        top.join(F.broadcast(cut), "b")
        .groupBy("user_id")
        .agg(
            F.sum("cnt").cast("long").alias("lower_bound"),
            F.sum("cutoff").cast("long").alias("present_cut"),
        )
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "lower_bound",
            (F.col("lower_bound") + F.col("total_cut") - F.col("present_cut"))
            .cast("long")
            .alias("upper_bound"),
        )
        .orderBy(F.desc("lower_bound"), "user_id")
        .limit(HH_TOPK)
    )

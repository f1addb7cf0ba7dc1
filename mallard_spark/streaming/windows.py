"""Structured Streaming operators.

The reference's EXCHANGE is a stream transform; Spark's native
streaming story is readStream → transform → writeStream. Here the
events table is replayed through a file stream source and aggregated
with tumbling windows; the result must equal the batch ev_hourly_agg
(that equivalence IS the oracle). `complete` output mode + memory
sink lets the driver's batch-style check consume a streaming result.

At scale the source becomes Kafka and the memory sink becomes a
parquet/Delta sink with a watermark — `windowed_stream` exposes the
watermark variant for that path.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.functions.hashing import md5_long_sql
from mallard_spark.functions.text import word_shingles_sql
from mallard_spark.operators.llm import _BLOOM_JS_SQL as BLOOM_JS_SQL
from mallard_spark.operators.llm import _bloom_pos_sql as bloom_pos_sql
from mallard_spark.registry import query

# same content-addressed split key as operators/llm.py's batch sweep
_BLOOM_BUCKET_SQL = f"{md5_long_sql('CAST(doc_id AS VARCHAR)')} % 100"

DV = "decimal(12,2)"

# Stateful-stream shuffle width. Stateful operators pay a PER-PARTITION
# state-store open/commit (delta files on disk) every micro-batch, so
# partition count must be sized to STATE VOLUME, not to the session's
# batch shuffle width: at sf0.1 the stream-stream interval join runs
# 9.8 s with 32 state partitions and 2.2 s with 4 — identical results.
# At 100 TB-scale state you raise this (it is fixed at first start by
# the checkpoint, like any Spark stateful query).
# Round 15 re-measure across ALL three benched streams (best-of-2,
# one session): 8 partitions → 1.23 + 4.48 + 2.37 = 8.08 s,
# 4 partitions → 1.19 + 4.06 + 2.15 = 7.40 s — 4 matches sf0.1 state
# volume better still; results identical (state partitioning is
# physical only). The env dial is unchanged for real state volumes.
STATE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STATE_PARTITIONS", "4"))


@contextmanager
def _no_nodata_batches(spark: SparkSession):
    """Disable watermark-advance (no-data) micro-batches while a
    stream runs to completion (round 16, VERDICT r15 item #5).

    SCOPE WITH CARE: safe ONLY for queries whose every output row is
    emitted by a DATA batch — the INNER stream-stream interval join
    emits eagerly on match, and its no-data batches exist purely to
    prune buffered state, which is moot for a run-to-completion
    invocation (the query stops right after processAllAvailable).
    Append-mode aggregations (stream_windowed_agg) and OUTER
    stream-stream joins (stream_interval_join_outer) emit their
    final/null-extended rows IN the watermark-advance batch — for
    those, disabling this setting LOSES rows. Measured paired
    best-of-3 on stream_interval_join, results collect-compared
    identical (1468 rows): 2.10 → 1.44 s. stream_dedup_minhash
    measured neutral (1.24/1.22 s) and keeps the default.
    """
    old = spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", old
        )


@contextmanager
def _state_shuffle(spark: SparkSession, n: int = STATE_PARTITIONS):
    """Pin shuffle partitions while a stateful stream STARTS (the
    value is captured into the query's checkpoint at start), then
    restore the session's batch setting."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events parquet (ns ts read as long)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path)
    if os.path.isdir(path):  # dataset directory of part files
        stream = spark.readStream.schema(batch.schema).parquet(path)
    else:
        # single-file layout: the stream source needs a directory;
        # glob down to the one file (pathGlobFilter matches leaf names)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if dict(batch.dtypes).get("ts") == "bigint":  # ns-precision source
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(batch.dtypes).get("ts") == "timestamp_ntz":  # µs NTZ source
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_stream(
    spark: SparkSession, sf_dir: str, watermark: str | None = None
) -> DataFrame:
    """Tumbling 1-hour windowed aggregation as a streaming query."""
    ev = _events_stream(spark, sf_dir)
    if watermark:
        ev = ev.withWatermark("ts", watermark)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DV)).cast("double").alias("total_value"),
        )
    )


@query(
    "session_window_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           date_trunc('second', MIN(ts)) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window (30-min gap) in batch mode.

    Same semantics as plans.events.ev_sessionize's lag+cumsum, but
    expressed with the built-in operator (which also works in
    streaming with state). Spark closes a session when the gap is
    ≥ the timeout, so the oracle's new-session test uses >=.
    Outputs are second-truncated: raw event timestamps would differ
    between a µs engine and an ns oracle.
    """
    from mallard_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DV)).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.date_trunc("second", F.col("sw.start")).alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "stream_stateful_user_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user running totals via
    applyInPandasWithState (arbitrary state, the Structured Streaming
    analogue of the reference's stateful exchangers).

    The state accumulates INTEGER CENTS (values are 2-decimal), so the
    final totals are exact under any batch/partition order — which
    makes the FINAL state value-checkable against the batch aggregate
    (round 3: upgraded from rows-only). Update-mode emits one row per
    state change; the final row per user is selected by the event
    COUNT (strictly increasing across state updates), not by the
    total itself, so negative values (refunds/adjustments) are safe
    (ADVICE r3).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from mallard_spark.session import ship_package

    ship_package(spark)
    ev = _events_stream(spark, sf_dir).select("user_id", "value")

    def update_totals(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    out = ev.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType="user_id long, n_events long, total_cents long",
        stateStructType="n long, cents long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = "mallard_stream_user_totals"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            # n_events strictly increases with every state update, so
            # max_by picks the LAST emitted state — correct even when
            # negative values make total_cents non-monotone.
            (F.max_by("total_cents", "n_events") / 100.0).alias("total_value"),
        )
    )


@query(
    "stream_windowed_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the windowed agg THROUGH Structured Streaming and return the
    finished result; the oracle is the equivalent batch SQL — streaming
    and batch must agree exactly (complete mode, no dropped windows)."""
    agg = windowed_stream(spark, sf_dir)
    name = "mallard_stream_windowed_agg"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "stream_rate_demo",
    oracle="SELECT 1000 AS n, 499500 AS total",  # sum(0..999) — source is synthetic
)
def stream_rate_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-style unbounded source demo: the deterministic
    ``rate-micro-batch`` source (fixed rows/batch, fixed timestamps —
    the reproducible stand-in for a Kafka topic), consumed through a
    memory sink until 1000 monotonic values have arrived.

    The aggregate over values 0..999 is a closed-form constant, so
    even an unbounded-source query gets a full value oracle.
    """
    import time

    name = "mallard_stream_rate_demo"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 250)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
        .select("value")
    )
    with _state_shuffle(spark):
        q = src.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).filter(F.col("value") >= 999).count() > 0:
                break
            time.sleep(0.2)
    finally:
        q.stop()
    return (
        spark.table(name)
        .filter(F.col("value") < 1000)
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )


@query(
    "stream_parquet_sink",
    oracle="""
    SELECT event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → parquet files with exactly-once foreachBatch.

    The production sink path: each micro-batch lands in a
    batch-id-named subdirectory with dynamic overwrite, so a replayed
    batch (restart after failure) overwrites its own output instead
    of appending duplicates — idempotent writes + checkpointed
    offsets = exactly-once file output. The oracle proves no row was
    lost or duplicated end-to-end: stream-written parquet must equal
    the batch aggregate of the source table.
    """
    import shutil
    import tempfile

    out_root = os.path.join(tempfile.gettempdir(), "mallard_stream_parquet_sink")
    data_dir = os.path.join(out_root, "data")
    ckpt_dir = os.path.join(out_root, "ckpt")
    shutil.rmtree(out_root, ignore_errors=True)

    ev = _events_stream(spark, sf_dir).select("event_id", "event_type", "value")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # idempotent: a replay of batch N rewrites batch=N in place
        (
            batch_df.write.mode("overwrite")
            .parquet(os.path.join(data_dir, f"batch={batch_id}"))
        )

    name = "mallard_stream_parquet_sink"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            ev.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt_dir)
            .queryName(name)
            .trigger(availableNow=True)
            .start()
    )
    q.awaitTermination(300)

    written = spark.read.parquet(os.path.join(data_dir, "batch=*"))
    return written.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DV)).cast("double").alias("total_value"),
    )


@query(
    "stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the unbounded event stream joins
    a static dimension (customer) per micro-batch, then aggregates.

    The static side is broadcast to every task — no stream-side state,
    no shuffle of the stream for the join; this is the standard
    "enrich a Kafka stream with a dim table" topology and it scales
    with the stream alone. Oracle = the equivalent batch join.
    """
    from mallard_spark.sources.readers import load_table

    ev = _events_stream(spark, sf_dir)
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    agg = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DV)).cast("double").alias("total_value"),
        )
    )
    name = "mallard_stream_static_join"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "stream_dedup",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: dropDuplicates on (event_type,
    user_id) maintains a distinct-keys state store across
    micro-batches and emits each key once (append mode).

    At scale the state is partitioned by key across executors; with a
    watermark the store is pruned by event time
    (dropDuplicatesWithinWatermark). The emitted key set is then
    counted batch-side; oracle = COUNT(DISTINCT) over the source.
    """
    ev = _events_stream(spark, sf_dir).select("event_type", "user_id")
    deduped = ev.dropDuplicates(["event_type", "user_id"])
    name = "mallard_stream_dedup"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.count("user_id").alias("n_users"))
    )


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the documents parquet (single-file layout)."""
    path = os.path.join(sf_dir, "documents.parquet")
    batch = spark.read.parquet(path)
    if os.path.isdir(path):
        return spark.readStream.schema(batch.schema).parquet(path)
    return (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def _band0_key_batch(batches):
    """Arrow-batched band-0 LSH key: per doc, 3-token shingles →
    md5-derived 60-bit ints → two affine minhashes → band md5. Exactly
    :func:`mallard_spark.operators.dedup._minhash_signatures` math for
    k=2 (same coefficients, same modulus), kept in Python because the
    streaming pre-dedup projection cannot use the explode+groupBy
    shape that keeps md5 in JVM codegen — see stream_dedup_minhash.
    ``text.lower().split()`` matches the ``\\S+`` tokenizer on this
    corpus (same equivalence phash_batch already relies on)."""
    import hashlib

    import pandas as pd

    from mallard_spark.operators.dedup import MH_P, _mh_coeff

    md5 = hashlib.md5
    (a0, b0), (a1, b1) = _mh_coeff(0), _mh_coeff(1)
    for pdf in batches:
        ids, keys = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = text.lower().split() if text else []
            n = len(toks)
            if n < 3:
                continue  # too short to shingle: passes through unkeyed
            m0 = m1 = MH_P
            for i in range(n - 2):
                s = " ".join(toks[i : i + 3])
                h = int(md5(s.encode()).hexdigest()[:15], 16) % MH_P
                v0 = (a0 * h + b0) % MH_P
                if v0 < m0:
                    m0 = v0
                v1 = (a1 * h + b1) % MH_P
                if v1 < m1:
                    m1 = v1
            ids.append(doc_id)
            keys.append(md5(f"0:{m0}:{m1}".encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "band_key": pd.Series(keys, dtype="object"),
            }
        )


def _minhash_band0_oracle() -> str:
    from mallard_spark.operators.dedup import minhash_sig_ctes

    return f"""
    WITH {minhash_sig_ctes(k=2)}
    SELECT COUNT(DISTINCT md5(concat(0, ':', mh0, ':', mh1))) AS n_near_distinct
    FROM mh
    """


@query("stream_dedup_minhash", oracle=_minhash_band0_oracle())
def stream_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING near-dup dedup: each arriving document is keyed by
    its first MinHash LSH band (band 0 of dedup_minhash_lsh's 8×2
    banding, md5-portable), and ``dropDuplicates`` on that key keeps
    one representative per near-dup family in the state store —
    the incremental counterpart of the batch MinHash dedup, for
    dedup-at-ingest pipelines.

    The band key is a pure per-row column expression (tokens →
    distinct shingles → two minhashes → band hash), so it streams
    without a pre-aggregation; docs too short to shingle pass through
    unkeyed and are excluded here (mirrored in the oracle). At scale
    the state store is key-partitioned across executors and pruned
    with dropDuplicatesWithinWatermark on event time.

    Oracle: the surviving-row CONTENT is arrival-order-dependent, but
    the number of distinct band keys is not — the count is the
    value-checked result.
    """
    from mallard_spark.session import ship_package

    ship_package(spark)
    # repartition BEFORE the heavy per-row work: the single-file
    # stream source yields ONE scan partition per micro-batch, which
    # would run all shingle+md5 work on one core (measured ~13% total
    # win here; at real ingest widths the projection dominates and the
    # spread is what keeps per-batch latency flat)
    docs = _documents_stream(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    # Round 15: the band key is computed in an Arrow-batched Python
    # pass (_band0_key_batch), not the old nested higher-order-function
    # chain (transform(shingles, md5) → 2 × array_min(transform(...))).
    # Spark evaluates higher-order lambdas INTERPRETED (no whole-stage
    # codegen), and the batch explode+groupBy shape that keeps md5 in
    # codegen is unavailable pre-dropDuplicates in a stream — measured
    # paired on the identical batch projection: HOF chain 4.03 s vs
    # Python pass 0.65 s at sf0.1, band keys bit-identical (the md5 →
    # 60-bit int → affine-min chain is exact int64 on both sides;
    # coefficients < 2³¹ keep a·h < 2⁶² overflow-free).
    keyed = docs.select("doc_id", "text").mapInPandas(
        _band0_key_batch, schema="doc_id long, band_key string"
    )
    deduped = keyed.dropDuplicates(["band_key"])
    name = "mallard_stream_dedup_minhash"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).agg(F.count("*").alias("n_near_distinct"))


ATTR_WINDOW_MIN = 240  # attribution lookback, minutes


@query(
    "stream_interval_join",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             epoch_ns(ts) // 1000 AS us
      FROM events
    )
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           p.value AS purchase_value,
           CAST((p.us - c.us) // 1000000 AS BIGINT) AS lag_seconds
    FROM e p JOIN e c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.us BETWEEN p.us - {ATTR_WINDOW_MIN * 60 * 1000000} AND p.us
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join: purchases attribute to the same
    user's clicks from the preceding {ATTR_WINDOW_MIN} minutes — both
    sides unbounded streams (a self-join of the event stream).

    This is the hardest Structured Streaming join shape: each side
    buffers rows in keyed state until the OTHER side's watermark
    passes the interval bound, so state is pruned to the lookback
    window instead of growing forever. At scale state is partitioned
    by user_id across executors; the time-interval condition is what
    makes cleanup possible (an unconstrained stream-stream join would
    accumulate unbounded state).

    Determinism: both engines compare integer MICROSECONDS (Spark
    timestamps are µs-precision; the oracle truncates its ns source
    the same way), so boundary pairs agree bit-for-bit. Output has no
    raw timestamps — the lag surfaces as whole seconds.
    """
    ev = _events_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("value").alias("purchase_value"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"user_id = c_user AND click_ts BETWEEN "
            f"p_ts - INTERVAL {ATTR_WINDOW_MIN} MINUTES AND p_ts"
        ),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        "purchase_value",
        (
            (F.unix_micros("p_ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000)
        ).cast("long").alias("lag_seconds"),
    )
    name = "mallard_stream_interval_join"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    # round 16: INNER join — every row is emitted by a data batch, so
    # the watermark-advance (no-data) micro-batches only prune state
    # the run-to-completion invocation never reuses; skipping them is
    # result-identical (see _no_nodata_batches) and -32% wall.
    with _no_nodata_batches(spark):
        with _state_shuffle(spark):
            q = (
                joined.writeStream.outputMode("append")
                .format("memory")
                .queryName(name)
                .start()
            )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           date_trunc('second', MIN(ts)) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows: session_window + watermark in
    append mode — the stateful gap-sessionization path whose state
    store holds only OPEN sessions (closed ones are emitted and
    evicted once the watermark passes, which is what bounds state at
    100 TB/day event volumes).

    Append mode only emits a session after the watermark passes its
    close, and a replayed static file advances the watermark exactly
    once — so the fixture stages the events as batch 1 and one
    far-future sentinel event as batch 2 (maxFilesPerTrigger=1).
    Batch 2's watermark closes every real session; the sentinel's own
    session is filtered out. Oracle = the batch lag+cumsum
    sessionization (same SQL as session_window_agg): streaming and
    batch sessions must agree exactly.
    """
    import shutil
    import tempfile

    stage_root = os.path.join(tempfile.gettempdir(), "mallard_stream_session_window")
    shutil.rmtree(stage_root, ignore_errors=True)
    src_dir = os.path.join(stage_root, "src")

    # stage batch 1: the real events (normalized ts), batch 2: sentinel
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(raw.dtypes).get("ts") == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    ev = raw.select("event_id", "ts", "user_id", "value")
    ev.coalesce(1).write.parquet(os.path.join(src_dir, "b1"))
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(-1, max_ts, -1, 0.0)], "event_id long, ts timestamp, user_id long, value double"
    ).select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        "user_id",
        "value",
    )
    sentinel.coalesce(1).write.parquet(os.path.join(src_dir, "b2"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src_dir, "*"))
        .withWatermark("ts", "1 minute")
    )
    sessions = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DV)).cast("double").alias("session_value"),
    )
    name = "mallard_stream_session_window"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            sessions.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.date_trunc("second", F.col("sw.start")).alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@query(
    "stream_sliding_window_agg",
    oracle="""
    WITH expanded AS (
      SELECT event_type, value,
             epoch_ms((CAST(FLOOR(epoch(ts) / 900) AS BIGINT) - k.k) * 900000)
                 AS window_start
      FROM events, (SELECT unnest(range(4)) AS k) k
    )
    SELECT window_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
)
def stream_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-window streaming aggregation (1 h window, 15 min
    slide): each event lands in exactly 4 overlapping windows —
    Spark's window() does the expansion inside the stateful agg.
    The oracle derives the same 4 epoch-aligned window starts per
    event with integer grid arithmetic, so streaming output equals
    the batch expansion exactly (complete mode, decimal-exact sums).
    At scale the state is #windows × #types rows — bounded by the
    watermarked retention, not the stream.
    """
    ev = _events_stream(spark, sf_dir)
    agg = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(DV)).cast("double").alias("total_value"),
    )
    name = "mallard_stream_sliding_agg"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "stream_interval_join_outer",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, value,
             epoch_ns(ts) // 1000 AS us
      FROM events
    )
    SELECT p.event_id AS purchase_id,
           COALESCE(c.event_id, -1) AS click_id,
           p.user_id,
           p.value AS purchase_value,
           CAST(COALESCE((p.us - c.us) // 1000000, -1) AS BIGINT) AS lag_seconds
    FROM e p LEFT JOIN e c
      ON p.user_id = c.user_id
     AND c.event_type = 'click'
     AND c.us BETWEEN p.us - {ATTR_WINDOW_MIN * 60 * 1000000} AND p.us
    WHERE p.event_type = 'purchase'
    """,
)
def stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase is
    emitted — attributed to preceding clicks when they exist, or as
    an unmatched row (click_id = −1) once the watermark PROVES no
    click can still arrive. That proof is the semantic difference
    from the inner join: null-side emission is watermark-driven
    state-timeout behavior, not a match.

    Fixture mechanics: outer results for rows buffered in batch N are
    emitted only after a LATER batch advances the global watermark
    (min of both sides) past their bound — so the staging dir gets
    the events file plus TWO far-future sentinel files (one batch
    each, both sides' event time advanced; sentinels use user −1 and
    are filtered from the result). Oracle = the batch LEFT JOIN.
    """
    import shutil
    import tempfile

    stage_root = os.path.join(
        tempfile.gettempdir(), "mallard_stream_interval_outer"
    )
    shutil.rmtree(stage_root, ignore_errors=True)
    src_dir = os.path.join(stage_root, "src")

    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(raw.dtypes).get("ts") == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    ev = raw.select("event_id", "ts", "user_id", "event_type", "value")
    ev.coalesce(1).write.parquet(os.path.join(src_dir, "b1"))
    max_ts = ev.agg(F.max("ts")).first()[0]
    for i, days in enumerate((30, 31)):
        sent = spark.createDataFrame(
            [(-1 - i, max_ts, -1, "click", 0.0), (-10 - i, max_ts, -1, "purchase", 0.0)],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        ).select(
            "event_id",
            (F.col("ts") + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
        sent.coalesce(1).write.parquet(os.path.join(src_dir, f"b{i + 2}"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src_dir, "*"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("value").alias("purchase_value"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"user_id = c_user AND click_ts BETWEEN "
            f"p_ts - INTERVAL {ATTR_WINDOW_MIN} MINUTES AND p_ts"
        ),
        "leftOuter",
    ).select(
        "purchase_id",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        "user_id",
        "purchase_value",
        F.coalesce(
            (
                (F.unix_micros("p_ts") - F.unix_micros("click_ts"))
                / F.lit(1_000_000)
            ).cast("long"),
            F.lit(-1),
        ).alias("lag_seconds"),
    )
    name = "mallard_stream_interval_outer"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).filter(F.col("user_id") >= 0)


@query(
    "stream_cdc_upsert",
    oracle="""
    SELECT user_id,
           date_trunc('second', first(ts ORDER BY ts DESC, event_id DESC))
               AS last_ts,
           first(value ORDER BY ts DESC, event_id DESC) AS last_value
    FROM events GROUP BY user_id
    """,
)
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert sink: foreachBatch merges each
    micro-batch into a keyed parquet state table with LATEST-WINS
    semantics (max (ts, event_id) per user) — the Delta-MERGE
    stand-in for "current state of every entity" serving tables.

    Replay safety without transactions: the merge is IDEMPOTENT
    (latest-wins union absorbs re-merged rows) and each batch writes
    a versioned state snapshot (state/v=N, overwritten on replay),
    so a crashed-and-replayed batch converges to the same state.
    The oracle is the batch latest-event-per-user — stream-built
    state must equal it exactly.
    """
    import shutil
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "mallard_stream_cdc_upsert")
    shutil.rmtree(root, ignore_errors=True)
    state_root = os.path.join(root, "state")
    ckpt = os.path.join(root, "ckpt")

    ev = _events_stream(spark, sf_dir).select("event_id", "ts", "user_id", "value")
    schema = "user_id long, ts timestamp, event_id long, value double"

    def latest(df: DataFrame) -> DataFrame:
        pick = F.max(F.struct("ts", "event_id", "value"))
        return df.groupBy("user_id").agg(
            pick.getField("ts").alias("ts"),
            pick.getField("event_id").alias("event_id"),
            pick.getField("value").alias("value"),
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os as _os

        prev_dirs = (
            sorted(
                int(d.split("=")[1])
                for d in _os.listdir(state_root)
                if d.startswith("v=") and int(d.split("=")[1]) < batch_id
            )
            if _os.path.isdir(state_root)
            else []
        )
        spark_ = batch_df.sparkSession
        cur = latest(batch_df.select("user_id", "ts", "event_id", "value"))
        if prev_dirs:
            prev = spark_.read.schema(schema).parquet(
                _os.path.join(state_root, f"v={prev_dirs[-1]}")
            )
            cur = latest(prev.unionByName(cur))
        # versioned snapshot: a replayed batch OVERWRITES its own
        # version, never compounds into a newer one
        cur.write.mode("overwrite").parquet(
            _os.path.join(state_root, f"v={batch_id}")
        )

    name = "mallard_stream_cdc_upsert"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            ev.writeStream.foreachBatch(merge_batch)
            .option("checkpointLocation", ckpt)
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(180)
    vs = sorted(
        int(d.split("=")[1]) for d in os.listdir(state_root) if d.startswith("v=")
    )
    state = spark.read.schema(schema).parquet(
        os.path.join(state_root, f"v={vs[-1]}")
    )
    return state.select(
        "user_id",
        F.date_trunc("second", "ts").alias("last_ts"),
        F.col("value").alias("last_value"),
    )


@query(
    "stream_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT source,
             len(regexp_extract_all(lower(text), '\\S+')) AS n,
             CAST(list_aggregate(list_transform(
                    regexp_extract_all(lower(text), '\\S+'),
                    t -> length(t)), 'sum') AS BIGINT) AS chars,
             len(list_filter(list_distinct(regexp_extract_all(lower(text), '\\S+')),
                 t -> t IN ('the','a','of','and','to','in','is','that','with','for')))
               AS n_stop,
             len(list_filter(regexp_extract_all(lower(text), '\\S+'),
                 t -> regexp_matches(t, '[a-z]'))) AS n_alpha
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(CASE WHEN n >= 20 AND n <= 100000
                          AND chars >= 3 * n AND chars <= 10 * n
                          AND n_stop >= 2 AND 10 * n_alpha >= 8 * n
                    THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept
    FROM scored GROUP BY source
    """,
)
def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time quality filtering: the Gopher rule battery
    (operators/quality.py ``gopher_flags`` — identical column
    expressions, imported, so batch and stream can never drift)
    applied to a streaming documents source, with per-source
    kept/total counts aggregated in complete mode. The oracle is the
    batch SQL over the same corpus — micro-batch filtering must
    produce exactly the batch answer. Rule evaluation is stateless
    per row; only the 20-row per-source count carries state.
    """
    from mallard_spark.operators.quality import gopher_flags

    path = os.path.join(sf_dir, "documents.parquet")
    batch = spark.read.parquet(path)
    if os.path.isdir(path):
        stream = spark.readStream.schema(batch.schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
    flags = gopher_flags(stream)
    agg = flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum(
            F.col("ok_words") * F.col("ok_mwl") * F.col("ok_stop") * F.col("ok_alpha")
        ).cast("long").alias("docs_kept"),
    )
    name = "mallard_stream_quality_filter"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("source", "docs", "docs_kept")


def bloom_flag_expr(words: list[int]) -> str:
    """The stateless per-document contamination flag: EXISTS over the
    doc's shingle array (column ``shs``) of "all BLOOM_J hash bits set
    in the baked-in bitmap". ONE definition shared by the registered
    streaming query and its restart test so they can never drift."""
    from mallard_spark.functions.hashing import md5_long_expr
    from mallard_spark.operators.llm import BLOOM_J, BLOOM_M

    bm = "array(" + ",".join(f"{w}L" for w in words) + ")"
    pos_src = "concat(s, ':bf', j)"
    posj = f"({md5_long_expr(pos_src)} % {BLOOM_M})"
    j_lits = ",".join(f"'{j}'" for j in range(BLOOM_J))
    return (
        f"exists(shs, s -> forall(transform(array({j_lits}), j -> "
        + posj
        + f"), p -> (shiftright(element_at({bm}, cast(p div 63 as int) + 1), "
        "cast(p % 63 as int)) & 1) = 1))"
    )


@query(
    "stream_decontaminate_bloom",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_BLOOM_BUCKET_SQL} AS bucket, s.sh
      FROM documents, UNNEST(list_distinct({word_shingles_sql(3)})) s(sh)
    ), test_sh AS (
      SELECT DISTINCT sh FROM sh WHERE bucket >= 90
    ), bloom AS (
      SELECT pos // 63 AS word, bit_or(1::BIGINT << (pos % 63)) AS bits
      FROM (
        SELECT {bloom_pos_sql('t.sh', 'j.j')} AS pos
        FROM test_sh t CROSS JOIN {BLOOM_JS_SQL} j
      )
      GROUP BY pos // 63
    ), probes AS (
      SELECT t.doc_id, t.sh, {bloom_pos_sql('t.sh', 'j.j')} AS pos
      FROM (SELECT doc_id, sh FROM sh WHERE bucket < 80) t
      CROSS JOIN {BLOOM_JS_SQL} j
    ), tested AS (
      SELECT p.doc_id, p.sh,
             MIN(CASE WHEN b.bits IS NOT NULL
                       AND (b.bits & (1::BIGINT << (p.pos % 63)))
                           = (1::BIGINT << (p.pos % 63))
                  THEN 1 ELSE 0 END) AS bloom_pos
      FROM probes p LEFT JOIN bloom b ON b.word = p.pos // 63
      GROUP BY p.doc_id, p.sh
    ), flagged AS (
      SELECT doc_id, MAX(bloom_pos) AS f FROM tested GROUP BY doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(COALESCE(f.f, 0)) AS BIGINT) AS docs_flagged
    FROM (SELECT doc_id, source FROM documents
          WHERE {_BLOOM_BUCKET_SQL} < 80) d
    LEFT JOIN flagged f ON f.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def stream_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time benchmark decontamination: the test split's
    Bloom bitmap (operators/llm.py ``bloom_bitmap_words`` — the SAME
    build as the batch sweep, so stream and batch can never disagree)
    is baked into the streaming plan as a dense int64 array literal,
    and every incoming train document is flagged by a pure row
    expression — EXISTS over its shingles of "all 3 hash bits set".
    No stream-static join, no per-shingle state: the only stateful
    operator is the per-source complete-mode count, so the filter
    runs at stateless-map speed on an unbounded stream. The oracle is
    the batch answer over the same corpus.
    """
    from mallard_spark.functions.text import shingles_of, tokens
    from mallard_spark.operators.llm import bloom_bitmap_words

    words = bloom_bitmap_words(spark, sf_dir)
    flag = bloom_flag_expr(words)

    path = os.path.join(sf_dir, "documents.parquet")
    batch = spark.read.parquet(path)
    if os.path.isdir(path):
        stream = spark.readStream.schema(batch.schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
    from mallard_spark.functions.hashing import md5_long

    train = stream.filter(
        md5_long(F.col("doc_id").cast("string")) % 100 < 80
    ).select(
        "source", tokens().alias("toks")
    ).select(
        "source", F.array_distinct(shingles_of("toks", 3)).alias("shs")
    )
    flags = train.select("source", F.expr(flag).cast("int").alias("flagged"))
    agg = flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("flagged").cast("long").alias("docs_flagged"),
    )
    name = "mallard_stream_decontaminate_bloom"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select("source", "docs", "docs_flagged")


def _hh_oracle() -> str:
    from mallard_spark.plans.events import heavy_hitters_oracle_sql

    return heavy_hitters_oracle_sql()


@query("stream_heavy_hitters", oracle=_hh_oracle())
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time hot-key monitoring: the per-(bucket, key)
    counts are maintained INCREMENTALLY by a complete-mode streaming
    aggregation (state = the key table, pruned nothing — the monitor
    IS the count store), and the bounded heavy-hitter merge
    (`plans.events.hh_merge` — the SAME definition the batch operator
    uses, so the two can never disagree) runs as a batch query over
    the sink's state whenever someone asks for the current top-k.
    Oracle = the batch answer over the same corpus.
    """
    from mallard_spark.functions.hashing import md5_long
    from mallard_spark.plans.events import HH_BUCKETS, hh_merge

    stream = _events_stream(spark, sf_dir)
    counts = (
        stream.select(
            (md5_long(F.col("user_id").cast("string")) % HH_BUCKETS).alias("b"),
            "user_id",
        )
        .groupBy("b", "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = "mallard_stream_heavy_hitters"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from mallard_spark.functions.exec import materialize

    # snapshot the sink state through the parquet barrier: the merge
    # self-joins the counts table, and a clean file-scan lineage both
    # sidesteps MemorySink's self-join attribute clash and is what a
    # production monitor would do (persist the state snapshot, query
    # the snapshot)
    return hh_merge(materialize(spark.table(name), "hh_stream_counts"))


def _qh_oracle() -> str:
    import mallard_spark.operators.sketches  # noqa: F401 — registers the batch op
    from mallard_spark.registry import REGISTRY

    return REGISTRY["quantile_histogram_merge"].oracle


@query("stream_quantile_histogram", oracle=_qh_oracle())
def stream_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time latency/value-distribution monitoring: the
    (day, bucket) partial histograms are maintained INCREMENTALLY by
    a complete-mode streaming aggregation (state = the bucket table,
    bounded by value-range/width × days, corpus-size-independent),
    and the quantile merge + exact-arm refinement
    (`operators.sketches.qh_report` — the SAME definition the batch
    operator uses, so the two can never disagree) runs over the state
    snapshot on demand. Oracle = the batch answer over the same
    corpus.
    """
    from mallard_spark.functions.exec import materialize
    from mallard_spark.operators.sketches import qh_cents, qh_partials, qh_report
    from mallard_spark.sources.readers import load_table

    stream = _events_stream(spark, sf_dir)
    partials = qh_partials(qh_cents(stream))
    name = "mallard_stream_quantile_histogram"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            partials.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # the exact-refinement arm reads the same corpus in batch (a
    # production monitor refines against the lake it just ingested)
    v = qh_cents(load_table(spark, sf_dir, "events"))
    return qh_report(v, materialize(spark.table(name), "qh_stream_partials"))


from mallard_spark.operators.llm import _MIX_TOKEN_BUDGET_ORACLE


@query("stream_token_budget", oracle=_MIX_TOKEN_BUDGET_ORACLE)
def stream_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming arm of ``mix_token_budget`` (round 6): per-source
    token mass aggregated in COMPLETE mode over the streaming
    documents source, then the SAME largest-remainder allocation
    (``operators/llm._allocate_budget`` — one definition site, the
    two cannot drift) runs on the source-bounded sink table.
    Micro-batched ingest must produce exactly the batch allocation —
    the oracle IS the batch operator's SQL, so the driver's value
    gate checks stream-equals-batch directly.

    State: the complete-mode aggregate holds one row per source — the
    monitor's state is bounded by the source count at any ingest
    volume, the streaming analogue of the batch plan's single
    per-source exchange.
    """
    from mallard_spark.functions.text import tokens
    from mallard_spark.operators.llm import _allocate_budget

    path = os.path.join(sf_dir, "documents.parquet")
    batch = spark.read.parquet(path)
    if os.path.isdir(path):
        stream = spark.readStream.schema(batch.schema).parquet(path)
    else:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
    agg = stream.groupBy("source").agg(
        F.sum(F.size(tokens())).cast("long").alias("avail_tokens")
    )
    name = "mallard_stream_token_budget"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    with _state_shuffle(spark):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return _allocate_budget(spark.table(name))

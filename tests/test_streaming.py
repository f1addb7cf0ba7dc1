"""Structured Streaming semantics: batch equivalence and watermark
late-data handling (SURVEY §2 streaming block)."""

import pandas as pd
import pyspark.sql.functions as F


def test_stream_equals_batch(spark, sf_dir):
    from mallard_spark.plans.events import ev_hourly_agg
    from mallard_spark.streaming.windows import stream_windowed_agg

    batch = {
        (r.hour, r.event_type): (r.n_events, r.total_value)
        for r in ev_hourly_agg(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in stream_windowed_agg(spark, sf_dir).collect()
    }
    assert stream == batch


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a watermark: a window only emits
    once the watermark passes its end, so with one batch whose max ts
    is inside the last window, that window is withheld."""
    ev = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:05",
                    "2024-01-01 00:20",
                    "2024-01-01 01:10",
                    "2024-01-01 01:40",
                    "2024-01-01 02:05",
                    "2024-01-01 02:10",
                ]
            ),
            "user_id": [1] * 6,
            "event_type": ["click"] * 6,
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    spark.createDataFrame(ev).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    from mallard_spark.streaming.windows import windowed_stream

    agg = windowed_stream(spark, str(tmp_path), watermark="10 minutes")
    name = "wm_test_sink"
    q = (
        agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
        # append mode emits a closed window on the batch AFTER the
        # watermark passes it — feed a second micro-batch
        ev2 = ev.iloc[:1].assign(
            event_id=[99], ts=pd.to_datetime(["2024-01-01 02:30"])
        )
        spark.createDataFrame(ev2).write.mode("append").parquet(
            str(tmp_path / "events.parquet")
        )
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = {
        r.win.start.strftime("%H:%M")
        for r in spark.table(name).select("win").collect()
    }
    # watermark = 02:10 - 10min = 02:00 → hours 00 and 01 are closed
    # and emitted; the 02:00 window (end 03:00 > watermark) is withheld
    assert emitted == {"00:00", "01:00"}


def test_foreach_batch_exactly_once_restart(spark, tmp_path):
    """Restarting a foreachBatch stream on the same checkpoint must not
    duplicate output: already-committed batches are not replayed, and a
    replayed batch would overwrite (not append) its own directory."""
    import os

    src_dir = tmp_path / "src"
    data_dir = str(tmp_path / "data")
    ckpt_dir = str(tmp_path / "ckpt")
    spark.range(100).selectExpr("id", "id * 2 AS v").write.mode("append").parquet(
        str(src_dir)
    )

    schema = spark.read.parquet(str(src_dir)).schema

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(
            os.path.join(data_dir, f"batch={batch_id}")
        )

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(str(src_dir))
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(f"{data_dir}/batch=*").count() == 100
    # "crash + restart": same checkpoint, same source → nothing replayed
    run_once()
    assert spark.read.parquet(f"{data_dir}/batch=*").count() == 100
    # new data after restart is picked up exactly once
    spark.range(100, 150).selectExpr("id", "id * 2 AS v").write.mode("append").parquet(
        str(src_dir)
    )
    run_once()
    out = spark.read.parquet(f"{data_dir}/batch=*")
    assert out.count() == 150
    assert out.select("id").distinct().count() == 150


def test_stateful_totals_survive_restart(spark, tmp_path):
    """Custom stateful operator fault tolerance: applyInPandasWithState
    totals are checkpointed in the state store, so a stop + restart on
    the same checkpoint RESUMES the per-key state (cumulative totals)
    instead of recounting from zero — the property that makes custom
    stateful streaming deployable."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    data_dir = str(tmp_path / "out")
    spark.createDataFrame(
        [(u, 1.0) for u in range(5) for _ in range(10)],
        "user_id long, value double",
    ).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def update_totals(key, pdfs, state):
        import pandas as pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "cents": [cents]})

    def write_batch(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(data_dir, f"batch={bid}"))

    def run():
        q = (
            spark.readStream.schema(schema)
            .parquet(src_dir)
            .groupBy("user_id")
            .applyInPandasWithState(
                update_totals,
                "user_id long, n long, cents long",
                "n long, cents long",
                "update",
                GroupStateTimeout.NoTimeout,
            )
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def totals(dirs):
        df = spark.read.parquet(*[os.path.join(data_dir, d) for d in dirs])
        rows = df.groupBy("user_id").agg(
            F.max("n").alias("n"), F.max("cents").alias("cents")
        ).collect()
        return {r.user_id: (r.n, r.cents) for r in rows}

    run()
    run1_dirs = set(os.listdir(data_dir))
    r1 = totals(run1_dirs)
    assert len(r1) == 5 and all(v == (10, 1000) for v in r1.values())

    # more data arrives while "down"; restart on the same checkpoint
    spark.createDataFrame(
        [(u, 2.0) for u in range(5) for _ in range(5)],
        "user_id long, value double",
    ).write.mode("append").parquet(src_dir)
    run()
    run2_dirs = set(os.listdir(data_dir)) - run1_dirs
    assert run2_dirs  # the restart processed the new data as new batches
    r2 = totals(run2_dirs)
    # cumulative (15, 2000), not a from-scratch (5, 1000): state resumed
    assert len(r2) == 5 and all(v == (15, 2000) for v in r2.values())


def test_session_window_state_survives_restart(spark, tmp_path):
    """Session-window streaming state is checkpointed: a session whose
    events arrived BEFORE a crash must still be emitted correctly
    after a restart, once later data advances the watermark past its
    close — proving open-session state (not just offsets) survives."""
    import os

    import pandas as pd

    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    os.makedirs(src_dir)

    def write_events(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            os.path.join(src_dir, name)
        )

    # one user, one session split across two pre-crash files
    write_events("b1", [(1, "2024-01-01 00:00:00", 7, 1.0)])
    write_events("b2", [(2, "2024-01-01 00:10:00", 7, 2.0)])

    schema = spark.read.parquet(os.path.join(src_dir, "b1")).schema

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src_dir, "*"))
            .withWatermark("ts", "1 minute")
        )
        sessions = stream.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        flat = sessions.select(
            F.col("sw.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
        q = (
            flat.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def read_out():
        return spark.read.schema(
            "session_start timestamp, user_id long, n_events long, session_value double"
        ).parquet(out_dir)

    run_once()  # both events consumed into OPEN session state, nothing emitted
    assert read_out().count() == 0

    # crash happened; a later event (different user) arrives and the
    # restarted query's watermark closes the pre-crash session
    write_events("b3", [(3, "2024-01-02 00:00:00", 9, 5.0)])
    run_once()

    out = read_out().filter(F.col("user_id") == 7).collect()
    assert len(out) == 1
    assert out[0].n_events == 2  # both pre-crash events in ONE session
    assert out[0].session_value == 3.0


def test_bloom_decontaminate_state_survives_restart(spark, tmp_path, sf_dir):
    """The Bloom ingest filter itself is stateless (bitmap baked into
    the plan); the only state is the per-source complete-mode count.
    Prove that state is checkpointed: stop mid-corpus, append the
    rest, restart on the same checkpoint — the resumed counts must
    equal the batch answer over the WHOLE corpus, with the second run
    having read only the appended files."""
    import os

    from mallard_spark.functions.hashing import md5_long
    from mallard_spark.functions.text import shingles_of, tokens
    from mallard_spark.operators.llm import bloom_bitmap_words
    from mallard_spark.streaming.windows import bloom_flag_expr

    words = bloom_bitmap_words(spark, sf_dir)
    flag = bloom_flag_expr(words)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    name = "bloom_restart_probe"
    docs.filter("doc_id % 2 = 0").write.mode("append").parquet(src)

    def pipeline(df):
        train = (
            df.filter(md5_long(F.col("doc_id").cast("string")) % 100 < 80)
            .select("source", tokens().alias("toks"))
            .select("source", F.array_distinct(shingles_of("toks", 3)).alias("shs"))
            .select("source", F.expr(flag).cast("int").alias("flagged"))
        )
        return train.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("flagged").cast("long").alias("docs_flagged"),
        )

    def run_once():
        stream = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            pipeline(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    run_once()
    mid = {tuple(r) for r in spark.table(name).collect()}
    assert mid  # first half produced counts
    # "crash", then the rest of the corpus arrives
    docs.filter("doc_id % 2 = 1").write.mode("append").parquet(src)
    q2 = run_once()
    # the restart processed only the appended files, not a rescan
    read2 = sum(p.numInputRows for p in q2.recentProgress)
    assert read2 == docs.filter("doc_id % 2 = 1").count()
    got = {tuple(r) for r in spark.table(name).collect()}
    want = {tuple(r) for r in pipeline(docs).collect()}
    assert got == want and got != mid


def test_kafka_source_swap_error_path(spark):
    """kafka_json_source is the documented one-line source swap; this
    container has no Kafka connector jar, so the helper must fail
    with the actionable --packages message (and never be needed by
    the file-stream variants)."""
    import pytest as _pytest

    from mallard_spark.streaming.sources import kafka_json_source

    docs_schema = "doc_id BIGINT, text STRING"
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(docs_schema)
    with _pytest.raises(RuntimeError, match="--packages"):
        kafka_json_source(spark, "broker:9092", "docs", schema)


def test_quantile_histogram_state_survives_restart(spark, tmp_path, sf_dir):
    """The streaming quantile monitor's state is the complete-mode
    (day, bucket) partial-histogram table. Stop mid-stream, append
    the rest, restart on the same checkpoint: the resumed partials
    must merge to the batch answer over the WHOLE corpus, with the
    second run reading only the appended files."""
    import os

    from mallard_spark.functions.exec import materialize
    from mallard_spark.operators.sketches import qh_cents, qh_partials, qh_report

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt_qh")
    name = "qh_restart_probe"
    ev.filter("event_id % 2 = 0").write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            qh_partials(qh_cents(stream))
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    run_once()
    mid = {tuple(r) for r in spark.table(name).collect()}
    assert mid
    ev.filter("event_id % 2 = 1").write.mode("append").parquet(src)
    q2 = run_once()
    read2 = sum(p.numInputRows for p in q2.recentProgress)
    assert read2 == ev.filter("event_id % 2 = 1").count()
    # the resumed partials merge to the WHOLE-corpus batch answer
    got = qh_report(
        qh_cents(ev), materialize(spark.table(name), "qh_restart_partials")
    ).collect()
    want = qh_report(qh_cents(ev), qh_partials(qh_cents(ev))).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert {tuple(r) for r in spark.table(name).collect()} != mid

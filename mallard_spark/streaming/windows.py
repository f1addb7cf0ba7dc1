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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.registry import query

DV = "decimal(12,2)"


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events parquet (ns ts read as long)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # the file-stream source needs a directory; glob down to the one file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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

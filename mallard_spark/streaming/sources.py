"""Streaming source swap: file source (tests) ↔ Kafka (production).

Every `stream_*` operator in this package reads a file-stream source
because that is what the test container can replay deterministically;
at 100 TB a training-ingest pipeline arrives over a broker. The swap
is ONE line because Structured Streaming sources are interchangeable
DataFrames: everything downstream of the source (watermarks, windows,
stateful operators, sinks, the Bloom/Gopher ingest filters) is
source-agnostic and runs unchanged.

    # file variant (what the tests run)
    stream = spark.readStream.schema(schema).parquet(path)
    # broker variant (production)
    stream = kafka_json_source(spark, "broker:9092", "events", schema)

``kafka_json_source`` needs the spark-sql-kafka connector jar
(``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
it raises a clear error when the connector is absent (this container
does not ship it — the helper and its error path are what's tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def kafka_json_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "latest",
) -> DataFrame:
    """An unbounded DataFrame of JSON records from a Kafka topic,
    parsed to ``schema`` — the drop-in replacement for the file
    sources used by the `stream_*` operators.

    The Kafka relation's fixed columns (key/value/topic/partition/
    offset/timestamp) are projected down to the parsed value columns
    so the downstream operator sees the SAME schema as the file
    variant. Partition-parallel by Kafka partition; offsets are
    tracked in the query checkpoint exactly like file-source progress.
    """
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # connector jar not on the classpath
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector "
            "(start Spark with --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>). "
            "The file-stream variants of every stream_* operator run "
            "without it."
        ) from e
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")

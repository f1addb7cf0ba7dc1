"""LLM training-data preparation operators: chunking, sequence
packing, and train/test decontamination.

These are the steps between "clean corpus" (operators.text /
operators.dedup) and "training batches": split documents into
overlapping context windows, pack variable-length documents into
fixed-capacity bins, and flag test-split documents whose content
leaks into the train split. All three are pure column-expression /
join plans (no Python in the hot path) with exact value oracles.

Reference parity: Mallard's query surface is arbitrary DuckDB SQL
(/root/reference/demo.py:103); these express the same computations
as distributed plans plus the matching DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mallard_spark.functions.hashing import md5_long, md5_long_sql
from mallard_spark.functions.text import (
    TOKENS_SQL,
    shingles_of,
    tokens,
    word_shingles_sql,
)
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

CHUNK = 64  # tokens per chunk
STRIDE = 48  # chunk start step (CHUNK - STRIDE = 16 tokens of overlap)


@query(
    "text_chunking",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n_tok FROM t WHERE len(toks) > 0
    ), c AS (
      SELECT doc_id, u.start,
             list_slice(toks, u.start + 1, least(u.start + {CHUNK}, n_tok)) AS chunk
      FROM s, UNNEST(range(0, n_tok, {STRIDE})) u(start)
    )
    SELECT doc_id,
           CAST(start // {STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(chunk) AS INT) AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: {CHUNK}-token chunks every {STRIDE}
    tokens (16-token overlap) — the standard context-window splitter.

    One explode per chunk start (sequence + slice, all JVM
    expressions); chunk identity is content-addressed (md5 of the
    joined tokens) so the oracle compares values, not offsets alone.
    Scales as one narrow map over the corpus — no shuffle at all.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    s = (
        docs.select("doc_id", tokens().alias("toks"))
        .withColumn("n_tok", F.size("toks"))
        .filter(F.col("n_tok") > 0)
    )
    c = s.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(f"sequence(0, cast(n_tok as int) - 1, {STRIDE})")
        ).alias("start"),
    ).withColumn("chunk", F.expr(f"slice(toks, start + 1, {CHUNK})"))
    return c.select(
        "doc_id",
        (F.col("start") / STRIDE).cast("long").alias("chunk_id"),
        F.size("chunk").alias("n_chunk_tokens"),
        F.md5(F.array_join("chunk", " ")).alias("chunk_md5"),
    )


PACK_CAP = 2048  # tokens per packed bin


@query(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, len({TOKENS_SQL}) AS n_tok FROM documents
    ), cum AS (
      SELECT lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM t
    )
    SELECT lang,
           CAST((running - n_tok) // {PACK_CAP} AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_in_bin
    FROM cum
    GROUP BY lang, 2
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-capacity sequence packing: documents are laid end-to-end
    in doc_id order within each lang shard and cut into
    {PACK_CAP}-token bins by cumulative offset (bin = floor(offset /
    cap)) — the distributed approximation of greedy packing (a doc
    may straddle its bin boundary; exact first-fit is inherently
    sequential). Partitioning by lang is the scale story: each shard
    packs independently, so the window sort never goes global.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", F.size(tokens()).alias("n_tok"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = t.withColumn("running", F.sum("n_tok").over(w))
    return (
        cum.withColumn(
            "bin_id",
            F.floor((F.col("running") - F.col("n_tok")) / PACK_CAP).cast("long"),
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("tokens_in_bin"),
        )
    )


_BUCKET_SQL = f"{md5_long_sql('CAST(doc_id AS VARCHAR)')} % 100"
CONTAM_MIN = 0.5


@query(
    "decontaminate_overlap",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_BUCKET_SQL} AS bucket, s.sh
      FROM documents, UNNEST(list_distinct({word_shingles_sql(3)})) s(sh)
    ), train_sh AS (
      SELECT DISTINCT sh FROM sh WHERE bucket < 80
    ), test_sh AS (
      SELECT doc_id, sh FROM sh WHERE bucket >= 90
    ), hits AS (
      SELECT t.doc_id,
             COUNT(*) AS n_shingles,
             SUM(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
      FROM test_sh t LEFT JOIN train_sh tr ON t.sh = tr.sh
      GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_overlap AS BIGINT) AS n_overlap,
           round(n_overlap / n_shingles, 6) AS contamination,
           n_overlap / n_shingles >= {CONTAM_MIN} AS contaminated
    FROM hits
    """,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: for every test-split document
    (same content-addressed 80/10/10 split as split_train_test), the
    fraction of its 3-shingles that also occur anywhere in the train
    split.

    The join is test-shingles ⋈ DISTINCT train shingles — output is
    bounded by the test side (the small side by construction), train
    shingles dedup to a set first, and everything keys on the shingle
    hash: linear in corpus size, no block blowup. The standard
    pre-training decontamination sweep (n-gram overlap), Spark-first.
    """
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    sh = (
        docs.withColumn("bucket", bucket)
        .select("doc_id", "bucket", tokens().alias("toks"))
        .select(
            "doc_id",
            "bucket",
            F.explode(F.array_distinct(shingles_of("toks", 3))).alias("sh"),
        )
    )
    train_sh = sh.filter(F.col("bucket") < 80).select("sh").distinct()
    test_sh = sh.filter(F.col("bucket") >= 90).select("doc_id", "sh")
    hit = (
        test_sh.join(
            train_sh.withColumnRenamed("sh", "tr_sh"),
            test_sh.sh == F.col("tr_sh"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("tr_sh").isNotNull(), 1).otherwise(0)).alias("n_overlap"),
        )
    )
    contam = F.col("n_overlap") / F.col("n_shingles")
    return hit.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_overlap").cast("long").alias("n_overlap"),
        F.round(contam, 6).alias("contamination"),
        (contam >= CONTAM_MIN).alias("contaminated"),
    )

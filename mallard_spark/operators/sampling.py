"""Deterministic sampling & dataset splitting for training pipelines.

A 100 TB corpus needs reproducible splits that (a) never depend on
row order or partitioning, (b) are stable across reruns and engines,
and (c) cost one scan with no shuffle on the split itself. The
standard trick is content-addressed bucketing: hash a stable key
(doc_id) to a bucket and route on bucket ranges. ``rand(seed)`` is
NOT reproducible across engines or partitionings — md5 bucketing is.

Reference parity: Mallard delegates sampling to DuckDB SQL
(`/root/reference/demo.py:103` do_get runs arbitrary SQL, e.g.
``USING SAMPLE``); hash-bucket routing is the distributed-safe,
engine-portable equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.functions.hashing import md5_long, md5_long_sql
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

_BUCKET_SQL = f"{md5_long_sql('CAST(doc_id AS VARCHAR)')} % 100"


@query(
    "split_train_test",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                WHEN {_BUCKET_SQL} < 90 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test split, content-addressed (md5 of
    doc_id → bucket 0-99) — reproducible regardless of partitioning,
    row order, or engine; one scan, one tiny aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    return (
        docs.withColumn(
            "split",
            F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH base AS (
        SELECT lang, n_chars,
               CASE WHEN {md5_long_sql("CAST(doc_id AS VARCHAR)")} % 10 < 2
                    THEN 1 ELSE 0 END AS keep
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(keep) AS BIGINT) AS n_sampled,
           CAST(SUM(keep) AS DOUBLE) / COUNT(*) AS sampled_frac,
           CAST(SUM(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS DOUBLE)
               / NULLIF(SUM(keep), 0) AS avg_chars_sampled
    FROM base
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified ~20% sample per language stratum via hash buckets.

    Unlike ``df.sampleBy`` (seeded rand — partitioning-dependent),
    hash routing gives the exact same sample membership on any
    cluster layout, which is what makes ablation reruns comparable.
    Integer sums + one final double division keep the fractions
    bit-deterministic.
    """
    docs = load_table(spark, sf_dir, "documents")
    keep = (md5_long(F.col("doc_id").cast("string")) % 10 < 2).cast("int")
    return (
        docs.withColumn("keep", keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("keep").alias("n_sampled"),
            (F.sum("keep").cast("double") / F.count("*")).alias("sampled_frac"),
            (
                F.sum(F.when(F.col("keep") == 1, F.col("n_chars")).otherwise(0)).cast("double")
                / F.nullif(F.sum("keep"), F.lit(0))
            ).alias("avg_chars_sampled"),
        )
        .orderBy("lang")
    )


@query(
    "sample_topk_per_source",
    oracle=f"""
    SELECT source, doc_id, lang
    FROM (
        SELECT source, doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY {md5_long_sql("CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn <= 3
    ORDER BY source, doc_id
    """,
)
def sample_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: hash-ordered row_number ≤ k.

    The portable stand-in for reservoir sampling — same guarantees
    (k uniform-ish rows per group, single pass) but reproducible.
    At scale the window shuffles once on `source`; with many small
    groups AQE coalesces the post-shuffle partitions.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        md5_long(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", "lang")
        .orderBy("source", "doc_id")
    )


@query(
    "sample_weighted",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE {md5_long_sql("'w' || CAST(doc_id AS VARCHAR)")} % 10000 < n_chars * 10
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling: keep each doc with probability
    proportional to its length (p = n_chars/1000), the standard
    length-weighted mixing step when composing training corpora.

    Deterministic hash-threshold acceptance (md5 of a salted doc_id
    vs an integer threshold) instead of rand(): reproducible across
    engines, reruns, partitionings — and pure integer math, so the
    accept decision can never straddle a float rounding edge. One
    scan, no shuffle before the tiny aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    accept = (
        md5_long(F.concat(F.lit("w"), F.col("doc_id").cast("string"))) % 10000
        < F.col("n_chars") * 10
    )
    return (
        docs.filter(accept)
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


@query(
    "sample_reservoir",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars,
           {md5_long_sql("'rsv' || CAST(doc_id AS VARCHAR)")} AS rnk
    FROM documents
    ORDER BY rnk, doc_id
    LIMIT 100
    """,
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global uniform k-sample without replacement (k=100), the
    deterministic equivalent of distributed reservoir sampling.

    Classic reservoir sampling (Vitter's Algorithm R) keeps the k
    rows with the smallest random keys; assigning each row the key
    md5('rsv'||doc_id) and taking the global k smallest is the SAME
    distribution over content-addressed keys but reproducible across
    engines, reruns, and partitionings. Spark compiles ORDER BY +
    LIMIT k into TakeOrderedAndProject: each task keeps a k-row heap
    and only k·#partitions rows ever reach the driver — no global
    sort, no shuffle, exactly the reservoir cost model at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    rnk = md5_long(F.concat(F.lit("rsv"), F.col("doc_id").cast("string")))
    return (
        docs.select("doc_id", "lang", "source", "n_chars", rnk.alias("rnk"))
        .orderBy("rnk", "doc_id")
        .limit(100)
    )


K_FOLDS = 5


@query(
    "split_kfold",
    oracle=f"""
    WITH folds AS (
      SELECT {md5_long_sql("'kf:' || CAST(doc_id AS VARCHAR)")} % {K_FOLDS} AS fold,
             lang, n_chars
      FROM documents
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM folds GROUP BY fold ORDER BY fold
    """,
)
def split_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {K_FOLDS}-fold cross-validation assignment —
    content-addressed like split_train_test (a salted md5 of doc_id,
    so the folds are INDEPENDENT of the 80/10/10 split's buckets),
    reported as per-fold balance (docs, char mass, language spread:
    the sanity check before running a CV sweep). Fold membership is
    reproducible across engines, partitionings, and reruns; one scan,
    one {K_FOLDS}-row aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    fold = md5_long(F.concat(F.lit("kf:"), F.col("doc_id").cast("string"))) % K_FOLDS
    return (
        docs.withColumn("fold", fold)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
        )
        .orderBy("fold")
    )

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

from mallard_spark.functions.exec import materialize, spread
from mallard_spark.functions.hashing import md5_long, md5_long_sql
from mallard_spark.functions.text import (
    TOKENS_EXPR,
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
    docs = spread(load_table(spark, sf_dir, "documents"))
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
    docs = spread(load_table(spark, sf_dir, "documents"))
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


N_SHARDS = 8


@query(
    "shard_assignment",
    oracle=f"""
    WITH k AS (
      SELECT doc_id,
             {md5_long_sql("CAST(doc_id AS VARCHAR) || ':shard'")} AS key
      FROM documents
    )
    SELECT doc_id,
           CAST(key % {N_SHARDS} AS BIGINT) AS shard_id,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY key % {N_SHARDS} ORDER BY key, doc_id
           ) AS BIGINT) AS pos
    FROM k
    """,
)
def shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle + sharding: every doc
    gets a content-addressed shard (md5 % {N_SHARDS}) and a position
    within its shard (rank of the same hash).

    This is how a 100 TB corpus is shuffled for training without a
    global sort: hash-partition into shards (one shuffle), sort only
    WITHIN each shard — per-shard sorts run independently and the
    order is engine- and partitioning-invariant, unlike
    ORDER BY rand(). Writers then emit one output file per shard in
    pos order.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":shard")))
    k = docs.select("doc_id", key.alias("key"))
    w = Window.partitionBy(F.col("key") % N_SHARDS).orderBy("key", "doc_id")
    return k.select(
        "doc_id",
        (F.col("key") % N_SHARDS).cast("long").alias("shard_id"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


MIX_PPM = 1_000_000  # parts-per-million resolution for sampling rates


@query(
    "mix_sources",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({TOKENS_SQL}) AS n_tok,
             {md5_long_sql("CAST(doc_id AS VARCHAR) || ':mix'")} % {MIX_PPM} AS h
      FROM documents
    ), totals AS (
      SELECT source, SUM(n_tok) AS tot FROM t GROUP BY source
    ), m AS (
      SELECT MIN(tot) AS min_tot FROM totals
    ), kept AS (
      SELECT t.source, t.n_tok, totals.tot, m.min_tot,
             t.h * totals.tot < m.min_tot * {MIX_PPM} AS keep
      FROM t JOIN totals USING (source) CROSS JOIN m
    )
    SELECT source,
           -- tot=0 (a source whose docs all tokenize empty): DuckDB's
           -- // 0 yields NULL; pin 0 to match the engine's explicit
           -- empty-source guard (review finding r4)
           CAST(MAX(CASE WHEN tot = 0 THEN 0
                         ELSE min_tot * {MIX_PPM} // tot END) AS BIGINT)
               AS rate_ppm,
           CAST(COUNT(*) AS BIGINT) AS n_docs_total,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
    FROM kept
    GROUP BY source
    """,
)
def mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: downsample every source to the token
    budget of the smallest source (rate_s = min_tokens / tokens_s),
    selecting docs content-addressed so the mix is reproducible.

    The keep test is pure integer arithmetic (h <= (min·1e6 - 1) div
    tot, the exact integer form of h·tot < min·1e6 — no float rate
    anywhere), so Spark and DuckDB agree bit-for-bit. The threshold is
    computed once per source in DECIMAL(38,0) so nothing in the
    per-row path can overflow int64 even at 1e13-token sources.
    Plan shape at 100 TB: ONE pass over the text (tokenizer output,
    ~30 B/row, is pinned so the totals branch and the keep pass don't
    each re-scan and re-tokenize the corpus), per-source totals
    broadcast back, then one narrow filtered pass — the corpus is
    never shuffled.

    Round 12 (VERDICT r11 item #6): the pin is ``localCheckpoint``
    (executor-local blocks) instead of a parquet barrier — the write-
    commit-reread round trip was a third of the query (paired sf10
    re-measure, one calm session, best-of-3: 1.67 → 1.15 s; DuckDB
    0.72 s → ratio 1.6, under the 2x bar). Trade-off, documented:
    localCheckpoint blocks are NOT fault-tolerant (an executor loss
    kills the lineage-free plan), acceptable for a single-node
    serving engine; a 1000-executor run of this operator should set
    a reliable checkpoint dir or revert to the parquet barrier
    (functions.exec.materialize) — same plan either way.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(tokens()).alias("n_tok"),
        (
            md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":mix")))
            % MIX_PPM
        ).alias("h"),
    ).localCheckpoint(eager=False)
    totals = t.groupBy("source").agg(F.sum("n_tok").alias("tot"))
    m = totals.agg(F.min("tot").alias("min_tot"))
    # Precompute the per-source keep threshold on the TINY totals side
    # in DECIMAL(38,0): at 100 TB (tot ~1e13 tokens) min_tot*PPM
    # exceeds int64 and h*tot would wrap silently (ADVICE r3). The
    # per-row test is then a plain int64 compare. Exactness:
    # h*tot < M  <=>  h <= (M-1) div tot  for tot > 0.
    D38 = "cast(min_tot as decimal(38,0)) * {ppm} - 1".format(ppm=MIX_PPM)
    thr = (
        totals.crossJoin(F.broadcast(m))
        .withColumn(
            "h_max",
            # min_tot=0 (a source whose docs all tokenize empty) must
            # keep NOTHING: (0*PPM - 1) div tot is -1/tot, and decimal
            # `div` truncates toward zero → 0, which would admit h=0
            # docs while the oracle's h*tot < 0 admits none. Pin -1.
            F.expr(
                f"CASE WHEN min_tot = 0 OR tot = 0 THEN -1L "
                f"ELSE cast(({D38}) div cast(tot as decimal(38,0)) as bigint) END"
            ),
        )
        .withColumn(
            "rate_ppm",
            # tot=0 guard (and ANSI div-by-zero): an empty source has
            # no meaningful rate — report 0, keep nothing
            F.expr(
                f"CASE WHEN tot = 0 THEN 0L "
                f"ELSE cast((cast(min_tot as decimal(38,0)) * {MIX_PPM}) "
                f"div cast(tot as decimal(38,0)) as bigint) END"
            ),
        )
    )
    kept = t.join(F.broadcast(thr), "source").withColumn(
        "keep", F.col("h") <= F.col("h_max")
    )
    return kept.groupBy("source").agg(
        F.max("rate_ppm").cast("long").alias("rate_ppm"),
        F.count("*").cast("long").alias("n_docs_total"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_docs_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tok")).otherwise(0))
        .cast("long")
        .alias("tokens_kept"),
    )


BP_NGRAM = 2
BP_MIN_FRAC = 0.05  # a bigram in ≥5% of docs is boilerplate


@query(
    "boilerplate_fraction",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, s.sh
      FROM documents,
           UNNEST(list_distinct({word_shingles_sql(BP_NGRAM)})) s(sh)
      WHERE len({TOKENS_SQL}) >= {BP_NGRAM}
    ), n AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM sh
    ), df AS (
      SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh
    ), boiler AS (
      SELECT sh FROM df CROSS JOIN n WHERE df * 100 >= n_docs * {int(BP_MIN_FRAC * 100)}
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           round(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS boiler_frac
    FROM sh s LEFT JOIN boiler b ON s.sh = b.sh
    GROUP BY s.doc_id
    """,
)
def boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: bigrams occurring in ≥{BP_MIN_FRAC:.0%}
    of documents are "boilerplate"; each doc reports what fraction of
    its distinct bigrams are boilerplate (headers/footers/nav chrome
    in a web corpus).

    Two-pass plan: the exploded shingle stream is staged to parquet
    once (one tokenizer pass over the text; both consumers read the
    stage with real stats — see the materialize() rationale in
    functions/exec.py), then document-frequency aggregate (one
    shuffle over shingles), threshold to a SMALL boilerplate set
    (high-df n-grams are rare by Zipf), broadcast it back over the
    shingle stream. The threshold test is integer (df·100 ≥ n_docs·5)
    — no float.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = materialize(
        docs.select("doc_id", tokens().alias("toks"))
        .filter(F.size("toks") >= BP_NGRAM)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles_of("toks", BP_NGRAM))).alias("sh"),
        ),
        "boilerplate_shingles",
    )
    n_docs = sh.select("doc_id").distinct().count()
    boiler = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") * 100 >= n_docs * int(BP_MIN_FRAC * 100))
        .select(F.col("sh").alias("b_sh"))
    )
    hit = (
        sh.join(F.broadcast(boiler), sh.sh == F.col("b_sh"), "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("b_sh").isNotNull(), 1).otherwise(0)).alias("n_boiler"),
        )
    )
    return hit.select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_boiler").cast("long").alias("n_boiler"),
        F.round(F.col("n_boiler") / F.col("n_shingles"), 6).alias("boiler_frac"),
    )


@query(
    "vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT u.t FROM documents, UNNEST({TOKENS_SQL}) u(t)
    ), cnt AS (
      SELECT t AS token, COUNT(*) AS n FROM tok GROUP BY t
    ), ranked AS (
      SELECT token, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
             SUM(n) OVER (ORDER BY n DESC, token
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(n) OVER () AS total
      FROM cnt
    )
    SELECT rank, token, CAST(n AS BIGINT) AS n_occurrences,
           round(cum / total, 6) AS cum_coverage
    FROM ranked
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: tokens ranked by corpus frequency
    with the cumulative fraction of all token occurrences covered —
    the "how big must the vocab be" curve for tokenizer design.

    The corpus-sized work is one explode + groupBy (map-side partial
    combine does most of it); the global window runs over the
    VOCABULARY (≪ corpus, Zipf), so the single-partition sort it
    implies is safe even at 100 TB of text.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select(F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.orderBy(F.desc("n"), "token")
    cum_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cnt.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        F.col("n").cast("long").alias("n_occurrences"),
        F.round(
            F.sum("n").over(cum_w) / F.sum("n").over(total_w), 6
        ).alias("cum_coverage"),
    )


BPE_TOP_PAIRS = 30


@query(
    "bpe_pair_counts",
    oracle=f"""
    WITH toks AS (
      SELECT t.tok FROM documents, UNNEST({TOKENS_SQL}) t(tok)
    ), pairs AS (
      SELECT substr(tok, p.i, 2) AS pair
      FROM toks, UNNEST(range(1, length(tok))) p(i)
      WHERE length(tok) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM pairs
    GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {BPE_TOP_PAIRS}
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE-training inner loop at corpus scale: count adjacent
    character pairs across all tokens and rank the merge candidates —
    the step a tokenizer trainer repeats per merge, and the one that
    must distribute at 100 TB (each iteration is one explode + one
    partial-combined count, no token list ever leaves its partition
    un-aggregated).

    Exact integer counts with a unique (n DESC, pair) order, so the
    top-{BPE_TOP_PAIRS} is deterministic on any engine.
    """
    from mallard_spark.functions.text import TOKENS_EXPR

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substr(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(BPE_TOP_PAIRS)
    )


@query(
    "tokenize_to_ids",
    oracle=r"""
    WITH d AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents
    ),
    flat AS (
      SELECT doc_id, u.pos AS pos, u.term AS term
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(len(toks)),
                                     i -> {'pos': i, 'term': toks[i+1]})) AS u
        FROM d
      )
    ),
    vocab AS (
      SELECT term, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) AS id
      FROM flat GROUP BY term QUALIFY id <= 24
    )
    SELECT f.doc_id,
           COUNT(*) AS n_tok,
           CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ',' ORDER BY f.pos)
               AS ids_csv
    FROM flat f LEFT JOIN vocab v USING (term)
    GROUP BY f.doc_id
    """,
)
def tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization to vocabulary ids — the step that turns
    cleaned text into training-ready integer sequences. The vocab is
    the corpus's own top-V terms by frequency (V=24 here so the OOV
    path is exercised; rank ties broken by term), OOV maps to id 0,
    and each doc's id sequence is emitted in token order as a CSV
    string (engine-portable; arrays don't hash stably across
    pandas/DuckDB reprs).

    Shape at 100 TB: the vocab build is one explode→groupBy(term)
    with map-side combine, and the global id ranking runs only over
    the VOCABULARY (V rows), never the corpus (same pattern as
    vocab_coverage). Scoring joins corpus tokens to a BROADCAST
    vocab, and the only corpus-wide exchange is the groupBy(doc_id)
    reassembly — the same single hash exchange a training-shard
    writer pays anyway (shard_assignment).
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    from mallard_spark.functions.text import TOKENS_EXPR

    flat = docs.select(
        "doc_id", F.posexplode(F.expr(TOKENS_EXPR)).alias("pos", "term")
    )
    w = Window.orderBy(F.col("cnt").desc(), "term")
    vocab = (
        flat.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .withColumn("id", F.row_number().over(w))
        .filter(F.col("id") <= 24)
        .select("term", "id")
    )
    joined = flat.join(F.broadcast(vocab), "term", "left").select(
        "doc_id",
        "pos",
        F.col("id").isNull().cast("int").alias("oov"),
        F.coalesce(F.col("id"), F.lit(0)).alias("id0"),
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tok"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(pos, id0))),"
            " x -> cast(x.id0 as string)), ',')"
        ).alias("ids_csv"),
    )


MIX_ALPHA = 0.5  # temperature exponent: 0 = equal budgets, 1 = natural


@query(
    "mix_temperature",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({TOKENS_SQL}) AS n_tok,
             {md5_long_sql("CAST(doc_id AS VARCHAR) || ':tmix'")} % {MIX_PPM} AS h
      FROM documents
    ),
    tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS tot FROM t GROUP BY source),
    m AS (SELECT MIN(tot) AS min_tot FROM tot WHERE tot > 0),
    r AS (
      SELECT source, tot,
             CASE WHEN tot = 0 THEN 0
                  ELSE CAST(FLOOR(sqrt(CAST(min_tot AS DOUBLE) / tot) * {MIX_PPM})
                            AS BIGINT) END AS rate_ppm
      FROM tot, m
    )
    SELECT t.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN t.h < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_docs,
           CAST(SUM(t.n_tok) AS BIGINT) AS tot_tokens,
           CAST(SUM(CASE WHEN t.h < r.rate_ppm THEN t.n_tok ELSE 0 END) AS BIGINT)
               AS kept_tokens,
           MIN(r.rate_ppm) AS rate_ppm
    FROM t JOIN r USING (source)
    GROUP BY t.source ORDER BY t.source
    """,
)
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (the multilingual-training
    standard, α=0.5): per-source keep rate (min_tokens/tokens_s)^(1−α)
    — big sources are downsampled toward, but not all the way to, the
    smallest source's budget (α=0 reproduces mix_sources; α=1 keeps
    the natural distribution).

    Determinism: the rate touches floats exactly once per SOURCE
    (one IEEE divide + sqrt + floor on the tiny totals side → integer
    ppm threshold); the per-row keep test is pure int64 (h <
    rate_ppm), so the sample is bit-stable across engines and
    partitionings. Same 100 TB shape as mix_sources: totals broadcast
    back, corpus never shuffled.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = materialize(
        docs.select(
            "doc_id",
            "source",
            F.size(tokens()).alias("n_tok"),
            (
                md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":tmix")))
                % MIX_PPM
            ).alias("h"),
        ),
        "mix_temperature_t",
    )
    totals = t.groupBy("source").agg(F.sum("n_tok").alias("tot"))
    m = totals.filter(F.col("tot") > 0).agg(F.min("tot").alias("min_tot"))
    r = (
        totals.crossJoin(F.broadcast(m))
        .select(
            "source",
            F.when(F.col("tot") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(
                    F.sqrt(F.col("min_tot").cast("double") / F.col("tot"))
                    * MIX_PPM
                ).cast("long")
            )
            .alias("rate_ppm"),
        )
    )
    keep = F.when(F.col("h") < F.col("rate_ppm"), 1).otherwise(0)
    return (
        t.join(F.broadcast(r), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(keep).cast("long").alias("kept_docs"),
            F.sum("n_tok").alias("tot_tokens"),
            F.sum(F.when(F.col("h") < F.col("rate_ppm"), F.col("n_tok")).otherwise(0)).alias(
                "kept_tokens"
            ),
            F.min("rate_ppm").alias("rate_ppm"),
        )
        .orderBy("source")
    )


_MIX_TOKEN_BUDGET_ORACLE = f"""
    WITH avail AS (
      SELECT source, CAST(SUM(len({TOKENS_SQL})) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(avail_tokens) AS BIGINT) AS total,
             CAST(SUM(avail_tokens) // 2 AS BIGINT) AS budget
      FROM avail
    ),
    alloc AS (
      SELECT a.source, a.avail_tokens,
             (t.budget * a.avail_tokens) // t.total AS base,
             (t.budget * a.avail_tokens) % t.total AS rem,
             t.budget AS budget
      FROM avail a CROSS JOIN tot t
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
             budget - SUM(base) OVER () AS leftover
      FROM alloc
    )
    SELECT source, avail_tokens,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_tokens
    FROM ranked ORDER BY source
    """


def _allocate_budget(avail: DataFrame) -> DataFrame:
    """Largest-remainder allocation over a (source, avail_tokens)
    relation — ONE definition shared by mix_token_budget and its
    streaming arm so the two can never drift. All int64 arithmetic;
    the windows run on the by-definition-tiny source table."""
    t = avail.agg(F.sum("avail_tokens").cast("long").alias("total")).select(
        "total", F.expr("total DIV 2").alias("budget")
    )
    alloc = avail.crossJoin(F.broadcast(t)).select(
        "source",
        "avail_tokens",
        F.expr("(budget * avail_tokens) DIV total").alias("base"),
        F.expr("(budget * avail_tokens) % total").alias("rem"),
        "budget",
    )
    w = Window.orderBy(F.desc("rem"), "source")
    ranked = alloc.withColumn("rk", F.row_number().over(w)).withColumn(
        "leftover",
        F.col("budget")
        - F.sum("base").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    return ranked.select(
        "source",
        "avail_tokens",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    ).orderBy("source")


@query("mix_token_budget", oracle=_MIX_TOKEN_BUDGET_ORACLE)
def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocation across sources (round 6): given a
    training budget (here floor(total/2) tokens), split it
    proportionally to each source's available token mass with
    LARGEST-REMAINDER rounding — the apportionment method whose
    per-source allocations are integers that sum EXACTLY to the
    budget (plain floor leaves a shortfall, plain round can
    overshoot). Remainder ties break by source name, so the
    allocation is bit-deterministic on both engines: every step is
    int64 arithmetic ((budget*avail) div/mod total), no floats
    anywhere.

    Shape at 100 TB: one per-source aggregate exchange over the
    corpus; the allocation itself runs on the SOURCE table (bounded
    by the number of sources, by definition tiny), with the two
    1-row aggregates broadcast per codebase convention. The corpus
    is never reshuffled — same scan shape as mix_sources.

    Reference parity: a Mallard client computes this as plain
    DuckDB SQL over the wire (flight_server.py:342); the oracle IS
    that SQL.
    """
    docs = load_table(spark, sf_dir, "documents")
    # ONE corpus pass into the (source-bounded, tiny) barrier — the
    # totals and allocation branches both read it; without the
    # barrier each branch re-scans the corpus (aliased subplans get
    # fresh expression ids, so ReuseExchange can't dedupe them — the
    # measured pathology exec.py documents)
    avail = materialize(
        docs.groupBy("source").agg(
            F.sum(F.size(tokens())).cast("long").alias("avail_tokens")
        ),
        "mix_token_budget_avail",
    )
    return _allocate_budget(avail)


# Per-source epoch factors in ppm (frozen from a quality review —
# the operator is weight-agnostic). 2_500_000 = "see this source 2.5
# times per training epoch": 2 full copies plus a 50% hash-sampled
# third. Sources absent from the dict train at 1 epoch.
UPSAMPLE_PPM = {
    "src0": 3_000_000,
    "src1": 2_500_000,
    "src2": 1_500_000,
    "src3": 1_250_000,
}
UPSAMPLE_DEFAULT_PPM = MIX_PPM


def _upsample_ppm_case() -> str:
    """CASE expression mapping source → epoch ppm — ONE definition
    rendered into both the Spark plan and the DuckDB oracle."""
    whens = " ".join(f"WHEN '{s}' THEN {p}" for s, p in sorted(UPSAMPLE_PPM.items()))
    return f"CASE source {whens} ELSE {UPSAMPLE_DEFAULT_PPM} END"


@query(
    "mix_upsample_epochs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, len({TOKENS_SQL}) AS n_tok,
             {_upsample_ppm_case()} AS ppm,
             {md5_long_sql("CAST(doc_id AS VARCHAR) || ':up'")} % {MIX_PPM} AS h
      FROM documents
    ), c AS (
      SELECT source, n_tok, ppm,
             ppm // {MIX_PPM}
               + CASE WHEN h < ppm % {MIX_PPM} THEN 1 ELSE 0 END AS copies
      FROM t
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(ppm) AS epochs_ppm,
           CAST(SUM(copies) AS BIGINT) AS out_docs,
           CAST(SUM(n_tok * copies) AS BIGINT) AS out_tokens,
           CAST(SUM(copies) * {MIX_PPM} // COUNT(*) AS BIGINT) AS realized_ppm
    FROM c GROUP BY source ORDER BY source
    """,
)
def mix_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-style UP-sampling mix (the Llama/Gopher data recipe
    direction mix_sources/mix_temperature don't cover: repeating
    high-quality sources several times per epoch instead of cutting
    the big ones). A factor of e.g. 2.5 materializes as 2 full copies
    plus a 50% content-addressed sample for the third — per-doc
    copies = ppm div 10⁶ + (md5(doc) % 10⁶ < ppm mod 10⁶), all int64,
    so the realized mix is bit-stable under any partitioning and
    engine. The report carries configured vs realized ppm per source
    (they converge as n_docs grows — the hash sample is unbiased).

    Scale shape: one corpus scan → per-source aggregate; the
    materialized training corpus (not built here) is the same scan
    followed by ``explode(sequence(1, copies))`` — a pure map with no
    shuffle, writing straight into `shard_assignment`.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.select(
        "source",
        F.size(tokens()).alias("n_tok"),
        F.expr(_upsample_ppm_case()).alias("ppm"),
        (
            md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(":up")))
            % MIX_PPM
        ).alias("h"),
    ).select(
        "source",
        "n_tok",
        "ppm",
        (
            F.expr(f"ppm div {MIX_PPM}")
            + F.when(F.col("h") < F.col("ppm") % MIX_PPM, 1).otherwise(0)
        ).alias("copies"),
    )
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("ppm").cast("long").alias("epochs_ppm"),
            F.sum("copies").cast("long").alias("out_docs"),
            F.sum(F.col("n_tok") * F.col("copies")).cast("long").alias("out_tokens"),
            F.expr(f"(sum(copies) * {MIX_PPM}) div count(1)")
            .cast("long")
            .alias("realized_ppm"),
        )
        .orderBy("source")
    )


@query(
    "pack_efficiency_report",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, len({TOKENS_SQL}) AS n_tok FROM documents
    ), cum AS (
      SELECT lang, n_tok,
             SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS running
      FROM t
    ), bins AS (
      SELECT lang,
             CAST((running - n_tok) // {PACK_CAP} AS BIGINT) AS bin_id,
             CAST(SUM(n_tok) AS BIGINT) AS tokens_in_bin
      FROM cum GROUP BY lang, 2
    )
    SELECT lang,
           COUNT(*) AS n_bins,
           CAST(SUM(tokens_in_bin) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN tokens_in_bin < {PACK_CAP}
                         THEN {PACK_CAP} - tokens_in_bin ELSE 0 END) AS BIGINT)
               AS wasted_tokens,
           ROUND(CAST(SUM(CASE WHEN tokens_in_bin > {PACK_CAP} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS straddle_frac,
           ROUND(CAST(SUM(LEAST(tokens_in_bin, {PACK_CAP})) AS DOUBLE)
                 / (COUNT(*) * {PACK_CAP}), 6) AS fill_rate
    FROM bins GROUP BY lang ORDER BY lang
    """,
)
def pack_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over pack_sequences' bins: fill rate,
    wasted padding tokens, and the fraction of bins a document
    straddles — the numbers that decide whether the packing capacity
    (or the doc-length filter) needs retuning before a training run
    burns compute on padding. Adds only a per-lang rollup on top of
    the per-bin aggregate — nothing touches the corpus twice.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", F.size(tokens()).alias("n_tok"))
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bins = (
        t.withColumn("running", F.sum("n_tok").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("running") - F.col("n_tok")) / PACK_CAP).cast("long"),
        )
        .groupBy("lang", "bin_id")
        .agg(F.sum("n_tok").cast("long").alias("tokens_in_bin"))
    )
    tib = F.col("tokens_in_bin")
    return (
        bins.groupBy("lang")
        .agg(
            F.count("*").alias("n_bins"),
            F.sum(tib).cast("long").alias("total_tokens"),
            F.sum(F.when(tib < PACK_CAP, PACK_CAP - tib).otherwise(0))
            .cast("long")
            .alias("wasted_tokens"),
            F.round(
                F.sum(F.when(tib > PACK_CAP, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("straddle_frac"),
            F.round(
                F.sum(F.least(tib, F.lit(PACK_CAP))).cast("double")
                / (F.count("*") * PACK_CAP),
                6,
            ).alias("fill_rate"),
        )
        .orderBy("lang")
    )


@query(
    "dataset_card_report",
    oracle=f"""
    WITH per_text AS (
      SELECT source, lang, md5(text) AS h,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(MIN(len({TOKENS_SQL})) AS BIGINT) AS tok,
             CAST(MIN(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source, lang, md5(text)
    )
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS uniq_texts,
           CAST(SUM(cnt) - COUNT(DISTINCT h) AS BIGINT) AS dup_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(cnt * tok) AS BIGINT) AS tokens,
           CAST(SUM(cnt * chars) AS BIGINT) AS chars,
           CAST((SUM(cnt * tok) * 100) // SUM(cnt) AS BIGINT) AS mean_tokens_x100
    FROM per_text GROUP BY source ORDER BY source
    """,
)
def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card ("datasheet for datasets"): doc and
    unique-text counts, exact-dup count, language spread, token and
    char mass, mean doc length — the summary block a training-mix
    decision reads first. ONE corpus scan: a (source, lang, md5)
    pre-aggregate (the partial-combined dedup count) feeding a
    per-source rollup; everything int64 (mean is ``tokens·100 //
    docs``), so the card value-oracles exactly.
    """
    docs = load_table(spark, sf_dir, "documents")
    per_text = docs.groupBy(
        "source", "lang", F.md5("text").alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min(F.expr(f"size({TOKENS_EXPR})")).cast("long").alias("tok"),
        F.min("n_chars").cast("long").alias("chars"),
    )
    return (
        per_text.groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("docs"),
            F.countDistinct("h").cast("long").alias("uniq_texts"),
            (F.sum("cnt") - F.countDistinct("h")).cast("long").alias("dup_docs"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum(F.col("cnt") * F.col("tok")).cast("long").alias("tokens"),
            F.sum(F.col("cnt") * F.col("chars")).cast("long").alias("chars"),
            F.expr("(sum(cnt * tok) * 100) div sum(cnt)")
            .cast("long")
            .alias("mean_tokens_x100"),
        )
        .orderBy("source")
    )


# Heaps-law thresholds: powers of two keep the report tiny and the
# "how much vocab survives a min-count cut" decision direct.
_VG_THRESHOLDS = (1, 2, 4, 8, 16, 32, 64, 128)


@query(
    "vocab_growth_curve",
    oracle=f"""
    WITH terms AS (
      SELECT unnest({TOKENS_SQL}) AS term FROM documents
    ), counts AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM terms GROUP BY term
    ), thresholds AS (
      SELECT unnest([{", ".join(map(str, _VG_THRESHOLDS))}]) AS min_count
    )
    SELECT CAST(t.min_count AS BIGINT) AS min_count,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(c.cnt) AS BIGINT) AS tokens_covered,
           CAST((SUM(c.cnt) * 1000000) //
                (SELECT SUM(cnt) FROM counts) AS BIGINT) AS coverage_ppm
    FROM thresholds t JOIN counts c ON c.cnt >= t.min_count
    GROUP BY t.min_count ORDER BY min_count
    """,
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-vs-min-count curve (the Heaps-law report behind
    every tokenizer vocab cut): for each power-of-two threshold, how
    many distinct terms survive and what fraction of the token mass
    they cover, in integer ppm. The corpus-sized work is ONE term
    count (explode + partial-combined groupBy); the curve itself is
    the tiny count table broadcast against 8 threshold rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    thresholds = spark.createDataFrame(
        [(t,) for t in _VG_THRESHOLDS], "min_count long"
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.join(F.broadcast(thresholds), F.col("cnt") >= F.col("min_count"))
        .groupBy("min_count")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab_size"),
            F.sum("cnt").cast("long").alias("tokens_covered"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "min_count",
            "vocab_size",
            "tokens_covered",
            F.expr("(tokens_covered * 1000000) div total")
            .cast("long")
            .alias("coverage_ppm"),
        )
        .orderBy("min_count")
    )


# Bloom decontamination dials: M bits, J hash functions. At the test
# fixture's ~4k distinct benchmark shingles, M=2^16 / J=3 gives an FP
# rate around (1-e^(-J*n/M))^J ≈ 0.05% — small but nonzero, so the
# false-positive audit path is actually exercised at sf0.01+.
BLOOM_M = 1 << 16
BLOOM_J = 3


def _bloom_pos_sql(sh: str, j: str) -> str:
    expr = f"{sh} || ':bf' || CAST({j} AS VARCHAR)"
    return f"{md5_long_sql(expr)} % {BLOOM_M}"


_BLOOM_JS_SQL = f"(SELECT unnest([{', '.join(map(str, range(BLOOM_J)))}]) AS j)"


def _bloom_js():
    """One row per hash function index (exploded j column)."""
    return F.explode(F.array(*[F.lit(j) for j in range(BLOOM_J)])).alias("j")


def _bloom_pos():
    """Bloom bit position of (sh, j) — THE hash; single definition
    site shared by the bitmap build, the batch sweep, and (via
    bloom_bitmap_words) the streaming filter."""
    return md5_long(
        F.concat(F.col("sh"), F.lit(":bf"), F.col("j").cast("string"))
    ) % BLOOM_M


def _bloom_mask():
    return F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))")


def _split_shingles_and_bitmap(docs: DataFrame):
    """(per-doc distinct shingles with split bucket, distinct TEST
    shingles, packed bitmap of their bloom positions). Shared by the
    batch sweep and the streaming ingest filter so the two can never
    disagree on the filter's contents."""
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
    test_sh = sh.filter(F.col("bucket") >= 90).select("sh").distinct()
    js, pos, mask = _bloom_js(), _bloom_pos(), _bloom_mask()
    bloom = (
        test_sh.select("sh", js)
        .select(pos.alias("pos"))
        .select(F.expr("pos DIV 63").alias("word"), mask.alias("m"))
        .groupBy("word")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    return sh, test_sh, bloom


def bloom_bitmap_words(spark: SparkSession, sf_dir: str) -> list[int]:
    """The test split's bloom filter as a DENSE word array (index =
    pos DIV 63) — the frozen artifact an ingestion pipeline ships to
    its stream jobs. <= {BLOOM_M}//63 + 1 int64s regardless of corpus
    size, so collecting it to the driver is the design, not a
    shortcut (same rationale as the in-plan LSH plane literals)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    _, _, bloom = _split_shingles_and_bitmap(docs)
    words = [0] * (BLOOM_M // 63 + 1)
    for r in bloom.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


@query(
    "decontaminate_bloom",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id, {_BUCKET_SQL} AS bucket, s.sh
      FROM documents, UNNEST(list_distinct({word_shingles_sql(3)})) s(sh)
    ), test_sh AS (
      SELECT DISTINCT sh FROM sh WHERE bucket >= 90
    ), bloom AS (
      SELECT pos // 63 AS word, bit_or(1::BIGINT << (pos % 63)) AS bits
      FROM (
        SELECT {_bloom_pos_sql('t.sh', 'j.j')} AS pos
        FROM test_sh t CROSS JOIN {_BLOOM_JS_SQL} j
      )
      GROUP BY pos // 63
    ), train_sh AS (
      SELECT doc_id, sh FROM sh WHERE bucket < 80
    ), probes AS (
      SELECT t.doc_id, t.sh, {_bloom_pos_sql('t.sh', 'j.j')} AS pos
      FROM train_sh t CROSS JOIN {_BLOOM_JS_SQL} j
    ), tested AS (
      SELECT p.doc_id, p.sh,
             MIN(CASE WHEN b.bits IS NOT NULL
                       AND (b.bits & (1::BIGINT << (p.pos % 63)))
                           = (1::BIGINT << (p.pos % 63))
                  THEN 1 ELSE 0 END) AS bloom_pos
      FROM probes p LEFT JOIN bloom b ON b.word = p.pos // 63
      GROUP BY p.doc_id, p.sh
    ), perdoc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_shingles,
             SUM(t.bloom_pos) AS n_bloom_pos,
             SUM(CASE WHEN e.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_exact
      FROM tested t LEFT JOIN test_sh e ON t.sh = e.sh
      GROUP BY t.doc_id
    )
    SELECT doc_id,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_bloom_pos AS BIGINT) AS n_bloom_pos,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_bloom_pos - n_exact AS BIGINT) AS n_false_pos
    FROM perdoc
    WHERE n_bloom_pos > 0
    """,
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination sweep — the scalable DIRECTION:
    build a tiny Bloom filter over the benchmark/test split's
    shingles, broadcast it, and scan the TRAIN corpus tagging docs
    whose shingles hit the filter (Dolma/RedPajama-style benchmark
    decontamination tags training docs, not test docs). An exact
    verification join runs ONLY to audit the filter: per train doc,
    bloom positives vs exact matches vs false positives.

    The filter is a packed int64 bitmap — 63 bits per word (bit 63
    stays clear: DuckDB raises on 1<<63), M=2^16 bits ⇒ ≤ 1041 words
    regardless of corpus size, J=3 md5-derived hash functions.
    Membership is MIN over the J bit tests (all bits set ⇒ positive),
    all integer ops on both engines.

    Shape at 100 TB: the bitmap build touches only the TEST split
    (small by construction) and aggregates to ≤1041 rows — broadcast.
    The train scan joins each shingle probe to that broadcast map:
    linear, no shuffle of train content except the per-doc groupBy.
    In production the exact-audit join is dropped (or sampled) and
    ONLY bloom positives — a tiny fraction — are re-checked exactly;
    the filter itself replaces the corpus-wide shingle⋈shingle join
    with a broadcast lookup, which is the point of the operator.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh, test_sh, bloom = _split_shingles_and_bitmap(docs)
    # Round 15: the J-probe explode (3× the train shingle stream) +
    # broadcast word join + (doc_id, sh) MIN-fold exchange is replaced
    # by J per-row position columns and ONE single-row broadcast
    # carrying the whole ≤1041-word bitmap as a MAP column (the same
    # 1-row-broadcast shape mix_sources uses for its global min). The
    # membership test completes inside the scan stage, so the old
    # plan's only corpus-sized shuffle — the (doc, shingle) MIN fold,
    # whose key cardinality equals its row count and therefore never
    # partial-combines — is gone. least() over the J map-lookup bit
    # tests equals the old MIN over exploded probes; a missing word
    # (NULL map lookup) tests 0 exactly as the old left join did.
    # Variants measured and rejected: collect-to-plan-literal (+0.5 s:
    # extra serial collect job) and three per-j broadcast word joins
    # (+0.3 s: the bitmap subtree is rebuilt per join — ReuseExchange
    # does not fire across the renamed sides).
    train = sh.filter(F.col("bucket") < 80).select(
        "doc_id",
        "sh",
        *[
            (md5_long(F.concat(F.col("sh"), F.lit(":bf"), F.lit(str(j)))) % BLOOM_M)
            .alias(f"p{j}")
            for j in range(BLOOM_J)
        ],
    )
    bmap = bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bm")
    )
    tested = train.crossJoin(F.broadcast(bmap))

    def _bit(j: int) -> str:
        e = f"element_at(bm, p{j} DIV 63)"
        m = f"shiftleft(cast(1 as bigint), cast(p{j} % 63 AS int))"
        return f"(CASE WHEN {e} IS NOT NULL AND ({e} & {m}) = {m} THEN 1 ELSE 0 END)"

    tested = tested.select(
        "doc_id",
        "sh",
        F.expr(
            "least(" + ", ".join(_bit(j) for j in range(BLOOM_J)) + ")"
        ).alias("bloom_pos"),
    )
    perdoc = (
        tested.join(
            test_sh.withColumnRenamed("sh", "e_sh"),
            tested.sh == F.col("e_sh"),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("bloom_pos").alias("n_bloom_pos"),
            F.sum(F.when(F.col("e_sh").isNotNull(), 1).otherwise(0)).alias("n_exact"),
        )
    )
    return perdoc.filter(F.col("n_bloom_pos") > 0).select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.col("n_bloom_pos").cast("long").alias("n_bloom_pos"),
        F.col("n_exact").cast("long").alias("n_exact"),
        (F.col("n_bloom_pos") - F.col("n_exact")).cast("long").alias("n_false_pos"),
    )


# BPE trainer dials: number of merge rounds learned. Each round is a
# full (word-table) pass; the WORD table — not the corpus — is the
# working set, which is what makes corpus-scale BPE training feasible.
BPE_MERGES = 4
# Min-frequency floor on the training word table (round-5 VERDICT #1):
# words seen fewer times are excluded from training — standard BPE
# trainer pruning (HF tokenizers' min_frequency). This is what makes
# the driver-side collect VOCAB-shaped instead of corpus-shaped: on
# 100 TB of web text the distinct-"word" count is billions (typos,
# URLs, code), but words above any fixed floor are bounded by
# corpus_mass / floor and in practice by the Zipf head. Applied
# identically in the DuckDB oracle (HAVING COUNT(*) >= floor).
BPE_MIN_FREQ = 2


def _bpe_iter_sql(i: int) -> list[str]:
    """One BPE merge round as chained CTEs (leftmost-nonoverlapping
    pair semantics via run-parity windows)."""
    return [
        f"""p{i} AS MATERIALIZED (
      SELECT word, freq, pos, sym,
             LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM s{i}
    )""",
        f"""b{i} AS MATERIALIZED (
      SELECT l, r, cnt FROM (
        SELECT sym AS l, nxt AS r, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM p{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt
      ) ORDER BY cnt DESC, l, r LIMIT 1
    )""",
        f"""c{i} AS MATERIALIZED (
      SELECT p.word, p.pos,
             ROW_NUMBER() OVER (PARTITION BY p.word ORDER BY p.pos) AS rn
      FROM p{i} p, b{i} b WHERE p.sym = b.l AND p.nxt = b.r
    )""",
        f"""k{i} AS MATERIALIZED (
      SELECT word, pos FROM (
        SELECT word, pos,
               MIN(pos) OVER (PARTITION BY word, pos - rn) AS g0
        FROM c{i}
      ) WHERE (pos - g0) % 2 = 0
    )""",
        f"""s{i + 1} AS MATERIALIZED (
      SELECT s.word AS word, s.freq AS freq,
             ROW_NUMBER() OVER (PARTITION BY s.word ORDER BY s.pos) - 1 AS pos,
             CASE WHEN k.pos IS NOT NULL THEN s.sym || b.r ELSE s.sym END AS sym
      FROM s{i} s
      CROSS JOIN b{i} b
      LEFT JOIN k{i} k ON k.word = s.word AND k.pos = s.pos
      LEFT JOIN k{i} kp ON kp.word = s.word AND kp.pos = s.pos - 1
      WHERE kp.pos IS NULL
    )""",
        f"""n{i} AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_symbols FROM s{i + 1})""",
    ]


def _bpe_train_oracle() -> str:
    ctes = [
        f"""w AS (
      SELECT t.tok AS word, COUNT(*) AS freq
      FROM documents, UNNEST({TOKENS_SQL}) t(tok)
      GROUP BY t.tok
      HAVING COUNT(*) >= {BPE_MIN_FREQ}
    )""",
        """s0 AS MATERIALIZED (
      SELECT word, freq, u.i - 1 AS pos, substr(word, u.i, 1) AS sym
      FROM w, UNNEST(range(1, length(word) + 1)) u(i)
    )""",
    ]
    for i in range(BPE_MERGES):
        ctes.extend(_bpe_iter_sql(i))
    steps = "\n    UNION ALL ".join(
        f"SELECT {i + 1} AS step, b.l AS left_sym, b.r AS right_sym, "
        f"b.cnt AS pair_count, n.n_symbols AS corpus_symbols_after "
        f"FROM b{i} b, n{i} n"
        for i in range(BPE_MERGES)
    )
    return (
        "WITH " + ",\n    ".join(ctes) + f"\n    {steps}\n    ORDER BY step"
    )


def _bpe_word_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE training word-frequency table: one distributed pass
    over the corpus, pruned by the BPE_MIN_FREQ floor so the driver
    collect is bounded by corpus_mass / BPE_MIN_FREQ (vocab-shaped),
    never by the raw distinct-token count (corpus-shaped)."""
    from mallard_spark.functions.text import TOKENS_EXPR

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr(TOKENS_EXPR)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= BPE_MIN_FREQ)
    )


@query("bpe_train_merges", oracle=_bpe_train_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016), {BPE_MERGES}
    merge rounds end-to-end: count adjacent symbol pairs weighted by
    word frequency, adopt the most frequent pair as a merge, apply it
    leftmost-nonoverlapping to every word, repeat. Emits the learned
    merge table — (step, pair, count, corpus symbol mass after) —
    i.e. the artifact a tokenizer ships.

    Leftmost-nonoverlapping semantics (the part naive string-replace
    gets wrong on runs like 'aaaa'): candidate positions form runs
    only when a symbol borders itself; within each run, keep
    even-offset candidates. Runs are found with the pos−ROW_NUMBER
    grouping idiom and offset parity — pure window functions,
    identical logic on both engines, no UDF.

    Shape at 100 TB: the corpus is touched ONCE by the distributed
    word count; training then operates on the collected
    WORD-FREQUENCY table, pruned by the BPE_MIN_FREQ floor (round-6:
    the floor is APPLIED, not just documented — the collect is
    bounded by corpus_mass / floor, and the oracle's HAVING matches).
    Round 5 moved the merge loop driver-side:
    pure integer/string recurrence (no float-parity surface), 4.1 s →
    0.8 s at sf0.1, while the DuckDB oracle still replays the merges
    with its independent run-parity window formulation — the
    cross-implementation check is unchanged (plus the naive-reference
    test as a third implementation).
    """
    # The corpus-scale work is the distributed word count inside
    # _bpe_word_table; the merge loop runs DRIVER-SIDE over the
    # collected word-frequency table, which the BPE_MIN_FREQ floor
    # makes vocab-shaped (bounded by corpus_mass / floor) instead of
    # corpus-shaped — the round-5 VERDICT fix; the floor is standard
    # BPE trainer pruning (HF tokenizers' min_frequency) and the
    # DuckDB oracle applies the identical HAVING. Pure integer/string
    # ops, so there is no float-parity surface at all; the oracle
    # still replays the merges with its INDEPENDENT run-parity window
    # formulation, keeping the cross-implementation check.
    rows = _bpe_word_table(spark, sf_dir).collect()
    words = {r["word"]: int(r["freq"]) for r in rows}
    syms = {t: list(t) for t in words}
    steps = []
    for step in range(BPE_MERGES):
        from collections import Counter

        counts: Counter = Counter()
        for t, freq in words.items():
            s = syms[t]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += freq
        if not counts:
            break
        # winner: max count, ties by (l, r) ascending — python string
        # comparison is code-point order, same as the engines' binary
        # collation on these lowercased tokens
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        for t in syms:
            s, out, i = syms[t], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2  # leftmost-nonoverlapping
                else:
                    out.append(s[i])
                    i += 1
            syms[t] = out
        n_after = sum(len(syms[t]) * f for t, f in words.items())
        steps.append((step + 1, left, right, cnt, n_after))
    return spark.createDataFrame(
        steps,
        "step int, left_sym string, right_sym string, "
        "pair_count long, corpus_symbols_after long",
    ).orderBy("step")


def _decontaminate_minhash_oracle() -> str:
    from mallard_spark.operators.dedup import (
        K_MINHASH,
        N_BANDS,
        EST_MIN,
        minhash_sig_ctes,
    )

    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5(concat({b}, ':', mh{2 * b}, ':', mh{2 * b + 1})) AS bkey FROM mh"
        for b in range(N_BANDS)
    )
    eq_terms = " + ".join(
        f"(CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END)" for i in range(K_MINHASH)
    )
    return f"""
    WITH {minhash_sig_ctes()}, bands AS (
      {band_selects}
    ), pairs AS (
      SELECT DISTINCT tr.doc_id AS doc_train, te.doc_id AS doc_test
      FROM bands tr JOIN bands te
        ON tr.band = te.band AND tr.bkey = te.bkey
      WHERE {_BUCKET_SQL.replace("doc_id", "tr.doc_id")} < 80
        AND {_BUCKET_SQL.replace("doc_id", "te.doc_id")} >= 90
    )
    SELECT doc_train, doc_test, ({eq_terms}) / {K_MINHASH}.0 AS est_sim
    FROM pairs
    JOIN mh ma ON ma.doc_id = doc_train
    JOIN mh mb ON mb.doc_id = doc_test
    WHERE ({eq_terms}) / {K_MINHASH}.0 >= {EST_MIN}
    """


@query("decontaminate_minhash", oracle=_decontaminate_minhash_oracle())
def decontaminate_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY decontamination: train documents that are NEAR-duplicates
    of test/benchmark documents, not just exact n-gram overlaps —
    the sweep frontier-model reports actually run (paraphrased or
    lightly-edited benchmark leakage defeats `decontaminate_overlap`'s
    exact shingle join; MinHash similarity catches it).

    Same content-addressed 80/10/10 split as split_train_test, same
    md5-portable MinHash(16)+LSH(8x2) machinery as dedup_minhash_lsh
    (ONE signature definition site — an estimator change cannot
    desynchronize the sweeps). The only corpus-scaled join is train
    bands ⋈ test bands: output bounded by the TEST side's match
    count, so the sweep costs one signature pass plus a
    benchmark-sized equi-join — the dedup_incremental shape with the
    batch roles swapped.
    """
    from mallard_spark.operators.dedup import (
        EST_MIN,
        K_MINHASH,
        _band_keys,
        _minhash_signatures,
    )

    docs = spread(load_table(spark, sf_dir, "documents"))
    mh = materialize(_minhash_signatures(docs), "decon_signatures")
    bucket_of = md5_long(F.col("doc_id").cast("string")) % 100
    bands = _band_keys(mh).withColumn("bucket", bucket_of)
    tr = bands.filter(F.col("bucket") < 80).alias("tr")
    te = bands.filter(F.col("bucket") >= 90).alias("te")
    pairs = (
        tr.join(
            te,
            (F.col("tr.band") == F.col("te.band"))
            & (F.col("tr.bkey") == F.col("te.bkey")),
        )
        .select(
            F.col("tr.doc_id").alias("doc_train"),
            F.col("te.doc_id").alias("doc_test"),
        )
        .distinct()
    )
    ma = mh.select(
        F.col("doc_id").alias("doc_train"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(K_MINHASH)],
    )
    mb = mh.select(
        F.col("doc_id").alias("doc_test"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(K_MINHASH)],
    )
    eq_sum = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(K_MINHASH)
    )
    est = eq_sum / float(K_MINHASH)
    return (
        pairs.join(ma, "doc_train")
        .join(mb, "doc_test")
        .filter(est >= EST_MIN)
        .select("doc_train", "doc_test", est.alias("est_sim"))
    )

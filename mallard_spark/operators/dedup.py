"""Deduplication operators over the `documents` / `embeddings` tables.

Five strategies, all shuffle-bounded (no O(n²) cross join anywhere):

- exact:          hash-groupBy on content md5 — one shuffle.
- n-gram Jaccard: candidate pairs via a rare-shingle inverted index
                  (df ≤ MAXDF blocks the hot shingles), exact Jaccard
                  on candidates only.
- MinHash + LSH:  16 portable md5 minhashes, 8 bands × 2 rows;
                  pairs that share a band bucket are candidates.
- SimHash:        16-bit simhash from weighted token hashes; banding
                  on 4 nibbles; Hamming ≤ 4 marks near-dups.
- embedding:      cosine ≥ 0.9 within label blocks.

At 100 TB the band/bucket joins hash-shuffle on short keys and
bucket sizes stay bounded (rare shingles / band hashes), so
candidate generation is ~linear in corpus size. All hashing is
md5-derived (functions.hashing) so DuckDB oracles reproduce every
stage bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.functions.exec import materialize, spread
from mallard_spark.functions.hashing import md5_long, md5_long_expr, md5_long_sql
from mallard_spark.functions.text import (
    TOKENS_EXPR,
    TOKENS_SQL,
    shingles_of,
    tokens,
    word_shingles_sql,
)
from mallard_spark.functions.vectors import as_double, cosine6_unrolled
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

# ------------------------------------------------------------- exact


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           MIN(doc_id) AS rep_doc,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-groupBy, keep the lowest doc_id per text."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("content_hash"))
        .agg(F.min("doc_id").alias("rep_doc"), F.count("*").alias("n_copies"))
    )


@query(
    "dedup_exact_count",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs
    FROM documents
    """,
)
def dedup_exact_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplication stats."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_dup_docs"),
    )


# --------------------------------------------------- n-gram Jaccard

MAXDF = 20  # shingles in more docs than this are too common to block on
JACC_MIN = 0.2


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH doc_shingles AS (
      SELECT DISTINCT doc_id, s.sh
      FROM documents, UNNEST({word_shingles_sql(3)}) s(sh)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles GROUP BY doc_id
    ), rare AS (
      SELECT sh FROM doc_shingles GROUP BY sh HAVING COUNT(*) <= {MAXDF}
    ), cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM doc_shingles a
      JOIN rare r ON a.sh = r.sh
      JOIN doc_shingles b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
    FROM cand
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter / (sa.n_sh + sb.n_sh - inter) >= {JACC_MIN}
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-shingle Jaccard over rare-shingle candidates.

    Shared rare shingle (df ≤ MAXDF) → candidate pair; Jaccard is
    computed exactly but only on candidates, so work is bounded by
    MAXDF² per shingle instead of n² per corpus. Note: only the
    *inner-join count* uses rare shingles; set sizes are full.
    """
    # repartition BEFORE tokenizing: the raw table is one parquet file,
    # so the regex/shingle work would otherwise run single-threaded
    docs = spread(load_table(spark, sf_dir, "documents"))
    doc_sh = materialize(
        docs.select("doc_id", tokens().alias("toks"))
        .select("doc_id", F.explode(shingles_of("toks", 3)).alias("sh"))
        .distinct(),
        "jaccard_doc_sh",  # consumed by sizes, rare, and both join sides
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        doc_sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= MAXDF)
        .select("sh")
    )
    a = doc_sh.alias("a")
    b = doc_sh.alias("b")
    cand = (
        a.join(rare, "sh")
        .join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jacc = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jacc >= JACC_MIN)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )


CONT_MIN = 0.5


@query(
    "dedup_containment",
    oracle=f"""
    WITH doc_shingles AS (
      SELECT DISTINCT doc_id, s.sh
      FROM documents, UNNEST({word_shingles_sql(3)}) s(sh)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM doc_shingles GROUP BY doc_id
    ), rare AS (
      SELECT sh FROM doc_shingles GROUP BY sh HAVING COUNT(*) <= {MAXDF}
    ), cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM doc_shingles a
      JOIN rare r ON a.sh = r.sh
      JOIN doc_shingles b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a AS contained_doc, doc_b AS container_doc,
           round(inter / sa.n_sh, 6) AS containment
    FROM cand
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter / sa.n_sh >= {CONT_MIN}
      AND sa.n_sh <= sb.n_sh
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: containment C(A,B) = |A∩B| / |A| over
    3-shingle sets — finds documents mostly CONTAINED in a larger one
    (quoted articles, boilerplate-wrapped copies, excerpt spam), which
    symmetric Jaccard misses whenever the container is much bigger
    than the contained doc.

    Same rare-shingle candidate generation as dedup_ngram_jaccard
    (work bounded by MAXDF² per shingle, never n²); the pair is
    ordered (contained → container) and kept when the smaller doc's
    shingles are ≥ {CONT_MIN} covered and it is no larger than the
    container.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    doc_sh = materialize(
        docs.select("doc_id", tokens().alias("toks"))
        .select("doc_id", F.explode(shingles_of("toks", 3)).alias("sh"))
        .distinct(),
        "containment_doc_sh",
    )
    sizes = doc_sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        doc_sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= MAXDF)
        .select("sh")
    )
    a = doc_sh.alias("a")
    b = doc_sh.alias("b")
    cand = (
        a.join(rare, "sh")
        .join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") != F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    containment = F.col("inter") / F.col("na")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter((containment >= CONT_MIN) & (F.col("na") <= F.col("nb")))
        .select(
            F.col("doc_a").alias("contained_doc"),
            F.col("doc_b").alias("container_doc"),
            F.round(containment, 6).alias("containment"),
        )
    )


# ----------------------------------------------------- MinHash + LSH

K_MINHASH = 16
N_BANDS = 8  # 8 bands × 2 rows
EST_MIN = 0.25


# Universal-hash minhash family: ONE md5 per shingle (the measured
# cost driver of the whole family — 16 md5s per shingle before round
# 4), then 16 cheap affine maps mh_i = (A_i·(h mod P) + B_i) mod P
# over the shared base hash. P = 2³¹−1 (Mersenne prime); A_i,B_i are
# md5-derived Python-time constants, so both engines evaluate the
# identical integer expressions: A_i<P, (h mod P)<P ⇒ product < 2⁶²,
# no int64 overflow anywhere.
MH_P = (1 << 31) - 1


def _mh_coeff(i: int) -> tuple[int, int]:
    import hashlib

    ha = int(hashlib.md5(f"mha:{i}".encode()).hexdigest()[:15], 16)
    hb = int(hashlib.md5(f"mhb:{i}".encode()).hexdigest()[:15], 16)
    return ha % (MH_P - 1) + 1, hb % MH_P


def _mh_sql(i: int) -> str:
    """DuckDB minhash i over a pre-hashed list column ``hs``."""
    a, b = _mh_coeff(i)
    return f"list_min(list_transform(hs, h -> ({a} * (h % {MH_P}) + {b}) % {MH_P}))"


def minhash_sig_ctes(k: int = K_MINHASH) -> str:
    """Shared oracle prefix ``sh / hashed / mh`` — distinct shingles,
    one base md5 per shingle, k universal-hash minhash columns. ONE
    definition site for every minhash oracle (lsh / incremental /
    accuracy / streaming band0), so a signature change cannot
    silently desynchronize an oracle from the Spark side (review
    finding r4; the round-4 universal-hash change had to be
    hand-applied to four copies)."""
    mh_cols = ",\n             ".join(
        f"{_mh_sql(i)} AS mh{i}" for i in range(k)
    )
    return f"""sh AS (
      SELECT doc_id, list_distinct({word_shingles_sql(3)}) AS shingles
      FROM documents
      WHERE len({word_shingles_sql(3)}) > 0
    ), hashed AS (
      SELECT doc_id,
             list_transform(shingles, s -> {md5_long_sql("s")}) AS hs
      FROM sh
    ), mh AS (
      SELECT doc_id,
             {mh_cols}
      FROM hashed
    )"""


def _minhash_lsh_oracle() -> str:
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
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, ({eq_terms}) / {K_MINHASH}.0 AS est_sim
    FROM pairs
    JOIN mh ma ON ma.doc_id = doc_a
    JOIN mh mb ON mb.doc_id = doc_b
    WHERE ({eq_terms}) / {K_MINHASH}.0 >= {EST_MIN}
    """


def _minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id → mh0..mh{K_MINHASH-1} signature columns.

    Explode-then-aggregate, NOT 16 array_min(transform(...)) columns:
    Catalyst's CollapseProject would inline the shingle pipeline into
    every minhash expression (16× redundant shingle building per
    row); exploding materializes each (doc, shingle) exactly once.
    Round 4: ONE md5 per shingle (staged as ``h``), 16 affine maps
    over it — md5 was the measured cost driver of the whole family.
    The groupBy is one shuffle on doc_id — the shape that scales.

    Round 15: the (doc_id, shingle) ``.distinct()`` that used to sit
    between explode and groupBy is gone — min() is invariant to
    multiplicity (a shingle occurring k times contributes the same
    affine-map values, and min over a multiset equals min over its
    set), so the dedup exchange bought nothing. The md5 → hp map now
    runs BEFORE the one remaining shuffle, whose partial map-side
    min() collapses each task's rows to one 16-long row per doc_id:
    the exchange carries per-(task, doc) partials instead of every
    (doc, shingle-string) pair. Oracle unchanged (it distincts shingle
    STRINGS; min over the hashed multiset is provably equal).
    """
    doc_sh = (
        docs.select("doc_id", tokens().alias("toks"))
        .select("doc_id", F.explode(shingles_of("toks", 3)).alias("s"))
        .select("doc_id", (md5_long(F.col("s")) % MH_P).alias("hp"))
    )
    return doc_sh.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(_mh_coeff(i)[0]) * F.col("hp") + F.lit(_mh_coeff(i)[1]))
                % MH_P
            ).alias(f"mh{i}")
            for i in range(K_MINHASH)
        ]
    )


def _band_keys(mh: DataFrame) -> DataFrame:
    """Signature table → (doc_id, band, bkey) LSH bucket rows."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(":", F.lit(b), F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
            ).alias("bkey"),
        )
        for b in range(N_BANDS)
    ]
    return mh.select("doc_id", F.explode(F.array(*band_structs)).alias("bk")).select(
        "doc_id", "bk.band", "bk.bkey"
    )


@query("dedup_minhash_lsh", oracle=_minhash_lsh_oracle())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH banding (8×2) near-dup candidates.

    Signatures and band buckets are md5-derived (portable); the
    band self-join is the only shuffle that grows with corpus size,
    and bucket keys are 60-bit hashes so buckets stay tiny unless
    documents genuinely collide.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    mh = materialize(
        _minhash_signatures(docs),
        "minhash_signatures",  # consumed by 4 branches (bands a/b, ma, mb)
    )
    bands = _band_keys(mh)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ma = mh.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(K_MINHASH)]
    )
    mb = mh.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(K_MINHASH)]
    )
    eq_sum = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(K_MINHASH)
    )
    est = eq_sum / float(K_MINHASH)
    return (
        pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .filter(est >= EST_MIN)
        .select("doc_a", "doc_b", est.alias("est_sim"))
    )


NEW_BATCH_MOD = 10  # doc_id % 10 == 0 plays "today's ingest batch"


def _incremental_oracle() -> str:
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
      SELECT DISTINCT n.doc_id AS doc_new, c.doc_id AS doc_corpus
      FROM bands n JOIN bands c
        ON n.band = c.band AND n.bkey = c.bkey
      WHERE n.doc_id % {NEW_BATCH_MOD} = 0 AND c.doc_id % {NEW_BATCH_MOD} <> 0
    )
    SELECT doc_new, doc_corpus, ({eq_terms}) / {K_MINHASH}.0 AS est_sim
    FROM pairs
    JOIN mh ma ON ma.doc_id = doc_new
    JOIN mh mb ON mb.doc_id = doc_corpus
    WHERE ({eq_terms}) / {K_MINHASH}.0 >= {EST_MIN}
    """


@query("dedup_incremental", oracle=_incremental_oracle())
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup dedup: match a new ingest batch (doc_id %
    {NEW_BATCH_MOD} == 0 plays today's arrivals) against the existing
    corpus WITHOUT any corpus×corpus work — the shape a daily 100 TB
    ingest actually runs.

    The corpus's minhash signatures are computed once and staged (in
    production they'd be a stored signature table maintained at write
    time); the only join is new-batch bands ⋈ corpus bands — an
    equi-join whose output is bounded by the new batch's match count,
    so daily cost scales with the batch, not the corpus. Same
    md5-portable signatures as dedup_minhash_lsh.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    mh = materialize(
        _minhash_signatures(docs),
        "inc_signatures",  # the "stored signature table"
    )
    bands = _band_keys(mh)
    is_new = F.col("doc_id") % NEW_BATCH_MOD == 0
    bn = bands.filter(is_new).alias("n")
    bc = bands.filter(~is_new).alias("c")
    pairs = (
        bn.join(
            bc,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bkey") == F.col("c.bkey")),
        )
        .select(
            F.col("n.doc_id").alias("doc_new"),
            F.col("c.doc_id").alias("doc_corpus"),
        )
        .distinct()
    )
    ma = mh.select(
        F.col("doc_id").alias("doc_new"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(K_MINHASH)],
    )
    mb = mh.select(
        F.col("doc_id").alias("doc_corpus"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(K_MINHASH)],
    )
    eq_sum = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(K_MINHASH)
    )
    est = eq_sum / float(K_MINHASH)
    return (
        pairs.join(ma, "doc_new")
        .join(mb, "doc_corpus")
        .filter(est >= EST_MIN)
        .select("doc_new", "doc_corpus", est.alias("est_sim"))
    )


# ------------------------------------------------------------ SimHash

SIM_BITS = 16
HAM_MAX = 4


def _simhash_oracle() -> str:
    h = md5_long_sql("tok")
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN cnt ELSE -cnt END) AS b{b}"
        for b in range(SIM_BITS)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIM_BITS)
    )
    nib_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {k} AS band, (simhash >> {4 * k}) & 15 AS nib FROM sim"
        for k in range(4)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, t.tok, COUNT(*) AS cnt
      FROM documents, UNNEST({TOKENS_SQL}) t(tok)
      GROUP BY doc_id, t.tok
    ), hashed AS (
      SELECT doc_id, {h} AS h, cnt FROM toks
    ), bits AS (
      SELECT doc_id,
             {bit_sums}
      FROM hashed GROUP BY doc_id
    ), sim AS (
      SELECT doc_id, {sim_expr} AS simhash FROM bits
    ), bands AS (
      {nib_selects}
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           bit_count(xor(sa.simhash, sb.simhash)) AS hamming
    FROM pairs
    JOIN sim sa ON sa.doc_id = doc_a
    JOIN sim sb ON sb.doc_id = doc_b
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {HAM_MAX}
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit weighted SimHash; nibble-banded candidates; Hamming ≤ 4.

    Candidate pairs share at least one of 4 simhash nibbles at the
    same position (standard Hamming-LSH banding), so the self-join is
    on a (band, nibble) key — bounded buckets, no full cross join.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = (
        docs.select("doc_id", F.explode(F.expr(TOKENS_EXPR)).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    hashed = toks.select("doc_id", F.expr(md5_long_expr("tok")).alias("h"), "cnt")
    bit_aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"b{b}")
        for b in range(SIM_BITS)
    ]
    bits = hashed.groupBy("doc_id").agg(*bit_aggs)
    sim_col = sum(
        F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(0) for b in range(SIM_BITS)
    ).cast("long")
    sim = materialize(
        bits.select("doc_id", sim_col.alias("simhash")),
        "simhash_signatures",  # consumed by bands + both join-back sides
    )
    nib_structs = [
        F.struct(
            F.lit(k).alias("band"),
            F.shiftright("simhash", 4 * k).bitwiseAND(F.lit(15)).alias("nib"),
        )
        for k in range(4)
    ]
    bands = sim.select("doc_id", F.explode(F.array(*nib_structs)).alias("bk")).select(
        "doc_id", "bk.band", "bk.nib"
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sim.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    sb = sim.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(hamming <= HAM_MAX)
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )


# ---------------------------------------------------- edit distance

LEV_PREFIX = 40  # compare bounded prefixes: levenshtein is O(m·n)
LEV_MAX = 10
LEV_END = 8  # chars of the prefix's front/back used as blocking keys


@query(
    "dedup_editdistance",
    oracle=f"""
    WITH d AS (SELECT doc_id, lang, n_chars,
                      substr(text, 1, {LEV_PREFIX}) AS prefix,
                      substr(text, 1, {LEV_END}) AS front_k,
                      substr(substr(text, 1, {LEV_PREFIX}), {LEV_PREFIX - LEV_END + 1}, {LEV_END}) AS back_k
               FROM documents),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.prefix AS pa, b.prefix AS pb
      FROM d a JOIN d b
        ON a.lang = b.lang
       AND (a.n_chars // 50) = (b.n_chars // 50)
       AND a.front_k = b.front_k
       AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id, b.doc_id, a.prefix, b.prefix
      FROM d a JOIN d b
        ON a.lang = b.lang
       AND (a.n_chars // 50) = (b.n_chars // 50)
       AND a.back_k = b.back_k
       AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, levenshtein(pa, pb) AS edit_dist
    FROM cand
    WHERE levenshtein(pa, pb) <= {LEV_MAX}
    """,
)
def dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs on bounded prefixes, with bounded
    blocks.

    Round-2 blocked on (lang, length-bucket) only — block-quadratic at
    scale (an ('en', bucket) block is millions of docs at 100 TB).
    Now a candidate pair must ALSO agree on the prefix's first
    {LEV_END} chars OR its last {LEV_END} chars (two equi-joins,
    UNION-deduped): a ≤{LEV_MAX}-edit pair that leaves either end of
    the 40-char prefix untouched is caught, and the blocking key
    cardinality now scales with the corpus instead of with
    #langs × #length-buckets. Known recall trade (standard in record
    linkage): edits touching both ends are missed — the oracle
    mirrors the same blocking, so the gate is exact. Exact duplicates
    (which collide on every key) are removed by dedup_exact first in
    a real pipeline.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "lang",
        (F.col("n_chars") / 50).cast("long").alias("len_bucket"),
        F.substring("text", 1, LEV_PREFIX).alias("prefix"),
        F.substring("text", 1, LEV_END).alias("front_k"),
        F.substring(
            F.substring("text", 1, LEV_PREFIX), LEV_PREFIX - LEV_END + 1, LEV_END
        ).alias("back_k"),
    )
    a = d.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"),
        F.col("len_bucket").alias("lb_a"), F.col("prefix").alias("pa"),
        F.col("front_k").alias("fk_a"), F.col("back_k").alias("bk_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
        F.col("len_bucket").alias("lb_b"), F.col("prefix").alias("pb"),
        F.col("front_k").alias("fk_b"), F.col("back_k").alias("bk_b"),
    )
    base = (
        (F.col("lang_a") == F.col("lang_b"))
        & (F.col("lb_a") == F.col("lb_b"))
        & (F.col("doc_a") < F.col("doc_b"))
    )
    cols = ["doc_a", "doc_b", "pa", "pb"]
    front = a.join(b, base & (F.col("fk_a") == F.col("fk_b"))).select(*cols)
    back = a.join(b, base & (F.col("bk_a") == F.col("bk_b"))).select(*cols)
    cand = front.union(back).distinct()
    lev = F.levenshtein("pa", "pb")
    return (
        cand.filter(lev <= LEV_MAX)
        .select("doc_a", "doc_b", lev.cast("int").alias("edit_dist"))
    )


# -------------------------------------------- connected components


ORACLE_MAX_COMPONENT = 256


def _cc_labels_ctes() -> str:
    """CTE chain (for a ``WITH RECURSIVE`` prologue) ending in
    ``labels(node, label)`` — the connected-component labeling of the
    MinHash-LSH near-dup pair graph. ONE definition shared by the
    ``dedup_clusters`` and ``dedup_canonical_select`` oracles so the
    two can never drift."""
    return f"""pairsrc AS (
      SELECT doc_a, doc_b FROM ({_minhash_lsh_oracle()})
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairsrc
      UNION
      SELECT doc_b AS a, doc_a AS b FROM pairsrc
    ), reach(node, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.dst
    ), labels AS (
      SELECT node, LEAST(node, MIN(dst)) AS label FROM reach GROUP BY node
    )"""


def _clusters_oracle() -> str:
    """Connected components as a recursive CTE: transitive closure of
    the (tiny, near-dup) pair graph, label = component minimum. The
    UNION dedups the frontier so the recursion terminates; component
    sizes are bounded by duplicate-cluster size, not corpus size.

    The closure is O(k²) rows per k-node component, so the oracle
    GUARDS that assumption (ADVICE r3): a component larger than
    ORACLE_MAX_COMPONENT makes the oracle fail loudly via error()
    instead of silently exploding the recursion. (The Spark side has
    no such bound — label propagation carries one label per node
    regardless of component size.)"""
    return f"""
    WITH RECURSIVE {_cc_labels_ctes()}, guarded AS (
      SELECT label AS cluster_id,
             MIN(node) AS rep_doc,
             COUNT(*) AS cluster_size
      FROM labels
      GROUP BY label
    )
    SELECT cluster_id, rep_doc,
           CASE WHEN cluster_size > {ORACLE_MAX_COMPONENT}
                THEN CAST(error('dedup_clusters oracle: component exceeds '
                                || '{ORACLE_MAX_COMPONENT} nodes; the O(k^2) '
                                || 'transitive-closure oracle is not sized for '
                                || 'this graph') AS BIGINT)
                ELSE cluster_size END AS cluster_size
    FROM guarded
    """


def _cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(node, label) connected-component labels over the MinHash-LSH
    near-dup pair graph by iterative min-label propagation — the
    engine-side mirror of :func:`_cc_labels_ctes`, shared by
    ``dedup_clusters`` and ``dedup_canonical_select``.

    Each iteration is two shuffle joins (label lookup across edges +
    min-aggregate); convergence is checked with a driver-side count
    of changed labels. At 100 TB this is the standard Pregel-style
    CC-on-DataFrames; iterations are bounded by graph diameter,
    which is tiny for near-dup clusters.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    edges = materialize(
        pairs.union(pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))),
        "cc_edges",
    )
    labels = materialize(
        edges.select(F.col("doc_a").alias("node")).distinct()
        .withColumn("label", F.col("node")),
        "cc_labels",
    )
    for _ in range(10):  # diameter bound; near-dup clusters are shallow
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.node)
            .groupBy(F.col("doc_a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = materialize(new_labels, "cc_labels_next")
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = materialize(new_labels, "cc_labels")
        if changed == 0:
            break
    return labels


@query("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS: connected components over the MinHash-LSH
    near-dup pair graph (see :func:`_cc_labels` for the propagation
    loop and its scale shape)."""
    labels = _cc_labels(spark, sf_dir)
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("cluster_size"), F.min("node").alias("rep_doc"))
        .select(F.col("label").alias("cluster_id"), "rep_doc", "cluster_size")
    )


def _cluster_size_histogram_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_labels_ctes()}, sizes AS (
      SELECT label, COUNT(*) AS cluster_size FROM labels GROUP BY label
    )
    SELECT cluster_size, COUNT(*) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS docs_covered
    FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """


@query("dedup_cluster_size_histogram", oracle=_cluster_size_histogram_oracle())
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster SIZE distribution (round 6) — the audit a
    curation run reads BEFORE choosing removal policy: a corpus whose
    duplicate mass sits in a few giant clusters needs template/
    boilerplate removal (cluster-level ops), while a long tail of
    small clusters is what pairwise canonical-select handles.
    One row per observed cluster size with the cluster count and the
    document mass it covers.

    Scale: reuses the shared CC labels (ONE definition with
    dedup_clusters/dedup_canonical_select — they cannot drift); the
    two aggregates beyond the label table are bounded by cluster
    count, then by distinct cluster SIZES. The PLANS.md sweep
    measures the label machinery linear to 100× with output exactly
    10×/decade.
    """
    labels = _cc_labels(spark, sf_dir)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("docs_covered"),
        )
        .orderBy("cluster_size")
    )


def _canonical_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_labels_ctes()}, joined AS (
      SELECT l.label, d.doc_id, d.n_chars
      FROM labels l JOIN documents d ON d.doc_id = l.node
    ), agg AS (
      SELECT label AS cluster_id,
             arg_max(doc_id, n_chars * 10000000 - doc_id) AS canonical_doc,
             CAST(COUNT(*) AS BIGINT) AS cluster_size,
             CAST(COUNT(*) - 1 AS BIGINT) AS removed_docs,
             CAST(SUM(n_chars)
                  - arg_max(n_chars, n_chars * 10000000 - doc_id)
               AS BIGINT) AS removed_chars
      FROM joined GROUP BY label
    )
    SELECT cluster_id, canonical_doc,
           CASE WHEN cluster_size > {ORACLE_MAX_COMPONENT}
                THEN CAST(error('dedup_canonical_select oracle: component '
                                || 'exceeds {ORACLE_MAX_COMPONENT} nodes; the '
                                || 'O(k^2) closure oracle is not sized for '
                                || 'this graph') AS BIGINT)
                ELSE cluster_size END AS cluster_size,
           removed_docs, removed_chars
    FROM agg
    """


@query("dedup_canonical_select", oracle=_canonical_oracle())
def dedup_canonical_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-representative selection per duplicate cluster — the
    step that turns the near-dup GRAPH into an actionable removal
    list: keep the longest document (tiebreak: smallest doc_id) of
    every connected component, drop the rest. Reports per cluster the
    canonical doc, the removal count, and the characters removed —
    the numbers a curation run logs before rewriting the corpus.

    The keep-rule is one integer composite (n_chars·10⁷ − doc_id,
    exact at any corpus scale since doc_id < 10⁷ here and max_by is
    order-exact on int64), so both engines pick identical
    representatives. Scale shape: labels are bounded by near-dup
    GRAPH nodes (≪ corpus), broadcast onto the documents scan; the
    per-cluster aggregate is one exchange on the label key.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labels = _cc_labels(spark, sf_dir)
    score = (F.col("n_chars") * F.lit(10000000) - F.col("doc_id")).alias("score")
    return (
        docs.join(F.broadcast(labels), docs.doc_id == labels.node)
        .select(F.col("label"), "doc_id", "n_chars", score)
        .groupBy("label")
        .agg(
            F.max_by("doc_id", "score").alias("canonical_doc"),
            F.count(F.lit(1)).cast("long").alias("cluster_size"),
            (F.count(F.lit(1)) - 1).cast("long").alias("removed_docs"),
            (F.sum("n_chars") - F.max_by("n_chars", "score"))
            .cast("long")
            .alias("removed_chars"),
        )
        .select(
            F.col("label").alias("cluster_id"),
            "canonical_doc",
            "cluster_size",
            "removed_docs",
            "removed_chars",
        )
    )


# --------------------------------------------------------- embedding

COS_MIN = 0.9  # production near-dup threshold (cos >= 0.9, angle <= 26°)
# The registered QUERY runs at a lower threshold: the synthetic
# embeddings are near-orthogonal random vectors whose max pairwise
# cosine is ~0.51 at every SF, so COS_MIN=0.9 would validate only the
# empty result (round-4 audit: 0 rows at sf0.001/0.01/0.1 — a
# trivially-green oracle). 0.45 emits a real pair set, so the bucket
# join, pair dedup, and cosine filter are all value-checked end to
# end; semantics are threshold-independent and both engines apply the
# identical dial.
COS_MIN_QUERY = 0.45
EMB_LSH_TABLES = 8  # recall for cos>=0.9 pairs: 1-(1-0.857^4)^8 ≈ 0.998
EMB_LSH_PLANES = 4
EMB_SALT = "emb"


def _dedup_embedding_oracle() -> str:
    from mallard_spark.operators.similarity import QUANT_VEC_SQL, lsh_bucket_sql

    bands = "\n      UNION ALL\n      ".join(
        f"SELECT vec_id, {t} AS tbl, ({lsh_bucket_sql(EMB_SALT, t, EMB_LSH_PLANES)}) AS bucket FROM q"
        for t in range(EMB_LSH_TABLES)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
      SELECT vec_id, {QUANT_VEC_SQL} AS qv FROM e
    ), bands AS (
      {bands}
    ), pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
    FROM pairs
    JOIN e ea ON ea.vec_id = id_a
    JOIN e eb ON eb.vec_id = id_b
    WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= {COS_MIN_QUERY}
    """


def dedup_embedding(
    spark: SparkSession, sf_dir: str, cos_min: float = COS_MIN
) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked on random-hyperplane
    LSH buckets (shared with similarity._lsh_buckets).

    Candidate pairs share at least one of L=8 4-bit hyperplane-sign
    buckets; exact cosine (6 dp) then filters at ``cos_min``
    (production default COS_MIN=0.9; the registered query runs at
    COS_MIN_QUERY so the synthetic near-orthogonal corpus yields a
    non-empty, value-checked pair set). For true
    near-dups (cos ≥ 0.9, angle ≤ 26°) a 4-bit table agrees with
    p ≈ 0.857⁴ ≈ 0.54, so 8 tables miss a pair with p ≈ 0.2 % —
    and the DuckDB oracle reproduces the exact same buckets
    (integer-quantized dot products, md5-derived planes), so the
    gate compares identical candidate sets bit-for-bit.

    Scale: the per-bucket self-join is Σ|bucket|², so bucket size is
    the knob — planes-per-table should grow as log2(n / target
    bucket size), and exact dups (which all collide by construction)
    are removed by dedup_exact FIRST in a real pipeline
    (pipeline_clean_corpus shows the composition). This replaces the
    round-2 label blocking (cardinality ~10 → O(n²/10) at scale).
    """
    from mallard_spark.operators.similarity import _lsh_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
    bands = _lsh_buckets(
        vecs, n_tables=EMB_LSH_TABLES, n_planes=EMB_LSH_PLANES, salt=EMB_SALT
    ).select("vec_id", "tbl", "bucket")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    # Round 15: unrolled-codegen cosine — this is a corpus-pair-sized
    # candidate set (every distinct bucket-collision pair pays the
    # cosine), the regime where the bigger plan amortizes: paired
    # A/B at sf0.1 fold 3.32 s → 2.62 s, bit-identical values
    # (see functions/vectors.dot64).
    cos = cosine6_unrolled(F.col("va"), F.col("vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= cos_min)
    )


@query("dedup_embedding", oracle=_dedup_embedding_oracle())
def _dedup_embedding_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered variant of :func:`dedup_embedding` at COS_MIN_QUERY:
    the synthetic corpus tops out at cosine ~0.51, so the production
    0.9 dial would validate only the empty result — the looser dial is
    passed EXPLICITLY here so API callers keep the production default."""
    return dedup_embedding(spark, sf_dir, cos_min=COS_MIN_QUERY)


# ------------------------------------------- duplicated-window share

SSW_W = 16  # tokens per window
SSW_STRIDE = 8


@query(
    "dedup_substring_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
      WHERE len({TOKENS_SQL}) >= {SSW_W}
    ), win AS (
      SELECT doc_id,
             md5(array_to_string(toks[u.s:u.s + {SSW_W - 1}], ' ')) AS wkey
      FROM t, UNNEST(range(1, len(toks) - {SSW_W - 2}, {SSW_STRIDE})) u(s)
    ), df AS (
      SELECT wkey, COUNT(DISTINCT doc_id) AS n_docs FROM win GROUP BY wkey
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           round(SUM(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END)
                 / COUNT(*), 6) AS dup_frac
    FROM win w JOIN df ON w.wkey = df.wkey
    GROUP BY w.doc_id
    """,
)
def dedup_substring_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication share: {SSW_W}-token windows every
    {SSW_STRIDE} tokens, content-addressed; a window appearing in ≥2
    distinct documents is "duplicated text", and each doc reports the
    fraction of its windows that are — the window-granular repetition
    metric behind exact-substring dedup (train-set memorization risk),
    without a suffix array.

    Plan: one narrow explode pass staged to parquet (windows ~16 B
    hash/row), a distinct-doc-count per window hash (one shuffle,
    map-side partial), and a hash-keyed join back — everything keys
    on the window md5, so work is linear in corpus size at 100 TB.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    win = materialize(
        docs.select("doc_id", tokens().alias("toks"))
        .filter(F.size("toks") >= SSW_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(1, size(toks) - {SSW_W - 1}, {SSW_STRIDE})")
            ).alias("s"),
            "toks",
        )
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.expr(f"slice(toks, s, {SSW_W})"))).alias("wkey"),
        ),
        "ssw_windows",
    )
    # Round 15: the dup test only needs "≥ 2 distinct docs", which is
    # exactly min(doc_id) != max(doc_id) — plain partial-combining
    # min/max instead of COUNT(DISTINCT)'s two-phase distinct
    # machinery over the corpus-sized window stream (identical output;
    # paired at 10×: 1.68 vs 1.76 s, equal at sf0.1).
    df_cnt = win.groupBy("wkey").agg(
        (F.min("doc_id") != F.max("doc_id")).alias("is_dup")
    )
    hit = (
        win.join(df_cnt, "wkey")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0)).alias("n_dup_windows"),
        )
    )
    return hit.select(
        "doc_id",
        F.col("n_windows").cast("long").alias("n_windows"),
        F.col("n_dup_windows").cast("long").alias("n_dup_windows"),
        F.round(F.col("n_dup_windows") / F.col("n_windows"), 6).alias("dup_frac"),
    )


@query(
    "dup_rate_by_source",
    oracle=f"""
    WITH pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_lsh_oracle()})
    ), dup_docs AS (
      SELECT doc_a AS doc_id FROM pairs
      UNION
      SELECT doc_b AS doc_id FROM pairs
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(COUNT(dd.doc_id) AS BIGINT) AS n_near_dup,
           round(COUNT(dd.doc_id) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_rate
    FROM documents d LEFT JOIN dup_docs dd ON dd.doc_id = d.doc_id
    GROUP BY d.source
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source near-duplication rate: the curation dashboard view
    of the MinHash-LSH pair graph — which ingest source is feeding
    duplicates into the corpus.

    Plan shape at 100 TB: the pair graph is bounded by near-dup
    density (orders of magnitude under corpus size), so the distinct
    doc set derived from it broadcasts back onto the documents scan —
    one corpus pass, one agg by source, no corpus shuffle.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    dup_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    docs = load_table(spark, sf_dir, "documents")
    joined = docs.join(F.broadcast(dup_docs), "doc_id", "left")
    return joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long").alias("n_near_dup"),
        F.round(
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            / F.count("*").cast("double"),
            6,
        ).alias("dup_rate"),
    )


# SemDeDup-style cluster blocking: k=|corpus|/SEM_STRIDE seeded
# centroids; pair work is bounded by cluster size (the SemDeDup
# recipe — Abbas et al. 2023 — at 100 TB you Lloyd-train the
# centroids; assignment/pair shape is identical).
SEM_STRIDE = 40
SEM_IDX_MOD = 1000  # centroid-index tiebreak field; requires < 1000 centroids
# Pair threshold for the registered query: cluster blocking admits
# fewer candidates than 8-table LSH, so 0.45 validates only 1-2
# pairs at small SF; 0.35 validates 56/555 pairs at sf0.01/sf0.1
# while staying selective (corpus pairs cluster around cos ~0).
SEM_COS_MIN = 0.35


def _dedup_semantic_oracle() -> str:
    sim_micro = (
        "CAST(ROUND(round(list_cosine_similarity(e.v, c.c), 6) * 1000000) AS BIGINT)"
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    c AS (
      SELECT vec_id // {SEM_STRIDE} AS cidx, v AS c FROM e
      WHERE vec_id % {SEM_STRIDE} = 0
    ),
    asg AS (
      SELECT e.vec_id AS vec_id,
             MIN((1000000 - {sim_micro}) * {SEM_IDX_MOD} + c.cidx)
               % {SEM_IDX_MOD} AS cluster
      FROM e, c GROUP BY e.vec_id
    )
    SELECT a.cluster AS cluster, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim
    FROM asg a
    JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
    JOIN e ea ON ea.vec_id = a.vec_id
    JOIN e eb ON eb.vec_id = b.vec_id
    WHERE round(list_cosine_similarity(ea.v, eb.v), 6) >= {SEM_COS_MIN}
    """


@query("dedup_semantic_kmeans", oracle=_dedup_semantic_oracle())
def dedup_semantic_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: block pair generation by
    NEAREST-CENTROID cluster (vs dedup_embedding's hyperplane-LSH
    buckets) and emit within-cluster pairs above the cosine
    threshold. Cluster assignment is an integer argmin
    (MIN((1e6−sim_micro)·1000+idx)) over a BROADCAST centroid set —
    exact, engine-portable, map-side-combinable; pair cost is
    Σ|cluster|², the dial SemDeDup tunes via k.

    The registered query uses a synthetic-corpus threshold
    (SEM_COS_MIN, same rationale as dedup_embedding) and seeded
    centroids; production would Lloyd-train them (knn_ivf_kmeans
    shows the exact-training machinery) and raise the threshold to
    the paper's ~0.95.
    """
    from mallard_spark.operators.similarity import cosine6 as _cos6

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double("embedding").alias("v"))
    cents = vecs.filter(F.col("vec_id") % SEM_STRIDE == 0).select(
        (F.col("vec_id") / SEM_STRIDE).cast("long").alias("cidx"),
        F.col("v").alias("c"),
    )
    sim_micro = F.round(_cos6(F.col("v"), F.col("c")) * 1_000_000).cast("long")
    asg = (
        vecs.join(F.broadcast(cents))
        .select(
            "vec_id",
            ((F.lit(1_000_000) - sim_micro) * SEM_IDX_MOD + F.col("cidx")).alias(
                "comb"
            ),
        )
        .groupBy("vec_id")
        .agg((F.min("comb") % SEM_IDX_MOD).alias("cluster"))
    )
    a = asg.select(F.col("cluster"), F.col("vec_id").alias("id_a"))
    b = asg.select(F.col("cluster"), F.col("vec_id").alias("id_b"))
    va = vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "cluster", "id_a", "id_b", _cos6(F.col("va"), F.col("vb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= SEM_COS_MIN)
    )


def _minhash_accuracy_oracle() -> str:
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
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), eq AS (
      SELECT doc_a, doc_b, ({eq_terms}) AS n_equal
      FROM pairs
      JOIN mh ma ON ma.doc_id = doc_a
      JOIN mh mb ON mb.doc_id = doc_b
    ), jac AS (
      SELECT e.n_equal,
             len(list_intersect(sa.shingles, sb.shingles)) * 1000000
               // (len(sa.shingles) + len(sb.shingles)
                   - len(list_intersect(sa.shingles, sb.shingles))) AS jac_ppm
      FROM eq e
      JOIN sh sa ON sa.doc_id = e.doc_a
      JOIN sh sb ON sb.doc_id = e.doc_b
    )
    SELECT CAST(n_equal AS BIGINT) AS n_equal,
           COUNT(*) AS n_pairs,
           CAST(n_equal AS BIGINT) * 62500 AS est_ppm,
           CAST(SUM(jac_ppm) AS DOUBLE) / COUNT(*) AS avg_jaccard_ppm,
           CAST(SUM(ABS(n_equal * 62500 - jac_ppm)) AS DOUBLE) / COUNT(*)
               AS avg_abs_err_ppm
    FROM jac GROUP BY n_equal ORDER BY n_equal
    """


@query("minhash_accuracy_report", oracle=_minhash_accuracy_oracle())
def minhash_accuracy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator quality audit: for every LSH candidate pair,
    compare the 16-perm similarity ESTIMATE against the EXACT
    3-shingle Jaccard, grouped by estimator value — the calibration
    table that justifies (or retunes) EST_MIN and the band layout.
    All error arithmetic is integer ppm (est = n_equal·62500 exactly;
    jaccard = |∩|·1e6 div |∪|), so the report is bit-stable and fully
    value-oracled — unlike a sampled spot check.

    Scale shape: pairs come from the same banded equi-join as
    dedup_minhash_lsh; the exact-Jaccard pass touches only CANDIDATE
    pairs (bounded by band collisions), never all pairs.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    sh = materialize(
        docs.select("doc_id", tokens().alias("toks"))
        .select("doc_id", F.array_distinct(shingles_of("toks", 3)).alias("shingles"))
        .filter(F.size("shingles") > 0),
        "minhash_acc_shingles",
    )
    mh = materialize(_minhash_signatures(docs), "minhash_acc_signatures")
    bands = _band_keys(mh)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ma = mh.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(K_MINHASH)],
    )
    mb = mh.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(K_MINHASH)],
    )
    n_equal = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(K_MINHASH)
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac_ppm = F.expr(
        "cast(size(array_intersect(sh_a, sh_b)) as bigint) * 1000000 div "
        "(size(sh_a) + size(sh_b) - size(array_intersect(sh_a, sh_b)))"
    )
    scored = (
        pairs.join(ma, "doc_a")
        .join(mb, "doc_b")
        .select("doc_a", "doc_b", n_equal.alias("n_equal"))
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("n_equal", jac_ppm.alias("jac_ppm"))
    )
    err = F.abs(F.col("n_equal") * 62500 - F.col("jac_ppm"))
    return (
        scored.groupBy(F.col("n_equal").cast("long").alias("n_equal"))
        .agg(
            F.count("*").alias("n_pairs"),
            (F.sum("jac_ppm").cast("double") / F.count("*")).alias("avg_jaccard_ppm"),
            (F.sum(err).cast("double") / F.count("*")).alias("avg_abs_err_ppm"),
        )
        .withColumn("est_ppm", F.col("n_equal") * 62500)
        .select("n_equal", "n_pairs", "est_ppm", "avg_jaccard_ppm", "avg_abs_err_ppm")
        .orderBy("n_equal")
    )


def _leakage_safe_oracle() -> str:
    return f"""
    WITH RECURSIVE {_cc_labels_ctes()}, g AS (
      SELECT d.doc_id, d.n_chars,
             COALESCE(l.label, d.doc_id) AS grp,
             CASE WHEN l.label IS NULL THEN 0 ELSE 1 END AS clustered
      FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
    )
    SELECT CASE WHEN {md5_long_sql("CAST(grp AS VARCHAR)")} % 100 < 80
                THEN 'train'
                WHEN {md5_long_sql("CAST(grp AS VARCHAR)")} % 100 < 90
                THEN 'valid' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(clustered) AS BIGINT) AS n_clustered_docs,
           COUNT(DISTINCT grp) AS n_groups,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM g GROUP BY 1 ORDER BY split
    """


@query("split_leakage_safe", oracle=_leakage_safe_oracle())
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split: documents are bucketed by
    their near-dup CLUSTER (connected component of the MinHash-LSH
    pair graph; singletons bucket by their own doc_id), so two
    near-duplicates can never straddle the train/test boundary — the
    split-level companion to decontamination (a test doc whose
    near-twin sits in train leaks just as surely as an exact copy).
    Routing is the same content-addressed md5 bucketing as
    split_train_test: reproducible at any partitioning, on any
    engine. Reports per split the doc count, how many docs ride a
    cluster assignment, the group count, and the character mass.

    Scale: reuses the shared CC labels (ONE definition with
    dedup_clusters — they cannot drift; measured linear to 100× in
    PLANS.md); beyond the label table this is one left join keyed on
    doc_id plus a 3-row aggregate — the join is corpus ⋈
    cluster-membership (near-dup-bounded, usually ≪ corpus), and
    the split itself adds NO shuffle: the bucket is a per-row hash.
    """
    labels = _cc_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    g = (
        docs.join(labels, docs.doc_id == labels.node, "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("label", "doc_id").alias("grp"),
            F.when(F.col("label").isNull(), 0).otherwise(1).alias("clustered"),
        )
    )
    bucket = md5_long(F.col("grp").cast("string")) % 100
    return (
        g.withColumn(
            "split",
            F.when(bucket < 80, "train")
            .when(bucket < 90, "valid")
            .otherwise("test"),
        )
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("clustered").cast("long").alias("n_clustered_docs"),
            F.countDistinct("grp").alias("n_groups"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("split")
    )


@query(
    "dedup_cross_source_priority",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS kept_docs,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY md5(text)
               ORDER BY source ASC, doc_id ASC
             ) AS rn
      FROM documents
    )
    WHERE rn = 1
    GROUP BY source
    ORDER BY source
    """,
)
def dedup_cross_source_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-source EXACT dedup keeping the highest-priority copy —
    the pretraining-mix recipe (FineWeb/Dolma style): when the same
    text appears in several ingest sources, keep the copy from the
    most-trusted source (priority = source name rank here; a real
    deployment passes an explicit priority table) and count what each
    source contributes AFTER the cross-source pass.

    Plan shape at 100 TB: one md5 per document (no text shuffle — the
    window partitions by the 128-bit digest, so only (hash, source,
    doc_id, n_chars) tuples move), one hash-partitioned window to pick
    the winner, one partial-aggregated rollup. Digest collisions are
    the cryptographic-hash risk every exact-dedup pipeline accepts.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", F.md5("text").alias("h")
    )
    # asc_nulls_last matches DuckDB's default ASC ordering (Spark's
    # plain asc sorts NULLS FIRST — a NULL source/doc_id would pick a
    # different winner than the oracle)
    w = Window.partitionBy("h").orderBy(
        F.col("source").asc_nulls_last(), F.col("doc_id").asc_nulls_last()
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("kept_docs"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("source")
    )

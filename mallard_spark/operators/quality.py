"""Published quality-filter rule sets over the documents corpus:
Gopher rules (Rae et al. 2021, §A1.1) and C4 rules (Raffel et al.
2020, §2.2) — the two heuristic batteries every large text-corpus
curation pipeline starts from.

Both operators are single-scan column-expression plans (no UDF, no
shuffle until the final per-source aggregate), so at 100 TB they
cost one pass like a count. The Gopher mean-word-length and ratio
rules are rewritten as EXACT integer comparisons (``3·n ≤ chars ≤
10·n`` instead of ``3 ≤ chars/n ≤ 10``) so the whole report is
int64 and value-oracles bit-for-bit with no float tolerance.

C4's rules are line-structural (terminal punctuation, words per
line, brace/boilerplate markers) and the synthetic corpus is a flat
lowercase word stream, so — exactly like the URL fixture in
``operators/web.py`` and the fake codec in ``multimodal/binary.py``
— each doc derives a deterministic LINE STRUCTURE from its token
array (doc_id-keyed line lengths, punctuation, injected ``lorem
ipsum`` / code-brace lines). The rule ENGINE is the real operator;
the fixture just gives it engine-reproducible input that exercises
every rule, and the DuckDB oracle re-derives it bit-for-bit.

Reference parity: Mallard runs arbitrary DuckDB SQL over Flight
tickets (/root/reference/flight_server.py:342 ``do_get``); a
Mallard user would express these filters as SQL — the oracles below
are that SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.functions.text import TOKENS_EXPR, TOKENS_SQL
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

# Gopher word-count bounds (the paper uses 50..100k; the synthetic
# docs run ~10..100 words, so the LOW bound is scaled to keep both
# branches of every rule populated — the comparison logic is the op).
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL = 3  # mean word length in [3, 10]
GOPHER_MAX_MWL = 10
GOPHER_MIN_STOP = 2  # ≥ 2 distinct English stopwords
_STOP = "('the','a','of','and','to','in','is','that','with','for')"


def gopher_flags(docs: DataFrame, extra: tuple = ()) -> DataFrame:
    """(source, *extra, ok_words, ok_mwl, ok_stop, ok_alpha) per
    document — pure column expressions (streaming-safe:
    ``stream_quality_filter`` applies the identical flags per
    micro-batch; ``curation_dashboard`` threads doc identity through
    ``extra``)."""
    scored = docs.select(
        "source",
        *extra,
        F.expr(f"size({TOKENS_EXPR})").alias("n"),
        F.expr(
            f"cast(aggregate(transform({TOKENS_EXPR}, t -> length(t)),"
            f" 0L, (acc, x) -> acc + x) as bigint)"
        ).alias("chars"),
        F.expr(
            f"size(filter(array_distinct({TOKENS_EXPR}), t -> t IN {_STOP}))"
        ).alias("n_stop"),
        F.expr(f"size(filter({TOKENS_EXPR}, t -> t rlike '[a-z]'))").alias("n_alpha"),
    )
    return scored.select(
        "source",
        *scored.columns[1 : 1 + len(extra)],  # extra by OUTPUT name
        F.when(
            (F.col("n") >= GOPHER_MIN_WORDS) & (F.col("n") <= GOPHER_MAX_WORDS), 1
        ).otherwise(0).alias("ok_words"),
        F.when(
            (F.col("chars") >= GOPHER_MIN_MWL * F.col("n"))
            & (F.col("chars") <= GOPHER_MAX_MWL * F.col("n")),
            1,
        ).otherwise(0).alias("ok_mwl"),
        F.when(F.col("n_stop") >= GOPHER_MIN_STOP, 1).otherwise(0).alias("ok_stop"),
        F.when(10 * F.col("n_alpha") >= 8 * F.col("n"), 1).otherwise(0).alias("ok_alpha"),
    )


@query(
    "quality_gopher_rules",
    oracle=f"""
    WITH scored AS (
      SELECT source,
             len({TOKENS_SQL}) AS n,
             CAST(list_aggregate(list_transform({TOKENS_SQL}, t -> length(t)),
                                 'sum') AS BIGINT) AS chars,
             len(list_filter(list_distinct({TOKENS_SQL}),
                             t -> t IN {_STOP})) AS n_stop,
             len(list_filter({TOKENS_SQL},
                             t -> regexp_matches(t, '[a-z]'))) AS n_alpha
      FROM documents
    ), flags AS (
      SELECT source,
             CASE WHEN n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS}
                  THEN 1 ELSE 0 END AS ok_words,
             CASE WHEN chars >= {GOPHER_MIN_MWL} * n
                   AND chars <= {GOPHER_MAX_MWL} * n
                  THEN 1 ELSE 0 END AS ok_mwl,
             CASE WHEN n_stop >= {GOPHER_MIN_STOP} THEN 1 ELSE 0 END AS ok_stop,
             CASE WHEN 10 * n_alpha >= 8 * n THEN 1 ELSE 0 END AS ok_alpha
      FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(ok_words) AS BIGINT) AS pass_word_count,
           CAST(SUM(ok_mwl) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(ok_stop) AS BIGINT) AS pass_stopwords,
           CAST(SUM(ok_alpha) AS BIGINT) AS pass_alpha_frac,
           CAST(SUM(ok_words * ok_mwl * ok_stop * ok_alpha) AS BIGINT) AS pass_all
    FROM flags GROUP BY source ORDER BY source
    """,
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery per source: word-count bounds, mean word
    length in [3, 10], ≥2 distinct stopwords, ≥80% alphabetic words
    — each rule an EXACT integer comparison (mean-word-length is
    ``3n ≤ chars ≤ 10n``, alpha fraction is ``10·n_alpha ≥ 8·n``),
    so the report is pure int64. One scan, one partial-combined
    per-source aggregate; every rule is a codegen column expression.
    """
    flags = gopher_flags(load_table(spark, sf_dir, "documents"))
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("ok_words").cast("long").alias("pass_word_count"),
            F.sum("ok_mwl").cast("long").alias("pass_mean_word_len"),
            F.sum("ok_stop").cast("long").alias("pass_stopwords"),
            F.sum("ok_alpha").cast("long").alias("pass_alpha_frac"),
            F.sum(
                F.col("ok_words") * F.col("ok_mwl") * F.col("ok_stop") * F.col("ok_alpha")
            ).cast("long").alias("pass_all"),
        )
        .orderBy("source")
    )


# --- C4 line-structure fixture --------------------------------------
#
# Deterministic per-doc line derivation (mirrored verbatim in the
# oracle): tokens are chunked into lines of ``4 + doc_id % 5`` words;
# line i of doc d ends with '.' when (d + i) % 4 ∈ {1, 2}, with '?'
# when 3, and UNPUNCTUATED when 0 (the C4 terminal-punctuation rule
# has real work to do). Docs with d % 13 == 0 get a code-brace line
# appended; docs with d % 17 == 0 get a 'lorem ipsum' line appended
# (both doc-level drop markers in C4).

_LINES_EXPR = (
    f"CASE WHEN size({TOKENS_EXPR}) = 0 THEN array() ELSE "
    f"transform(sequence(0, cast(ceil(size({TOKENS_EXPR}) / (4 + doc_id % 5)) as int) - 1),"
    f" i -> concat(concat_ws(' ', slice({TOKENS_EXPR}, i * (4 + doc_id % 5) + 1,"
    f" 4 + doc_id % 5)),"
    f" CASE (doc_id + i) % 4 WHEN 1 THEN '.' WHEN 2 THEN '.'"
    f" WHEN 3 THEN '?' ELSE '' END)) END"
)
_LINES_SQL = (
    f"CASE WHEN len({TOKENS_SQL}) = 0 THEN [] ELSE "
    f"list_transform(range(0, CAST(ceil(len({TOKENS_SQL}) / (4 + doc_id % 5)) AS INT)),"
    f" i -> array_to_string(({TOKENS_SQL})[i * (4 + doc_id % 5) + 1 :"
    f" (i + 1) * (4 + doc_id % 5)], ' ') ||"
    f" CASE (doc_id + i) % 4 WHEN 1 THEN '.' WHEN 2 THEN '.'"
    f" WHEN 3 THEN '?' ELSE '' END) END"
)
_BRACE_LINE = "function f() { return 1; }"
_LOREM_LINE = "lorem ipsum dolor sit amet."


@query(
    "quality_c4_rules",
    oracle=f"""
    WITH staged AS (
      SELECT doc_id, source,
             list_concat(list_concat(
               {_LINES_SQL},
               CASE WHEN doc_id % 13 = 0 THEN ['{_BRACE_LINE}']
                    ELSE CAST([] AS VARCHAR[]) END),
               CASE WHEN doc_id % 17 = 0 THEN ['{_LOREM_LINE}']
                    ELSE CAST([] AS VARCHAR[]) END
             ) AS lines
      FROM documents
    ), scored AS (
      SELECT doc_id, source, len(lines) AS lines_in,
             list_filter(lines, l ->
               regexp_matches(l, '[.!?]$')
               AND len(regexp_extract_all(l, '\\S+')) >= 3) AS kept,
             CASE WHEN len(list_filter(lines, l ->
                    contains(l, '{{') OR contains(l, 'lorem ipsum'))) > 0
                  THEN 1 ELSE 0 END AS has_marker
      FROM staged
    ), flagged AS (
      SELECT doc_id, source, lines_in, len(kept) AS lines_kept,
             CAST(list_aggregate(list_transform(kept, l -> length(l)), 'sum')
                  AS BIGINT) AS chars_kept,
             CASE WHEN has_marker = 0 AND len(kept) >= 5 THEN 1 ELSE 0 END AS doc_kept
      FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs_in,
           CAST(SUM(doc_kept) AS BIGINT) AS docs_kept,
           CAST(SUM(lines_in) AS BIGINT) AS lines_in,
           CAST(SUM(CASE WHEN doc_kept = 1 THEN lines_kept ELSE 0 END) AS BIGINT)
             AS lines_kept,
           CAST(SUM(CASE WHEN doc_kept = 1 THEN COALESCE(chars_kept, 0) ELSE 0 END)
                AS BIGINT) AS chars_kept
    FROM flagged GROUP BY source ORDER BY source
    """,
)
def quality_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 rule battery per source over the deterministic line fixture:
    keep lines ending in terminal punctuation with ≥3 words; drop
    docs containing a code brace or 'lorem ipsum' marker, or with
    fewer than 5 surviving sentences. Reports per-source doc/line/
    char attrition — the numbers a curation run logs before
    committing a filter. All higher-order array functions on one
    scan (filter/transform/aggregate — no explode, so a doc's lines
    never shuffle), then one per-source aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "source",
        F.expr(
            f"concat({_LINES_EXPR},"
            f" CASE WHEN doc_id % 13 = 0 THEN array('{_BRACE_LINE}') ELSE array() END,"
            f" CASE WHEN doc_id % 17 = 0 THEN array('{_LOREM_LINE}') ELSE array() END)"
        ).alias("lines"),
    )
    scored = staged.select(
        "doc_id",
        "source",
        F.size("lines").alias("lines_in"),
        F.expr(
            "filter(lines, l -> l rlike '[.!?]$'"
            " AND size(regexp_extract_all(l, '\\\\S+', 0)) >= 3)"
        ).alias("kept"),
        F.expr(
            "CASE WHEN size(filter(lines, l ->"
            " contains(l, '{') OR contains(l, 'lorem ipsum'))) > 0"
            " THEN 1 ELSE 0 END"
        ).alias("has_marker"),
    )
    flagged = scored.select(
        "source",
        "lines_in",
        F.size("kept").alias("lines_kept"),
        F.expr(
            "cast(aggregate(transform(kept, l -> length(l)), 0L,"
            " (acc, x) -> acc + x) as bigint)"
        ).alias("chars_kept"),
        F.expr(
            "CASE WHEN has_marker = 0 AND size(kept) >= 5 THEN 1 ELSE 0 END"
        ).alias("doc_kept"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_in"),
            F.sum("doc_kept").cast("long").alias("docs_kept"),
            F.sum("lines_in").cast("long").alias("lines_in"),
            F.sum(
                F.when(F.col("doc_kept") == 1, F.col("lines_kept")).otherwise(0)
            ).cast("long").alias("lines_kept"),
            F.sum(
                F.when(F.col("doc_kept") == 1, F.coalesce("chars_kept", F.lit(0)))
                .otherwise(0)
            ).cast("long").alias("chars_kept"),
        )
        .orderBy("source")
    )


@query(
    "curation_dashboard",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, md5(text) AS h,
             len({TOKENS_SQL}) AS n,
             COALESCE(CAST(list_aggregate(list_transform({TOKENS_SQL}, t -> length(t)), 'sum') AS BIGINT), 0) AS chars,
             len(list_filter(list_distinct({TOKENS_SQL}), t -> t IN {_STOP})) AS n_stop,
             len(list_filter({TOKENS_SQL}, t -> regexp_matches(t, '[a-z]'))) AS n_alpha
      FROM documents
    ), dup AS (
      SELECT h, COUNT(*) AS copies FROM scored GROUP BY h
    ), per_doc AS (
      SELECT s.source, s.n, s.chars,
             CASE WHEN d.copies > 1 THEN 1 ELSE 0 END AS is_dup,
             CASE WHEN s.n >= {GOPHER_MIN_WORDS} AND s.n <= {GOPHER_MAX_WORDS}
                   AND s.chars >= {GOPHER_MIN_MWL} * s.n AND s.chars <= {GOPHER_MAX_MWL} * s.n
                   AND s.n_stop >= {GOPHER_MIN_STOP}
                   AND 10 * s.n_alpha >= 8 * s.n
                  THEN 1 ELSE 0 END AS ok
      FROM scored s JOIN dup d ON d.h = s.h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           CAST((SUM(is_dup) * 1000000) // COUNT(*) AS BIGINT) AS exact_dup_ppm,
           CAST((SUM(ok) * 1000000) // COUNT(*) AS BIGINT) AS gopher_pass_ppm,
           CAST(SUM(n) // COUNT(*) AS BIGINT) AS tokens_per_doc
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def curation_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-stop per-source curation dashboard: volume (docs,
    token/char mass), exact-duplication rate, and Gopher-pass rate —
    the numbers a data-mix owner compares across sources before
    setting `mix_sources`/`mix_temperature` weights. Reuses the ONE
    `gopher_flags` definition (batch filter, streaming filter, and
    this dashboard can never disagree); duplication is the
    cross-source md5 cluster test. One scan + one hash-linear
    dup join-back + a #sources-row aggregate; exact integer ppm.
    """
    from mallard_spark.functions.exec import materialize, spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    # flags + identity + mass in ONE scan (gopher_flags threads the
    # extra columns through); staged because the dup aggregate and
    # the join-back both consume it
    scored = materialize(
        gopher_flags(
            docs,
            extra=(
                F.md5("text").alias("h"),
                F.expr(f"size({TOKENS_EXPR})").cast("long").alias("n_toks"),
                F.expr(
                    f"coalesce(cast(aggregate(transform({TOKENS_EXPR},"
                    f" t -> length(t)), 0L, (acc, x) -> acc + x) as bigint), 0)"
                ).alias("n_chars"),
            ),
        ),
        "curation_flags",
    )
    dup = scored.groupBy("h").agg(F.count(F.lit(1)).alias("copies"))
    ok = (
        (F.col("ok_words") == 1)
        & (F.col("ok_mwl") == 1)
        & (F.col("ok_stop") == 1)
        & (F.col("ok_alpha") == 1)
    ).cast("int")
    per_doc = scored.join(dup, "h").select(
        "source",
        "n_toks",
        "n_chars",
        F.when(F.col("copies") > 1, 1).otherwise(0).alias("is_dup"),
        ok.alias("ok"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("(sum(is_dup) * 1000000) div count(*)")
            .cast("long")
            .alias("exact_dup_ppm"),
            F.expr("(sum(ok) * 1000000) div count(*)")
            .cast("long")
            .alias("gopher_pass_ppm"),
            F.expr("sum(n_toks) div count(*)").cast("long").alias("tokens_per_doc"),
        )
        .orderBy("source")
    )

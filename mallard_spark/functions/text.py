"""Text column expressions — tokenization, shingles, ratios.

All pure ``pyspark.sql.functions`` / SQL expressions (whole-stage
codegen, no Python in the hot path), each with a DuckDB mirror
string so text operators stay oracle-checkable. Tokenization is
regex-based (``\\S+`` runs, not ``split``) so both engines agree on
empty/edge inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Spark side (expression builders) --------------------------------

TOKENS_EXPR = "regexp_extract_all(lower(text), '\\\\S+', 0)"
# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation
BPE_EXPR = "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"
PUNCT_EXPR = "regexp_extract_all(text, '[^a-zA-Z0-9\\\\s]', 0)"


def tokens() -> Column:
    return F.expr(TOKENS_EXPR)


def shingles_of(tokens_col: str, n: int = 3) -> Column:
    """n-token shingles from an ALREADY-MATERIALIZED token array column.

    Always shingle from a column, never inline the tokenizer: an
    inlined ``regexp_extract_all`` would be re-evaluated once per
    shingle index (O(tokens²) regex work per document — measured as
    a multi-minute stall at 5k docs before this was split out).

    Guarded CASE: Spark's sequence(1, 0) would produce a DESCENDING
    [1, 0] rather than an empty list.
    """
    t = tokens_col
    return F.expr(
        f"CASE WHEN size({t}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({t}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({t}, i, {n}))) END"
    )


# --- DuckDB mirrors ---------------------------------------------------

TOKENS_SQL = r"regexp_extract_all(lower(text), '\S+')"
BPE_SQL = r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')"
PUNCT_SQL = r"regexp_extract_all(text, '[^a-zA-Z0-9\s]')"


def word_shingles_sql(n: int = 3, tokens_sql: str = TOKENS_SQL) -> str:
    return (
        f"list_transform(range(1, greatest(len({tokens_sql}) - {n - 2}, 1)),"
        f" i -> array_to_string(({tokens_sql})[i:i+{n - 1}], ' '))"
    )

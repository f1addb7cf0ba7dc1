"""Web-corpus curation: URL canonicalization dedup + per-domain stats.

Crawled corpora carry the same page under many raw URLs (http vs
https, ``www.`` prefixes, tracking parameters, trailing slashes,
fragments). Canonicalizing URLs BEFORE content dedup removes the
cheapest duplicate class with zero text comparison — a pure
column-expression map over the scan, no shuffle until the final
aggregate. At 100 TB this is the first pass of every crawl pipeline
(CCNet/Dolma both do it); it costs one scan and a partial-combined
aggregate, so it scales exactly like a count.

The testdata ``documents`` table has no URL column, so — like the
multimodal fake-codec fixtures (`multimodal/binary.py`) — each doc
derives a deterministic raw URL from ``doc_id``: three consecutive
doc_ids share one logical page but get three different raw spellings
(www + utm params + fragment / HTTP + uppercase host + trailing
slash / trailing tracking params). The *canonicalization logic is
the real operator*; the fixture just gives it engine-reproducible
input, so DuckDB re-derives everything bit-for-bit.

Reference parity: Mallard runs arbitrary DuckDB SQL over tickets
(`/root/reference/flight_server.py:342` do_get), so a Mallard user
would express this as SQL; here it is the same declarative plan with
the regex chain documented and value-oracled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mallard_spark.functions.hashing import md5_long, md5_long_sql
from mallard_spark.registry import query
from mallard_spark.sources.readers import load_table

# Regex chain shared verbatim by the Spark builders and the DuckDB
# oracles (no capture-group replacements: Spark spells them $1,
# DuckDB \1 — avoiding captures keeps one pattern string per rule).
_FRAGMENT = "#.*$"
_TRACK_MID = "(utm_[a-z]+|fbclid|gclid)=[^&#]*&"  # param followed by another
_TRACK_END = "[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*"  # sole/last param
_SLASH_Q = "/[?]"  # trailing slash before query
_TRAIL = "[?&/]+$"  # dangling separators
_SCHEME = "^[A-Za-z]+://"
# URL-shape guard: scheme + domain-ish host, then path/query/fragment.
# Inputs that don't parse (double schemes, ports, empty hosts) pass
# through UNCHANGED — identity is idempotent, and not corrupting
# unparseable rows is the right behavior for a 100 TB cleaning pass.
_VALID = "^[A-Za-z]+://(www[.])*[A-Za-z0-9.-]+([/?#].*)?$"


def _raw_url(doc_id: Column) -> Column:
    """Deterministic raw-URL fixture: 3 consecutive doc_ids share one
    logical page (doc_id div 3) under 3 different raw spellings; the
    host is keyed on the PAGE so all 3 spellings live on one domain."""
    page = F.expr("doc_id div 3").cast("string")
    host = F.concat(
        F.lit("d"), (md5_long(page) % 20).cast("string"), F.lit(".example.com")
    )
    base = F.concat(F.lit("/a/"), page, F.lit("?id="), page)
    v = doc_id % 3
    return (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://www."), host, F.lit("/a/"), page,
                F.lit("?utm_source=rss&id="), page, F.lit("#frag"),
            ),
        )
        .when(
            v == 1,
            F.concat(F.lit("HTTP://"), F.upper(host), F.lit("/a/"), page, F.lit("/?id="), page),
        )
        .otherwise(F.concat(F.lit("https://"), host, base, F.lit("&utm_campaign=x&fbclid=abc")))
    )


_RAW_URL_SQL = """
    CASE doc_id % 3
      WHEN 0 THEN 'https://www.' || {host} || '/a/' || {page}
                  || '?utm_source=rss&id=' || {page} || '#frag'
      WHEN 1 THEN 'HTTP://' || upper({host}) || '/a/' || {page} || '/?id=' || {page}
      ELSE 'https://' || {host} || '/a/' || {page} || '?id=' || {page}
           || '&utm_campaign=x&fbclid=abc'
    END
"""
_PAGE_SQL = "CAST(doc_id // 3 AS VARCHAR)"
_RAW_URL_SQL = _RAW_URL_SQL.format(
    host=f"'d' || CAST({md5_long_sql(_PAGE_SQL)} % 20 AS VARCHAR) || '.example.com'",
    page=_PAGE_SQL,
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form: https, lowercase host, no www./fragment/
    tracking params/trailing slash. Pure JVM regex chain — codegen'd,
    zero Python, zero shuffle."""
    u = F.regexp_replace(url, _FRAGMENT, "")
    u = F.regexp_replace(u, _TRACK_MID, "")
    u = F.regexp_replace(u, _TRACK_END, "")
    u = F.regexp_replace(u, _SLASH_Q, "?")
    u = F.regexp_replace(u, _TRAIL, "")
    rest = F.regexp_replace(u, _SCHEME, "")
    host = F.lower(F.regexp_extract(rest, "^([^/?#]+)", 1))
    host = F.regexp_replace(host, "^(www[.])+", "")
    path = F.regexp_replace(rest, "^[^/?#]*", "")
    canon = F.concat(F.lit("https://"), host, path)
    # guard makes the function total AND idempotent (property-tested):
    # canonical outputs re-match the guard and are fixed points of
    # every rule; unparseable inputs map to themselves
    return F.when(url.rlike(_VALID), canon).otherwise(url)


def _canon_sql(url_expr: str) -> str:
    """DuckDB mirror of :func:`canonicalize_url` (identical patterns;
    DuckDB needs the explicit 'g' flag Spark applies by default)."""
    u = f"regexp_replace({url_expr}, '{_FRAGMENT}', '', 'g')"
    u = f"regexp_replace({u}, '{_TRACK_MID}', '', 'g')"
    u = f"regexp_replace({u}, '{_TRACK_END}', '', 'g')"
    u = f"regexp_replace({u}, '{_SLASH_Q}', '?', 'g')"
    u = f"regexp_replace({u}, '{_TRAIL}', '', 'g')"
    rest = f"regexp_replace({u}, '{_SCHEME}', '')"
    host = (
        f"regexp_replace(lower(regexp_extract({rest}, '^([^/?#]+)', 1)),"
        f" '^(www[.])+', '')"
    )
    path = f"regexp_replace({rest}, '^[^/?#]*', '')"
    return (
        f"CASE WHEN regexp_matches({url_expr}, '{_VALID}')"
        f" THEN 'https://' || {host} || {path} ELSE {url_expr} END"
    )


@query(
    "url_canonicalize_dedup",
    oracle=f"""
    WITH urls AS (
        SELECT {_RAW_URL_SQL} AS raw_url FROM documents
    ), canon AS (
        SELECT raw_url, {_canon_sql('raw_url')} AS canonical_url FROM urls
    )
    SELECT regexp_extract(canonical_url, '^https://([^/]+)', 1) AS domain,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT raw_url) AS n_raw_urls,
           COUNT(DISTINCT canonical_url) AS n_canonical,
           COUNT(*) - COUNT(DISTINCT canonical_url) AS dup_docs,
           ROUND(1.0 - CAST(COUNT(DISTINCT canonical_url) AS DOUBLE) / COUNT(*), 6)
               AS url_dup_rate
    FROM canon GROUP BY domain ORDER BY domain
    """,
)
def url_canonicalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup rate per domain: raw URLs stay
    distinct, canonical URLs collapse the 3-spelling groups — the
    gap is the duplicate mass removable before any content hashing.
    One scan → regex map (codegen) → one aggregate; at 100 TB the
    canonical column would also become the dedup key of a groupBy
    keeping `min(doc_id)` per URL (same plan shape as dedup_exact).
    """
    docs = load_table(spark, sf_dir, "documents")
    canon = (
        docs.select(_raw_url(F.col("doc_id")).alias("raw_url"))
        .withColumn("canonical_url", canonicalize_url(F.col("raw_url")))
        .withColumn(
            "domain", F.regexp_extract(F.col("canonical_url"), "^https://([^/]+)", 1)
        )
    )
    return (
        canon.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("raw_url").alias("n_raw_urls"),
            F.countDistinct("canonical_url").alias("n_canonical"),
            (F.count("*") - F.countDistinct("canonical_url")).alias("dup_docs"),
            F.round(
                F.lit(1.0) - F.countDistinct("canonical_url").cast("double") / F.count("*"), 6
            ).alias("url_dup_rate"),
        )
        .orderBy("domain")
    )


@query(
    "domain_quality_agg",
    oracle=f"""
    WITH urls AS (
        SELECT lang, n_chars,
               regexp_extract({_canon_sql(_RAW_URL_SQL)}, '^https://([^/]+)', 1) AS domain
        FROM documents
    )
    SELECT domain,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS BIGINT) AS short_docs,
           ROUND(CAST(SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS short_frac,
           COUNT(DISTINCT lang) AS n_langs
    FROM urls GROUP BY domain ORDER BY domain
    """,
)
def domain_quality_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain curation dashboard: doc counts, char mass, and the
    short-doc fraction that drives domain-level filtering decisions
    (a domain whose pages are mostly <200 chars is boilerplate). The
    domain key comes from the canonical URL, so spelling variants of
    one host aggregate together. One scan, one partial-combined
    aggregate keyed on ~#domains — the classic crawl-curation rollup
    that stays a single shuffle at any corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    canon = canonicalize_url(_raw_url(F.col("doc_id")))
    short = F.when(F.col("n_chars") < 200, 1).otherwise(0)
    return (
        docs.select(
            "lang",
            "n_chars",
            F.regexp_extract(canon, "^https://([^/]+)", 1).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(short).cast("long").alias("short_docs"),
            F.round(F.sum(short).cast("double") / F.count("*"), 6).alias("short_frac"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("domain")
    )


# Deterministic demo blocklist: hosts whose md5 bucket is 0 or 7 (2
# of the 20 fixture domains) — stands in for the curated spam/SEO
# domain lists every crawl pipeline maintains.
_BLOCK_BUCKETS = (0, 7)


@query(
    "url_blocklist_filter",
    oracle=f"""
    WITH urls AS (
        SELECT source, lang, n_chars,
               regexp_extract({_canon_sql(_RAW_URL_SQL)}, '^https://([^/]+)', 1)
                   AS domain
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN domain IN ('d0.example.com', 'd7.example.com')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
           CAST(SUM(CASE WHEN domain IN ('d0.example.com', 'd7.example.com')
                         THEN 0 ELSE n_chars END) AS BIGINT) AS kept_chars,
           ROUND(CAST(SUM(CASE WHEN domain IN ('d0.example.com', 'd7.example.com')
                              THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS blocked_frac
    FROM urls GROUP BY source ORDER BY source
    """,
)
def url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filtering report: per source, how many docs a
    host blocklist removes and the character mass that survives — the
    first hard filter of every crawl pipeline (spam/SEO/adult domain
    lists). The blocklist is a literal IN-set here; a 100k-entry
    production list becomes a broadcast anti-join on the canonical
    host with the IDENTICAL plan shape (scan → codegen map →
    broadcast lookup → one aggregate; the corpus never shuffles on
    the domain).
    """
    docs = load_table(spark, sf_dir, "documents")
    domain = F.regexp_extract(
        canonicalize_url(_raw_url(F.col("doc_id"))), "^https://([^/]+)", 1
    )
    blocked = F.when(
        domain.isin(*[f"d{b}.example.com" for b in _BLOCK_BUCKETS]), 1
    ).otherwise(0)
    return (
        docs.select("source", "n_chars", blocked.alias("blocked"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("blocked").cast("long").alias("n_blocked"),
            F.sum(
                F.when(F.col("blocked") == 1, 0).otherwise(F.col("n_chars"))
            ).alias("kept_chars"),
            F.round(F.sum("blocked").cast("double") / F.count("*"), 6).alias(
                "blocked_frac"
            ),
        )
        .orderBy("source")
    )


@query(
    "pipeline_curation_funnel",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, n_chars, md5(text) AS content_hash,
             {_canon_sql(_RAW_URL_SQL)} AS canon
      FROM documents
    ), f2 AS (
      SELECT *,
             regexp_extract(canon, '^https://([^/]+)', 1)
                 NOT IN ('d0.example.com', 'd7.example.com') AS s1,
             MIN(doc_id) OVER (PARTITION BY canon) AS url_rep
      FROM base
    ), f3 AS (
      SELECT *,
             s1 AND doc_id = url_rep AS s2,
             s1 AND doc_id = url_rep AND n_chars >= 200 AS s3
      FROM f2
    ), f4 AS (
      SELECT *,
             MIN(CASE WHEN s3 THEN doc_id END)
                 OVER (PARTITION BY content_hash) AS exact_rep
      FROM f3
    ), f5 AS (SELECT *, s3 AND doc_id = exact_rep AS s4 FROM f4)
    SELECT * FROM (
      SELECT 1 AS stage_no, 'raw' AS stage,
             COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars FROM f5
      UNION ALL
      SELECT 2, 'blocklist', CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN s1 THEN n_chars ELSE 0 END) AS BIGINT) FROM f5
      UNION ALL
      SELECT 3, 'url_dedup', CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN s2 THEN n_chars ELSE 0 END) AS BIGINT) FROM f5
      UNION ALL
      SELECT 4, 'quality', CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN s3 THEN n_chars ELSE 0 END) AS BIGINT) FROM f5
      UNION ALL
      SELECT 5, 'exact_dedup', CAST(SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN s4 THEN n_chars ELSE 0 END) AS BIGINT) FROM f5
    ) ORDER BY stage_no
    """,
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed crawl-curation funnel in ONE pass: raw →
    domain-blocklist → URL-canonical dedup → quality floor → exact
    content dedup, reported as surviving docs/chars per stage (the
    attrition chart every curation run publishes).

    Single-pass design: per-doc survival flags chain through two
    windows (canonical URL, content hash) and one aggregate — the
    corpus is scanned once, vs a naive 5-branch plan that rescans per
    stage. The URL representative can be taken over ALL docs because
    the blocklist is domain-level and a canonical-URL group never
    spans domains — group members are blocked or kept together. The
    exact-dedup representative is chosen among stage-3 SURVIVORS
    (conditional window min), the order-correct semantics.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    canon = canonicalize_url(_raw_url(F.col("doc_id")))
    base = docs.select(
        "doc_id",
        "n_chars",
        F.md5("text").alias("content_hash"),
        canon.alias("canon"),
    )
    domain = F.regexp_extract(F.col("canon"), "^https://([^/]+)", 1)
    blockset = [f"d{b}.example.com" for b in _BLOCK_BUCKETS]
    f2 = base.withColumn("s1", ~domain.isin(*blockset)).withColumn(
        "url_rep", F.min("doc_id").over(Window.partitionBy("canon"))
    )
    f3 = f2.withColumn(
        "s2", F.col("s1") & (F.col("doc_id") == F.col("url_rep"))
    ).withColumn("s3", F.col("s2") & (F.col("n_chars") >= 200))
    f4 = f3.withColumn(
        "exact_rep",
        F.min(F.when(F.col("s3"), F.col("doc_id"))).over(
            Window.partitionBy("content_hash")
        ),
    ).withColumn("s4", F.col("s3") & (F.col("doc_id") == F.col("exact_rep")))

    # ONE aggregate computes all 10 conditional sums, then stack()
    # unpivots to the 5 report rows — union-of-5-aggregates would
    # rescan the corpus (and re-run both windows) per branch, since
    # Catalyst does not share subtrees across union arms (review
    # finding r4; same pattern as profile_table_summary)
    stages = [
        (1, "raw", None),
        (2, "blocklist", "s1"),
        (3, "url_dedup", "s2"),
        (4, "quality", "s3"),
        (5, "exact_dedup", "s4"),
    ]
    sums = []
    for no, _name, flag in stages:
        cond = F.lit(True) if flag is None else F.col(flag)
        sums.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"n{no}")
        )
        sums.append(
            F.sum(F.when(cond, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias(f"c{no}")
        )
    agg = f4.agg(*sums)
    stack_args = ", ".join(
        f"cast({no} as int), '{name}', n{no}, c{no}" for no, name, _ in stages
    )
    return agg.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage_no, stage, n_docs, sum_chars)"
    ).orderBy("stage_no")


@query(
    "source_overlap_matrix",
    oracle="""
    WITH h AS (
      SELECT DISTINCT md5(text) AS ch, source FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_texts
    FROM h a JOIN h b ON a.ch = b.ch AND a.source < b.source
    GROUP BY 1, 2
    ORDER BY shared_texts DESC, source_a, source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplication matrix: for every source pair,
    how many distinct texts they SHARE — the "who is mirroring whom"
    view that decides which source to keep when curation drops
    duplicates (companion to `curation_dashboard`'s per-source dup
    rate and `dedup_canonical_select`'s removal list).

    Scale shape: one (md5, source) distinct aggregate, then a
    self-join ON the content hash — join fan-out is bounded by
    duplicate-cluster sizes (a hash shared by k sources yields
    k·(k−1)/2 pairs), never corpus×corpus; the pair aggregate is keyed
    on ≤ #sources² rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(F.md5("text").alias("ch"), "source").distinct()
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ch") == F.col("b.ch"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_texts"))
        .orderBy(F.desc("shared_texts"), "source_a", "source_b")
    )

"""URL hygiene for crawled corpora: canonicalization, blocklist
filtering, canonical-URL dedup, and per-domain caps.

Web-scale corpus recipes treat the URL as a first-class dedup and
quality key BEFORE any content pass (C4 keeps one page per URL;
RefinedWeb's first two stages are URL filtering — blocklists and
per-domain rules — ahead of all text processing), because a URL-keyed
pass is a pure projection + one tiny-key shuffle while content passes
cost orders of magnitude more. Operators here:

* :func:`canonical_url_expr` — deterministic canonical form: scheme
  and host lowercased, a leading ``www.`` stripped, the fragment
  dropped, tracking parameters (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``) removed, surviving query params sorted, a trailing slash
  on a non-root path stripped. Regex-based with explicit ASCII
  classes so Spark (Java regex) and DuckDB (RE2) agree; the
  public-suffix list is out of scope (public data, but a moving
  artifact), so "domain" is the registrable host minus ``www.`` —
  documented simplification.
* :func:`url_dedup` — one page per canonical URL (min id wins: the
  first crawl), the C4 rule.
* :func:`blocklist_filter` — drop pages whose domain is on a
  blocklist (broadcast; blocklists are thousands of rows).
* :func:`domain_cap` — at most ``n`` pages per domain, picked by a
  deterministic (order column DESC, id ASC) window — RefinedWeb's
  per-domain rule shaped as one windowed shuffle on the domain key.

100 TB shape: canonicalization/domain are pure codegen-free
projections (regex + conditional string ops; the param-filter lambda
is interpreted but per-row bounded by the query-string length);
url_dedup groups on the canonical URL (map-side combined); the
blocklist broadcasts; domain_cap is ONE window shuffle on domain.
Everything composes into a single pre-content pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "canonical_url_expr",
    "domain_expr",
    "url_dedup",
    "blocklist_filter",
    "domain_cap",
    "url_pipeline",
    "duckdb_canonical_url_sql",
    "duckdb_domain_sql",
    "duckdb_url_pipeline_sql",
]

#: Tracking parameters dropped during canonicalization (public
#: convention: UTM campaign tags, Google/Facebook click ids, ref).
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]*|gclid|fbclid|ref)="

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# the '?' must precede any '#': a '?' inside the fragment is fragment
# content (RFC 3986 §3.5) and must NOT leak into the canonical query —
# anchored [^#?]* admits only the FIRST '?' and only before a '#'.
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _kept_query(url) -> "F.Column":
    """Sorted, tracking-stripped query string ('' when nothing
    survives)."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    parts = F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonical_url_expr(url_col: str = "url") -> "F.Column":
    """The canonical form of ``url_col`` (see module docstring).
    Twin: :func:`duckdb_canonical_url_sql` — byte-identical output.

    Expects absolute URLs (``scheme://...``); a scheme-less or
    malformed value degrades to ``"://"`` (every component regex
    anchors on the scheme), which keeps such rows grouped together
    and visibly wrong rather than silently passing through — filter
    them upstream with ``url RLIKE '^[a-zA-Z][a-zA-Z0-9+.-]*://'``
    if the crawl frontier can emit relative URLs."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOST_RE, 1)), r"^www\.", ""
    )
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(
        (F.length(raw_path) > 1) & raw_path.endswith("/"),
        raw_path.substr(F.lit(1), F.length(raw_path) - F.lit(1)),
    ).otherwise(raw_path)
    kept = _kept_query(url)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(
            F.lit("")
        ),
    )


def domain_expr(url_col: str = "url") -> "F.Column":
    """Registrable host minus a leading ``www.`` (lowercased)."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1)),
        r"^www\.",
        "",
    )


def url_dedup(
    pages: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """One page per canonical URL — the smallest id (first crawl)
    wins. Output: (canon_url, keep_id, n_crawls). One
    map-side-combined groupBy on the canonical key."""
    return (
        pages.select(
            F.col(id_col),
            canonical_url_expr(url_col).alias("canon_url"),
        )
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_crawls"),
        )
    )


def blocklist_filter(
    pages: DataFrame,
    blocked_domains: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop pages whose domain appears in ``blocked_domains``
    (single column ``domain``). Broadcast anti-join — blocklists are
    thousands of rows against a corpus of billions."""
    withd = pages.withColumn("domain", domain_expr(url_col))
    return withd.join(
        F.broadcast(blocked_domains.select("domain")),
        "domain",
        "left_anti",
    )


def domain_cap(
    pages: DataFrame,
    n: int,
    order_col: str,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """At most ``n`` pages per domain, picked by (``order_col`` DESC,
    id ASC) — a total order, so the cap boundary is deterministic.
    ONE window shuffle on the domain key."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    from pyspark.sql import Window

    w = Window.partitionBy("domain").orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        pages.withColumn("domain", domain_expr(url_col))
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n)
        .drop("_rank")
    )


def url_pipeline(
    pages: DataFrame,
    blocked_domains: DataFrame,
    cap_n: int,
    order_col: str,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """The composed pre-content URL pass: canonical dedup (min id
    wins) → blocklist → per-domain cap ranked by the KEEPER's
    ``order_col``. Output: (keep_id, canon_url, domain, n_crawls).
    Twin: :func:`duckdb_url_pipeline_sql`."""
    if cap_n < 1:
        raise ValueError(f"cap_n must be >= 1, got {cap_n}")
    from pyspark.sql import Window

    p = pages.select(
        F.col(id_col),
        F.col(order_col),
        canonical_url_expr(url_col).alias("canon_url"),
        domain_expr(url_col).alias("domain"),
    )
    dedup = p.groupBy("canon_url", "domain").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_crawls"),
    )
    kept = dedup.join(
        F.broadcast(blocked_domains.select("domain")),
        "domain",
        "left_anti",
    ).join(
        p.select(F.col(id_col).alias("keep_id"), order_col),
        "keep_id",
    )
    w = Window.partitionBy("domain").orderBy(
        F.col(order_col).desc(), F.col("keep_id").asc()
    )
    return (
        kept.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= cap_n)
        .select("keep_id", "canon_url", "domain", "n_crawls")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def duckdb_canonical_url_sql(url_sql: str = "url") -> str:
    """Canonical-URL twin over a URL expression."""
    scheme = f"lower(regexp_extract({url_sql}, '{_SCHEME_RE}', 1))"
    host = (
        f"regexp_replace(lower(regexp_extract({url_sql}, "
        f"'{_HOST_RE}', 1)), '^www\\.', '')"
    )
    raw_path = f"regexp_extract({url_sql}, '{_PATH_RE}', 1)"
    path = f"""CASE WHEN length({raw_path}) > 1
                     AND {raw_path} LIKE '%/'
                THEN substring({raw_path}, 1, length({raw_path}) - 1)
                ELSE {raw_path} END"""
    kept = f"""array_to_string(list_sort(list_filter(
        string_split(regexp_extract({url_sql}, '{_QUERY_RE}', 1), '&'),
        p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')
    )), '&')"""
    return f"""({scheme} || '://' || {host} || {path} ||
        CASE WHEN {kept} <> '' THEN '?' || {kept} ELSE '' END)"""


def duckdb_domain_sql(url_sql: str = "url") -> str:
    return (
        f"regexp_replace(lower(regexp_extract({url_sql}, "
        f"'{_HOST_RE}', 1)), '^www\\.', '')"
    )


def duckdb_url_pipeline_sql(
    pages_sql: str,
    blocked_domains: tuple[str, ...],
    cap_n: int,
    order_col: str,
    id_col: str = "doc_id",
) -> str:
    """Twin of the composed pipeline: canonical dedup (min id wins) →
    blocklist → per-domain cap. Emits (keep_id, canon_url, domain,
    n_crawls)."""
    # an EMPTY blocklist must be a no-op ('' is a legal domain value —
    # the malformed-URL degenerate — and NOT IN ('') would drop it);
    # single quotes in domains are doubled per SQL literal rules
    if blocked_domains:
        quoted = ", ".join(
            "'" + d.replace("'", "''") + "'" for d in blocked_domains
        )
        block_clause = f"d.domain NOT IN ({quoted})"
    else:
        block_clause = "TRUE"
    return f"""
        WITH _p AS (
          SELECT {id_col}, {order_col}, url,
                 {duckdb_canonical_url_sql("url")} AS canon_url,
                 {duckdb_domain_sql("url")} AS domain
          FROM ({pages_sql}) src
        ),
        _dedup AS (
          SELECT canon_url, domain,
                 min({id_col}) AS keep_id,
                 CAST(count(*) AS BIGINT) AS n_crawls
          FROM _p GROUP BY 1, 2
        ),
        _kept AS (
          SELECT d.*, p.{order_col}
          FROM _dedup d
          JOIN _p p ON p.{id_col} = d.keep_id
          WHERE {block_clause}
        )
        SELECT keep_id, canon_url, domain, n_crawls
        FROM (
          SELECT *, row_number() OVER (
            PARTITION BY domain
            ORDER BY {order_col} DESC, keep_id ASC) AS _rank
          FROM _kept
        ) WHERE _rank <= {cap_n}
    """


def domain_curation_report(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain curation dashboard: page count, quality pass count
    and rate (``textstats.quality_features``), and token volume — the
    aggregate a crawl-curation loop ranks domains by (RefinedWeb-style
    per-domain rules are tuned from exactly this table). Output:
    (domain, n_pages, n_quality, quality_rate, n_tokens) with
    quality_rate rounded to 6 dp (cross-engine float contract).

    100 TB shape: quality features are narrow codegen projections and
    the groupBy on domain is map-side combined — ONE shuffle whose
    output is domain-cardinality, not page-cardinality."""
    from auto_data_tokenize_spark.operators.textstats import (
        quality_features,
    )

    q = quality_features(pages, text_col).withColumn(
        "domain", domain_expr(url_col)
    )
    n_pages = F.count(F.lit(1)).cast("long")
    n_quality = F.sum(F.col("is_quality").cast("int")).cast("long")
    return q.groupBy("domain").agg(
        n_pages.alias("n_pages"),
        n_quality.alias("n_quality"),
        F.round(n_quality / n_pages, 6).alias("quality_rate"),
        F.sum("n_ws_tokens").cast("long").alias("n_tokens"),
    )

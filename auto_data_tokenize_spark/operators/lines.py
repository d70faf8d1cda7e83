"""Line-level corpus hygiene: cross-document repeated-line removal
(CCNet-style boilerplate dedup) and C4-style per-line heuristic
cleaning.

Web pages carry navigation chrome, cookie banners, and footer
boilerplate that repeats across millions of documents; the standard
pre-training fix (CCNet, Wenzek et al. 2019; C4, Raffel et al. 2019)
drops a LINE when it occurs in many distinct documents, and applies
per-line heuristics (terminal punctuation, minimum words, banned
substrings) before document-level dedup ever runs. Both operators
here are pure DataFrame compositions — posexplode + one groupBy for
the corpus-wide line census, codegen predicates for the heuristics,
and an order-preserving reassembly via sorted collect_list — so at
100 TB the only shuffle is the line-hash census (map-side combined;
the census output is the distinct-line set, orders of magnitude
smaller than the corpus) plus the per-document regroup.

Relation to the reference: auto-data-tokenize flattens records,
filters null/default values per entry, and re-nests
(RecordFlattener / un-pivot, src/main/java/com/google/cloud/solutions/autotokenize/pipeline/dto — see
SURVEY.md §2.3); these operators are the text-corpus analogue of that
per-entry filter + re-nest cycle, applied to lines of a document
instead of fields of a record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "split_lines",
    "repeated_line_hashes",
    "remove_repeated_lines",
    "c4_clean_lines",
    "remove_duplicated_spans",
    "duplicated_window_hashes",
    "span_coverage",
    "duckdb_lines_sql",
    "duckdb_line_dedup_sql",
    "duckdb_c4_clean_sql",
    "duckdb_span_dedup_sql",
    "duckdb_span_coverage_sql",
]

#: Banned substrings from the C4 cleaning recipe (public: Raffel et
#: al. 2019 §2.2 — lorem ipsum, javascript, curly brace as a code
#: smell). Lowercase; matching is on the lowercased line.
C4_BANNED = ("lorem ipsum", "javascript", "{")

# explicit ASCII classes so Spark (Java regex) and DuckDB (RE2) agree
_TERMINAL_RE = r'[.!?"]$'


def split_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Explode documents into (id, line_idx, line) on literal ``\\n``.

    ``split(text, '\\n', -1)`` pins limit=-1 so trailing empty lines
    survive — DuckDB's ``string_split`` keeps them too, and dropping
    them on one engine only would fork the reassembled text.
    """
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "line_idx", "line"
        ),
    )


def repeated_line_hashes(
    lines: DataFrame, min_docs: int, id_col: str = "doc_id"
) -> DataFrame:
    """The corpus-wide boilerplate census: md5(line) for every line
    that occurs in at least ``min_docs`` DISTINCT documents (distinct,
    so a line legitimately repeated inside one document does not
    count as boilerplate). One groupBy shuffle on the line hash with
    map-side partial aggregation; the output is the distinct repeated
    line set — tiny next to the corpus."""
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    return (
        lines.select(F.md5("line").alias("line_hash"), id_col)
        .groupBy("line_hash")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("line_hash")
    )


def _reassemble(
    kept: DataFrame, docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Regroup kept (id, line_idx, line) rows back into documents in
    original line order; documents whose every line was removed come
    back with empty text (left join from the original ids) rather
    than vanishing — the caller decides whether to drop empties."""
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("line_idx", "line"))
            ).alias("_ls"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
        .select(
            id_col,
            F.concat_ws(
                "\n", F.expr("transform(_ls, s -> s.line)")
            ).alias(text_col),
            "n_kept",
        )
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        )
    )


def remove_repeated_lines(
    docs: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every line that occurs in
    ``min_docs``-or-more distinct documents, reassemble the remainder
    in original order. Output: (id, text, n_kept, n_removed).

    Scale: census shuffle (line hash) + broadcast-or-shuffle left_anti
    against the census + regroup shuffle on the id. The census side is
    the DISTINCT boilerplate set; Catalyst broadcasts it when small,
    and at web scale it stays bounded by the distinct-chrome universe,
    not the corpus."""
    lines = split_lines(docs, id_col, text_col)
    boiler = repeated_line_hashes(lines, min_docs, id_col)
    kept = lines.join(
        boiler,
        F.md5(lines["line"]) == boiler["line_hash"],
        "left_anti",
    )
    n_lines = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_total")
    )
    return (
        _reassemble(kept, docs, id_col, text_col)
        .join(n_lines, id_col)
        .select(
            id_col,
            text_col,
            "n_kept",
            (F.col("_n_total") - F.col("n_kept")).alias("n_removed"),
        )
    )


def c4_clean_lines(
    docs: DataFrame,
    min_words: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    banned: tuple[str, ...] = C4_BANNED,
) -> DataFrame:
    """C4-style per-line heuristics (Raffel et al. 2019 §2.2): keep a
    line only if it ends in terminal punctuation, has at least
    ``min_words`` whitespace words, and contains none of ``banned``
    (case-insensitive). Output: (id, text, n_kept, n_removed). Pure
    codegen predicates — the only shuffles are the per-document
    regroup and count."""
    lines = split_lines(docs, id_col, text_col)
    lowered = F.lower(F.col("line"))
    keep = (
        F.col("line").rlike(_TERMINAL_RE)
        & (F.size(F.split(F.trim("line"), r"\s+")) >= min_words)
    )
    for b in banned:
        keep = keep & ~lowered.contains(b.lower())
    kept = lines.filter(keep)
    n_lines = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_total")
    )
    return (
        _reassemble(kept, docs, id_col, text_col)
        .join(n_lines, id_col)
        .select(
            id_col,
            text_col,
            "n_kept",
            (F.col("_n_total") - F.col("n_kept")).alias("n_removed"),
        )
    )


def _window_grams(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, tok, _gh): every whitespace token with the md5 key of
    the k-token window STARTING at it (null for the last k-1 positions
    of a doc). One frame aggregate over the id partition."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    fwd = Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, k - 1)
    return toks.select(
        id_col,
        "pos",
        "tok",
        F.when(
            F.count("tok").over(fwd) == k,
            F.md5(F.concat_ws("\x1f", F.collect_list("tok").over(fwd))),
        ).alias("_gh"),
    )


def duplicated_window_hashes(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The boilerplate census: (window_hash) of every k-token window
    whose exact token sequence occurs in >= ``min_docs`` DISTINCT
    documents. ONE map-side-combined corpus-wide shuffle; the output
    is bounded by the repeated-boilerplate universe, not the corpus.
    Persist it to serve :func:`span_coverage` gates."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    grams = _window_grams(docs, k, id_col, text_col)
    return (
        grams.where(F.col("_gh").isNotNull())
        .groupBy("_gh")
        .agg(F.count_distinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select(F.col("_gh").alias("window_hash"))
    )


def span_coverage(
    docs: DataFrame,
    dup_hashes: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a duplicated-window census: (id,
    n_tokens, n_covered, covered_frac) where n_covered counts tokens
    covered by ANY census window and covered_frac is rounded to 6 dp
    (cross-engine float contract). The ingest-gate primitive: a high
    fraction means the doc is mostly known boilerplate.

    Plan: the doc side gets the same forward-frame window keys (one
    Exchange on id), a left join marks census hits (census side
    bounded — broadcast or bucket at scale), the backward frame and
    the per-doc count reuse the id partition.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    grams = _window_grams(docs, k, id_col, text_col)
    flagged = grams.join(
        dup_hashes.withColumnRenamed("window_hash", "_dup_gh"),
        grams["_gh"] == F.col("_dup_gh"),
        "left",
    ).select(
        id_col,
        "pos",
        F.col("_dup_gh").isNotNull().cast("int").alias("_dup_start"),
    )
    back = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(k - 1), 0)
    )
    return (
        flagged.withColumn(
            "_covered",
            (F.max("_dup_start").over(back) == 1).cast("long"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("_covered").cast("long").alias("n_covered"),
        )
        .withColumn(
            "covered_frac",
            F.round(F.col("n_covered") / F.col("n_tokens"), 6),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-SPAN removal — the distributed,
    token-window analogue of ExactSubstr dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better", which
    removes every substring of >= 50 tokens that appears twice; their
    implementation is a single-machine suffix array). Here a token is
    a whitespace word and a span is any maximal run covered by
    duplicated ``k``-token windows: a window is duplicated when its
    exact token sequence occurs in >= ``min_docs`` DISTINCT documents,
    and a token is removed when ANY duplicated window covers it.
    Survivors are re-joined with single spaces in original order.

    Output: (id, text, n_kept, n_removed) with token counts.

    Plan shape / 100 TB: posexplode to (id, pos, tok); the k-token
    window key is a frame aggregate over the id partition (ONE
    Exchange on id); the census groupBy on the window hash is the
    only corpus-wide shuffle (map-side combined, output = the
    duplicated-window set, bounded by the repeated-boilerplate
    universe); the census joins back with the strategy left to
    Catalyst/AQE (broadcast when small); coverage is a second
    frame aggregate over the SAME id partition (no new Exchange); the
    regroup reuses it too; total token counts are a pure projection on
    the input (no extra explode branch). Docs shorter than ``k``
    tokens produce no windows and are never touched.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    from pyspark.sql import Window

    grams = _window_grams(docs, k, id_col, text_col)
    dup = duplicated_window_hashes(
        docs, k, min_docs, id_col, text_col
    ).select(F.col("window_hash").alias("_dup_gh"))
    # join strategy left to Catalyst/AQE (same posture as
    # span_coverage): the census is bounded by the repeated-
    # boilerplate universe, which broadcasts when pruned but can be
    # multi-GB on a full crawl — a forced broadcast hint would bypass
    # autoBroadcastJoinThreshold and OOM instead of falling back to a
    # shuffle join.
    flagged = grams.join(
        dup, grams["_gh"] == F.col("_dup_gh"), "left"
    ).select(
        id_col,
        "pos",
        "tok",
        F.col("_dup_gh").isNotNull().cast("int").alias("_dup_start"),
    )
    back = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(-(k - 1), 0)
    )
    kept = flagged.withColumn(
        "_covered", F.max("_dup_start").over(back) == 1
    ).where(~F.col("_covered"))
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias(
                "_ts"
            ),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
        )
        .select(
            id_col,
            F.concat_ws(" ", F.expr("transform(_ts, s -> s.tok)")).alias(
                text_col
            ),
            "n_kept",
        )
    )
    # total token count is a pure projection on docs (size of the same
    # split the explode used) — no third explode/groupBy branch
    totals = docs.select(
        id_col,
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        .cast("long")
        .alias("_n_total"),
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
            (
                F.col("_n_total")
                - F.coalesce("n_kept", F.lit(0).cast("long"))
            ).alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def duckdb_lines_sql(pages_sql: str, id_col: str = "doc_id") -> str:
    """(id, line_idx, line) over an arbitrary page source — the twin
    of :func:`split_lines` (1-based generate_subscripts aligned to
    Spark's 0-based posexplode by subtracting 1)."""
    return f"""
        SELECT {id_col},
               generate_subscripts(_ls, 1) - 1 AS line_idx,
               unnest(_ls) AS line
        FROM (SELECT {id_col}, string_split(text, chr(10)) AS _ls
              FROM ({pages_sql}) p)
    """


def _duck_reassemble(kept_cte: str, pages_cte: str, id_col: str) -> str:
    return f"""
        SELECT p.{id_col},
               coalesce(k.text, '') AS text,
               coalesce(k.n_kept, 0) AS n_kept,
               n.n_total - coalesce(k.n_kept, 0) AS n_removed
        FROM (SELECT DISTINCT {id_col} FROM ({pages_cte})) p
        JOIN (SELECT {id_col}, count(*) AS n_total
              FROM _lines GROUP BY 1) n USING ({id_col})
        LEFT JOIN (
          SELECT {id_col},
                 string_agg(line, chr(10) ORDER BY line_idx) AS text,
                 count(*) AS n_kept
          FROM ({kept_cte}) GROUP BY 1
        ) k USING ({id_col})
    """


def duckdb_line_dedup_sql(
    pages_sql: str, min_docs: int = 5, id_col: str = "doc_id"
) -> str:
    """Twin of :func:`remove_repeated_lines` over ``pages_sql``."""
    return f"""
        WITH _lines AS ({duckdb_lines_sql(pages_sql, id_col)}),
        _boiler AS (
          SELECT md5(line) AS line_hash
          FROM _lines GROUP BY 1
          HAVING count(DISTINCT {id_col}) >= {min_docs}
        )
        {_duck_reassemble(
            f"SELECT * FROM _lines WHERE md5(line) NOT IN (SELECT line_hash FROM _boiler)",
            pages_sql, id_col,
        )}
    """


def duckdb_c4_clean_sql(
    pages_sql: str,
    min_words: int = 3,
    id_col: str = "doc_id",
    banned: tuple[str, ...] = C4_BANNED,
) -> str:
    """Twin of :func:`c4_clean_lines` over ``pages_sql``."""
    bans = " AND ".join(
        f"NOT contains(lower(line), '{b.lower()}')" for b in banned
    )
    keep = (
        f"regexp_matches(line, '{_TERMINAL_RE}') "
        f"AND length(string_split_regex(trim(line), '\\s+')) >= {min_words} "
        f"AND {bans}"
    )
    return f"""
        WITH _lines AS ({duckdb_lines_sql(pages_sql, id_col)})
        {_duck_reassemble(
            f"SELECT * FROM _lines WHERE {keep}", pages_sql, id_col
        )}
    """


def duckdb_span_coverage_sql(
    docs_sql: str,
    census_docs_sql: str,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> str:
    """Twin of :func:`span_coverage` with the census built over
    ``census_docs_sql`` — (id, n_tokens, n_covered, covered_frac)."""
    sep = "chr(31)"

    def toks(src: str, alias: str) -> str:
        return f"""
          SELECT {id_col},
                 generate_subscripts(_ws, 1) - 1 AS pos,
                 unnest(_ws) AS tok
          FROM (SELECT {id_col},
                       string_split_regex(trim(text), '\\s+') AS _ws
                FROM ({src}) {alias})
        """

    def grams(toks_cte: str) -> str:
        return f"""
          SELECT {id_col}, pos, tok,
                 CASE WHEN count(*) OVER w = {k}
                      THEN md5(string_agg(tok, {sep}) OVER w) END AS _gh
          FROM ({toks_cte})
          WINDOW w AS (PARTITION BY {id_col} ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {k - 1} FOLLOWING)
        """

    return f"""
        WITH _census AS (
          SELECT _gh FROM ({grams(toks(census_docs_sql, "c0"))})
          WHERE _gh IS NOT NULL
          GROUP BY 1 HAVING count(DISTINCT {id_col}) >= {min_docs}
        ),
        _flag AS (
          SELECT {id_col}, pos,
                 max(CASE WHEN _gh IN (SELECT _gh FROM _census)
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY {id_col} ORDER BY pos
                         ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
                   AS _cov
          FROM ({grams(toks(docs_sql, "d0"))})
        )
        SELECT {id_col},
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(_cov) AS BIGINT) AS n_covered,
               round(sum(_cov) * 1.0 / count(*), 6) AS covered_frac
        FROM _flag GROUP BY 1
    """


def duckdb_span_dedup_sql(
    pages_sql: str,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
) -> str:
    """Twin of :func:`remove_duplicated_spans` over ``pages_sql``.

    Mirrors the Spark plan step for step: whitespace tokens with
    0-based positions, a forward k-row frame building the window key
    (windowed ``string_agg`` concatenates in frame order — verified —
    matching Spark's windowed ``collect_list``), the distinct-doc
    census, and the backward k-row coverage max. ``count(*)`` is
    BIGINT in DuckDB, matching the Spark side's explicit long casts.
    """
    sep = "chr(31)"  # \\x1f, same separator as the Spark side
    return f"""
        WITH _toks AS (
          SELECT {id_col},
                 generate_subscripts(_ws, 1) - 1 AS pos,
                 unnest(_ws) AS tok
          FROM (SELECT {id_col},
                       string_split_regex(trim(text), '\\s+') AS _ws
                FROM ({pages_sql}) src)
        ),
        _grams AS (
          SELECT {id_col}, pos, tok,
                 CASE WHEN count(*) OVER w = {k}
                      THEN md5(string_agg(tok, {sep}) OVER w) END AS _gh
          FROM _toks
          WINDOW w AS (PARTITION BY {id_col} ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {k - 1} FOLLOWING)
        ),
        _dup AS (
          SELECT _gh FROM _grams WHERE _gh IS NOT NULL
          GROUP BY 1 HAVING count(DISTINCT {id_col}) >= {min_docs}
        ),
        _kept AS (
          SELECT {id_col}, pos, tok FROM (
            SELECT {id_col}, pos, tok,
                   max(CASE WHEN _gh IN (SELECT _gh FROM _dup)
                            THEN 1 ELSE 0 END)
                     OVER (PARTITION BY {id_col} ORDER BY pos
                           ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
                     AS _cov
            FROM _grams
          ) WHERE _cov = 0
        ),
        _reb AS (
          SELECT {id_col},
                 string_agg(tok, ' ' ORDER BY pos) AS text,
                 count(*) AS n_kept
          FROM _kept GROUP BY 1
        ),
        _tot AS (
          SELECT {id_col}, count(*) AS n_total FROM _toks GROUP BY 1
        )
        SELECT p.{id_col},
               coalesce(r.text, '') AS text,
               coalesce(r.n_kept, 0) AS n_kept,
               t.n_total - coalesce(r.n_kept, 0) AS n_removed
        FROM (SELECT DISTINCT {id_col} FROM ({pages_sql}) s2) p
        JOIN _tot t USING ({id_col})
        LEFT JOIN _reb r USING ({id_col})
    """

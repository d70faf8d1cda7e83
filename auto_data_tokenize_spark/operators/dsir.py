"""DSIR-style data selection via hashed n-gram importance resampling.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", DSIR) select pre-training documents whose hashed n-gram
feature distribution looks like a small TARGET set rather than the
RAW crawl: unigrams+bigrams hash into B buckets, bucket distributions
p (target) and q (raw) are estimated with Laplace smoothing, and each
raw document gets the importance weight

    log w(x) = sum over gram occurrences g in x of
               [ ln p_hat(bucket(g)) - ln q_hat(bucket(g)) ]

after which DSIR samples with Gumbel noise. This implementation keeps
the estimator and makes the selection DETERMINISTIC (top-k on the
weight with a doc_id tie-break) so results are reproducible and
oracle-checkable — the Gumbel draw is orthogonal to the distributed
plan and callers can re-add it on the emitted weights.

Exactness contract: each bucket's log-ratio is rounded to 6 dp ONCE
(in the shared ratio table) and scaled to integer micro-units
(``ratio_micro6 = round(ratio * 1e6)`` as BIGINT), so the per-document
weight is an exact INTEGER sum — no cross-engine float-summation-order
risk at all; ``logw_micro6 / 1e6`` recovers the float weight.

100 TB shape: the gram projection is one narrow lag window per doc
(ONE Exchange on doc_id); each distribution is a map-side-combined
groupBy whose shuffle volume is at most B rows per map task; the
ratio table is B rows (B ~ 1e4) and broadcasts to the scoring join;
the per-doc sum partial-aggregates map-side before its doc_id
shuffle. The raw corpus is never joined to itself and never collected.

Reference relation: the reference decides per-column flow with a
sampled DLP model (DlpSampleIdentify, SURVEY.md §2.4); this is the
corpus-level analogue — a bounded in-engine model (2·B counts)
deciding which documents flow onward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from auto_data_tokenize_spark.functions.xengine import (
    duckdb_md5_prefix,
    spark_md5_prefix,
)

__all__ = [
    "hashed_gram_buckets",
    "dsir_log_ratios",
    "dsir_default_ratio_micro6",
    "score_against_ratios",
    "dsir_weights",
    "dsir_select",
    "duckdb_dsir_weights_sql",
    "duckdb_dsir_select_sql",
]


def _grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram): every unigram and bigram occurrence, same trim +
    ``\\s+`` token contract as textstats/lm. One lag window per doc
    (single Exchange on the id); bigrams join with a single space."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "w"
        ),
    )
    return (
        toks.withColumn("_p1", F.lag("w", 1).over(w))
        .select(
            id_col,
            F.explode(
                F.array(
                    F.col("w"),
                    F.when(
                        F.col("_p1").isNotNull(),
                        F.concat_ws(" ", "_p1", "w"),
                    ),
                )
            ).alias("gram"),
        )
        .where(F.col("gram").isNotNull())
    )


def hashed_gram_buckets(
    docs: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, cnt): per-document hashed n-gram bucket counts.
    Bucket = md5-prefix(gram) % n_buckets — the repo's single
    cross-engine hash construction (functions/xengine.py)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    return (
        _grams(docs, id_col, text_col)
        .select(
            id_col,
            (F.expr(spark_md5_prefix("gram")) % n_buckets).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _bucket_totals(grams: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, cnt) distribution of a gram stream — map-side combined,
    shuffle volume <= n_buckets per map task."""
    return grams.select(
        (F.expr(spark_md5_prefix("gram")) % n_buckets).alias("bucket")
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def dsir_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(bucket, ratio_micro6): the Laplace-smoothed (alpha=1)
    importance log-ratio per hashed bucket, rounded to 6 dp and
    scaled to integer micro-units. Emits every bucket observed in
    EITHER corpus (full outer), so the table is complete for scoring
    the raw docs AND serves as a static table for new documents —
    anything outside it is a both-sides-zero bucket, whose constant
    ratio :func:`dsir_default_ratio_micro6` supplies."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    rg = _grams(raw, id_col, text_col)
    tg = _grams(target, id_col, text_col)
    rb = _bucket_totals(rg, n_buckets)
    tb = _bucket_totals(tg, n_buckets)
    # coalesce: an EMPTY corpus sums to NULL, which would silently
    # null every ratio; with 0 the alpha smoothing still defines a
    # (uniform) distribution
    rtot = rb.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("_rtot")
    )
    ttot = tb.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("_ttot")
    )
    joined = (
        rb.withColumnRenamed("cnt", "_rc")
        .join(
            tb.withColumnRenamed("cnt", "_tc"),
            "bucket",
            "full_outer",
        )
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
    )
    ratio = (
        F.log(F.coalesce("_tc", F.lit(0)) + F.lit(1))
        - F.log(F.col("_ttot") + F.lit(n_buckets))
        - F.log(F.coalesce("_rc", F.lit(0)) + F.lit(1))
        + F.log(F.col("_rtot") + F.lit(n_buckets))
    )
    return joined.select(
        "bucket",
        F.round(F.round(ratio, 6) * 1e6).cast("long").alias(
            "ratio_micro6"
        ),
    )


def dsir_default_ratio_micro6(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """1-row (default_ratio_micro6): the log-ratio of a bucket with
    ZERO count on both sides — ``ln(rtot+B) - ln(ttot+B)`` under the
    same alpha=1 smoothing and rounding. This is what an
    out-of-census bucket (a gram never seen when the static ratio
    table was built) must contribute when scoring NEW documents, so
    streaming gates stay exact instead of silently dropping unseen
    grams."""
    rtot = _grams(raw, id_col, text_col).agg(
        F.count(F.lit(1)).alias("_r")  # count(): 0 on empty, no NULL
    )
    ttot = _grams(target, id_col, text_col).agg(
        F.count(F.lit(1)).alias("_t")
    )
    return rtot.crossJoin(ttot).select(
        F.round(
            F.round(
                F.log(F.col("_r") + F.lit(n_buckets))
                - F.log(F.col("_t") + F.lit(n_buckets)),
                6,
            )
            * 1e6
        )
        .cast("long")
        .alias("default_ratio_micro6")
    )


def score_against_ratios(
    docs: DataFrame,
    ratios: DataFrame,
    default_ratio_micro6: int,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score NEW documents against a STATIC ratio table: (id,
    n_grams, logw_micro6). Buckets absent from the table (grams the
    table's raw corpus never produced) contribute
    ``default_ratio_micro6`` per occurrence — the zero-count smoothing
    value, so the streaming score equals what a batch rebuild with
    those docs' buckets at count zero would give. LEFT broadcast join
    + one map-side-combined groupBy on the id."""
    per_doc = hashed_gram_buckets(docs, n_buckets, id_col, text_col)
    return (
        per_doc.join(F.broadcast(ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(
                F.col("cnt")
                * F.coalesce(
                    "ratio_micro6", F.lit(int(default_ratio_micro6))
                )
            )
            .cast("long")
            .alias("logw_micro6"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams, logw_micro6) for every raw document: the exact
    integer micro-unit importance weight (sum of per-occurrence
    bucket ratios) and the gram-occurrence count. Higher = more
    target-like. The ratio table broadcasts; the per-doc sum is one
    map-side-combined groupBy on the id."""
    ratios = dsir_log_ratios(raw, target, n_buckets, id_col, text_col)
    per_doc = hashed_gram_buckets(raw, n_buckets, id_col, text_col)
    return (
        per_doc.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("ratio_micro6"))
            .cast("long")
            .alias("logw_micro6"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic DSIR selection: the ``k`` most target-like raw
    documents by (logw_micro6 DESC, id ASC) — a total order, so the
    LIMIT boundary is stable across runs, layouts, and engines."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = dsir_weights(raw, target, n_buckets, id_col, text_col)
    return w.orderBy(
        F.col("logw_micro6").desc(), F.col(id_col).asc()
    ).limit(k)


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def _duck_grams(docs_sql: str, id_col: str, text_col: str) -> str:
    return f"""
        SELECT {id_col}, gram FROM (
          SELECT {id_col}, w AS gram FROM (
            SELECT {id_col}, unnest(string_split_regex(trim({text_col}),
                   '\\s+')) AS w
            FROM ({docs_sql}) t1)
          UNION ALL
          SELECT {id_col},
                 lag(w) OVER (PARTITION BY {id_col} ORDER BY pos)
                   || ' ' || w AS gram
          FROM (
            SELECT {id_col},
                   generate_subscripts(_ws, 1) AS pos, unnest(_ws) AS w
            FROM (SELECT {id_col},
                         string_split_regex(trim({text_col}), '\\s+')
                           AS _ws
                  FROM ({docs_sql}) t2) t3) t4
        ) g WHERE gram IS NOT NULL
    """


def _duck_bucket(n_buckets: int) -> str:
    return f"({duckdb_md5_prefix('gram')} % {n_buckets})"


def duckdb_dsir_weights_sql(
    raw_sql: str,
    target_sql: str,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Twin of :func:`dsir_weights` — same hash family, same Laplace
    smoothing, same 6-dp-then-micro-integer rounding, so the summed
    weights are bit-identical BIGINTs."""
    b = _duck_bucket(n_buckets)
    return f"""
        WITH _rg AS ({_duck_grams(raw_sql, id_col, text_col)}),
        _tg AS ({_duck_grams(target_sql, id_col, text_col)}),
        _rb AS (SELECT {b} AS bucket, CAST(count(*) AS BIGINT) AS rc
                FROM _rg GROUP BY 1),
        _tb AS (SELECT {b} AS bucket, CAST(count(*) AS BIGINT) AS tc
                FROM _tg GROUP BY 1),
        _tot AS (SELECT
            (SELECT CAST(coalesce(sum(rc), 0) AS BIGINT) FROM _rb) AS rtot,
            (SELECT CAST(coalesce(sum(tc), 0) AS BIGINT) FROM _tb) AS ttot),
        _ratio AS (
          SELECT bucket,
                 CAST(round(round(
                     ln(coalesce(tc, 0) + 1)
                   - ln(ttot + {n_buckets})
                   - ln(coalesce(rc, 0) + 1)
                   + ln(rtot + {n_buckets}), 6) * 1e6) AS BIGINT)
                   AS ratio_micro6
          FROM _rb FULL OUTER JOIN _tb USING (bucket) CROSS JOIN _tot
        ),
        _docb AS (
          SELECT {id_col}, {b} AS bucket,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM _rg GROUP BY 1, 2
        )
        SELECT {id_col},
               CAST(sum(cnt) AS BIGINT) AS n_grams,
               CAST(sum(cnt * ratio_micro6) AS BIGINT) AS logw_micro6
        FROM _docb JOIN _ratio USING (bucket)
        GROUP BY 1
    """


def duckdb_dsir_select_sql(
    raw_sql: str,
    target_sql: str,
    k: int,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Twin of :func:`dsir_select`."""
    return f"""
        SELECT * FROM ({duckdb_dsir_weights_sql(
            raw_sql, target_sql, n_buckets, id_col, text_col)})
        ORDER BY logw_micro6 DESC, {id_col} ASC
        LIMIT {k}
    """

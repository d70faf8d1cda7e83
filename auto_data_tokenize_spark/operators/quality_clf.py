"""Distributed Naive-Bayes document classifier — the "quality
classifier" stage of pretraining corpus assembly (the CCNet / GPT-3
recipe: train a cheap linear classifier on a labeled slice, score the
whole corpus, keep documents the classifier likes).

    score(x) = ln P(1) - ln P(0)
             + sum over token occurrences t in x of
               [ ln p(t|1) - ln p(t|0) ]        (Laplace alpha = 1)

Why NB and not SGD: the sufficient statistics are per-(token, class)
counts — ONE map-side-combined groupBy over the labeled corpus trains
the model exactly, with no iterative driver loop, no learning-rate
state, and a bit-for-bit reproducible result at any cluster size. The
model is a bounded table (vocab × 2 counts) that broadcasts.

Exactness contract (the DSIR discipline, operators/dsir.py): every
per-token log-likelihood ratio is rounded to 6 dp ONCE at train time
and materialized as an exact integer in MICRO-UNITS (×1e6, BIGINT);
scoring is pure integer addition, so token order, partitioning and
engine never perturb a score, and threshold compares are exact integer
comparisons. Unseen tokens get the exact smoothing-floor ratio
(``ln(N0+V) - ln(N1+V)``) rather than being dropped.

Token contract: ``split(trim(text), '\\s+')`` — identical to the LM /
token-count operators (textstats.ws_tokens_expr), twinned in DuckDB by
``string_split_regex``.

100 TB shape: train = one narrow groupBy with map-side combine (+ two
1-row aggregates); the ratio table is vocabulary-sized (count-cutoff
pruned) and broadcast for scoring; score = one explode + one hash join
+ one per-doc partial agg. No driver-side data beyond the 2-row class
totals.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "NaiveBayesModel",
    "train_nb",
    "score_nb",
    "duckdb_nb_score_sql",
]


def _tokens(text_col: str) -> "F.Column":
    return F.split(F.trim(F.col(text_col)), r"\s+")


@dataclass
class NaiveBayesModel:
    """ratios: (token, ratio_micro6 long); defaults: 1 row
    (default_ratio_micro6, prior_micro6) — both bounded tables.
    ``ratios`` is built on a PERSISTED count table (see train_nb);
    call :meth:`unpersist` when the model is retired."""

    ratios: DataFrame
    defaults: DataFrame
    _counts: DataFrame | None = None

    def unpersist(self) -> None:
        if self._counts is not None:
            self._counts.unpersist()

    def __enter__(self) -> "NaiveBayesModel":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


def train_nb(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    min_count: int = 1,
) -> NaiveBayesModel:
    """Train on a labeled corpus (``label_col`` boolean-ish: truthy =
    positive class). Tokens below ``min_count`` TOTAL occurrences are
    pruned from the vocabulary (they score as unseen — the count-cutoff
    that keeps the model broadcast-sized on web-scale corpora)."""
    toks = labeled.select(
        F.col(label_col).cast("boolean").alias("_y"),
        F.explode(_tokens(text_col)).alias("_t"),
    )
    counts = (
        toks.groupBy("_t")
        .agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0))
            .cast("long")
            .alias("_c1"),
            F.sum(F.when(F.col("_y"), 0).otherwise(1))
            .cast("long")
            .alias("_c0"),
        )
        .filter((F.col("_c1") + F.col("_c0")) >= min_count)
    )
    # persist: the count table is consumed twice (the totals row here,
    # the ratio projection at score time) — without it the full
    # explode+groupBy over the labeled corpus would run twice, and a
    # mutated source between train and score would silently desync the
    # collected totals from the recomputed counts
    counts = counts.persist()
    # class totals and doc priors are 1-row bounded summaries (the IVF
    # centroid precedent) — collecting them here both inlines them as
    # literals (no crossJoins in the ratio plan) and lets an unusable
    # training set FAIL FAST instead of silently nulling every score
    # through ln(0)
    tot = counts.agg(
        F.coalesce(F.sum("_c1"), F.lit(0)).cast("long").alias("_n1"),
        F.coalesce(F.sum("_c0"), F.lit(0)).cast("long").alias("_n0"),
        F.count(F.lit(1)).cast("long").alias("_v"),
    ).first()
    dc = labeled.select(F.col(label_col).cast("boolean").alias("_y")).agg(
        F.coalesce(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("_d1"),
        F.coalesce(
            F.sum(F.when(F.col("_y"), 0).otherwise(1)), F.lit(0)
        ).cast("long").alias("_d0"),
    ).first()
    if dc["_d1"] == 0 or dc["_d0"] == 0 or tot["_v"] == 0:
        raise ValueError(
            "train_nb needs labeled documents in BOTH classes with a "
            f"non-empty vocabulary (got d1={dc['_d1']}, d0={dc['_d0']}, "
            f"vocab={tot['_v']})"
        )
    micro = lambda c: F.round(F.round(c, 6) * 1e6).cast("long")  # noqa: E731
    spark = labeled.sparkSession
    ratios = counts.select(
        F.col("_t").alias("token"),
        micro(
            F.log(F.col("_c1") + F.lit(1))
            - F.log(F.lit(tot["_n1"] + tot["_v"]))
            - F.log(F.col("_c0") + F.lit(1))
            + F.log(F.lit(tot["_n0"] + tot["_v"]))
        ).alias("ratio_micro6"),
    )
    defaults = spark.range(1).select(
        micro(
            F.log(F.lit(tot["_n0"] + tot["_v"]))
            - F.log(F.lit(tot["_n1"] + tot["_v"]))
        ).alias("default_ratio_micro6"),
        micro(
            F.log(F.lit(dc["_d1"])) - F.log(F.lit(dc["_d0"]))
        ).alias("prior_micro6"),
    )
    return NaiveBayesModel(ratios=ratios, defaults=defaults, _counts=counts)


def score_nb(
    docs: DataFrame,
    model: NaiveBayesModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, score_micro6): exact integer log-posterior ratio
    per document; ``score_micro6 > 0`` reads "positive class more
    likely". The ratio table joins broadcast; the per-doc reduction is
    one partial-agg groupBy."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    scored = (
        toks.join(F.broadcast(model.ratios), "token", "left")
        .crossJoin(F.broadcast(model.defaults))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (
                F.sum(
                    F.coalesce(
                        F.col("ratio_micro6"),
                        F.col("default_ratio_micro6"),
                    )
                ).cast("long")
                + F.min("prior_micro6")
            ).alias("score_micro6"),
        )
    )
    return scored


def duckdb_nb_score_sql(
    labeled_sql: str,
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_expr: str = "label",
    min_count: int = 1,
) -> str:
    """DuckDB twin of ``score_nb(docs, train_nb(labeled))`` in one
    statement — identical tokens, identical Laplace arithmetic,
    identical double-round micro-unit quantization."""

    def toks(src: str, extra: str) -> str:
        return f"""
          SELECT {extra}, unnest(string_split_regex(trim({text_col}),
                                                    '\\s+')) AS token
          FROM ({src}) s
        """

    return f"""
        WITH _lt AS ({toks(labeled_sql, f"CAST({label_expr} AS BOOLEAN) AS _y")}),
        _cnt AS (
          SELECT token,
                 CAST(sum(CASE WHEN _y THEN 1 ELSE 0 END) AS BIGINT) AS _c1,
                 CAST(sum(CASE WHEN _y THEN 0 ELSE 1 END) AS BIGINT) AS _c0
          FROM _lt GROUP BY 1
          HAVING sum(1) >= {min_count}
        ),
        _tot AS (
          SELECT CAST(coalesce(sum(_c1), 0) AS BIGINT) AS _n1,
                 CAST(coalesce(sum(_c0), 0) AS BIGINT) AS _n0,
                 CAST(count(*) AS BIGINT) AS _v
          FROM _cnt
        ),
        _docs AS (
          SELECT CAST(coalesce(sum(CASE WHEN CAST({label_expr} AS BOOLEAN)
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS _d1,
                 CAST(coalesce(sum(CASE WHEN CAST({label_expr} AS BOOLEAN)
                                    THEN 0 ELSE 1 END), 0) AS BIGINT) AS _d0
          FROM ({labeled_sql}) l
        ),
        _ratio AS (
          SELECT token,
                 CAST(round(round(
                   ln(_c1 + 1) - ln(_n1 + _v)
                   - ln(_c0 + 1) + ln(_n0 + _v), 6) * 1e6) AS BIGINT)
                 AS ratio_micro6
          FROM _cnt, _tot
        ),
        _def AS (
          SELECT CAST(round(round(ln(_n0 + _v) - ln(_n1 + _v), 6) * 1e6)
                      AS BIGINT) AS default_ratio_micro6,
                 CAST(round(round(ln(_d1) - ln(_d0), 6) * 1e6) AS BIGINT)
                      AS prior_micro6
          FROM _tot, _docs
        ),
        _dt AS ({toks(docs_sql, id_col)})
        SELECT t.{id_col},
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(coalesce(r.ratio_micro6, d.default_ratio_micro6))
                    + min(d.prior_micro6) AS BIGINT) AS score_micro6
        FROM _dt t LEFT JOIN _ratio r ON t.token = r.token
        CROSS JOIN _def d
        GROUP BY 1
    """

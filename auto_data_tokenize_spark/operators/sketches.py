"""KMV (k-minimum-values) distinct-count sketch.

The classic bottom-k sketch (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"): hash every value into (0, 1],
keep the k smallest distinct hashes per group; if fewer than k
distinct hashes exist the count is exact, otherwise the k-th minimum
R estimates the cardinality as (k-1)/R. Mergeable (union the bottom-k
sets, re-take bottom k), bounded state (k doubles per group), and —
unlike Spark's built-in HLL ``approx_count_distinct`` — fully
deterministic given the hash, so the DuckDB oracle recomputes the
IDENTICAL estimate (the correctness gate checks the sketch itself,
not a tolerance band).

Plan shape: distinct (group, hash) → per-group bottom-k via a window
→ one aggregate. The distinct is the only big shuffle, on exactly the
data any distinct-count must see; the window never materializes
per-group arrays (contrast collect_set, which is unbounded per group).
A production continuous variant would wrap the same math in a custom
bounded aggregator; this form is the batch/SQL-portable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 32-bit hash space; +1 shifts into (0, 1] so R is never zero
_H32 = 4_294_967_296


def _hash_expr(col: str) -> str:
    """Deterministic (0,1] hash both engines compute identically:
    first 8 hex chars of md5 as uint32, shifted and normalized."""
    return (
        f"(cast(conv(substring(md5({col}), 1, 8), 16, 10) as double) + 1.0)"
        f" / {_H32}.0"
    )


def duckdb_kmv_hash_sql(col: str) -> str:
    return f"((('0x' || substr(md5({col}), 1, 8))::BIGINT::DOUBLE + 1.0) / {_H32}.0)"


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group_col, n_hashes ≤ k, kmv_est) where kmv_est is the
    exact distinct-hash count when the group has fewer than k distinct
    hashes, else round((k-1)/R, 6)."""
    if k < 2:
        raise ValueError("k must be at least 2")
    # NULL values are not elements (countDistinct semantics) — and the
    # engines disagree on NULL ordering in the bottom-k window (Spark
    # sorts NULLS FIRST, DuckDB NULLS LAST), so they must never reach it
    dh = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), F.expr(_hash_expr(value_col)).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("_h")
    topk = dh.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        topk.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max("_h").alias("_r"),
        )
        .select(
            group_col,
            "n_hashes",
            F.expr(
                f"CASE WHEN n_hashes < {k} THEN cast(n_hashes as double)"
                f" ELSE round(({k} - 1) / _r, 6) END"
            ).alias("kmv_est"),
        )
    )


def duckdb_kmv_sql(
    src_sql: str, group_col: str, value_col: str, k: int = 256
) -> str:
    """DuckDB twin of :func:`kmv_distinct` over an arbitrary
    (group, value) source subquery — identical hash, bottom-k, and
    estimator."""
    return f"""
        WITH dh AS (
          SELECT DISTINCT {group_col}, {duckdb_kmv_hash_sql(value_col)} AS h
          FROM ({src_sql}) src
          WHERE {value_col} IS NOT NULL
        ),
        topk AS (
          SELECT * FROM dh
          QUALIFY row_number() OVER (PARTITION BY {group_col} ORDER BY h) <= {k}
        )
        SELECT {group_col}, COUNT(*) AS n_hashes,
               CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE
                    ELSE round(({k} - 1) / MAX(h), 6) END AS kmv_est
        FROM topk GROUP BY {group_col}
    """

"""Re-identification risk analysis (DLP risk-analysis analogue).

The reference engine's platform exposes privacy risk metrics over
de-identified tables through the public DLP risk-analysis API
(``RiskAnalysisJobConfig``: k-anonymity, l-diversity). The reference
repo itself stops at producing the de-identified table; an operator of
that pipeline measures residual risk with exactly these metrics, so
this engine implements the locally-computable members:

- **k-anonymity**: group records by the quasi-identifier tuple; the
  table is k-anonymous iff every equivalence class has >= k records.
  Outputs per-class sizes and the DLP-style class-size histogram.
- **l-diversity**: additionally require each class to contain >= l
  distinct values of a sensitive attribute.

Scale posture: one keyed groupBy per metric (map-side partial
aggregation; the quasi-identifier tuple is the shuffle key — no
skew-prone global collects). ``count_distinct`` inside the class
groupBy is exact, matching the SQL oracle; at 100 TB swap
``approx_count_distinct`` via ``exact=False`` when estimate-grade
l-diversity is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "k_anonymity",
    "k_anonymity_histogram",
    "l_diversity",
    "l_diversity_histogram",
]


def _check_cols(df: DataFrame, cols: list[str]) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if not cols:
        raise ValueError("quasi-identifier column list must be non-empty")


def k_anonymity(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """Equivalence classes over the quasi-identifier tuple:
    ``qi_cols... , class_size``. The table's k value is
    ``min(class_size)``."""
    _check_cols(df, qi_cols)
    return df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("class_size"))


def k_anonymity_histogram(df: DataFrame, qi_cols: list[str]) -> DataFrame:
    """DLP-style result shape: how many equivalence classes (and
    records) exist at each class size — ``class_size, num_classes,
    num_records``. Two keyed aggregations, both with map-side partials."""
    classes = k_anonymity(df, qi_cols)
    return classes.groupBy("class_size").agg(
        F.count(F.lit(1)).alias("num_classes"),
        F.sum("class_size").cast("long").alias("num_records"),
    )


def l_diversity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    exact: bool = True,
) -> DataFrame:
    """Per equivalence class: ``qi_cols..., class_size,
    distinct_sensitive``. The table is l-diverse iff
    ``min(distinct_sensitive) >= l``."""
    _check_cols(df, qi_cols + [sensitive_col])
    distinct = (
        F.count_distinct(F.col(sensitive_col))
        if exact
        else F.approx_count_distinct(F.col(sensitive_col))
    )
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("class_size"),
        distinct.cast("long").alias("distinct_sensitive"),
    )


def l_diversity_histogram(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    exact: bool = True,
) -> DataFrame:
    """How many classes exist at each sensitive-value diversity level:
    ``distinct_sensitive, num_classes, num_records``."""
    classes = l_diversity(df, qi_cols, sensitive_col, exact=exact)
    return classes.groupBy("distinct_sensitive").agg(
        F.count(F.lit(1)).alias("num_classes"),
        F.sum("class_size").cast("long").alias("num_records"),
    )

"""Generalization to k-anonymity: ladder-based global recoding.

The risk metrics in :mod:`auto_data_tokenize_spark.operators.risk`
MEASURE residual re-identification risk; this operator FIXES a failing
report. Given a generalization ladder per quasi-identifier (raw →
coarser buckets / shorter prefixes → suppressed), it finds the lowest
uniform ladder level at which every equivalence class holds at least k
records, and rewrites the columns at that level — the classic
full-domain global-recoding scheme from the k-anonymity literature
(Samarati/Sweeney), restricted to declarative level specs so the
result is exactly reproducible in plain SQL.

Level specs (one list per column, all lists the same length; level 0
is the first entry and is normally ``("raw",)``):

- ``("raw",)``       — keep the value (numeric: low = high = value)
- ``("bucket", w)``  — numeric half-open bucket ``[floor(v/w)*w, +w)``
- ``("prefix", n)``  — string truncated to its first n characters
- ``("suppress",)``  — numeric → NULL/NULL, string → ``"*"``

Scale shape: the level search never re-shuffles records. ONE keyed
groupBy reduces the table to (distinct raw QI tuple, count) — the same
aggregate k-anonymity itself needs — and every candidate level is
probed by re-aggregating that class table (generalization is a pure
function of the tuple, so level-l class counts are sums of level-0
class counts). The driver sees one scalar (the min class size) per
level; the final rewrite is a pure-codegen projection on the original
DataFrame. At 100 TB this is one shuffle of distinct-tuple cardinality
plus L cheap re-aggs, not L table scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["generalize_to_k", "generalized_classes"]

_SPEC_KINDS = ("raw", "bucket", "prefix", "suppress")


def _check_ladders(df: DataFrame, ladders: dict[str, list[tuple]]) -> int:
    if not ladders:
        raise ValueError("ladders must be non-empty")
    missing = [c for c in ladders if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    lengths = {len(v) for v in ladders.values()}
    if len(lengths) != 1:
        raise ValueError("every ladder must have the same number of levels")
    (n_levels,) = lengths
    if n_levels == 0:
        raise ValueError("ladders must define at least one level")
    for col, levels in ladders.items():
        for spec in levels:
            if not spec or spec[0] not in _SPEC_KINDS:
                raise ValueError(
                    f"bad level spec {spec!r} for {col!r}; expected one of "
                    f"{_SPEC_KINDS}"
                )
            if spec[0] == "bucket" and (len(spec) != 2 or spec[1] <= 0):
                raise ValueError(f"bucket spec needs a positive width: {spec!r}")
            if spec[0] == "prefix" and (len(spec) != 2 or spec[1] < 1):
                raise ValueError(f"prefix spec needs a length >= 1: {spec!r}")
    return n_levels


def _numeric_level_exprs(col: str, spec: tuple) -> list[tuple[str, Column]]:
    """(name, expr) pairs for a NUMERIC column at one ladder level —
    always the (col_low, col_high) pair so the output schema is
    identical at every level (suppress emits NULL/NULL)."""
    kind = spec[0]
    c = F.col(col)
    if kind == "raw":
        return [
            (f"{col}_low", c.cast("double")),
            (f"{col}_high", c.cast("double")),
        ]
    if kind == "bucket":
        w = float(spec[1])
        low = F.floor(c / F.lit(w)) * F.lit(w)
        return [
            (f"{col}_low", low.cast("double")),
            (f"{col}_high", (low + F.lit(w)).cast("double")),
        ]
    if kind == "suppress":
        null = F.lit(None).cast("double")
        return [(f"{col}_low", null), (f"{col}_high", null)]
    raise ValueError(f"string spec {spec!r} on numeric-laddered column {col!r}")


def _is_string_ladder(levels: list[tuple]) -> bool:
    return any(s[0] == "prefix" for s in levels) or all(
        s[0] in ("raw", "suppress") for s in levels
    )


def _ladder_string_cols(ladders: dict[str, list[tuple]]) -> set[str]:
    """Classify each laddered column as string vs numeric from its
    declared specs (not Spark types): any ("prefix", n) level makes a
    string ladder; any ("bucket", w) level makes it numeric; an
    all-raw/suppress ladder defaults to string."""
    string_cols = {
        c for c, levels in ladders.items() if _is_string_ladder(levels)
    }
    for col, levels in ladders.items():
        if any(s[0] == "bucket" for s in levels):
            string_cols.discard(col)
    return string_cols


def _exprs_for_level(
    ladders: dict[str, list[tuple]], level: int, string_cols: set[str]
) -> list[Column]:
    out: list[Column] = []
    for col, levels in ladders.items():
        spec = levels[level]
        if col in string_cols:
            c = F.col(col)
            if spec[0] == "raw":
                out.append(c.alias(col))
            elif spec[0] == "prefix":
                out.append(F.substring(c, 1, int(spec[1])).alias(col))
            elif spec[0] == "suppress":
                out.append(F.lit("*").alias(col))
            else:
                raise ValueError(
                    f"numeric spec {spec!r} on string-laddered column {col!r}"
                )
        else:
            for name, expr in _numeric_level_exprs(col, spec):
                out.append(expr.alias(name))
    return out


def generalize_to_k(
    df: DataFrame, ladders: dict[str, list[tuple]], k: int
) -> tuple[DataFrame, int]:
    """Rewrite the quasi-identifier columns of ``df`` at the lowest
    ladder level that achieves k-anonymity; return ``(generalized_df,
    level)``. Non-ladder columns pass through untouched. Raises
    ``ValueError`` when even the top level cannot reach k (callers
    should end the ladder with ``("suppress",)`` on every column,
    which collapses to one class of size count(*))."""
    if k < 1:
        raise ValueError("k must be >= 1")
    n_levels = _check_ladders(df, ladders)
    string_cols = _ladder_string_cols(ladders)
    qi = list(ladders.keys())
    base = (
        df.groupBy(*qi).agg(F.count(F.lit(1)).alias("_n")).persist()
    )
    try:
        chosen = None
        for level in range(n_levels):
            exprs = _exprs_for_level(ladders, level, string_cols)
            probe = (
                base.select(*exprs, "_n")
                .groupBy(*[e for e in _level_names(ladders, string_cols)])
                .agg(F.sum("_n").alias("_cs"))
                .agg(F.min("_cs").alias("_m"))
                .first()
            )
            if probe["_m"] is not None and probe["_m"] >= k:
                chosen = level
                break
        if chosen is None:
            raise ValueError(
                f"no ladder level reaches k={k}; end every ladder with "
                "('suppress',) to guarantee convergence"
            )
    finally:
        base.unpersist()

    keep = [c for c in df.columns if c not in ladders]
    out = df.select(
        *keep, *_exprs_for_level(ladders, chosen, string_cols)
    )
    return out, chosen


def _level_names(
    ladders: dict[str, list[tuple]], string_cols: set[str]
) -> list[str]:
    names: list[str] = []
    for col in ladders:
        if col in string_cols:
            names.append(col)
        else:
            names.extend([f"{col}_low", f"{col}_high"])
    return names


def generalized_classes(
    df: DataFrame, ladders: dict[str, list[tuple]], k: int
) -> DataFrame:
    """Convenience: run :func:`generalize_to_k` and return the
    equivalence classes of the chosen level — ``generalized QI
    columns..., class_size, level`` — the shape an auditor reviews
    (and the shape q71's SQL twin reproduces level-by-level)."""
    out, level = generalize_to_k(df, ladders, k)
    names = _level_names(ladders, _ladder_string_cols(ladders))
    return (
        out.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .withColumn("level", F.lit(level))
    )

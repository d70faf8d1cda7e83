"""Success/error stream split — the reference's multi-output error
routing (TupleTagList, dlp/DlpIdentify.java:106-112;
BatchAndDlpDeIdRecords.java:148-157; error files to <report>/error,
pipeline/DlpInspectionPipeline.java:142-161).

Spark-first restatement: a status column + two filtered views of ONE
plan. Catalyst shares the scan between the two branches; writers either
write both (two passes) or, in streaming, route within one foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ERROR_COL = "_error"


def with_validity(
    df: DataFrame,
    checks: dict[str, Column],
) -> DataFrame:
    """Annotate rows with the first failing check's name (NULL = ok).

    ``checks`` maps error-name -> boolean Column that must hold.
    """
    err = F.lit(None).cast("string")
    for name, cond in reversed(list(checks.items())):
        err = F.when(~cond, F.lit(name)).otherwise(err)
    return df.withColumn(ERROR_COL, err)


def split_errors(
    df: DataFrame, checks: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_status_col, error_rows_with_reason)."""
    annotated = with_validity(df, checks)
    good = annotated.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
    bad = annotated.filter(F.col(ERROR_COL).isNotNull()).withColumnRenamed(
        ERROR_COL, "error"
    )
    return good, bad


def transcript_validity_checks(df: DataFrame) -> dict[str, Column]:
    """Standard input hygiene for the transcript shape (oversize-cell
    filter mirrors the reference's 480 KB cap, dlp/BatchColumnsForDlp.java:153-161)."""
    return {
        "null_conv_id": F.col("conv_id").isNotNull() & (F.trim("conv_id") != ""),
        "bad_turn_idx": F.col("turn_idx").isNotNull() & (F.col("turn_idx") >= 1),
        "null_ts": F.col("ts").isNotNull(),
        "oversize_text": (F.length("text") <= 480_000) | F.col("text").isNull(),
    }


def completeness_monitor(
    df: DataFrame,
    cols: list[str],
    window: str = "1 minute",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window NULL-rate monitor over the monitored columns — the
    schema-health alarm a 100 TB/day ingest runs so an upstream field
    that silently goes missing (extractor change, renamed key, encoder
    bug) pages in the window it breaks rather than at the next batch
    audit. Works on batch and streaming inputs alike.

    Output: one row per (window, column): ``window_start, column_name,
    n_rows, n_null, null_rate`` (round 6).

    Scale: ONE windowed groupBy with map-side partials computing every
    column's null count in the same pass (state = one row of counters
    per open window); the long-form un-pivot is a stateless codegen
    stack on the closed aggregate."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(set(cols)) != len(cols):
        raise ValueError(f"cols contains duplicates: {cols}")
    d = df.withWatermark(ts_col, watermark) if watermark is not None else df
    agg = d.groupBy(F.window(F.col(ts_col), window).alias("w")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"_null_{c}")
            for c in cols
        ],
    )
    # backtick-quote the generated identifiers (and escape quotes in the
    # label literal) so non-plain column names like 'content-type' parse
    stack = ", ".join(
        "'{}', `{}`".format(c.replace("'", "\\'"), f"_null_{c}")
        for c in cols
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        "n_rows",
        F.expr(f"stack({len(cols)}, {stack}) AS (column_name, n_null)"),
    ).select(
        "window_start",
        "column_name",
        "n_rows",
        "n_null",
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_rate"),
    )


def duckdb_completeness_sql(
    table: str,
    cols: list[str],
    window_us: int = 60_000_000,
    ts_expr: str = "ts",
) -> str:
    """DuckDB twin of ``completeness_monitor`` (same bucketing,
    rounding, long-form shape, and input validation; the streaming
    final-watermark predicate is the caller's outer filter)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(set(cols)) != len(cols):
        raise ValueError(f"cols contains duplicates: {cols}")
    per_col = " UNION ALL ".join(
        """
        SELECT window_start, '{lbl}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN "{ident}" IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null
        FROM b GROUP BY 1""".format(
            lbl=c.replace("'", "''"), ident=c.replace('"', '""')
        )
        for c in cols
    )
    return f"""
        WITH b AS (
          SELECT *, make_timestamp((epoch_us({ts_expr}) // {window_us})
                      * {window_us}) AS window_start
          FROM {table}
        )
        SELECT window_start, column_name, n_rows, n_null,
               ROUND(n_null * 1.0 / n_rows, 6) AS null_rate
        FROM ({per_col}) u
    """

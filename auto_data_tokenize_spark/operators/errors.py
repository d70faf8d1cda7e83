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

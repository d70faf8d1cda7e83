"""Stateful stream-stream join: detection events × token-dictionary
side stream, under watermarks.

The cross-stream analogue of the reference's TokenizedDataMerger
(dlp/BatchAndDlpDeIdRecords.java:341-398), which re-merged DLP
responses to originating records by record_id inside one batch. Here
both sides are unbounded streams, so the equi-key (token) is paired
with a time-range condition and watermarks on BOTH sides — without
the range, join state grows without bound at 10^12-turn scale
(SURVEY.md §7 "hard parts").

State sizing: each side keeps only rows within ``interval`` of its
watermark; state is hash-partitioned by the join key (token), which is
high-cardinality and uniform (tokens are ciphertexts) — no hot-key
problem even when one conv_id dominates, because the key is the token,
not the conversation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def token_dictionary_join(
    detections: DataFrame,
    dictionary: DataFrame,
    interval: str = "10 minutes",
    det_watermark: str = "10 minutes",
    dict_watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """detections(conv_id, turn_idx, info_type, token, ts) ⋈ dictionary
    (token, info_type, conv_id, ts) on token within ±interval.

    Output: detection columns + dictionary entry ts as ``dict_ts``.
    Works identically on batch DataFrames (watermarks become no-ops),
    which is how the DuckDB oracle checks it.
    """
    d = detections
    t = dictionary
    if hasattr(d, "isStreaming") and d.isStreaming:
        d = d.withWatermark("ts", det_watermark)
    if hasattr(t, "isStreaming") and t.isStreaming:
        t = t.withWatermark("ts", dict_watermark)

    d = d.alias("d")
    t = (
        t.select(
            F.col("token").alias("t_token"),
            F.col("ts").alias("dict_ts"),
        )
    ).alias("t")

    cond = (
        (F.col("d.token") == F.col("t_token"))
        & (F.col("dict_ts") >= F.col("d.ts") - F.expr(f"INTERVAL {interval}"))
        & (F.col("dict_ts") <= F.col("d.ts") + F.expr(f"INTERVAL {interval}"))
    )
    return d.join(t, cond, how).drop("t_token")

"""Empirical pins for the window-boundary semantics the module
docstring claims (operators/windows.py): epoch alignment of tumbling
windows, session merge at EXACTLY the gap, session break only when the
gap is STRICTLY exceeded, session_end = last_ts + gap.

These matter because the DuckDB oracles re-derive sessions with a
lag()-based gap test (``> INTERVAL``) — if Spark's session_window used
>= at the boundary, every oracle session query would silently diverge
on exact-gap data.
"""

import pandas as pd
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.windows import (
    infotype_frequencies,
    sessionize_generic,
)


def _events(spark, times):
    df = spark.createDataFrame(
        [("u", t, 1.0) for t in times], "user_id string, s string, value double"
    )
    return df.select(
        "user_id", F.col("s").cast("timestamp").alias("ts"), "value"
    )


def test_session_merges_at_exact_gap(spark):
    df = _events(spark, ["2026-01-01 00:00:00", "2026-01-01 00:30:00"])
    out = sessionize_generic(df, "user_id", gap="30 minutes", value_col="value").collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["session_start"]) == "2026-01-01 00:00:00"
    # session_end = last event + gap
    assert str(r["session_end"]) == "2026-01-01 01:00:00"
    assert r["n_events"] == 2


def test_session_breaks_when_gap_strictly_exceeded(spark):
    df = _events(spark, ["2026-01-01 00:00:00", "2026-01-01 00:30:01"])
    out = sessionize_generic(df, "user_id", gap="30 minutes").collect()
    assert len(out) == 2
    ends = sorted(str(r["session_end"]) for r in out)
    assert ends == ["2026-01-01 00:30:00", "2026-01-01 01:00:01"]


def test_tumbling_windows_align_to_epoch(spark):
    det = spark.createDataFrame(
        [("c", "EMAIL_ADDRESS", "2026-01-01 00:37:12")],
        "conv_id string, info_type string, s string",
    ).select("conv_id", "info_type", F.col("s").cast("timestamp").alias("ts"))
    out = infotype_frequencies(det, "5 minutes").collect()
    assert len(out) == 1
    assert str(out[0]["window_start"]) == "2026-01-01 00:35:00"
    assert str(out[0]["window_end"]) == "2026-01-01 00:40:00"


def test_sliding_windows_emit_every_covering_window(spark):
    det = spark.createDataFrame(
        [("c", "EMAIL_ADDRESS", "2026-01-01 00:07:00")],
        "conv_id string, info_type string, s string",
    ).select("conv_id", "info_type", F.col("s").cast("timestamp").alias("ts"))
    out = infotype_frequencies(det, "10 minutes", slide="5 minutes").collect()
    starts = sorted(str(r["window_start"]) for r in out)
    assert starts == ["2026-01-01 00:00:00", "2026-01-01 00:05:00"]

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


def test_infotype_rollup_batch_consistency(spark):
    """The two-level rollup must agree with directly aggregating to the
    coarse window, and n_fine_windows counts distinct fine buckets."""
    from auto_data_tokenize_spark.operators.windows import (
        infotype_frequencies,
        infotype_rollup,
    )

    rows = []
    for m in (0, 3, 7, 12, 59, 61, 65):
        rows.append(("EMAIL_ADDRESS", f"2026-01-01 00:{m % 60:02d}:00", m // 60))
    df = spark.createDataFrame(
        [(it, f"2026-01-01 {h:02d}:{int(s[14:16]):02d}:00") for it, s, h in rows],
        "info_type string, s string",
    ).withColumn("ts", F.col("s").cast("timestamp")).drop("s")

    got = {
        (r["window_start"].isoformat(), r["info_type"]): (r["n"], r["n_fine_windows"])
        for r in infotype_rollup(df, "5 minutes", "1 hour").collect()
    }
    direct = {
        (r["window_start"].isoformat(), r["info_type"]): r["n"]
        for r in infotype_frequencies(df, "1 hour").collect()
    }
    assert {k: v[0] for k, v in got.items()} == direct
    # first hour: minutes 0,3 -> bucket 0; 7 -> 5; 12 -> 10; 59 -> 55 = 4 buckets
    assert got[("2026-01-01T00:00:00", "EMAIL_ADDRESS")] == (5, 4)
    assert got[("2026-01-01T01:00:00", "EMAIL_ADDRESS")] == (2, 2)


def test_infotype_rollup_rejects_non_divisible_durations(spark):
    """coarse must be an integer multiple of fine: a straddling fine
    window (e.g. [00:56, 01:03) against hourly) is attributed entirely
    to ONE coarse window by window_time, so the rollup would silently
    disagree with a direct coarse aggregation."""
    import pytest as _pytest

    from auto_data_tokenize_spark.operators.windows import infotype_rollup

    df = spark.createDataFrame(
        [("EMAIL", "2026-01-01 00:57:00")], "info_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pytest.raises(ValueError, match="integer multiple"):
        infotype_rollup(df, fine="7 minutes", coarse="1 hour")
    # divisible combinations still build
    infotype_rollup(df, fine="5 minutes", coarse="1 hour").collect()
    infotype_rollup(df, fine="30 seconds", coarse="2 minutes").collect()

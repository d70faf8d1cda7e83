"""Windowed / sessionized aggregates over the detection event stream.

These transforms are mode-agnostic: the same plan works on a batch
DataFrame (driver correctness gate, DuckDB oracle) and on a streaming
DataFrame (with ``watermark=`` set, they become state-store aggregates
per the north_rule). Reference analogue: the batch per-column infoType
frequency count (dlp/DlpIdentify.java:114-128) lifted onto event time.

Empirically pinned semantics (tests/test_windows.py):
- ``window(ts, d)`` buckets align to the epoch.
- ``session_window`` merges events exactly ``gap`` apart; a session
  breaks only when the gap is strictly exceeded; session_end =
  last_ts + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark else df


_DURATION_UNIT_S = {
    "millisecond": 0.001,
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "week": 604800.0,
}


def _duration_seconds(s: str) -> float:
    """Parse a Spark window-duration string ('5 minutes', '1 hour')
    into seconds — used only for driver-side validation."""
    import re as _re

    m = _re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]+?)s?\s*", s)
    if m and m.group(2).lower() in _DURATION_UNIT_S:
        return int(m.group(1)) * _DURATION_UNIT_S[m.group(2).lower()]
    raise ValueError(f"unsupported window duration: {s!r}")


def infotype_frequencies(
    detections: DataFrame,
    duration: str = "5 minutes",
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) per-infoType counts.

    Output: (window_start, window_end, info_type, n). Partial
    (map-side) aggregation makes this skew-proof in batch; in streaming
    the state key is (window, info_type) — bounded cardinality, no
    conv_id, so hot conversations cannot skew it.
    """
    d = _maybe_watermark(detections, ts_col, watermark)
    win = F.window(F.col(ts_col), duration, slide) if slide else F.window(
        F.col(ts_col), duration
    )
    return (
        d.groupBy(win.alias("w"), "info_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "info_type",
            "n",
        )
    )


def infotype_rollup(
    detections: DataFrame,
    fine: str = "5 minutes",
    coarse: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Hierarchical windowed rollup: fine-grained tumbling counts
    re-aggregated into coarse windows in ONE query — two chained
    stateful aggregations in streaming (Spark ≥ 3.4 multi-window
    support via ``window_time``), a plain two-level groupBy in batch.

    Output: (window_start, window_end, info_type, n, n_fine_windows).

    Scale shape: this is the hypertable-rollup pattern — the fine agg
    shrinks the stream to (fine-window × info_type) cardinality
    map-side, so the coarse state only ever sees pre-aggregated rows;
    both state keys are conversation-free and bounded. In streaming the
    coarse windows emit when the watermark passes (append mode), which
    the DuckDB oracle reproduces with the final-watermark filter.

    ``coarse`` must be an integer multiple of ``fine`` (both are
    epoch-aligned tumbling windows, so divisibility makes every fine
    window nest inside exactly one coarse window): the coarse window
    is assigned from the fine window's ``window_time`` (end − 1µs), so
    a straddling fine window — e.g. fine='7 minutes' against
    coarse='1 hour', window [00:56, 01:03) — would attribute ALL its
    events to the later coarse window and the rollup would disagree
    with a direct coarse aggregation."""
    fine_s, coarse_s = _duration_seconds(fine), _duration_seconds(coarse)
    if coarse_s % fine_s != 0:
        raise ValueError(
            f"coarse ({coarse!r}) must be an integer multiple of fine "
            f"({fine!r}): a straddling fine window would be attributed "
            "entirely to one coarse window"
        )
    d = _maybe_watermark(detections, ts_col, watermark)
    fine_agg = d.groupBy(
        F.window(F.col(ts_col), fine).alias("w"), "info_type"
    ).agg(F.count(F.lit(1)).alias("n_fine"))
    return (
        fine_agg.groupBy(
            F.window(F.window_time("w"), coarse).alias("cw"), "info_type"
        )
        .agg(
            F.sum("n_fine").alias("n"),
            F.count(F.lit(1)).alias("n_fine_windows"),
        )
        .select(
            F.col("cw.start").alias("window_start"),
            F.col("cw.end").alias("window_end"),
            "info_type",
            F.col("n").cast("long").alias("n"),
            "n_fine_windows",
        )
    )


def session_reports(
    detections: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-conversation session sensitivity reports (streaming analogue
    of MakeInspectionReport, pipeline/MakeInspectionReport.java:86-98).

    Output: (conv_id, session_start, session_end, n_detections,
    n_info_types, info_types). Grouping is by the UNSALTED conv_id —
    session assembly cannot be salted (SURVEY.md §7); skew protection
    comes from state-store partitioning on (conv_id) and, in batch,
    from partial aggregation of count/collect_set.
    """
    d = _maybe_watermark(detections, ts_col, watermark)
    return (
        d.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), "conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_detections"),
            F.size(F.collect_set("info_type")).alias("n_info_types"),
            F.sort_array(F.collect_set("info_type")).alias("info_types"),
        )
        .select(
            "conv_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_detections",
            "n_info_types",
            "info_types",
        )
    )


def sessionize_generic(
    df: DataFrame,
    key_col: str,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    value_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Generic sessionization of any keyed event stream (events table,
    clickstreams). Output: key, session_start, session_end, n_events
    [, sum_value]."""
    d = _maybe_watermark(df, ts_col, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return (
        d.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), key_col)
        .agg(*aggs)
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col else []),
        )
    )

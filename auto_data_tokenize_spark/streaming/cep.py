"""CEP-style custom stateful operator: per-conversation PII-exposure
escalation.

Pattern: ALERT when a conversation has produced detections of at least
``min_distinct`` DIFFERENT infoTypes. The alert fires once per
conversation, stamped with the event time at which the threshold was
crossed (= the first detection ts of the ``min_distinct``-th distinct
infoType) — a classic CEP "count distinct within a key" pattern the
reference cannot express (it is batch-only).

Two implementations with identical semantics:

- ``escalation_alerts_batch``: declarative DataFrame plan (also the
  DuckDB-oracle shape): per (conv_id, info_type) first-seen ts, then
  the ``min_distinct``-th smallest first-seen per conversation.
- ``escalation_alerts_stream``: ``applyInPandasWithState`` over the
  detection stream — state = set of infoTypes seen + whether the alert
  already fired; emits exactly one row per conversation when the
  threshold crosses. State is keyed by conv_id, capped (≤ min_distinct
  infoTypes), and EXPIRED by event-time timeout once a conversation
  has been idle for the retention period — so the state store is
  O(recently active conversations), bounded even at 10^12 turns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ALERT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("alert_ts", TimestampType()),
        StructField("n_info_types", IntegerType()),
    ]
)

_STATE_SCHEMA = "seen ARRAY<STRING>, fired BOOLEAN"


def escalation_alerts_batch(
    detections: DataFrame, min_distinct: int = 3
) -> DataFrame:
    """(conv_id, alert_ts, n_info_types) for conversations reaching
    ``min_distinct`` distinct infoTypes; alert_ts = first-seen ts of the
    n-th distinct infoType."""
    first_seen = detections.groupBy("conv_id", "info_type").agg(
        F.min("ts").alias("first_ts")
    )
    ranked = first_seen.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("conv_id").orderBy("first_ts", "info_type")
        ),
    )
    return (
        ranked.filter(F.col("rk") == min_distinct)
        .select(
            "conv_id",
            F.col("first_ts").alias("alert_ts"),
            F.lit(min_distinct).alias("n_info_types"),
        )
    )


def escalation_alerts_stream(
    detections: DataFrame,
    min_distinct: int = 3,
    watermark: str = "10 minutes",
    retention: str = "1 hour",
) -> DataFrame:
    """Streaming twin via applyInPandasWithState with EVENT-TIME state
    expiry: a conversation's state is dropped once the watermark passes
    (last activity + ``retention``), so the state store is O(recently
    active conversations), not O(every conversation ever seen).

    Expiry semantics (tests/test_cep.py): a conversation idle past the
    retention loses its seen-infoType set — a much-later detection
    starts a fresh count rather than completing the old one, and a
    conversation that already fired cannot double-fire within the
    retention horizon (the fired flag lives exactly as long as the
    state). Re-fires after a full retention of silence are inherent to
    ANY bounded-state design; size ``retention`` to the maximum
    plausible conversation gap."""
    retention_ms = _duration_ms(retention)

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed last-activity + retention: drop state
            state.remove()
            return
        (conv_id,) = key
        if state.exists:
            seen, fired = state.get
            seen = list(seen)
        else:
            seen, fired = [], False
        out = []
        # collect (ts, info_type); sorted by event time for determinism
        rows = []
        for pdf in pdfs:
            rows.extend(zip(pdf["ts"], pdf["info_type"]))
        if not fired:
            rows.sort(key=lambda r: (r[0], r[1]))
            for ts, it in rows:
                if it not in seen:
                    seen.append(it)
                    if len(seen) >= min_distinct:
                        fired = True
                        out.append((conv_id, ts, len(seen)))
                        break
        state.update((seen, fired))
        if rows:
            last_ms = max(int(ts.value) // 1_000_000 for ts, _ in rows)
            # > watermark by construction: late rows were already dropped
            state.setTimeoutTimestamp(last_ms + retention_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["conv_id", "alert_ts", "n_info_types"]
            )

    d = detections
    if d.isStreaming:
        d = d.withWatermark("ts", watermark)
    return (
        d.groupBy("conv_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=ALERT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _duration_ms(text: str) -> int:
    """'1 hour' / '30 minutes' / '45 seconds' → milliseconds."""
    qty, unit = text.split()
    mult = {"second": 1_000, "minute": 60_000, "hour": 3_600_000}[
        unit.rstrip("s")
    ]
    return int(qty) * mult

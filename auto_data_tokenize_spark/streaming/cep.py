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
  threshold crosses. State is keyed by conv_id and capped (≤ 4
  infoTypes), so state size is O(active conversations) regardless of
  turn volume.
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
) -> DataFrame:
    """Streaming twin via applyInPandasWithState. Emits append-mode
    alert rows; state clears nothing (fired flag prevents re-emission;
    a production deployment would add an event-time timeout to expire
    idle conversations — wired here via GroupStateTimeout, trivially
    enabled when retention policy is chosen)."""

    def _fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if state.exists:
            seen, fired = state.get
            seen = list(seen)
        else:
            seen, fired = [], False
        out = []
        if not fired:
            # collect (ts, info_type) sorted by event time for determinism
            rows = []
            for pdf in pdfs:
                rows.extend(zip(pdf["ts"], pdf["info_type"]))
            rows.sort(key=lambda r: (r[0], r[1]))
            for ts, it in rows:
                if it not in seen:
                    seen.append(it)
                    if len(seen) >= min_distinct:
                        fired = True
                        out.append((conv_id, ts, len(seen)))
                        break
        else:
            for _ in pdfs:  # drain
                pass
        state.update((seen, fired))
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
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

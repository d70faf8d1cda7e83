"""Streaming metrics: a StreamingQueryListener that appends each
progress event (rows/sec, batch duration, state-store metrics,
watermark) to ``<table>/_metrics/progress.jsonl`` — the observability
half of the sink's commit lineage (north_rule: "per-partition lineage +
metrics")."""

from __future__ import annotations

import json
import os

from pyspark.sql.streaming import StreamingQueryListener


class JsonlMetricsListener(StreamingQueryListener):
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "progress.jsonl")

    def onQueryStarted(self, event) -> None:
        self._append({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._append(
            {
                "event": "progress",
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs) if p.durationMs else {},
                "event_time": dict(p.eventTime) if p.eventTime else {},
                "state_operators": [
                    {
                        "operator": getattr(s, "operatorName", ""),
                        "num_rows_total": s.numRowsTotal,
                        "num_rows_updated": s.numRowsUpdated,
                        "memory_used_bytes": s.memoryUsedBytes,
                    }
                    for s in (p.stateOperators or [])
                ],
            }
        )

    def onQueryTerminated(self, event) -> None:
        # event.exception distinguishes a crash from a clean stop — the
        # one field an observability log must not drop
        rec = {"event": "terminated", "id": str(event.id)}
        exc = getattr(event, "exception", None)
        if exc:
            rec["exception"] = str(exc)
            err_cls = getattr(event, "errorClassOnException", None)
            if err_cls:
                rec["error_class"] = str(err_cls)
        self._append(rec)

    def onQueryIdle(self, event) -> None:
        pass

    def _append(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, default=str) + "\n")

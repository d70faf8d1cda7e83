"""Inspection-report file sinks — parity with the reference's report
layout (common/InspectionReportFileWriter.java:61-86):

    <report_dir>/col-<sanitized_column>.json   one file per column
    <report_dir>/schema.json                   single-shard schema file

The per-column fan-out is tiny (one row per column), so the files are
written from collected rows on the driver — the same effective
single-shard layout the reference gets from FileIO.writeDynamic +
withNumShards(1). For large fan-outs use
``df.write.partitionBy("column_name").json(...)`` instead.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame


def _sanitize(name: str) -> str:
    # InspectionReportFileWriter.java:83-84 semantics
    return re.sub(r"[^A-Za-z0-9_]+", "-", name).strip("-")


def write_column_reports(col_report: DataFrame, out_dir: str) -> list[str]:
    """One ``col-<name>.json`` per ColumnInformation row."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for row in col_report.collect():
        d = row.asDict(recursive=True)
        p = os.path.join(out_dir, f"col-{_sanitize(d['column_name'])}.json")
        with open(p, "w") as f:
            json.dump(d, f, sort_keys=True)
        paths.append(p)
    return paths


def write_schema_file(df: DataFrame, out_dir: str) -> str:
    """Single ``schema.json`` with the source schema (single-shard
    TextIO semantics, InspectionReportFileWriter.java:61-67)."""
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, "schema.json")
    with open(p, "w") as f:
        f.write(df.schema.json())
    return p


def write_errors(bad: DataFrame, report_dir: str) -> str:
    """Error rows under <report>/error (DlpInspectionPipeline.java:142-161)."""
    p = os.path.join(report_dir, "error")
    bad.write.mode("overwrite").json(p)
    return p

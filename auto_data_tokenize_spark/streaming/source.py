"""Streaming sources for the engine.

Production target is an Iceberg table changelog / Kafka feed; neither
jar ships in this sandbox, so the canonical source here is Spark's
file source over a directory of parquet files — same state-store
semantics, same watermark behavior, replayable and deterministic.
``spark.readStream.format("iceberg")`` is gated behind jar detection.

``stage_stream_input`` materializes a transcripts parquet as K files in
event-time order so ``maxFilesPerTrigger=1`` yields a K-micro-batch
stream whose watermark advances realistically (late rows jitter within
and across files, which is exactly what the watermark tests need).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

TOKEN_DICT_SCHEMA = StructType(
    [
        StructField("token", StringType()),
        StructField("info_type", StringType()),
        StructField("conv_id", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def stage_stream_input(
    parquet_path: str,
    out_dir: str,
    n_files: int = 8,
    arrival_order: str = "ts",
    replicate: int = 1,
) -> str:
    """Split one parquet into ``n_files`` chunks in arrival order.

    ``arrival_order='ts'`` sorts by event time (late rows in the
    generator keep their jittered-backward ts, so they *arrive* late
    relative to the watermark — they are late by generation, not by
    file order).

    ``arrival_order='original'`` keeps the input row order.

    ``replicate=k`` scales the stream k× by cloning rows under suffixed
    conv_ids (deterministic; used by the scaling benchmark so compute
    dominates fixed per-job overhead).

    Pre-existing ``chunk-*.parquet`` files in ``out_dir`` are removed
    first: a rerun that writes fewer chunks (smaller input or smaller
    ``n_files``) would otherwise leave stale chunks from the previous
    dataset for the file-source stream to replay — silent
    double-counting."""
    if arrival_order not in ("ts", "original"):
        raise ValueError(
            f"arrival_order must be 'ts' or 'original': {arrival_order!r}"
        )
    os.makedirs(out_dir, exist_ok=True)
    import glob as _glob

    for stale in _glob.glob(os.path.join(out_dir, "chunk-*.parquet")):
        os.unlink(stale)
    df = pd.read_parquet(parquet_path)
    if replicate > 1:
        clones = []
        for r in range(replicate):
            c = df.copy()
            if r > 0:
                c["conv_id"] = c["conv_id"] + f"_r{r}"
            clones.append(c)
        df = pd.concat(clones, ignore_index=True)
    if arrival_order == "ts":
        # Arrival time = per-conversation running max of event time: a
        # late (backdated-ts) row still *arrives* where its neighbors
        # do, so it is genuinely late relative to the watermark, while
        # the overall stream is event-time ordered like a real feed.
        df = df.reset_index(drop=True)
        arrival = df.groupby("conv_id", sort=False)["ts"].cummax()
        df = df.iloc[arrival.sort_values(kind="stable").index].reset_index(drop=True)
    chunk = max(1, len(df) // n_files)
    for i in range(n_files):
        lo = i * chunk
        hi = len(df) if i == n_files - 1 else (i + 1) * chunk
        if lo >= len(df):
            break
        df.iloc[lo:hi].to_parquet(
            os.path.join(out_dir, f"chunk-{i:04d}.parquet"), index=False
        )
    return out_dir


def transcripts_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def token_dictionary_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(TOKEN_DICT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)

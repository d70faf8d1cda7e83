"""Byte/cell-bounded batch assignment — the reference's
PartialBatchAccumulator / GroupIntoBatches.ofByteSize contract made
explicit (dlp/PartialBatchAccumulator.java:51-52 caps batches at
480 000 target bytes and 50 000 cells; dlp/BatchColumnsForDlp.java:41-43).

Spark's Arrow batching already gives OUR pandas UDFs size-bounded
chunks for free (session.ARROW_BATCH_ROWS), but a pipeline calling an
external rate-limited API (the reference's DLP requests) still needs
explicit, cap-honoring batch ids. ``assign_batches`` stamps every row
with (``batch_part``, ``batch_idx``): a single per-partition streaming
pass (``mapInPandas``), no shuffle, memory O(one Arrow chunk). Batch
ids are unique per (partition, index) pair; rows within a partition
are batched in partition order, so run-to-run determinism follows the
partitioning of the input (sort first if you need stable ids — same
caveat the reference's GroupByKey batching has).

A row whose own payload exceeds ``max_bytes`` gets a batch of its own
(the caller's oversize filter — operators/errors.py — is the place to
reject such rows outright, mirroring the reference's 480 KB cell
filter).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StructField, StructType

DLP_BATCH_BYTES = 480_000   # BatchColumnsForDlp.java:41
DLP_BATCH_CELLS = 50_000    # BatchColumnsForDlp.java:43


def assign_batches(
    df: DataFrame,
    value_cols: list[str],
    max_bytes: int = DLP_BATCH_BYTES,
    max_cells: int = DLP_BATCH_CELLS,
) -> DataFrame:
    """Adds ``batch_part`` (partition id) and ``batch_idx`` (batch
    ordinal within the partition). A batch never exceeds ``max_bytes``
    of UTF-8 payload across ``value_cols`` nor ``max_cells`` cells,
    except single rows that alone exceed ``max_bytes`` (isolated)."""
    if max_bytes <= 0 or max_cells <= 0:
        raise ValueError("caps must be positive")
    n_cols = len(value_cols)
    if n_cols == 0:
        raise ValueError("value_cols must be non-empty")
    if n_cols > max_cells:
        raise ValueError(f"one row already exceeds max_cells ({n_cols} > {max_cells})")

    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("batch_part", IntegerType(), False),
           StructField("batch_idx", IntegerType(), False)]
    )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        bidx = 0
        cur_bytes = 0
        cur_cells = 0
        for pdf in batches:
            sizes = None
            for c in value_cols:
                col = pdf[c]
                non_null = col.dropna()
                if len(non_null) and isinstance(
                    non_null.iloc[0], (bytes, bytearray, memoryview)
                ):
                    # bytes payloads: count the payload, not its repr
                    # (str(b'..') measures escape sequences — the
                    # reference counts cell bytes,
                    # dlp/PartialBatchAccumulator.java:51-52)
                    s = col.map(lambda v: len(v) if v is not None else 0)
                else:
                    # vectorized UTF-8 byte length; nulls size 0
                    mask = col.notna()
                    s = (
                        col.astype(str)
                        .str.encode("utf-8")
                        .str.len()
                        .where(mask, 0)
                        .astype("int64")
                    )
                sizes = s if sizes is None else sizes + s
            ids = []
            for sz in sizes:
                if cur_cells > 0 and (
                    cur_cells + n_cols > max_cells or cur_bytes + sz > max_bytes
                ):
                    bidx += 1
                    cur_bytes = 0
                    cur_cells = 0
                ids.append(bidx)
                cur_bytes += int(sz)
                cur_cells += n_cols
            out = pdf.copy()
            out["batch_part"] = pid
            out["batch_idx"] = ids
            yield out

    return df.mapInPandas(_proc, out_schema)

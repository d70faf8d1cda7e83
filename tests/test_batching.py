"""assign_batches: PartialBatchAccumulator cap semantics
(dlp/PartialBatchAccumulator.java:51-52, BatchColumnsForDlp.java:41-43)."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.batching import assign_batches


def _one_partition(spark, rows):
    return spark.createDataFrame(rows, "id long, text string").coalesce(1)


def test_byte_cap_boundaries(spark):
    # 4 rows of 40 bytes with a 100-byte cap: [r0,r1] [r2,r3]
    df = _one_partition(spark, [(i, "x" * 40) for i in range(4)])
    out = assign_batches(df, ["text"], max_bytes=100, max_cells=1000)
    got = {r["id"]: r["batch_idx"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1}


def test_cell_cap_boundaries(spark):
    # 2 value columns -> 2 cells/row; cap 5 cells -> 2 rows per batch
    df = spark.createDataFrame(
        [(i, "a", "b") for i in range(5)], "id long, c1 string, c2 string"
    ).coalesce(1)
    out = assign_batches(df, ["c1", "c2"], max_bytes=10**9, max_cells=5)
    got = {r["id"]: r["batch_idx"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2}


def test_oversize_row_isolated(spark):
    df = _one_partition(
        spark, [(0, "x" * 10), (1, "y" * 500), (2, "z" * 10)]
    )
    out = assign_batches(df, ["text"], max_bytes=100, max_cells=1000)
    got = {r["id"]: r["batch_idx"] for r in out.collect()}
    # the giant row flushes the open batch and sits alone
    assert got[0] != got[1] and got[1] != got[2]


def test_caps_hold_on_reference_defaults(spark):
    """No produced batch exceeds the reference's 480 KB / 50k-cell caps
    (oversize singletons excepted)."""
    rows = [(i, "word " * (1 + i % 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, text string").repartition(4)
    out = assign_batches(df, ["text"]).withColumn(
        "sz", F.length(F.col("text"))
    )
    agg = (
        out.groupBy("batch_part", "batch_idx")
        .agg(F.sum("sz").alias("bytes"), F.count(F.lit(1)).alias("cells"))
        .collect()
    )
    assert len(agg) >= 1
    for r in agg:
        assert r["bytes"] <= 480_000 and r["cells"] <= 50_000


def test_validation(spark):
    df = _one_partition(spark, [(0, "x")])
    with pytest.raises(ValueError):
        assign_batches(df, [])
    with pytest.raises(ValueError):
        assign_batches(df, ["text"], max_bytes=0)


def test_binary_cells_count_payload_not_repr(spark):
    """bytes cells must be sized as len(payload): str(b'..') measures
    the escaped repr (~4x for non-ASCII bytes), diverging from the
    reference's byte accounting (dlp/PartialBatchAccumulator.java:51-52)."""
    payload = bytes(range(256)) * 40  # 10_240 payload bytes; repr ~4x
    df = spark.createDataFrame(
        [(i, payload) for i in range(4)], "id long, blob binary"
    ).coalesce(1)
    # payload accounting: 2 rows/batch at 25_000; repr accounting would
    # overflow every row into its own batch
    out = assign_batches(df, ["blob"], max_bytes=25_000).collect()
    ids = [r["batch_idx"] for r in sorted(out, key=lambda r: r["id"])]
    assert ids == [0, 0, 1, 1], ids


def test_null_and_unicode_sizing(spark):
    df = _one_partition(spark, [(0, "é" * 10), (1, None), (2, "x")])
    # é is 2 UTF-8 bytes: row0=20, row1=0 (null), row2=1
    out = assign_batches(df, ["text"], max_bytes=21).collect()
    ids = {r["id"]: r["batch_idx"] for r in out}
    assert ids[0] == 0 and ids[1] == 0 and ids[2] == 0  # 21 bytes total fits

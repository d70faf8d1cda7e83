"""Pure-Python Avro container codec: spec byte vectors, container
round-trips, the distributed Spark read/write path, and the
reference's main tutorial flow (Avro in → tokenize → Avro out →
detokenize; TransformingReader.java:221-223,
EncryptionPipeline.java:125-132, EncryptionPipelineTest.java:104-145)
— now exercised against REAL .avro bytes, jar or no jar."""

import datetime
import io
import json
import zlib

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.sources import avro_io as A
from auto_data_tokenize_spark.sources.readers import read_source


# -- binary encoding spec vectors ---------------------------------------------


def test_zigzag_varint_spec_vectors():
    """The worked examples from the Avro spec's binary-encoding table."""
    vectors = [
        (0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
        (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01"), (8192, b"\x80\x80\x01"),
    ]
    for n, want in vectors:
        buf = io.BytesIO()
        A.write_long(buf, n)
        assert buf.getvalue() == want, n
        assert A.read_long(io.BytesIO(want)) == n


AVSC = {
    "type": "record",
    "name": "R",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": ["null", "double"]},
        {"name": "flag", "type": "boolean"},
        {"name": "payload", "type": ["null", "bytes"]},
        {"name": "tags", "type": {"type": "array", "items": ["null", "long"]}},
        {"name": "ts", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
    ],
}
ROWS = [
    {
        "id": 1, "name": "héllo wörld ünïcode", "score": 3.25, "flag": True,
        "payload": b"\x00\xff\x10", "tags": [1, None, 3],
        "ts": datetime.datetime(2026, 1, 5, 9, 51, 16, 123456),
    },
    {
        "id": -2, "name": None, "score": None, "flag": False,
        "payload": None, "tags": [], "ts": None,
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    data, n = A.encode_container(iter(ROWS), AVSC, codec)
    assert n == 2
    got_schema, got = A.decode_container(data)
    assert got_schema == AVSC
    assert got == ROWS


def test_container_header_structure():
    """The file must be a spec-shaped container: magic, schema +
    codec in the metadata map, 16-byte sync, deflate block that raw
    zlib can inflate."""
    data, _ = A.encode_container(iter(ROWS), AVSC, "deflate")
    assert data[:4] == b"Obj\x01"
    buf = io.BytesIO(data)
    avsc, codec, sync = A.read_header(buf)
    assert avsc == AVSC and codec == "deflate" and len(sync) == 16
    n = A.read_long(buf)
    size = A.read_long(buf)
    raw = zlib.decompress(buf.read(size), wbits=-15)
    assert n == 2 and len(raw) > 0
    assert json.loads(json.dumps(avsc)) == AVSC


def test_schema_mapping_roundtrip():
    st = A.avro_schema_to_spark(AVSC)
    assert A.avro_schema_to_spark(A.spark_schema_to_avro(st, "R")) == st


def test_unsupported_types_raise_actionably(spark):
    nested = spark.range(1).select(F.struct("id").alias("s"))
    with pytest.raises(ValueError, match="flatten|spark-avro"):
        A.spark_schema_to_avro(nested.schema)
    with pytest.raises(ValueError, match="spark-avro|nullable"):
        A.avro_schema_to_spark(
            {"type": "record", "name": "X",
             "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}]}
        )


# -- distributed Spark path ----------------------------------------------------


def test_spark_write_read_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "héllo", 3.25, True, bytearray(b"\x00\xff"), [1, 2],
             datetime.datetime(2026, 1, 5, 9, 51, 16, 123456)),
            (2, None, None, False, None, [], None),
        ],
        "id long, name string, score double, flag boolean, "
        "payload binary, tags array<bigint>, ts timestamp",
    ).repartition(3)
    path = str(tmp_path / "t")
    n = A.write_avro_fallback(df, path)
    assert n == 2
    back = A.read_avro_fallback(spark, path)
    assert back.schema == df.schema
    key = lambda r: r[0]  # noqa: E731
    got = sorted(([*r] for r in back.collect()), key=key)
    want = sorted(([*r] for r in df.collect()), key=key)
    assert got == want


def test_read_source_avro_dispatch(spark, transcripts_small, tmp_path):
    """read_source('AVRO', ...) must work in this sandbox (fallback) —
    the reference's primary source type can no longer be a gap."""
    sample = transcripts_small.select("conv_id", "turn_idx", "role", "text", "ts").limit(50)
    path = str(tmp_path / "avro_src")
    A.write_avro(sample, path)
    back = read_source(spark, "AVRO", path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))


def test_avro_tokenize_roundtrip(spark, transcripts_small, tmp_path):
    """The reference's tutorial flow on real .avro bytes: read Avro,
    tokenize the free-form column, write Avro, read it back, verify
    detections were replaced and the detokenized text matches."""
    from auto_data_tokenize_spark.functions.udfs import detokenize_text_udf
    from auto_data_tokenize_spark.operators.tokenize import tokenize_turns

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    A.write_avro(
        transcripts_small.select("conv_id", "turn_idx", "role", "text", "ts").limit(200),
        src,
    )
    turns = A.read_avro(spark, src)
    tok = tokenize_turns(turns).select("conv_id", "turn_idx", "text_tok")
    A.write_avro(tok, out)
    back = A.read_avro(spark, out)
    assert back.count() == tok.count()
    detok = back.select(
        "conv_id", "turn_idx",
        detokenize_text_udf()(F.col("conv_id"), F.col("text_tok")).alias("text"),
    )
    orig = turns.select("conv_id", "turn_idx", "text")
    diff = detok.exceptAll(orig)
    assert diff.count() == 0


def test_write_retries_cannot_leak_partials(spark, tmp_path):
    """Only files named in the successful attempts' manifest reach the
    target dir; staging residue is removed."""
    import os

    df = spark.range(100).select(F.col("id"), F.lit("x").alias("v")).repartition(4)
    path = str(tmp_path / "t2")
    A.write_avro_fallback(df, path)
    entries = os.listdir(path)
    assert all(
        e.endswith(".avro") or e == A.MANIFEST_NAME for e in entries
    ), entries
    assert not any(e.startswith("_staging") for e in entries)


def test_write_avro_overwrites_previous_dataset(spark, tmp_path):
    """Fallback writes have the native branch's overwrite semantics:
    a second write replaces the first, no unioned stale rows."""
    path = str(tmp_path / "ow")
    A.write_avro_fallback(spark.range(50).selectExpr("id", "'a' AS v"), path)
    A.write_avro_fallback(spark.range(10).selectExpr("id", "'b' AS v"), path)
    back = A.read_avro_fallback(spark, path)
    assert back.count() == 10
    assert {r["v"] for r in back.select("v").distinct().collect()} == {"b"}


def test_crashed_finalize_is_detected(spark, tmp_path):
    """A file listed in the manifest but missing on disk (crash between
    the move loop and nothing — simulated by deletion) must raise, not
    silently read a partial dataset."""
    import os

    path = str(tmp_path / "crash")
    A.write_avro_fallback(
        spark.range(100).selectExpr("id", "'x' AS v").repartition(4), path
    )
    victim = next(e for e in os.listdir(path) if e.endswith(".avro"))
    os.unlink(os.path.join(path, victim))
    with pytest.raises(FileNotFoundError, match="manifest"):
        A.read_avro_fallback(spark, path)


def test_streaming_avro_ingestion(spark, transcripts_small, tmp_path):
    """File-drop streaming: .avro containers landing in a directory
    flow through readStream + mapInPandas decode into micro-batches,
    through the tokenize stage, into the exactly-once sink."""
    from auto_data_tokenize_spark.operators.tokenize import tokenize_turns
    from auto_data_tokenize_spark.streaming import pipeline
    from auto_data_tokenize_spark.streaming.sink import ExactlyOnceSink

    sample = transcripts_small.select(
        "conv_id", "turn_idx", "role", "text", "ts"
    ).limit(120)
    drop_dir = str(tmp_path / "drops")
    A.write_avro(sample.repartition(3), drop_dir)

    st = A.read_avro_stream(spark, drop_dir)
    assert st.isStreaming
    sink = ExactlyOnceSink(str(tmp_path / "out"))
    pipeline.run_to_sink(
        tokenize_turns(st).select("conv_id", "turn_idx", "text_tok"),
        sink,
        str(tmp_path / "ckpt"),
    )
    got = sink.read_committed(spark)
    assert got.count() == 120
    # equality with the batch path on the same rows
    want = tokenize_turns(sample).select("conv_id", "turn_idx", "text_tok")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_streaming_avro_empty_dir_needs_schema(spark, tmp_path):
    empty = str(tmp_path / "empty")
    import os

    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        A.read_avro_stream(spark, empty)
    st = A.read_avro_stream(spark, empty, avsc=AVSC)  # explicit schema OK
    assert st.isStreaming

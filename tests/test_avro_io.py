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


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
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
    # nested records and string-keyed maps are in scope since r4;
    # enums/fixed and non-string map keys remain clean gates
    with pytest.raises(ValueError, match="spark-avro"):
        A.avro_schema_to_spark(
            {"type": "record", "name": "X",
             "fields": [{"name": "e", "type": {"type": "enum", "name": "E",
                                               "symbols": ["A", "B"]}}]}
        )
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="string-keyed"):
        A.spark_schema_to_avro(
            T.StructType([T.StructField(
                "m", T.MapType(T.LongType(), T.StringType()))])
        )


def test_nested_record_and_map_schema_roundtrip():
    st = A.avro_schema_to_spark(
        {"type": "record", "name": "X", "fields": [
            {"name": "c", "type": ["null", {
                "type": "record", "name": "C", "fields": [
                    {"name": "name", "type": ["null", "string"]},
                    {"name": "nums", "type": {"type": "array", "items": {
                        "type": "record", "name": "N", "fields": [
                            {"name": "kind", "type": ["null", "string"]}]}}},
                ]}]},
            {"name": "m", "type": {"type": "map", "values": ["null", "long"]}},
        ]}
    )
    assert A.avro_schema_to_spark(A.spark_schema_to_avro(st, "X")) == st


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


# -- real third-party bytes (the reference's own golden artifacts) ------------

REF_CONTACTS = "/root/reference/contacts5k.avro"
REF_USERDATA = "/root/reference/userdata.avro"
REF_BQ_EXPORT = (
    "/root/reference/src/test/resources/avro_records/bq_exported_tables/"
    "table_with_date_and_timestamp.avro"
)


def test_reference_contacts5k_decodes(spark):
    """Spec compliance against bytes this repo did NOT write: the
    reference's contacts5k.avro golden input (null codec, NESTED
    records + array-of-record) — 5 000 contact rows
    (EncryptionPipelineTest.java:104-145 uses the same artifact)."""
    import os

    if not os.path.exists(REF_CONTACTS):
        pytest.skip("reference artifact not present")
    df = A.read_avro_fallback(spark, REF_CONTACTS)
    assert [f.name for f in df.schema.fields] == ["index", "contact"]
    rows = df.collect()
    assert len(rows) == 5000
    one = next(r for r in rows if r["contact"] is not None)
    assert one["contact"]["name"]
    assert isinstance(one["contact"]["nums"], list)
    # nested data then flows through the reference's flatten stage
    n_nums = df.select(F.explode_outer("contact.nums").alias("n")).count()
    assert n_nums >= 5000


def test_reference_bq_export_decodes(spark):
    """Second third-party artifact: BigQuery-exported date + timestamp
    logicals (null codec)."""
    import os

    if not os.path.exists(REF_BQ_EXPORT):
        pytest.skip("reference artifact not present")
    df = A.read_avro_fallback(spark, REF_BQ_EXPORT)
    assert df.schema.simpleString() == "struct<dt:date,ts:timestamp>"
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0]["dt"] is not None


def test_snappy_decompress_spec_vectors():
    """Hand-built raw-snappy streams covering all four tag kinds and
    the run-length overlap-copy semantics."""
    # literal only: uvarint len 5, tag (5-1)<<2, "hello"
    assert A.snappy_decompress(bytes([5, 4 << 2]) + b"hello") == b"hello"
    # literal "ab" + 1-byte-offset copy len 4 off 2 -> "ab" + "abab"
    s = bytes([6, 1 << 2]) + b"ab" + bytes([(4 - 4) << 2 | 1, 2])
    assert A.snappy_decompress(s) == b"ababab"
    # overlap run: literal "x" + copy len 7 off 1 -> "xxxxxxxx"
    s = bytes([8, 0]) + b"x" + bytes([(7 - 1) << 2 | 2, 1, 0])
    assert A.snappy_decompress(s) == b"x" * 8
    # 4-byte-offset copy kind
    s = bytes([4, 1 << 2]) + b"yz" + bytes([(2 - 1) << 2 | 3, 2, 0, 0, 0])
    assert A.snappy_decompress(s) == b"yzyz"
    # corrupt: declared length mismatch
    with pytest.raises(ValueError, match="corrupt snappy"):
        A.snappy_decompress(bytes([9, 4 << 2]) + b"hello")
    # corrupt: offset beyond output
    with pytest.raises(ValueError, match="bad copy offset"):
        A.snappy_decompress(bytes([4, 0]) + b"a" + bytes([1, 9]))


def test_reference_userdata_snappy_decodes_to_golden():
    """userdata.avro is snappy-compressed: the pure-Python raw-snappy
    decompressor + CRC check must reproduce the reference's OWN golden
    expectations (schema.json field list and record-1.json values from
    src/test/resources/avro_records/userdata_records/)."""
    import os

    golden_dir = (
        "/root/reference/src/test/resources/avro_records/userdata_records"
    )
    if not (os.path.exists(REF_USERDATA) and os.path.isdir(golden_dir)):
        pytest.skip("reference artifacts not present")
    with open(REF_USERDATA, "rb") as f:
        data = f.read()
    _, codec, _ = A.read_header(io.BytesIO(data))
    assert codec == "snappy"
    avsc, rows = A.decode_container(data)
    assert len(rows) == 1000
    with open(f"{golden_dir}/schema.json") as f:
        golden_schema = json.load(f)
    assert [f_["name"] for f_ in avsc["fields"]] == [
        f_["name"] for f_ in golden_schema["fields"]
    ]
    with open(f"{golden_dir}/record-1.json") as f:
        golden_row = json.load(f)

    def unwrap(v):  # Avro JSON encoding tags union values: {"long": 5}
        if isinstance(v, dict) and len(v) == 1 and next(iter(v)) in (
            "long", "double", "string", "int", "float", "boolean", "bytes",
        ):
            return next(iter(v.values()))
        return v

    assert rows[0] == {k: unwrap(v) for k, v in golden_row.items()}


def test_reference_snappy_transcripts_decode():
    """Second/third snappy artifacts: the reference's encrypted
    transcript goldens and its deeply nested record.avro."""
    import os

    p = "/root/reference/src/test/resources/csv/tink_encrypted_transcripts.avro"
    if not os.path.exists(p):
        pytest.skip("reference artifact not present")
    with open(p, "rb") as f:
        avsc, rows = A.decode_container(f.read())
    assert len(rows) == 100
    assert {f_["name"] for f_ in avsc["fields"]} >= {
        "chatId", "userType", "encrypted_transcript",
    }
    nested = "/root/reference/src/test/resources/avro_records/nested_repeated/record.avro"
    if os.path.exists(nested):
        with open(nested, "rb") as f:
            _, nrows = A.decode_container(f.read())
        assert len(nrows) == 1 and nrows[0]["ticket"]["via"]["channel"] == "api"


def test_truly_unsupported_codec_still_gates():
    """An unknown codec (zstandard) refuses with the actionable
    message on BOTH paths — never garbage rows."""
    with pytest.raises(ValueError, match="unsupported codec"):
        A.encode_container(iter(ROWS), AVSC, "zstandard")
    out = io.BytesIO()
    out.write(A.MAGIC)
    meta = {
        "avro.schema": json.dumps(AVSC).encode(),
        "avro.codec": b"zstandard",
    }
    A.write_long(out, len(meta))
    for k, v in meta.items():
        A.write_bytes(out, k.encode())
        A.write_bytes(out, v)
    A.write_long(out, 0)
    out.write(b"\x00" * 16)
    with pytest.raises(ValueError, match="unsupported codec 'zstandard'"):
        A.decode_container(out.getvalue())


# -- nested struct/map Spark round-trip + precision ---------------------------


def test_spark_nested_struct_map_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, ("ann", [("WORK", "555-1"), ("HOME", "555-2")]), {"a": 1, "b": None}),
            (2, None, {}),
            (3, ("bo", []), {"z": 9}),
        ],
        "id long, contact struct<name:string, "
        "nums:array<struct<kind:string,num:string>>>, m map<string,bigint>",
    ).repartition(2)
    path = str(tmp_path / "nested")
    assert A.write_avro_fallback(df, path) == 3
    back = A.read_avro_fallback(spark, path)
    assert back.schema == df.schema
    key = lambda r: r["id"]  # noqa: E731
    got = sorted(back.collect(), key=key)
    want = sorted(df.collect(), key=key)
    assert got == want


def test_nullable_long_precision_above_2_53(spark, tmp_path):
    """r3 ADVICE: nullable longs must not round through float64 —
    2^53 + 1 is the first integer float64 cannot represent."""
    big = (1 << 53) + 1
    df = spark.createDataFrame(
        [(1, big), (2, None), (3, -big)], "id long, v long"
    )
    path = str(tmp_path / "bigint")
    A.write_avro_fallback(df, path)
    got = {r["id"]: r["v"] for r in A.read_avro_fallback(spark, path).collect()}
    assert got == {1: big, 2: None, 3: -big}


def test_max_file_bytes_guard(spark, tmp_path, transcripts_small):
    sample = transcripts_small.limit(20).coalesce(1)
    path = str(tmp_path / "guarded")
    A.write_avro_fallback(sample, path)
    with pytest.raises(ValueError, match="max_file_bytes"):
        A.read_avro_fallback(spark, path, max_file_bytes=10)
    assert A.read_avro_fallback(spark, path).count() == 20  # default passes


def test_generated_record_names_cannot_collide():
    """'a b' and 'a_b' sanitize identically — the writer must still
    emit unique named types or conformant readers reject the file."""
    from pyspark.sql import types as T

    inner = T.StructType([T.StructField("x", T.LongType())])
    st = T.StructType(
        [
            T.StructField("a b", inner),
            T.StructField("a_b", inner),
        ]
    )
    # illegal FIELD name 'a b' must be rejected outright
    with pytest.raises(ValueError, match="legal Avro name"):
        A.spark_schema_to_avro(st)
    st2 = T.StructType(
        [
            T.StructField("ok", T.StructType(
                [T.StructField("a_b", inner)])),
            T.StructField("ok_a_b", inner),
        ]
    )
    avsc = A.spark_schema_to_avro(st2, "R")

    names = []

    def walk(t):
        if isinstance(t, dict):
            if t.get("type") == "record":
                names.append(t["name"])
                for f in t["fields"]:
                    walk(f["type"])
            elif t.get("type") == "array":
                walk(t["items"])
            elif t.get("type") == "map":
                walk(t["values"])
        elif isinstance(t, list):
            for x in t:
                walk(x)

    walk(avsc)
    assert len(names) == len(set(names)), names


def test_non_ascii_field_name_gates():
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="legal Avro name"):
        A.spark_schema_to_avro(
            T.StructType([T.StructField("café", T.LongType())])
        )


def test_snappy_truncated_raises_valueerror():
    with pytest.raises(ValueError, match="truncated"):
        A.snappy_decompress(b"")
    with pytest.raises(ValueError, match="corrupt|truncated"):
        A.snappy_decompress(bytes([200, 1]))  # preamble cut mid-varint
    # the sneaky case: a literal overruns the buffer but the shortened
    # slice happens to match the declared uncompressed length — before
    # the bounds check this decoded "successfully" to corrupt data
    with pytest.raises(ValueError, match="truncated"):
        A.snappy_decompress(bytes([2, 4 << 2]) + b"he")  # tag says 5 bytes
    # extended literal length bytes cut off
    with pytest.raises(ValueError, match="truncated"):
        A.snappy_decompress(bytes([100, 61 << 2, 0x63]))
    # 2-byte copy offset cut off
    with pytest.raises(ValueError, match="truncated"):
        A.snappy_decompress(bytes([4, 0]) + b"a" + bytes([(2 - 1) << 2 | 2, 1]))


def test_snappy_compress_roundtrip_shapes():
    """Deterministic shapes that force every compressor branch:
    incompressible, all-repeat (long overlap copies), periodic,
    >64 KiB literals (extended length encodings), empty."""
    import random

    rnd = random.Random(7)
    cases = [
        b"",
        b"a",
        b"abc" * 40_000,            # periodic, matches at offset 3
        b"x" * 100_000,             # run -> overlap copies
        bytes(rnd.randrange(256) for _ in range(70_000)),  # incompressible
        (b"the quick brown fox " * 2000) + bytes(range(256)) * 10,
    ]
    for data in cases:
        comp = A.snappy_compress(data)
        assert A.snappy_decompress(comp) == data
    # compressible inputs actually shrink (it's a compressor, not an
    # escape hatch): kind-2 copies cap at 64 bytes/3-byte element, so a
    # pure run compresses to ~len/21 — assert the ratio, with headroom
    assert len(A.snappy_compress(b"x" * 100_000)) < 100_000 / 15


def test_spark_snappy_write_read_roundtrip(spark, transcripts_small, tmp_path):
    """q37-style gate on a SNAPPY-written container: the fallback sink
    writes codec=snappy (the reference's own write codec,
    EncryptionPipeline.java:125-132), a fresh read must round-trip, and
    the file's header must declare the codec."""
    sample = transcripts_small.select("conv_id", "turn_idx", "text").limit(100)
    out = str(tmp_path / "snappy_ds")
    import os as _os

    n = A.write_avro_fallback(sample, out, codec="snappy")
    assert n == 100
    files = [p for p in _os.listdir(out) if p.endswith(".avro")]
    with open(_os.path.join(out, files[0]), "rb") as f:
        _, codec, _ = A.read_header(f)
    assert codec == "snappy"
    got = A.read_avro_fallback(spark, out)
    assert got.count() == 100
    assert got.exceptAll(sample).count() == 0
    assert sample.exceptAll(got).count() == 0


def test_stream_oversize_guard_is_opt_in_and_loud(spark, transcripts_small, tmp_path):
    """Default: no length filter (nothing silently dropped). Opt-in
    guard: oversize drops are skipped in-plan AND surfaced by the
    companion oversize_avro_stream monitor."""
    sample = transcripts_small.select("conv_id", "turn_idx", "text").limit(60)
    drop = str(tmp_path / "drops")
    A.write_avro(sample.coalesce(1), drop)
    # default = no filter: every row arrives
    st = A.read_avro_stream(spark, drop)
    n_default = (
        st.writeStream.format("memory").queryName("all_rows")
        .trigger(availableNow=True).start()
    )
    n_default.awaitTermination(60)
    assert spark.sql("select count(*) c from all_rows").first()["c"] == 60
    # opt-in guard: the single file is "oversize" at a 10-byte limit
    gated = A.read_avro_stream(spark, drop, max_file_bytes=10)
    q = (
        gated.writeStream.format("memory").queryName("gated_rows")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    assert spark.sql("select count(*) c from gated_rows").first()["c"] == 0
    mon = A.oversize_avro_stream(spark, drop, max_file_bytes=10)
    m = (
        mon.writeStream.format("memory").queryName("oversize_files")
        .trigger(availableNow=True).start()
    )
    m.awaitTermination(60)
    rows = spark.sql("select * from oversize_files").collect()
    assert len(rows) == 1 and rows[0]["length"] > 10

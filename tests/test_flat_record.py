"""FlatRecord flattening vs the reference's own textpb goldens.

Each case pairs an Avro-JSON record + schema from
``avro_records/`` with its published FlatRecord golden in
``flat_records/*.textpb`` (the fixtures GenericRecordFlattenerTest
consumes upstream).  The tiny textproto parser below understands
exactly the two repeated map fields the FlatRecord message uses.
"""

from __future__ import annotations

import json
import re

import pytest

from auto_data_tokenize_spark.sources.flat_record import flatten_avro_json

REF = "/root/reference/src/test/resources/"


def _unquote_proto(quoted: str) -> str:
    """Textproto string literal: \\" \\\\ \\n \\t, \\uXXXX, and octal
    \\NNN byte runs (the goldens encode UTF-8 that way, which JSON's
    escape grammar lacks)."""
    body = quoted[1:-1]
    buf = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c != "\\":
            buf.extend(c.encode("utf-8"))
            i += 1
            continue
        n = body[i + 1]
        if n in "01234567":
            buf.append(int(body[i + 1:i + 4], 8))
            i += 4
        elif n == "u":
            buf.extend(chr(int(body[i + 2:i + 6], 16)).encode("utf-8"))
            i += 6
        elif n == "n":
            buf.append(0x0A)
            i += 2
        elif n == "t":
            buf.append(0x09)
            i += 2
        else:  # \" \\ and friends
            buf.extend(n.encode("utf-8"))
            i += 2
    return buf.decode("utf-8")


def _parse_textpb_flat_record(text: str) -> dict:
    """Parse the FlatRecord textproto subset: repeated
    ``flat_key_schema {key value}`` and ``values {key value{...}}``."""
    out = {"values": {}, "flat_key_schema": {}}
    block_re = re.compile(
        r"(flat_key_schema|values)\s*\{(.*?)\n\}", re.S
    )
    for kind, body in block_re.findall(text):
        key = _unquote_proto(
            re.search(r'key:\s*(".*?(?<!\\)")', body).group(1)
        )
        if kind == "flat_key_schema":
            out["flat_key_schema"][key] = _unquote_proto(
                re.search(r'value:\s*(".*?(?<!\\)")', body).group(1)
            )
            continue
        value: dict = {}
        m = re.search(r'string_value:\s*(".*?(?<!\\)")', body)
        if m:
            value = {"string_value": _unquote_proto(m.group(1))}
        m = re.search(r"integer_value:\s*(-?\d+)", body)
        if m:
            value = {"integer_value": int(m.group(1))}
        m = re.search(r"float_value:\s*(-?[\d.eE+-]+)", body)
        if m:
            value = {"float_value": float(m.group(1))}
        m = re.search(r"boolean_value:\s*(true|false)", body)
        if m:
            value = {"boolean_value": m.group(1) == "true"}
        out["values"][key] = value
    return out


GOLDEN_CASES = [
    (
        "avro_records/simple_field_avro_record.json",
        "avro_records/simple_field_avro_schema.json",
        "flat_records/simple_field_flat_record.textpb",
    ),
    (
        "avro_records/union_with_array_record.json",
        "avro_records/union_with_array_schema.json",
        "flat_records/union_with_array_flat_record.textpb",
    ),
    (
        "avro_records/array_with_null_union_long_avro_record.json",
        "avro_records/array_with_null_union_long_avro_schema.json",
        "flat_records/array_with_null_union_long_flat_record.textpb",
    ),
    (
        "avro_records/array_with_null_union_record_avro_record.json",
        "avro_records/array_with_null_union_record_avro_schema.json",
        "flat_records/array_with_null_union_record_flat_record.textpb",
    ),
]


@pytest.mark.parametrize(
    "record_file,schema_file,golden_file",
    GOLDEN_CASES,
    ids=[c[2].rsplit("/", 1)[-1].removesuffix(".textpb") for c in GOLDEN_CASES],
)
def test_flatten_matches_reference_textpb_golden(
    record_file, schema_file, golden_file
):
    with open(REF + record_file) as f:
        record = json.load(f)
    with open(REF + schema_file) as f:
        schema = json.load(f)
    with open(REF + golden_file) as f:
        want = _parse_textpb_flat_record(f.read())

    got = flatten_avro_json(record, schema)
    assert got["flat_key_schema"] == want["flat_key_schema"]
    assert set(got["values"]) == set(want["values"])
    for k, v in want["values"].items():
        if "float_value" in v:
            assert got["values"][k]["float_value"] == pytest.approx(
                v["float_value"], rel=0, abs=0
            ), k
        else:
            assert got["values"][k] == v, k


def test_flatten_rejects_map_and_multibranch_union():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "m", "type": {"type": "map", "values": "string"}}],
    }
    with pytest.raises(ValueError, match="Unsupported Type MAP"):
        flatten_avro_json({"m": {"a": "b"}}, schema)

    schema3 = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["null", "string", "long"]}],
    }
    with pytest.raises(ValueError, match="Only nullable union"):
        flatten_avro_json({"u": {"string": "x"}}, schema3)


def test_float32_widening_matches_java_float_semantics():
    """Golden pins 3.14f -> 3.140000104904175 through the proto double."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "f", "type": "float"}],
    }
    got = flatten_avro_json({"f": 3.14}, schema)
    assert got["values"]["$.f"]["float_value"] == 3.140000104904175


# --------------------------------------------------------------------------
# JDBC → FlatRecord parity against the reference's jdbc_flatrecords goldens
# --------------------------------------------------------------------------


def _parse_textpb_bytes(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return _parse_textpb_flat_record(f.read())


def _derby_exec(spark, url: str, stmts: list[str]) -> None:
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        for s in stmts:
            st.executeUpdate(s)
        st.close()
    finally:
        conn.close()


def _derby_ok(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
        return True
    except Exception:
        return False


def test_jdbc_flat_records_match_reference_goldens(spark, tmp_path):
    """The reference's JdbcIO path (db_init_scripts/
    simple_flat_records.sql → jdbc_flatrecords/record_{1,2,3}.textpb)
    reproduced over embedded Derby: same rows (incl. the Devanagari /
    CJK regional names), read through read_jdbc, schema fabricated by
    spark_schema_to_avro (NOT-NULL id stays bare — `$.id`; nullable
    columns grow `.string` / `.double` / `.int` / `.long` branch
    keys), values Avro-JSON-encoded and flattened — equal to all
    three published goldens field-for-field."""
    import pytest as _pytest

    from auto_data_tokenize_spark.sources.flat_record import (
        flatten_avro_json,
        row_to_avro_json,
        spark_schema_to_avro,
    )
    from auto_data_tokenize_spark.sources.readers import (
        jdbc_not_null_columns,
        read_jdbc,
    )

    if not _derby_ok(spark):
        _pytest.skip("derby jar not on the Spark classpath")
    url = f"jdbc:derby:{tmp_path}/fr_db;create=true"
    _derby_exec(spark, url, [
        'CREATE TABLE "SimpleFlatRecords" ('
        '"id" INTEGER NOT NULL PRIMARY KEY, "name" VARCHAR(100), '
        '"regional_name" VARCHAR(50), "salary" DOUBLE, '
        '"birth_date" DATE, "last_signin_timestamp" TIMESTAMP)',
        'INSERT INTO "SimpleFlatRecords" VALUES '
        "(1, 'Test User1', 'टेस्ट "
        "यूजर1', 123.2453, '2000-05-11', "
        "'2021-05-11 23:55:00'), "
        "(2, 'Test User2', '测试用户2', 456.7896, "
        "'2001-06-12', '2020-05-11 13:55:00'), "
        "(3, 'Test User3', '「テストユー"
        "ザー」3', 789.1225, '2002-07-13', "
        "'2019-07-15 12:55:00')",
    ])
    df = read_jdbc(
        spark, url, table='"SimpleFlatRecords"',
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    avsc = spark_schema_to_avro(
        df.schema,
        not_null=jdbc_not_null_columns(
            spark, url, "SimpleFlatRecords",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        ),
    )
    rows = sorted(df.collect(), key=lambda r: r["id"])
    for i, row in enumerate(rows, start=1):
        got = flatten_avro_json(row_to_avro_json(row.asDict(), avsc), avsc)
        want = _parse_textpb_bytes(
            f"{REF}jdbc_flatrecords/record_{i}.textpb"
        )
        assert dict(got) == want, f"record_{i}"


def test_jdbc_time_fields_match_reference_golden(spark, tmp_path):
    """date_time_fields_flatrecords.textpb over embedded Derby: DATE →
    epoch-day ints, TIMESTAMP/DATETIME → epoch-milli longs, TIME →
    millis-of-day via the time-millis override (Spark's JDBC reader
    widens SQL TIME to timestamp; MySQL YEAR is modeled as the
    reference renders it — the year's first epoch day)."""
    import pytest as _pytest

    from auto_data_tokenize_spark.sources.flat_record import (
        flatten_avro_json,
        row_to_avro_json,
        spark_schema_to_avro,
    )
    from auto_data_tokenize_spark.sources.readers import read_jdbc

    if not _derby_ok(spark):
        _pytest.skip("derby jar not on the Spark classpath")
    url = f"jdbc:derby:{tmp_path}/tf_db;create=true"
    _derby_exec(spark, url, [
        'CREATE TABLE "TableWithTimeFields" ('
        '"date_field" DATE, "time_field" TIME, '
        '"datetime_field" TIMESTAMP, "timestamp_field" TIMESTAMP, '
        '"year_field" DATE)',
        'INSERT INTO "TableWithTimeFields" VALUES '
        "('2021-12-12', '10:11:30', '2021-12-12 10:11:30', "
        "'2021-12-12 10:11:30', '2021-01-01')",
    ])
    df = read_jdbc(
        spark, url, table='"TableWithTimeFields"',
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    avsc = spark_schema_to_avro(
        df.schema,
        overrides={
            "time_field": {"type": "int", "logicalType": "time-millis"}
        },
    )
    row = df.collect()[0]
    got = flatten_avro_json(row_to_avro_json(row.asDict(), avsc), avsc)
    want = _parse_textpb_bytes(
        f"{REF}jdbc_flatrecords/date_time_fields_flatrecords.textpb"
    )
    assert dict(got) == want


def test_jdbc_avro_schema_matches_contacts5k_golden(spark, tmp_path):
    """The fabricated JDBC Avro schema equals the reference's own
    Contacts5kSql_avro_schema.json (DlpInspectionPipelineTest's MySQL
    case) when the contacts table is replayed in Derby with the same
    character width the reference's TEXT columns surfaced (16383
    utf8mb4 chars): nullable ["null", T] unions, empty docs, and
    varchar logicalType + maxLength from the database metadata."""
    import json

    import pytest as _pytest

    from auto_data_tokenize_spark.sources.flat_record import (
        spark_schema_to_avro,
    )
    from auto_data_tokenize_spark.sources.readers import (
        jdbc_column_meta,
        read_jdbc,
    )

    if not _derby_ok(spark):
        _pytest.skip("derby jar not on the Spark classpath")
    url = f"jdbc:derby:{tmp_path}/c5k_db;create=true"
    _derby_exec(spark, url, [
        'CREATE TABLE "Contacts" ('
        '"row_id" INTEGER, "person_name" VARCHAR(16383), '
        '"contact_type" VARCHAR(16383), "contact_number" VARCHAR(16383))',
        'INSERT INTO "Contacts" VALUES '
        "(1, 'sunny meet', 'WORK', '(559)458-7172')",
    ])
    df = read_jdbc(
        spark, url, table='"Contacts"',
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    meta = jdbc_column_meta(
        spark, url, "Contacts",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    got = spark_schema_to_avro(
        df.schema,
        not_null={c for c, m in meta.items() if m["not_null"]},
        varchar_sizes={c: m["varchar_length"] for c, m in meta.items()},
    )
    with open(
        f"{REF}Contacts5kSql_avro_schema.json"
    ) as f:
        assert got == json.load(f)


def test_namespace_inheritance_uses_full_names():
    """Avro-spec namespace inheritance: a nested named type without an
    explicit namespace lives in the enclosing one, and the reference
    keys use Java getFullName() (GenericRecordFlattener.java:173,213)
    — branch segments and schema keys must carry com.x.Inner, and a
    later full-name reference to the type must resolve."""
    schema = {
        "type": "record", "name": "Outer", "namespace": "com.x",
        "fields": [
            {"name": "u", "type": ["null", {
                "type": "record", "name": "Inner",
                "fields": [{"name": "a", "type": "string"}],
            }]},
            {"name": "again", "type": ["null", "com.x.Inner"]},
        ],
    }
    got = flatten_avro_json(
        {"u": {"com.x.Inner": {"a": "v1"}}, "again": None}, schema
    )
    assert got["values"] == {
        '$.u.["com.x.Inner"].a': {"string_value": "v1"},
        "$.again": {},
    }
    assert got["flat_key_schema"]['$.u.["com.x.Inner"].a'] == (
        "$.com.x.Outer.u.com.x.Inner.a"
    )


def test_bare_record_with_self_named_field_not_misread_as_wrapper():
    """A BARE union-record value whose single field shares the branch
    name (the contacts/contact shape) must flatten as the record, not
    be unwrapped as the spec wrapper; the wrapped spec form still
    works."""
    schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "contact", "type": ["null", {
            "type": "record", "name": "contact",
            "fields": [{"name": "contact", "type": "string"}],
        }]}],
    }
    want = {'$.contact.["contact"].contact': {"string_value": "555"}}
    bare = flatten_avro_json({"contact": {"contact": "555"}}, schema)
    assert bare["values"] == want
    wrapped = flatten_avro_json(
        {"contact": {"contact": {"contact": "555"}}}, schema
    )
    assert wrapped["values"] == want

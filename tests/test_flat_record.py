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


def _unquote(s: str) -> str:
    # textproto string: handle \" \\ and \uXXXX-style escapes via the
    # JSON decoder (same escape grammar for the subset used here)
    return json.loads(s)


def _parse_textpb_flat_record(text: str) -> dict:
    """Parse the FlatRecord textproto subset: repeated
    ``flat_key_schema {key value}`` and ``values {key value{...}}``."""
    out = {"values": {}, "flat_key_schema": {}}
    block_re = re.compile(
        r"(flat_key_schema|values)\s*\{(.*?)\n\}", re.S
    )
    for kind, body in block_re.findall(text):
        key = _unquote(re.search(r'key:\s*(".*?(?<!\\)")', body).group(1))
        if kind == "flat_key_schema":
            val = _unquote(
                re.search(r'value:\s*(".*?(?<!\\)")', body).group(1)
            )
            out["flat_key_schema"][key] = val
            continue
        vm = re.search(r"value\s*\{(.*)\}?", body, re.S).group(1)
        value: dict = {}
        m = re.search(r'string_value:\s*(".*?(?<!\\)")', vm)
        if m:
            value = {"string_value": _unquote(m.group(1))}
        m = re.search(r"integer_value:\s*(-?\d+)", vm)
        if m:
            value = {"integer_value": int(m.group(1))}
        m = re.search(r"float_value:\s*(-?[\d.eE+-]+)", vm)
        if m:
            value = {"float_value": float(m.group(1))}
        m = re.search(r"boolean_value:\s*(true|false)", vm)
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

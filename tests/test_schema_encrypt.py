"""Golden parity for the de-identified Avro schema transform.

Each case replays a row of the reference's own parametrized test
(``test/common/DeIdentifiedRecordSchemaConverterTest.java:140-245``)
against the golden pair it ships in
``src/test/resources/avro_records/``.  Comparison mirrors Avro
``Schema.equals`` semantics (the equality the reference test itself
uses): names, types, field order, defaults, symbols, sizes and
schema-level props count; field-level docs and props do NOT — the
reference's own goldens are inconsistent there (e.g.
``avroSchema_with_user_defined_props_encrypted.json`` and
``bq_contacts_schema_encrypted.json`` omit ``ORIGINAL_TYPE`` on
encrypted fields while the other eight carry it), which only passes
upstream because Avro field equality ignores props.  Where a golden
DOES pin ``ORIGINAL_TYPE``, we additionally assert it byte-for-byte —
that string must match Avro's ``Schema.toString()`` exactly for the
reference's detokenizer to restore types.
"""

from __future__ import annotations

import json

import pytest

from auto_data_tokenize_spark.sources.schema_encrypt import (
    encrypt_avro_schema,
    schema_to_avro_str,
)

REF = "/root/reference/src/test/resources/"

# (input, golden, updated_at, encrypt_columns) — verbatim from the
# reference test's schemaData() table.
GOLDEN_CASES = [
    (
        "avro_records/array_with_null_union_record_avro_schema.json",
        "avro_records/array_with_null_union_record_avro_encrypted_schema.json",
        "2020-10-21T00:30:15Z",
        {"$.kylosample.name", "$.kylosample.contacts.contact.number"},
    ),
    (
        "avro_records/array_with_null_union_long_avro_schema.json",
        "avro_records/array_with_null_union_long_avro_encrypted_schema.json",
        "2020-10-21T00:40:15Z",
        {"$.kylosample.name", "$.kylosample.nums"},
    ),
    (
        "avro_records/nullable_encryption_column_schema.json",
        "avro_records/nullable_encryption_column_encrypted_schema.json",
        "2020-10-21T00:50:15Z",
        {"$.kylosample.name", "$.kylosample.contacts.contact.number"},
    ),
    (
        "avro_records/avroSchema_with_user_defined_props.json",
        "avro_records/avroSchema_with_user_defined_props_encrypted.json",
        "2020-10-21T01:00:15Z",
        {"$.kylosample.name", "$.kylosample.contacts.contact.number"},
    ),
    (
        "avro_records/union_with_all_types_avro_schema.json",
        "avro_records/union_with_all_types_avro_encrypted_schema.json",
        "2020-10-21T01:00:15Z",
        {
            "$.union_all_test.union_with_enum",
            "$.union_all_test.union_with_boolean",
            "$.union_all_test.union_with_long",
            "$.union_all_test.union_with_int",
            "$.union_all_test.union_with_string",
            "$.union_all_test.union_with_float",
            "$.union_all_test.union_with_double",
            "$.union_all_test.union_with_fixed",
            "$.union_all_test.union_with_bytes",
            "$.union_all_test.union_with_record.custom_record.custom_field"
            ".custom_field_record.second_level_field_string",
        },
    ),
    (
        "avro_records/union_with_array_long_schema.json",
        "avro_records/union_with_array_long_encrypted_schema.json",
        "2020-10-21T01:00:15Z",
        {"$.kylosample.cc"},
    ),
    (
        "avro_records/union_with_array_schema.json",
        "avro_records/union_with_array_encrypted_schema.json",
        "2020-10-21T01:00:15Z",
        {"$.kylosample.cc"},
    ),
    (
        "avro_records/contacts_schema/person_name_union_null_long_contact_schema.json",
        "avro_records/contacts_schema/person_name_union_null_long_contact_encrypted_schema.json",
        "2020-10-21T01:00:15Z",
        {"$.contact_records.contacts.contact.number"},
    ),
    (
        "avro_records/contact_records_with_namespace/bq_contacts_schema.json",
        "avro_records/contact_records_with_namespace/bq_contacts_schema_encrypted.json",
        "2020-10-21T01:00:15Z",
        {"$.Root.contact.root.Contact.nums.root.contact.Nums.number"},
    ),
    (
        "avro_records/nyc_taxi_avro_schema.json",
        "avro_records/nyc_taxi_avro_schema_encrypted.json",
        "2020-10-21T01:00:15Z",
        {
            "$.schema.vendor_id",
            "$.schema.dropoff_latitude",
            "$.schema.dropoff_longitude",
        },
    ),
]

_SCHEMA_ATTRS = {
    "type", "name", "namespace", "doc", "fields", "symbols", "items",
    "values", "size", "aliases", "default", "logicalType",
}


def _load(rel):
    with open(REF + rel) as f:
        return json.load(f)


def _kind(t):
    if isinstance(t, list):
        return "union"
    if isinstance(t, str):
        return t
    return t["type"] if isinstance(t.get("type"), str) else _kind(t["type"])


def _norm(t, enclosing_ns=None):
    """Avro-equality normal form: collapses prop-less primitive dicts,
    resolves namespaces to fullnames, keeps schema-level props, drops
    docs (Avro equality ignores them)."""
    if isinstance(t, str):
        return t
    if isinstance(t, list):
        return ["U"] + [_norm(b, enclosing_ns) for b in t]
    kind = _kind(t)
    props = {k: v for k, v in t.items() if k not in _SCHEMA_ATTRS}
    if kind in {"null", "boolean", "int", "long", "float", "double",
                "bytes", "string"}:
        return kind if not props else {"type": kind, **props}
    out = {"type": kind, **props}
    if "name" in t:
        name = t["name"]
        ns = t.get("namespace", enclosing_ns)
        out["name"] = name if "." in name else (f"{ns}.{name}" if ns else name)
        enclosing_ns = ns
    if "logicalType" in t:
        out["logicalType"] = t["logicalType"]
    if kind == "record":
        out["fields"] = [_norm_field(f, enclosing_ns) for f in t["fields"]]
    elif kind == "enum":
        out["symbols"] = t["symbols"]
    elif kind == "fixed":
        out["size"] = t["size"]
    elif kind == "array":
        out["items"] = _norm(t["items"], enclosing_ns)
    elif kind == "map":
        out["values"] = _norm(t["values"], enclosing_ns)
    return out


def _norm_field(f, enclosing_ns):
    out = {"name": f["name"], "type": _norm(f["type"], enclosing_ns)}
    if "default" in f:
        out["default"] = f["default"]
    if f.get("aliases"):
        out["aliases"] = sorted(f["aliases"])
    return out


def _original_types(schema, path=()):
    """{field-path: ORIGINAL_TYPE} for every field that carries one."""
    found = {}
    if isinstance(schema, list):
        for b in schema:
            found.update(_original_types(b, path))
    elif isinstance(schema, dict):
        if _kind(schema) == "record":
            for f in schema["fields"]:
                p = path + (f["name"],)
                if "ORIGINAL_TYPE" in f:
                    found[p] = f["ORIGINAL_TYPE"]
                found.update(_original_types(f["type"], p))
        elif _kind(schema) == "array":
            found.update(_original_types(schema["items"], path))
    return found


@pytest.mark.parametrize(
    "src,golden,ts,cols",
    GOLDEN_CASES,
    ids=[c[0].rsplit("/", 1)[-1].removesuffix(".json") for c in GOLDEN_CASES],
)
def test_encrypted_schema_matches_reference_golden(src, golden, ts, cols):
    produced = encrypt_avro_schema(_load(src), cols, ts)
    expected = _load(golden)

    assert _norm(produced) == _norm(expected)
    # root doc (incl. the literal-"null" missing-doc quirk) must match
    assert produced["doc"] == expected["doc"]
    # every ORIGINAL_TYPE the golden pins must match byte-for-byte
    want = _original_types(expected)
    got = _original_types(produced)
    for path, val in want.items():
        assert got.get(path) == val, f"ORIGINAL_TYPE mismatch at {path}"


def test_every_encrypted_field_records_original_type():
    """Our output always carries ORIGINAL_TYPE on renamed fields (the
    converter always sets it — only some goldens were regenerated
    after that property landed upstream)."""
    produced = encrypt_avro_schema(
        _load("avro_records/contact_records_with_namespace/bq_contacts_schema.json"),
        {"$.Root.contact.root.Contact.nums.root.contact.Nums.number"},
        "2020-10-21T01:00:15Z",
    )
    ots = _original_types(produced)
    assert ots == {
        ("contact", "nums", "encrypted_number"): '["null","string"]'
    }


def test_schema_to_avro_str_shapes():
    assert schema_to_avro_str("string") == '"string"'
    assert schema_to_avro_str(["null", "long"]) == '["null","long"]'
    assert (
        schema_to_avro_str(
            {"type": "enum", "name": "e", "symbols": ["A", "B"]}
        )
        == '{"type":"enum","name":"e","symbols":["A","B"]}'
    )
    assert (
        schema_to_avro_str({"type": "fixed", "name": "fx", "size": 10})
        == '{"type":"fixed","name":"fx","size":10}'
    )
    assert (
        schema_to_avro_str(
            ["null", {"type": "array", "items": ["null", "string"]}]
        )
        == '["null",{"type":"array","items":["null","string"]}]'
    )


def test_rejects_reference_unsupported_shapes():
    base = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "m", "type": {"type": "map", "values": "string"}}],
    }
    with pytest.raises(ValueError, match="not supported"):
        encrypt_avro_schema(base, {"$.r.m"}, "2020-01-01T00:00:00Z")

    three_way = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["null", "string", "long"]}],
    }
    with pytest.raises(ValueError, match="max of two"):
        encrypt_avro_schema(three_way, {"$.r.u"}, "2020-01-01T00:00:00Z")

    not_null_first = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "u", "type": ["string", "null"]}],
    }
    with pytest.raises(ValueError, match="first being null"):
        encrypt_avro_schema(not_null_first, {"$.r.u"}, "2020-01-01T00:00:00Z")

    with pytest.raises(ValueError, match="can't be null or empty"):
        encrypt_avro_schema(base, set(), "2020-01-01T00:00:00Z")

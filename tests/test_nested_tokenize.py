"""Nested/array tokenize-rename parity (TokenizeColumnNameUpdater.java:
98-123 + DeIdentifiedRecordSchemaConverter.java:53,209): leaves inside
structs and array<struct> get renamed encrypted_<leaf> in place, types
ride in top-level column metadata, and detokenize restores names,
values, and types. Fixture mirrors the reference's contacts5k shape."""

import pytest
from pyspark.sql import Row, functions as F

from auto_data_tokenize_spark.operators.tokenize import (
    detokenize_nested,
    tokenize_nested,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        Row(
            pid=1,
            profile=Row(email="a@example.com", age=33),
            contacts=[
                Row(contact=Row(number="555-0101"), kind="home"),
                Row(contact=Row(number="555-0202"), kind="work"),
            ],
            tags=["vip", "beta"],
        ),
        Row(
            pid=2,
            profile=Row(email="b@example.com", age=44),
            contacts=[Row(contact=Row(number="555-0303"), kind="home")],
            tags=[],
        ),
        Row(pid=3, profile=Row(email=None, age=55), contacts=[], tags=None),
    ]
    return spark.createDataFrame(rows)


KEYS = ["$.profile.email", "$.contacts.contact.number", "$.tags"]


def test_nested_tokenize_renames_and_encrypts(spark, people):
    enc = tokenize_nested(people, KEYS, scope_col="pid")
    # leaf renames, in place
    assert "encrypted_email" in enc.schema["profile"].dataType.fieldNames()
    assert "email" not in enc.schema["profile"].dataType.fieldNames()
    cstruct = enc.schema["contacts"].dataType.elementType["contact"].dataType
    assert cstruct.fieldNames() == ["encrypted_number"]
    # top-level array leaf: column itself renamed
    assert "encrypted_tags" in enc.columns and "tags" not in enc.columns
    r = {x["pid"]: x for x in enc.collect()}
    assert all(t.startswith("[TOK:COL_TAGS:") for t in r[1]["encrypted_tags"])
    assert r[1]["profile"]["encrypted_email"].startswith("[TOK:COL_")
    assert r[1]["profile"]["age"] == 33  # sibling untouched
    assert r[1]["contacts"][0]["kind"] == "home"
    assert r[1]["contacts"][0]["contact"]["encrypted_number"] != "555-0101"
    # determinism within scope: same value, same conv scope -> same token
    enc2 = tokenize_nested(people, KEYS, scope_col="pid")
    assert enc2.collect() == enc.collect()
    # null / empty propagation
    assert r[3]["profile"]["encrypted_email"] is None
    assert r[3]["contacts"] == []


def test_nested_metadata_records_types(spark, people):
    enc = tokenize_nested(people, KEYS, scope_col="pid")
    assert enc.schema["profile"].metadata["original_type.$.profile.email"] == "string"
    assert (
        enc.schema["contacts"].metadata["original_type.$.contacts.contact.number"]
        == "string"
    )


def test_nested_roundtrip_restores_names_values_types(spark, people):
    enc = tokenize_nested(people, KEYS, scope_col="pid")
    dec = detokenize_nested(enc, KEYS, scope_col="pid")
    want = people.select("pid", "profile", "contacts", "tags")
    got = dec.select("pid", "profile", "contacts", "tags")
    # names + types restored exactly; rebuilt structs are marked
    # non-nullable (stricter) by F.struct, so compare simpleString
    assert got.schema.simpleString() == want.schema.simpleString()
    assert sorted(got.collect(), key=lambda r: r["pid"]) == sorted(
        want.collect(), key=lambda r: r["pid"]
    )


def test_nested_int_leaf_type_restored(spark, people):
    enc = tokenize_nested(people, ["$.profile.age"], scope_col="pid")
    assert enc.schema["profile"].metadata["original_type.$.profile.age"] == "bigint"
    dec = detokenize_nested(enc, ["$.profile.age"], scope_col="pid")
    assert dec.schema["profile"].dataType["age"].dataType.simpleString() == "bigint"
    assert {x["pid"]: x["profile"]["age"] for x in dec.collect()} == {1: 33, 2: 44, 3: 55}


def test_nested_rejects_indexed_and_multi_array_keys(spark, people):
    with pytest.raises(ValueError, match="index-free"):
        tokenize_nested(people, ["$.contacts[0].contact.number"])
    with pytest.raises(ValueError, match="tokenize_columns"):
        tokenize_nested(people, ["$.pid"])


def test_null_struct_rows_stay_null(spark):
    """A NULL struct (or NULL element) must round-trip as NULL, not
    degrade to a struct of nulls."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(pid=1, profile=Row(email="a@x.io", age=3)), Row(pid=2, profile=None)]
    )
    enc = tokenize_nested(df, ["$.profile.email"], scope_col="pid")
    dec = detokenize_nested(enc, ["$.profile.email"], scope_col="pid")
    got = {r["pid"]: r["profile"] for r in dec.collect()}
    assert got[2] is None
    assert got[1]["email"] == "a@x.io" and got[1]["age"] == 3


def test_array_leaf_inside_struct_roundtrip(spark):
    """An array leaf NESTED inside a struct ($.profile.tags) must
    round-trip as an array — regression for the detok cast that
    stringified it — including non-string element types."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(pid=1, profile=Row(tags=["vip", "beta"], nums=[7, 9], age=3))]
    )
    keys = ["$.profile.tags", "$.profile.nums"]
    enc = tokenize_nested(df, keys, scope_col="pid")
    fnames = enc.schema["profile"].dataType.fieldNames()
    assert "encrypted_tags" in fnames and "encrypted_nums" in fnames
    dec = detokenize_nested(enc, keys, scope_col="pid")
    r = dec.collect()[0]["profile"]
    assert r["tags"] == ["vip", "beta"]
    assert r["nums"] == [7, 9]
    assert (
        dec.schema["profile"].dataType["nums"].dataType.simpleString()
        == "array<bigint>"
    )

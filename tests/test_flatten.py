"""Nested-record flatten/unflatten (GenericRecordFlattener /
RecordUnflattener parity)."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.sources import flatten


@pytest.fixture(scope="module")
def nested(spark):
    return spark.createDataFrame(
        [
            (1, ("alice", ("a@x.io", 7)), [(("home", 111),), (("work", 222),)]),
            (2, ("bob", ("b@y.io", 9)), []),
        ],
        "id long, person struct<name:string, contact:struct<email:string, score:int>>, "
        "contacts array<struct<contact:struct<type:string, number:long>>>",
    )


def test_flatten_scalar_leaves(spark, nested):
    flat = flatten.flatten_records(nested.drop("contacts"))
    assert set(flat.columns) == {
        "$.id", "$.person.name", "$.person.contact.email", "$.person.contact.score",
    }
    rows = {r["$.id"]: r for r in flat.collect()}
    assert rows[1]["$.person.contact.email"] == "a@x.io"


def test_flatten_roundtrip(spark, nested):
    df = nested.drop("contacts")
    back = flatten.unflatten_records(flatten.flatten_records(df))
    assert set(back.columns) == {"id", "person"}
    a = {r["id"]: r["person"] for r in back.collect()}
    b = {r["id"]: r["person"] for r in df.collect()}
    assert a == b


def test_flatten_array_records_flat_keys(spark, nested):
    pairs = flatten.flatten_array_records(nested.select("id", "contacts"), "contacts")
    got = {
        (r["id"], r["flat_key"]): r["value"] for r in pairs.collect() if r["flat_key"]
    }
    # reference-style concrete flat keys with [i] (proto:130-170)
    assert got[(1, "$.contacts[0].contact.number")] == "111"
    assert got[(1, "$.contacts[1].contact.type")] == "work"
    schema_keys = {r["schema_key"] for r in pairs.collect() if r["schema_key"]}
    assert schema_keys == {
        "$.contacts.contact.type", "$.contacts.contact.number",
    }


def test_map_rejected(spark):
    df = spark.createDataFrame([(1, {"a": "b"})], "id long, m map<string,string>")
    with pytest.raises(ValueError, match="MAP"):
        flatten.flatten_records(df)

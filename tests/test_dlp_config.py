"""Config-driven tokenization: the reference's DlpEncryptConfig JSON
shape parsed and applied (operators/dlp_config.py). Parses the
reference repo's OWN config files where present."""

import os

import pytest

from auto_data_tokenize_spark.functions.tokenizer import DEFAULT_ROOT_KEY, Tokenizer
from auto_data_tokenize_spark.operators.dlp_config import (
    apply_encrypt_config,
    parse_encrypt_config,
)

REF_CSV_CFG = "/root/reference/csv_dlp_tokenize_config.json"
REF_CC_CFG = "/root/reference/email_cc_dlp_encrypt_config.json"


def test_parse_reference_csv_config():
    if not os.path.exists(REF_CSV_CFG):
        pytest.skip("reference repo not present")
    specs = parse_encrypt_config(REF_CSV_CFG)
    assert len(specs) == 1
    s = specs[0]
    assert s.parts == ("transcript",)
    assert s.free_form is True
    assert s.info_types == ("PERSON_NAME", "EMAIL_ADDRESS", "DATE_OF_BIRTH")
    assert s.key_ref and s.key_ref.startswith("projects/")


def test_parse_reference_email_cc_config():
    if not os.path.exists(REF_CC_CFG):
        pytest.skip("reference repo not present")
    specs = parse_encrypt_config(REF_CC_CFG)
    assert [s.parts for s in specs] == [("cc",), ("email",)]
    assert all(not s.free_form for s in specs)
    assert all(s.info_types is None for s in specs)


def test_parse_rejects_unknown_info_type():
    with pytest.raises(ValueError, match="unknown infoType"):
        parse_encrypt_config(
            {"transforms": [{"columnId": "$.r.c", "infoTypes": ["IBAN_CODE"]}]}
        )


def test_parse_rejects_bad_column_id():
    with pytest.raises(ValueError, match="columnId"):
        parse_encrypt_config({"transforms": [{"columnId": "no-dollar"}]})
    with pytest.raises(ValueError, match="record"):
        parse_encrypt_config({"transforms": [{"columnId": "$.only_record"}]})
    with pytest.raises(ValueError, match="transforms"):
        parse_encrypt_config({"transforms": []})


def test_apply_free_form_matches_tokenizer_oracle(spark):
    specs = parse_encrypt_config(
        {
            "transforms": [
                {
                    "columnId": "$.R.text",
                    "freeFormColumn": "true",
                    "infoTypes": ["PERSON_NAME", "EMAIL_ADDRESS", "DATE_OF_BIRTH"],
                }
            ]
        }
    )
    rows = [
        ("c1", "Alice Smith born 1987-04-12, a@b.co, call 415-555-0143"),
        ("c2", "no pii at all"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = {
        r["conv_id"]: r["text"]
        for r in apply_encrypt_config(df, specs, scope_col="conv_id").collect()
    }
    tok = Tokenizer(DEFAULT_ROOT_KEY)
    want = {
        c: tok.tokenize_text(c, t, ("PERSON_NAME", "EMAIL_ADDRESS", "DATE_OF_BIRTH"))
        for c, t in rows
    }
    assert out == want
    # the config's 3-type selection leaves the phone number plaintext
    assert "415-555-0143" in out["c1"]
    assert "Alice" not in out["c1"]


def test_apply_whole_value_matches_tokenize_columns(spark):
    from auto_data_tokenize_spark.operators.tokenize import tokenize_columns

    specs = parse_encrypt_config(
        {
            "transforms": [
                {"columnId": "$.kylosample.cc"},
                {"columnId": "$.kylosample.email"},
            ]
        }
    )
    df = spark.createDataFrame(
        [(1, "4111111111111111", "a@b.co")], "id long, cc string, email string"
    )
    got = apply_encrypt_config(df, specs).collect()[0]
    want = tokenize_columns(df, ["cc", "email"]).collect()[0]
    assert got["encrypted_cc"] == want["encrypted_cc"]
    assert got["encrypted_email"] == want["encrypted_email"]
    assert set(got.asDict()) == {"id", "encrypted_cc", "encrypted_email"}


def test_apply_nested_routes_to_tokenize_nested(spark):
    specs = parse_encrypt_config(
        {"transforms": [{"columnId": "$.contacts.contact.number"}]}
    )
    df = spark.createDataFrame(
        [(1, {"number": "555"})], "id long, contact struct<number:string>"
    )
    out = apply_encrypt_config(df, specs)
    assert "encrypted_number" in out.select("contact.*").columns


def test_free_form_nested_rejected():
    specs = parse_encrypt_config(
        {
            "transforms": [
                {"columnId": "$.r.a.b", "freeFormColumn": "true"}
            ]
        }
    )
    with pytest.raises(ValueError, match="flat"):
        apply_encrypt_config(None, specs)


# ------------------------------------------------- review-fix regressions
def test_empty_infotypes_rejected():
    with pytest.raises(ValueError, match="empty infoTypes"):
        parse_encrypt_config(
            {"transforms": [{"columnId": "$.R.text",
                             "freeFormColumn": "true", "infoTypes": []}]}
        )


def test_duplicate_column_ids_rejected(spark):
    specs = parse_encrypt_config(
        {"transforms": [
            {"columnId": "$.R.a", "transform": {"redactConfig": {}}},
            {"columnId": "$.R.a", "transform": {"redactConfig": {}}},
        ]}
    )
    df = spark.createDataFrame([("x",)], "a string")
    with pytest.raises(ValueError, match="duplicate columnId"):
        apply_encrypt_config(df, specs)


def test_transform_order_is_semantics_free(spark):
    """dateShift context reads the ORIGINAL custkey even when a
    sibling replaceConfig rewrites custkey — entry order must not
    change any result column."""
    import datetime

    rows = [(1, datetime.date(2020, 6, 1)), (2, datetime.date(2020, 6, 1))]
    df = spark.createDataFrame(rows, "custkey long, d date")
    shift = {
        "columnId": "$.R.d",
        "transform": {"dateShiftConfig": {
            "lowerBoundDays": -30, "upperBoundDays": 30,
            "context": {"name": "custkey"},
        }},
    }
    repl = {
        "columnId": "$.R.custkey",
        "transform": {"replaceConfig": {"newValue": {"integerValue": 0}}},
    }
    a = apply_encrypt_config(
        df, parse_encrypt_config({"transforms": [shift, repl]}),
        root_key=b"k" * 32,
    )
    b = apply_encrypt_config(
        df, parse_encrypt_config({"transforms": [repl, shift]}),
        root_key=b"k" * 32,
    )
    ra = sorted((r.custkey, r.d) for r in a.collect())
    rb = sorted((r.custkey, r.d) for r in b.collect())
    assert ra == rb
    # and the two contexts produce distinct shifts (context survived)
    assert len({d for _, d in ra}) == 2
    assert set(a.columns) == {"custkey", "d"}  # snapshots dropped

"""Report file sinks + pluggable value tokenizers."""

import json
import os

import pytest

from auto_data_tokenize_spark.functions import value_tokenizer as vt
from auto_data_tokenize_spark.operators import report_io
from auto_data_tokenize_spark.operators.identify import (
    column_infotype_counts,
    column_report,
    inspection_report,
)


def test_write_column_reports_layout(spark, transcripts_small, tmp_path):
    rep = column_report(column_infotype_counts(transcripts_small, ["text"]))
    paths = report_io.write_column_reports(rep, str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["col-text.json"]
    d = json.load(open(paths[0]))
    assert d["column_name"] == "$.text"
    assert {it["info_type"] for it in d["info_types"]} == {
        "EMAIL_ADDRESS", "PHONE_NUMBER", "CREDIT_CARD_NUMBER",
        "US_SOCIAL_SECURITY_NUMBER",
    }


def test_schema_file(spark, transcripts_small, tmp_path):
    p = report_io.write_schema_file(transcripts_small, str(tmp_path))
    s = json.load(open(p))
    assert {f["name"] for f in s["fields"]} == {
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    }


def test_inspection_report_shape(spark, transcripts_small):
    rep = inspection_report(
        column_report(column_infotype_counts(transcripts_small, ["text"])),
        "PARQUET", "/data/transcripts/*.parquet",
    )
    row = rep.collect()[0]
    assert row["source_type"] == "PARQUET"
    assert len(row["column_report"]) == 1


def test_value_tokenizer_registry_roundtrip():
    for name in ("aes_siv", "aes_ecb"):
        t = vt.resolve(name)
        tok = t.encrypt("scope1", "415-555-0143")
        assert t.decrypt("scope1", tok) == "415-555-0143"
        assert t.encrypt("scope1", "415-555-0143") == tok  # deterministic


def test_value_tokenizer_reflection_path():
    t = vt.resolve(
        "auto_data_tokenize_spark.functions.value_tokenizer:AesEcbValueTokenizer"
    )
    assert t.decrypt("", t.encrypt("", "x")) == "x"
    with pytest.raises(KeyError):
        vt.resolve("nope")


def test_aes_ecb_matches_reference_semantics():
    # ECB determinism: equal plaintext blocks -> equal ciphertext blocks
    t = vt.resolve("aes_ecb")
    a = t.encrypt("", "A" * 16 + "A" * 16)
    import base64
    raw = base64.b64decode(a)
    assert raw[:16] == raw[16:32]  # the documented ECB weakness, by design

"""Tink keyset wire compatibility, pinned against the REFERENCE's own
golden fixtures (read in place from /root/reference, never copied)."""

import base64
import json
import os

import pytest

from auto_data_tokenize_spark.functions.tink_compat import (
    TinkDaeadTokenizer,
    decode_dlp_value,
    encode_dlp_value,
    load_tink_keyset,
    make_keyset_json,
)

REF = "/root/reference/src/test/resources"


def _ref(path):
    p = os.path.join(REF, path)
    if not os.path.exists(p):
        pytest.skip("reference fixtures not present")
    return open(p).read()


def test_reference_golden_tokens_byte_identical():
    """Our encrypt of the reference's plain contact records must equal
    its published encrypted records byte for byte — keyset, Value
    proto, AES-SIV and TINK prefix all wire-compatible
    (encryptors/DaeadEncryptingValueTokenizer.java:40-48)."""
    tok = TinkDaeadTokenizer(_ref("test_encryption_key.json"))
    for who in ("john", "jane"):
        plain = json.loads(
            _ref(f"avro_records/contacts_schema/{who}_doe_contact_plain_avro_record.json")
        )
        enc = json.loads(
            _ref(f"avro_records/contacts_schema/{who}_doe_contact_encrypted_avro_record.json")
        )
        assert len(plain["contacts"]) >= 2
        for p, e in zip(plain["contacts"], enc["contacts"]):
            num = p["contact"]["number"]
            want = e["contact"]["encrypted_number"]
            assert tok.encrypt(num) == want
            assert tok.decrypt(want) == num


def test_keyset_parse_and_prefix():
    key_id, key = load_tink_keyset(_ref("test_encryption_key.json"))
    assert key_id == 1704923596 and len(key) == 64
    tok = TinkDaeadTokenizer(_ref("test_encryption_key.json"))
    raw = base64.b64decode(tok.encrypt("x"))
    assert raw[0] == 1 and raw[1:5] == key_id.to_bytes(4, "big")


def test_rejects_non_siv_keyset():
    with pytest.raises(ValueError, match="AES256-SIV"):
        TinkDaeadTokenizer(_ref("aes128_eax_keyset.json"))


@pytest.mark.parametrize(
    "v", [0, 1, -1, 2**62, -(2**62), 1.5, -0.25, "héllo wörld", "", True, False, None]
)
def test_dlp_value_roundtrip(v):
    assert decode_dlp_value(encode_dlp_value(v)) == v
    t = TinkDaeadTokenizer(make_keyset_json(bytes(range(64)), key_id=7))
    assert t.decrypt(t.encrypt(v)) == v


def test_spark_columns_roundtrip_and_cross_decrypt(spark):
    """tokenize_columns_tink over a DataFrame roundtrips, and a token
    produced by the column op decrypts with the scalar tokenizer (and
    vice versa) — one wire format everywhere."""
    from auto_data_tokenize_spark.operators.tokenize import (
        detokenize_columns_tink,
        tokenize_columns_tink,
    )

    ks = make_keyset_json(bytes(range(64)), key_id=99)
    df = spark.createDataFrame(
        [(1, "alice", 10.5, 123), (2, "bob", -3.25, None)],
        "id long, name string, bal double, phone long",
    )
    tok = tokenize_columns_tink(df, ["name", "bal", "phone"], ks)
    assert {f.name for f in tok.schema} == {
        "id", "encrypted_name", "encrypted_bal", "encrypted_phone"
    }
    scalar = TinkDaeadTokenizer(ks)
    row = {r["id"]: r for r in tok.collect()}
    assert scalar.decrypt(row[1]["encrypted_name"]) == "alice"
    assert row[2]["encrypted_phone"] is None
    assert row[1]["encrypted_phone"] == scalar.encrypt(123)
    back = detokenize_columns_tink(
        tok, ["name", "bal", "phone"], ks,
        {"name": "string", "bal": "double", "phone": "long"},
    )
    got = sorted(map(tuple, back.select("id", "name", "bal", "phone").collect()))
    assert got == [(1, "alice", 10.5, 123), (2, "bob", -3.25, None)]


def test_tink_rekey_rotates_reference_wire_tokens(spark):
    """Rotate a table tokenized under keyset A to keyset B: every token
    changes, B's scalar tokenizer decrypts the result, and values
    survive — the migration job for reference users."""
    from auto_data_tokenize_spark.operators.tokenize import (
        rekey_columns_tink,
        tokenize_columns_tink,
    )

    ks_a = make_keyset_json(bytes(range(64)), key_id=1)
    ks_b = make_keyset_json(bytes(range(64, 128)), key_id=2)
    df = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "id long, name string"
    )
    tok_a = tokenize_columns_tink(df, ["name"], ks_a)
    rot = rekey_columns_tink(tok_a, ["name"], ks_a, ks_b)
    a = {r["id"]: r["encrypted_name"] for r in tok_a.collect()}
    b = {r["id"]: r["encrypted_name"] for r in rot.collect()}
    assert all(a[i] != b[i] for i in a)
    dec = TinkDaeadTokenizer(ks_b)
    assert dec.decrypt(b[1]) == "alice" and dec.decrypt(b[2]) == "bob"
    with pytest.raises(ValueError, match="missing tokenized"):
        rekey_columns_tink(df, ["name"], ks_a, ks_b)


def test_encode_rejects_out_of_range_int():
    t = TinkDaeadTokenizer(make_keyset_json(bytes(range(64))))
    for v in (2**63, -(2**63) - 1, 2**64):
        with pytest.raises(ValueError, match="int64"):
            t.encrypt(v)
    # boundary values survive exactly
    assert t.decrypt(t.encrypt(2**63 - 1)) == 2**63 - 1
    assert t.decrypt(t.encrypt(-(2**63))) == -(2**63)


def test_tokenize_columns_tink_rejects_unsupported_types(spark):
    from auto_data_tokenize_spark.operators.tokenize import (
        tokenize_columns_tink,
    )

    ks = make_keyset_json(bytes(range(64)))
    df = spark.createDataFrame([(1, b"\x00")], "id long, blob binary")
    with pytest.raises(ValueError, match="unsupported column type"):
        tokenize_columns_tink(df, ["blob"], ks)


def test_float_column_widens_like_java(spark):
    """A FloatType column must token-match the double produced by IEEE
    float→double widening (what the reference encodes), NOT the double
    nearest the shortest float repr."""
    import struct as _struct

    from auto_data_tokenize_spark.operators.tokenize import (
        tokenize_columns_tink,
    )

    ks = make_keyset_json(bytes(range(64)))
    df = spark.createDataFrame([(1, 0.1)], "id long, x float")
    tok = tokenize_columns_tink(df, ["x"], ks)
    got = tok.first()["encrypted_x"]
    widened = _struct.unpack("<f", _struct.pack("<f", 0.1))[0]
    assert widened != 0.1  # the two candidate doubles really differ
    scalar = TinkDaeadTokenizer(ks)
    assert got == scalar.encrypt(widened)
    assert got != scalar.encrypt(0.1)

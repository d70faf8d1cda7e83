"""Unit tests for the deterministic AES-SIV tokenizer + key hierarchy
(reference analogue: encryptors/DaeadEncryptingValueTokenizerTest)."""

import base64

import pytest

from auto_data_tokenize_spark.functions.tokenizer import (
    DEFAULT_ROOT_KEY,
    TOKEN_RE,
    Tokenizer,
    hkdf_sha256,
)


def test_hkdf_rfc5869_case1():
    # RFC 5869 A.1 test vector (public)
    ikm = bytes.fromhex("0b" * 22)
    salt = bytes.fromhex("000102030405060708090a0b0c")
    info = bytes.fromhex("f0f1f2f3f4f5f6f7f8f9")
    okm = hkdf_sha256(ikm, salt, info, 42)
    assert okm.hex() == (
        "3cb25f25faacd57a90434f64d0362f2a2d2d0a90cf1a5a4c5db02d56ecc4c5bf"
        "34007208d5b887185865"
    )


def test_token_deterministic():
    t = Tokenizer()
    a = t.token("conv1", "EMAIL_ADDRESS", "bob@example.com")
    b = t.token("conv1", "EMAIL_ADDRESS", "bob@example.com")
    assert a == b
    assert TOKEN_RE.fullmatch(a)


def test_token_scoped_by_conv_and_infotype():
    t = Tokenizer()
    base = t.token("conv1", "EMAIL_ADDRESS", "bob@example.com")
    assert t.token("conv2", "EMAIL_ADDRESS", "bob@example.com") != base
    assert t.token("conv1", "PHONE_NUMBER", "bob@example.com") != base


def test_roundtrip():
    t = Tokenizer()
    tok = t.token("c", "PHONE_NUMBER", "415-555-0143")
    m = TOKEN_RE.fullmatch(tok)
    assert t.detoken("c", m.group(1), m.group(2)) == "415-555-0143"


def test_tokenize_text_and_back():
    t = Tokenizer()
    text = "reach me at alice@example.com or (212) 555-0100 thx"
    enc = t.tokenize_text("conv9", text)
    assert "alice@example.com" not in enc
    assert "(212) 555-0100" not in enc
    assert enc.count("[TOK:") == 2
    assert t.detokenize_text("conv9", enc) == text


def test_tokenize_text_no_pii_identity():
    t = Tokenizer()
    assert t.tokenize_text("c", "hello world") == "hello world"
    assert t.tokenize_text("c", None) is None
    assert t.tokenize_text("c", "") == ""


def test_wrong_conv_cannot_detokenize():
    t = Tokenizer()
    enc = t.tokenize_text("conv1", "mail bob@example.com")
    with pytest.raises(Exception):
        t.detokenize_text("conv2", enc)


def test_root_key_separates_tenants():
    t1 = Tokenizer(DEFAULT_ROOT_KEY)
    t2 = Tokenizer(b"\x01" * 32)
    assert t1.token("c", "EMAIL_ADDRESS", "x@y.io") != t2.token(
        "c", "EMAIL_ADDRESS", "x@y.io"
    )


def test_token_is_stable_join_key():
    # determinism ⇒ same plaintext twice in one conversation → same token
    t = Tokenizer()
    enc = t.tokenize_text(
        "c", "first bob@example.com then again bob@example.com"
    )
    toks = TOKEN_RE.findall(enc)
    assert len(toks) == 2 and toks[0] == toks[1]


def test_key_provider_precedence(monkeypatch):
    """explicit key > registered KeyProvider > env var > dev default
    (the KeySetExtractor-style custody seam,
    EncryptionPipeline.java:299-330)."""
    from auto_data_tokenize_spark.functions import tokenizer as tk

    key_a, key_b = b"a" * 32, b"b" * 32
    env_key = bytes.fromhex("63" * 32)
    monkeypatch.setenv("ADT_ROOT_KEY_HEX", "63" * 32)
    assert tk.resolve_root_key() == env_key  # env beats dev default

    tk.register_key_provider(tk.StaticKeyProvider(key_b))
    try:
        assert tk.resolve_root_key() == key_b       # provider beats env
        assert tk.resolve_root_key(key_a) == key_a  # explicit beats provider
    finally:
        tk.register_key_provider(None)
    assert tk.resolve_root_key() == env_key  # cleared -> env again


def test_env_key_provider_makes_key_mandatory(monkeypatch):
    from auto_data_tokenize_spark.functions import tokenizer as tk

    monkeypatch.delenv("ADT_NO_SUCH_KEY", raising=False)
    tk.register_key_provider(tk.EnvKeyProvider("ADT_NO_SUCH_KEY"))
    try:
        with pytest.raises(KeyError, match="ADT_NO_SUCH_KEY"):
            tk.resolve_root_key()
    finally:
        tk.register_key_provider(None)


def test_dev_default_still_warns(monkeypatch):
    from auto_data_tokenize_spark.functions import tokenizer as tk

    monkeypatch.delenv("ADT_ROOT_KEY_HEX", raising=False)
    with pytest.warns(UserWarning, match="dev root key"):
        assert tk.resolve_root_key() == tk.DEFAULT_ROOT_KEY


def test_static_key_provider_validates_length():
    from auto_data_tokenize_spark.functions import tokenizer as tk

    with pytest.raises(ValueError, match="32 bytes"):
        tk.StaticKeyProvider(b"short")
    with pytest.raises(TypeError, match="KeyProvider"):
        tk.register_key_provider(object())

"""FF1 format-preserving encryption: NIST SP 800-38G sample-vector
goldens, round-trip/determinism properties, DLP CryptoReplaceFfxFpe
semantics (alphabets, context tweak, surrogates), and the Spark
whole-value + free-form wiring."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from auto_data_tokenize_spark.functions.fpe import (
    BASE95_ALPHABET,
    COMMON_ALPHABETS,
    FpeCipher,
    ff1_decrypt,
    ff1_encrypt,
    min_length,
    reidentify_text,
    wrap_surrogate,
)

AES128_KEY = bytes.fromhex("2B7E151628AED2A6ABF7158809CF4F3C")
LOWER36 = "0123456789abcdefghijklmnopqrstuvwxyz"


def _enc_str(key, tweak, alphabet, pt: str) -> str:
    ct = ff1_encrypt(key, tweak, len(alphabet), [alphabet.index(c) for c in pt])
    return "".join(alphabet[d] for d in ct)


# --- NIST SP 800-38G FF1-AES128 sample vectors (published goldens) ---


def test_nist_sample_1_radix10_empty_tweak():
    assert _enc_str(AES128_KEY, b"", "0123456789", "0123456789") == "2433477484"


def test_nist_sample_2_radix10_tweak():
    t = bytes.fromhex("39383736353433323130")
    assert _enc_str(AES128_KEY, t, "0123456789", "0123456789") == "6124200773"


def test_nist_sample_3_radix36():
    t = bytes.fromhex("3737373770717273373737")
    assert (
        _enc_str(AES128_KEY, t, LOWER36, "0123456789abcdefghi")
        == "a9tv40mll9kdu509eum"
    )


def test_decrypt_inverts_nist_vectors():
    for tweak, alpha, pt in [
        (b"", "0123456789", "0123456789"),
        (bytes.fromhex("39383736353433323130"), "0123456789", "0123456789"),
        (bytes.fromhex("3737373770717273373737"), LOWER36, "0123456789abcdefghi"),
    ]:
        radix = len(alpha)
        ct = ff1_encrypt(AES128_KEY, tweak, radix, [alpha.index(c) for c in pt])
        back = ff1_decrypt(AES128_KEY, tweak, radix, ct)
        assert "".join(alpha[d] for d in back) == pt


# --- properties ---


@settings(deadline=None, max_examples=60)
@given(
    key=st.sampled_from([AES128_KEY, b"\x01" * 24, b"\xab" * 32]),
    radix=st.sampled_from([10, 16, 36, 62, 95]),
    tweak=st.binary(max_size=20),
    data=st.data(),
)
def test_roundtrip_and_format_preservation(key, radix, tweak, data):
    n = data.draw(st.integers(min_value=min_length(radix), max_value=24))
    pt = data.draw(st.lists(st.integers(0, radix - 1), min_size=n, max_size=n))
    ct = ff1_encrypt(key, tweak, radix, pt)
    assert len(ct) == len(pt) and all(0 <= d < radix for d in ct)
    assert ff1_decrypt(key, tweak, radix, ct) == pt


def test_deterministic_and_tweak_sensitive():
    pt = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]
    a = ff1_encrypt(AES128_KEY, b"ctx-a", 10, pt)
    assert ff1_encrypt(AES128_KEY, b"ctx-a", 10, pt) == a
    assert ff1_encrypt(AES128_KEY, b"ctx-b", 10, pt) != a


def test_parameter_validation():
    with pytest.raises(ValueError, match="radix"):
        ff1_encrypt(AES128_KEY, b"", 1, [0, 0, 0, 0, 0, 0, 0])
    with pytest.raises(ValueError, match="min len"):
        ff1_encrypt(AES128_KEY, b"", 10, [1, 2, 3, 4, 5])  # 10^5 < 1e6
    with pytest.raises(ValueError, match="key"):
        ff1_encrypt(b"short", b"", 10, [0] * 10)


def test_min_length_examples():
    assert min_length(10) == 6
    assert min_length(36) == 4
    assert min_length(62) == 4
    assert min_length(95) == 4
    assert min_length(1000) == 2


# --- FpeCipher / DLP alphabet semantics ---


def test_cipher_common_alphabet_roundtrip():
    c = FpeCipher(AES128_KEY, common_alphabet="NUMERIC")
    tok = c.encrypt("4111111111111111", context="cust-7")
    assert tok != "4111111111111111" and len(tok) == 16
    assert set(tok) <= set(COMMON_ALPHABETS["NUMERIC"])
    assert c.decrypt(tok, context="cust-7") == "4111111111111111"
    assert c.encrypt("4111111111111111", context="cust-8") != tok


def test_cipher_radix_prefix_and_custom_alphabet():
    assert FpeCipher(AES128_KEY, radix=10).alphabet == "0123456789"
    assert FpeCipher(AES128_KEY, radix=95).alphabet == BASE95_ALPHABET
    c = FpeCipher(AES128_KEY, alphabet="0123456789-")
    tok = c.encrypt("25-989-741-2988")
    assert len(tok) == 15 and set(tok) <= set("0123456789-")
    assert c.decrypt(tok) == "25-989-741-2988"


def test_cipher_rejects_bad_configs_and_values():
    with pytest.raises(ValueError, match="exactly one"):
        FpeCipher(AES128_KEY)
    with pytest.raises(ValueError, match="exactly one"):
        FpeCipher(AES128_KEY, radix=10, common_alphabet="NUMERIC")
    with pytest.raises(ValueError, match="unknown common alphabet"):
        FpeCipher(AES128_KEY, common_alphabet="EMOJI")
    with pytest.raises(ValueError, match="duplicate"):
        FpeCipher(AES128_KEY, alphabet="aabcdefghij")
    with pytest.raises(ValueError, match="radix must be in"):
        FpeCipher(AES128_KEY, radix=96)
    c = FpeCipher(AES128_KEY, common_alphabet="NUMERIC")
    with pytest.raises(ValueError, match="outside the FPE alphabet"):
        c.encrypt("123-456-7890")
    assert not c.can_encrypt("12345")  # below min_length(10) == 6
    assert c.can_encrypt("123456")


# --- surrogates / re-identification ---


def test_surrogate_wrap_and_reidentify():
    c = FpeCipher(AES128_KEY, radix=95)
    text = "mail john.doe@example.com and call 406-555-0123 today"
    tok_mail = c.encrypt("john.doe@example.com")
    tok_tel = c.encrypt("406-555-0123")
    masked = (
        f"mail {wrap_surrogate('ADT_TOKEN', tok_mail)} and call "
        f"{wrap_surrogate('ADT_TOKEN', tok_tel)} today"
    )
    assert reidentify_text(masked, c, "ADT_TOKEN") == text


def test_reidentify_skips_foreign_and_malformed_heads():
    c = FpeCipher(AES128_KEY, radix=95)
    tok = wrap_surrogate("ADT_TOKEN", c.encrypt("secret-value"))
    text = f"OTHER(3):abc then len overrun ADT_TOKEN(99):x then {tok}"
    out = reidentify_text(text, c, "ADT_TOKEN")
    assert out.startswith("OTHER(3):abc then len overrun ADT_TOKEN(99):x then ")
    assert out.endswith("secret-value")


def test_reidentify_none_and_empty():
    c = FpeCipher(AES128_KEY, radix=95)
    assert reidentify_text(None, c, "T") is None
    assert reidentify_text("", c, "T") == ""
    assert reidentify_text("no tokens here", c, "T") == "no tokens here"


def test_wrap_surrogate_validates_name():
    with pytest.raises(ValueError, match="surrogate name"):
        wrap_surrogate("bad name", "tok")


# --- Spark wiring: whole-value transform, config path, free-form ---


def test_whole_value_fpe_transform_roundtrip(spark):
    from auto_data_tokenize_spark.operators.deidentify import (
        apply_whole_value_transform,
        fpe_cipher_for,
        fpe_transform_udf,
    )

    df = spark.createDataFrame(
        [("c1", "25-989-741-2988"), ("c2", "23-768-687-3665"), ("c3", None)],
        "id string, phone string",
    )
    cfg = {
        "cryptoReplaceFfxFpeConfig": {
            "customAlphabet": "0123456789-",
            "context": {"name": "id"},
        }
    }
    out = apply_whole_value_transform(df, "phone", cfg, out_col="tok")
    rows = {r["id"]: r for r in out.collect()}
    assert rows["c3"]["tok"] is None
    assert rows["c1"]["tok"] != rows["c1"]["phone"]
    assert len(rows["c1"]["tok"]) == 15
    assert set(rows["c1"]["tok"]) <= set("0123456789-")

    cipher = fpe_cipher_for("phone", cfg["cryptoReplaceFfxFpeConfig"])
    dec = out.withColumn(
        "back",
        fpe_transform_udf(cipher, decrypt=True)(
            out["tok"], out["id"].cast("string")
        ),
    )
    for r in dec.collect():
        assert r["back"] == r["phone"]


def test_config_driven_fpe_with_surrogate(spark):
    from auto_data_tokenize_spark.operators.dlp_config import (
        apply_encrypt_config,
        parse_encrypt_config,
    )

    df = spark.createDataFrame(
        [("a", "123456789"), ("b", "987654321")], "id string, acct string"
    )
    cfg = {
        "transforms": [
            {
                "columnId": "$.R.acct",
                "transform": {
                    "cryptoReplaceFfxFpeConfig": {
                        "commonAlphabet": "NUMERIC",
                        "surrogateInfoType": {"name": "ACCT"},
                    }
                },
            }
        ]
    }
    out = {
        r["id"]: r["acct"]
        for r in apply_encrypt_config(df, parse_encrypt_config(cfg)).collect()
    }
    assert out["a"].startswith("ACCT(9):") and out["a"] != "123456789"
    assert out["a"] != out["b"]


def test_free_form_fpe_reidentify_roundtrip(spark):
    from auto_data_tokenize_spark.functions.udfs import transform_text_udf
    from auto_data_tokenize_spark.operators.deidentify import (
        fpe_cipher_for,
        fpe_reidentify_udf,
        free_form_repl,
    )

    cfg = {
        "cryptoReplaceFfxFpeConfig": {
            "radix": 95,
            "surrogateInfoType": {"name": "ADT_TOKEN"},
        }
    }
    df = spark.createDataFrame(
        [
            ("t1", "reach me at jane@corp.example or 406-555-0123"),
            ("t2", "ssn 536-90-4399 cc 4556737586899855"),
            ("t3", None),
            ("t4", "no findings at all"),
        ],
        "id string, text string",
    )
    repl = free_form_repl(cfg, column="text")
    masked = df.withColumn("masked", transform_text_udf(repl)(df["text"]))
    m = {r["id"]: r["masked"] for r in masked.collect()}
    assert "jane@corp.example" not in (m["t1"] or "")
    assert "ADT_TOKEN(" in m["t1"] and "ADT_TOKEN(" in m["t2"]
    assert m["t3"] is None and m["t4"] == "no findings at all"

    cipher = fpe_cipher_for("text", cfg["cryptoReplaceFfxFpeConfig"])
    back = masked.withColumn(
        "back", fpe_reidentify_udf(cipher, "ADT_TOKEN")(masked["masked"])
    )
    for r in back.collect():
        assert r["back"] == r["text"]


def test_free_form_fpe_requires_surrogate():
    from auto_data_tokenize_spark.operators.deidentify import free_form_repl

    with pytest.raises(ValueError, match="surrogateInfoType"):
        free_form_repl({"cryptoReplaceFfxFpeConfig": {"radix": 95}})


def test_reidentify_recovers_token_adjacent_to_word_chars(spark):
    """A surrogate head immediately preceded by word characters must
    still be found: the greedy name class matches 'IDSSN(9):' first,
    and scanning must resume INSIDE the failed head (regression: it
    resumed after it, silently leaving the token encrypted)."""
    from auto_data_tokenize_spark.functions.fpe import (
        FpeCipher,
        reidentify_text,
        wrap_surrogate,
    )

    cipher = FpeCipher(b"k" * 16, common_alphabet="NUMERIC")
    tok = wrap_surrogate("SSN", cipher.encrypt("536904399"))
    text = f"ID{tok} and tail"
    back = reidentify_text(text, cipher, "SSN")
    assert back == "ID536904399 and tail"
    # a genuinely foreign annotation is still kept verbatim
    keep = reidentify_text("OTHER(3):123", cipher, "SSN")
    assert keep == "OTHER(3):123"


def test_ff1_preamble_cache_is_transparent(spark):
    """The per-(radix, n, tweak) preamble cache must not change any
    ciphertext: same value+context always round-trips and differing
    contexts still diverge after the cache is warm."""
    from auto_data_tokenize_spark.functions.fpe import FpeCipher

    cipher = FpeCipher(b"q" * 16, radix=62)
    vals = ["abc123", "zzz999", "abc123"]
    for ctx in ("", "conv-1", "conv-2", ""):
        toks = [cipher.encrypt(v, ctx) for v in vals]
        assert toks[0] == toks[2]  # deterministic under warm cache
        for v, t in zip(vals, toks):
            assert cipher.decrypt(t, ctx) == v
    t1 = cipher.encrypt("abc123", "conv-1")
    t2 = cipher.encrypt("abc123", "conv-2")
    assert t1 != t2
    assert len(cipher._aes.iv_cache) > 0


def test_free_form_fpe_context_binds_per_row(spark):
    """A configured context column must reach the free-form FPE spans:
    equal values in different conversations yield DIFFERENT tokens
    (cross-scope unlinkability), and context-aware re-identification
    round-trips (regression: the span callback silently dropped the
    configured context and tokens were keyset-global)."""
    from auto_data_tokenize_spark.functions.udfs import transform_text_udf
    from auto_data_tokenize_spark.operators.deidentify import (
        fpe_cipher_for,
        fpe_reidentify_udf,
        free_form_repl,
    )

    cfg = {
        "cryptoReplaceFfxFpeConfig": {
            "radix": 95,
            "context": {"name": "conv_id"},
            "surrogateInfoType": {"name": "ADT_TOKEN"},
        }
    }
    df = spark.createDataFrame(
        [
            ("c1", "ssn is 536-90-4399"),
            ("c2", "ssn is 536-90-4399"),
            (None, "ssn is 536-90-4399"),
        ],
        "conv_id string, text string",
    )
    repl = free_form_repl(cfg, column="text")
    masked = df.withColumn(
        "masked",
        transform_text_udf(repl, takes_context=True)(
            df["text"], df["conv_id"]
        ),
    )
    rows = {r["conv_id"]: r["masked"] for r in masked.collect()}
    assert rows["c1"] != rows["c2"]  # unlinkable across contexts
    assert all("536-90-4399" not in (m or "") for m in rows.values())
    cipher = fpe_cipher_for("text", cfg["cryptoReplaceFfxFpeConfig"])
    back = masked.withColumn(
        "back",
        fpe_reidentify_udf(cipher, "ADT_TOKEN", takes_context=True)(
            masked["masked"], masked["conv_id"]
        ),
    )
    for r in back.collect():
        assert r["back"] == r["text"]


def test_encrypt_config_free_form_fpe_context_applies(spark):
    """apply_encrypt_config must thread a freeFormColumn FPE context
    through to the spans (and read it from the original-value
    snapshot)."""
    from auto_data_tokenize_spark.operators.dlp_config import (
        apply_encrypt_config,
        parse_encrypt_config,
    )

    cfg = {
        "transforms": [
            {
                "columnId": "$.r.text",
                "freeFormColumn": "true",
                "infoTypes": ["US_SOCIAL_SECURITY_NUMBER"],
                "transform": {
                    "cryptoReplaceFfxFpeConfig": {
                        "radix": 95,
                        "context": {"name": "conv_id"},
                        "surrogateInfoType": {"name": "ADT_TOKEN"},
                    }
                },
            }
        ]
    }
    df = spark.createDataFrame(
        [("c1", "ssn 536-90-4399"), ("c2", "ssn 536-90-4399")],
        "conv_id string, text string",
    )
    out = apply_encrypt_config(df, parse_encrypt_config(cfg))
    rows = {r["conv_id"]: r["text"] for r in out.collect()}
    assert rows["c1"] != rows["c2"]
    assert all("ADT_TOKEN(" in v for v in rows.values())

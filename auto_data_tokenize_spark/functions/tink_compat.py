"""Tink-keyset wire compatibility — consume the reference's OWN
cleartext AES256-SIV keysets and produce byte-identical tokens.

The reference encrypts with Google Tink's DeterministicAead primitive
(encryptors/DaeadEncryptingValueTokenizer.java:40-48): the plaintext is
the serialized DLP ``Value`` proto, the associated data is the literal
``"AutoDLP"``, and the TINK output prefix (0x01 ‖ big-endian keyId) is
prepended before base64. All three layers are public formats:

  * keyset JSON (Tink's cleartext JSON keyset; ``keyData.value`` is a
    base64 ``AesSivKey`` proto: field 1 = version varint, field 2 =
    the 64-byte key) — parsed here with a minimal hand-rolled proto
    reader, the same discipline as the pure-Python Avro codec;
  * ``google.privacy.dlp.v2.Value`` (proto3 oneof: integer_value=1
    varint, float_value=2 double, string_value=3 bytes,
    boolean_value=4 varint) — encoded/decoded for the locally
    representable members;
  * RFC 5297 AES-SIV with a single AD component (cryptography's
    AESSIV follows the same RFC construction Tink does).

tests/test_tink_compat.py pins this module against the reference's own
golden fixtures: ``test_encryption_key.json`` +
``john/jane_doe_contact_encrypted_avro_record.json`` — our encrypt of
the plain records reproduces the reference's base64 tokens byte for
byte, so a user can bring their existing keyset AND their existing
tokenized tables.
"""

from __future__ import annotations

import base64
import json
import struct

from cryptography.hazmat.primitives.ciphers.aead import AESSIV

ASSOCIATED_DATA = b"AutoDLP"  # DaeadEncryptingValueTokenizer.java:33
AES_SIV_TYPE_URL = "type.googleapis.com/google.crypto.tink.AesSivKey"

__all__ = [
    "load_tink_keyset",
    "encode_dlp_value",
    "decode_dlp_value",
    "TinkDaeadTokenizer",
]


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # proto int64 negative: 10-byte two's complement
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _parse_aes_siv_key(proto: bytes) -> bytes:
    """Minimal AesSivKey proto parse: field 2 (key_value) bytes."""
    pos, key = 0, None
    while pos < len(proto):
        tag, pos = _read_varint(proto, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint (version)
            _, pos = _read_varint(proto, pos)
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(proto, pos)
            if field == 2:
                key = proto[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire} in AesSivKey")
    if key is None or len(key) != 64:
        raise ValueError("AesSivKey must carry a 64-byte key_value")
    return key


def load_tink_keyset(keyset_json: str) -> tuple[int, bytes]:
    """Cleartext Tink keyset JSON → (primary key id, 64-byte SIV key).
    Only the ENABLED primary AES256-SIV key is consumed — the exact
    shape of the reference's test_encryption_key.json and of keysets
    produced by ``tinkey create-keyset --key-template AES256_SIV``."""
    ks = json.loads(keyset_json)
    primary = ks["primaryKeyId"]
    for k in ks["key"]:
        if k["keyId"] != primary:
            continue
        if k.get("status") != "ENABLED":
            raise ValueError("primary key is not ENABLED")
        kd = k["keyData"]
        if kd["typeUrl"] != AES_SIV_TYPE_URL:
            raise ValueError(
                f"unsupported key type {kd['typeUrl']!r}; this engine "
                "tokenizes with AES256-SIV (deterministic AEAD)"
            )
        if k.get("outputPrefixType") != "TINK":
            raise ValueError("only TINK output prefix keysets supported")
        return primary, _parse_aes_siv_key(base64.b64decode(kd["value"]))
    raise ValueError("primary key id not present in keyset")


def encode_dlp_value(value) -> bytes:
    """Serialize the DLP ``Value`` oneof for the locally representable
    members (what the reference's Value.toByteArray() emits)."""
    if value is None:
        return b""
    if isinstance(value, bool):
        return bytes([0x20]) + _write_varint(1 if value else 0)
    if isinstance(value, int):
        if not -(1 << 63) <= value < (1 << 63):
            # the proto field is int64; silent varint wraparound would
            # corrupt the value through an encrypt/decrypt roundtrip
            raise ValueError(
                f"integer {value} outside int64 range for DLP Value"
            )
        return bytes([0x08]) + _write_varint(value)
    if isinstance(value, float):
        return bytes([0x11]) + struct.pack("<d", value)
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return bytes([0x1A]) + _write_varint(len(raw)) + raw
    raise TypeError(f"unsupported DLP Value type {type(value).__name__}")


def decode_dlp_value(data: bytes):
    """Inverse of :func:`encode_dlp_value` (empty bytes → None)."""
    if not data:
        return None
    tag, pos = _read_varint(data, 0)
    field = tag >> 3
    if field == 1:
        v, _ = _read_varint(data, pos)
        return v - (1 << 64) if v >= (1 << 63) else v
    if field == 2:
        return struct.unpack("<d", data[pos : pos + 8])[0]
    if field == 3:
        ln, pos = _read_varint(data, pos)
        return data[pos : pos + ln].decode("utf-8")
    if field == 4:
        v, _ = _read_varint(data, pos)
        return bool(v)
    raise ValueError(f"unsupported DLP Value field {field}")


class TinkDaeadTokenizer:
    """The reference's DaeadEncryptingValueTokenizer, keyset-compatible:
    base64(0x01 ‖ keyId_be ‖ AES-SIV(key, Value-proto, ["AutoDLP"]))."""

    def __init__(self, keyset_json: str):
        key_id, key = load_tink_keyset(keyset_json)
        self._prefix = b"\x01" + struct.pack(">I", key_id)
        self._siv = AESSIV(key)

    def encrypt(self, value) -> str:
        ct = self._siv.encrypt(encode_dlp_value(value), [ASSOCIATED_DATA])
        return base64.b64encode(self._prefix + ct).decode("ascii")

    def decrypt(self, token: str):
        raw = base64.b64decode(token)
        if raw[:5] != self._prefix:
            raise ValueError("token prefix does not match keyset primary")
        pt = self._siv.decrypt(raw[5:], [ASSOCIATED_DATA])
        return decode_dlp_value(pt)


def make_keyset_json(key: bytes, key_id: int = 42) -> str:
    """Build a cleartext Tink AES256-SIV keyset JSON around ``key``
    (64 bytes) — the bring-your-own-key path for tests and for callers
    who hold raw key material rather than a tinkey-produced file."""
    if len(key) != 64:
        raise ValueError("AES256-SIV key must be 64 bytes")
    proto = b"\x12\x40" + key  # field 2 (key_value), 64 bytes
    return json.dumps(
        {
            "primaryKeyId": key_id,
            "key": [
                {
                    "keyData": {
                        "typeUrl": AES_SIV_TYPE_URL,
                        "value": base64.b64encode(proto).decode("ascii"),
                        "keyMaterialType": "SYMMETRIC",
                    },
                    "outputPrefixType": "TINK",
                    "keyId": key_id,
                    "status": "ENABLED",
                }
            ],
        }
    )


_TOKENIZER_CACHE: dict[str, "TinkDaeadTokenizer"] = {}


def get_tokenizer(keyset_json: str) -> "TinkDaeadTokenizer":
    """Per-process memoized tokenizer (the _get_tokenizer discipline of
    functions/udfs.py): keyset parse + AESSIV key schedule happen once
    per executor, not once per Arrow batch."""
    tok = _TOKENIZER_CACHE.get(keyset_json)
    if tok is None:
        tok = _TOKENIZER_CACHE[keyset_json] = TinkDaeadTokenizer(keyset_json)
    return tok

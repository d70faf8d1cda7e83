"""Pluggable value-tokenizer surface — the reference's UDF extension
point (encryptors/ValueTokenizer.java + ValueTokenizerFactory.java,
loaded by reflection from a class-name option,
pipeline/EncryptionPipeline.java:288-336).

Spark-first restatement: a small ABC + a registry; ``resolve()`` takes
either a registered name or a ``module:Class`` path (the reflection
analogue). Implementations must be deterministic for equal inputs —
that is the property the engine's joins and goldens rely on.

Ships two implementations:
- ``aes_siv`` — the production AES-SIV tokenizer (delegates to
  functions.tokenizer.Tokenizer).
- ``aes_ecb`` — parity with the reference's DEMO AesEcbStringValueTokenizer
  (encryptors/AesEcbStringValueTokenizer.java:37-75), which its own
  javadoc (28-31) labels insecure (ECB leaks equal blocks). Kept for
  test/sample parity only; do not use in production.
"""

from __future__ import annotations

import base64
import importlib
from abc import ABC, abstractmethod

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

from auto_data_tokenize_spark.functions.tokenizer import DEFAULT_ROOT_KEY, Tokenizer


class ValueTokenizer(ABC):
    """encrypt(scope, value) -> token; decrypt(scope, token) -> value."""

    @abstractmethod
    def encrypt(self, scope: str, value: str) -> str: ...

    @abstractmethod
    def decrypt(self, scope: str, token: str) -> str: ...


class AesSivValueTokenizer(ValueTokenizer):
    def __init__(self, root_key: bytes = DEFAULT_ROOT_KEY):
        self._tok = Tokenizer(root_key)

    def encrypt(self, scope: str, value: str) -> str:
        return self._tok.token(scope, "VALUE", value)

    def decrypt(self, scope: str, token: str) -> str:
        from auto_data_tokenize_spark.functions.tokenizer import TOKEN_RE

        m = TOKEN_RE.fullmatch(token)
        if not m:
            raise ValueError("not a token")
        return self._tok.detoken(scope, m.group(1), m.group(2))


class AesEcbValueTokenizer(ValueTokenizer):
    """INSECURE demo tokenizer: AES/ECB + PKCS#5/7 padding, base64 —
    byte-for-byte semantics of the reference's sample
    (AesEcbStringValueTokenizer.java:37-75; key derived from a
    passphrase there, a fixed key here). Ignores ``scope``."""

    def __init__(self, key: bytes = DEFAULT_ROOT_KEY[:16]):
        self._key = key

    def _pad(self, b: bytes) -> bytes:
        n = 16 - len(b) % 16
        return b + bytes([n]) * n

    def _unpad(self, b: bytes) -> bytes:
        return b[: -b[-1]]

    def encrypt(self, scope: str, value: str) -> str:
        enc = Cipher(algorithms.AES(self._key), modes.ECB()).encryptor()
        ct = enc.update(self._pad(value.encode())) + enc.finalize()
        return base64.b64encode(ct).decode()

    def decrypt(self, scope: str, token: str) -> str:
        dec = Cipher(algorithms.AES(self._key), modes.ECB()).decryptor()
        pt = dec.update(base64.b64decode(token)) + dec.finalize()
        return self._unpad(pt).decode()


_REGISTRY: dict[str, type[ValueTokenizer]] = {
    "aes_siv": AesSivValueTokenizer,
    "aes_ecb": AesEcbValueTokenizer,
}


def register(name: str, cls: type[ValueTokenizer]) -> None:
    _REGISTRY[name] = cls


def resolve(name_or_path: str, **kwargs) -> ValueTokenizer:
    """Registered name, or ``module:Class`` (reflection-loading parity
    with EncryptionPipeline.java:288-336)."""
    if name_or_path in _REGISTRY:
        return _REGISTRY[name_or_path](**kwargs)
    if ":" in name_or_path:
        mod, cls_name = name_or_path.split(":", 1)
        cls = getattr(importlib.import_module(mod), cls_name)
        if not issubclass(cls, ValueTokenizer):
            raise TypeError(f"{name_or_path} is not a ValueTokenizer")
        return cls(**kwargs)
    raise KeyError(f"unknown tokenizer {name_or_path!r}")

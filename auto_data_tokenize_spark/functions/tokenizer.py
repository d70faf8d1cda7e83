"""Deterministic AES-SIV tokenization core with a conv_id-scoped key
hierarchy (pure Python, Spark-free).

Semantic parity with the reference's Tink DAEAD tokenizer
(encryptors/DaeadEncryptingValueTokenizer.java:32,40-64): AES256-SIV
(RFC 5297) deterministic AEAD with associated data ``"AutoDLP"``,
base64-encoded ciphertext. Determinism ⇒ equal plaintexts under the
same (conv_id, info_type) key produce equal tokens, so tokens remain
usable as join/group keys (reference README.md:53-56) — this property
is what the stream-stream token-dictionary join relies on.

Key hierarchy (north_star): instead of one global KMS-wrapped keyset
unwrapped on the driver (EncryptionPipeline.java:104-118), keys are
*derived* per (conv_id, info_type) with HKDF-SHA256 (RFC 5869) from a
root key. Derivation is pure compute — no KMS RPC in the hot path, no
key material ever shuffled — and scoping tokens to a conversation
bounds blast radius and keeps token cardinality per state-store key
small at 10^12-turn scale.

Token wire format (replaces each detected span in free-form text,
the analogue of DLP surrogate infoTypes, dlp/DeidetifyConfigMaker.java:138-161):

    [TOK:<INFO_TYPE>:<base64url(SIV || ciphertext)>]

Round-trippable: `detokenize_text` finds these markers and decrypts.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import re

from cryptography.hazmat.primitives.ciphers.aead import AESSIV

from auto_data_tokenize_spark.functions import detectors

# Associated data stamp — mirrors DaeadEncryptingValueTokenizer.java:32.
ASSOCIATED_DATA = b"AutoDLP"

# Dev/test root key — publicly derivable from this source file, so any
# token minted under it is reversible by anyone with the repo. The
# reference never has this failure mode (its keyset is mandatory and
# KMS-wrapped, EncryptionPipeline.java:104-118); here the guard is
# ``resolve_root_key``: production entry points resolve the key from
# the ADT_ROOT_KEY_HEX environment variable, and every Tokenizer built
# on the dev default warns loudly.
DEFAULT_ROOT_KEY = hashlib.sha256(b"auto-data-tokenize-spark/dev-root-key").digest()


class KeyProvider:
    """Pluggable root-key custody seam — the analogue of the
    reference's KeySetExtractor indirection
    (EncryptionPipeline.java:299-330, where a KMS-wrapped keyset is
    unwrapped once on the driver through an interface production code
    swaps): register a provider and every entry point that calls
    ``resolve_root_key`` picks it up, so KMS custody is a plug-in, not
    a rewrite. Providers run DRIVER-side only; executors receive
    derived ciphers, never the root key through a shuffle."""

    def root_key(self) -> bytes:
        raise NotImplementedError


class StaticKeyProvider(KeyProvider):
    """Holds an explicit 32-byte key (tests, or a caller that already
    unwrapped its keyset)."""

    def __init__(self, key: bytes):
        if len(key) != 32:
            raise ValueError("root key must be 32 bytes")
        self._key = key

    def root_key(self) -> bytes:
        return self._key


class EnvKeyProvider(KeyProvider):
    """Reads 64 hex chars from an environment variable; raises if the
    variable is unset — registering this provider makes the key
    MANDATORY (the reference's posture: no keyset, no pipeline)."""

    def __init__(self, var: str = "ADT_ROOT_KEY_HEX"):
        self.var = var

    def root_key(self) -> bytes:
        import os

        env = os.environ.get(self.var)
        if not env:
            raise KeyError(f"key provider requires {self.var} to be set")
        key = bytes.fromhex(env)
        if len(key) != 32:
            raise ValueError(f"{self.var} must decode to 32 bytes")
        return key


_key_provider: KeyProvider | None = None


def register_key_provider(provider: KeyProvider | None) -> None:
    """Install (or with ``None``, clear) the process-wide provider
    consulted by ``resolve_root_key`` when no explicit key is given."""
    global _key_provider
    if provider is not None and not isinstance(provider, KeyProvider):
        raise TypeError("provider must be a KeyProvider")
    _key_provider = provider


def resolve_root_key(root_key: bytes | None = None) -> bytes:
    """Explicit key > registered :class:`KeyProvider` >
    ``ADT_ROOT_KEY_HEX`` env (64 hex chars) > dev default (with a loud
    warning). Call this at pipeline entry points so omitting the key
    is a visible decision, not a silent one."""
    import os

    if root_key is not None:
        return root_key
    if _key_provider is not None:
        return _key_provider.root_key()
    env = os.environ.get("ADT_ROOT_KEY_HEX")
    if env:
        key = bytes.fromhex(env)
        if len(key) != 32:
            raise ValueError("ADT_ROOT_KEY_HEX must decode to 32 bytes")
        return key
    _warn_dev_key()
    return DEFAULT_ROOT_KEY


def _warn_dev_key() -> None:
    import warnings

    warnings.warn(
        "using the publicly-known dev root key: tokens are reversible by "
        "anyone with this repo. Pass root_key= or set ADT_ROOT_KEY_HEX "
        "for production runs.",
        UserWarning,
        stacklevel=3,
    )

TOKEN_RE = re.compile(r"\[TOK:([A-Z_0-9]+):([A-Za-z0-9_\-]+=*)\]")


def hkdf_sha256(key: bytes, salt: bytes, info: bytes, length: int = 64) -> bytes:
    """RFC 5869 HKDF (extract+expand), stdlib-only."""
    prk = hmac.new(salt or b"\x00" * 32, key, hashlib.sha256).digest()
    out = b""
    block = b""
    counter = 1
    while len(out) < length:
        block = hmac.new(prk, block + info + bytes([counter]), hashlib.sha256).digest()
        out += block
        counter += 1
    return out[:length]


class Tokenizer:
    """Deterministic tokenizer with per-(conv_id, info_type) derived keys.

    Instances cache derived AESSIV ciphers; create one per executor /
    per Arrow batch processor, never serialize key material through a
    shuffle.
    """

    def __init__(self, root_key: bytes = DEFAULT_ROOT_KEY):
        if len(root_key) != 32:
            raise ValueError("root key must be 32 bytes")
        self._root_key = root_key
        self._ciphers: dict[tuple[str, str], AESSIV] = {}

    def _cipher(self, conv_id: str, info_type: str) -> AESSIV:
        k = (conv_id, info_type)
        cipher = self._ciphers.get(k)
        if cipher is None:
            # AES256-SIV takes a 64-byte key (two AES-256 subkeys).
            key = hkdf_sha256(
                self._root_key,
                salt=info_type.encode(),
                info=conv_id.encode(),
                length=64,
            )
            cipher = AESSIV(key)
            self._ciphers[k] = cipher
            # Bound the cache (hot executors see many conv_ids).
            if len(self._ciphers) > 100_000:
                self._ciphers.clear()
        return cipher

    # -- scalar token ops --------------------------------------------------

    def token(self, conv_id: str, info_type: str, plaintext: str) -> str:
        ct = self._cipher(conv_id, info_type).encrypt(
            plaintext.encode("utf-8"), [ASSOCIATED_DATA]
        )
        b64 = base64.urlsafe_b64encode(ct).decode("ascii")
        return f"[TOK:{info_type}:{b64}]"

    def detoken(self, conv_id: str, info_type: str, b64: str) -> str:
        ct = base64.urlsafe_b64decode(b64)
        pt = self._cipher(conv_id, info_type).decrypt(ct, [ASSOCIATED_DATA])
        return pt.decode("utf-8")

    # -- free-form text ops (the transcript hot path) ----------------------

    def tokenize_text(
        self,
        conv_id: str,
        text: str | None,
        info_types: tuple[str, ...] | None = None,
    ) -> str | None:
        """Replace every detected span with its deterministic token
        (free_form_column=true semantics, csv_dlp_tokenize_config.json:1-21).
        ``info_types`` selects the detector set (the DlpEncryptConfig
        infoType-list posture, proto:183-205); ``None`` keeps the
        default four so existing goldens are stable."""
        return detectors.replace_spans(
            text,
            lambda info_type, matched: self.token(conv_id, info_type, matched),
            info_types,
        )

    def detokenize_text(self, conv_id: str, text: str | None) -> str | None:
        if not text:
            return text
        return TOKEN_RE.sub(
            lambda m: self.detoken(conv_id, m.group(1), m.group(2)), text
        )

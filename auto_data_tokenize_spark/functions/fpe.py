"""FF1 format-preserving encryption (NIST SP 800-38G) and the DLP
``CryptoReplaceFfxFpeConfig`` semantics built on it.

The reference's ``ColumnTransform`` embeds the full public
``google.privacy.dlp.v2.PrimitiveTransformation`` oneof
(src/main/proto/google/cloud/autodlp/auto_tokenize_messages.proto:188-205);
``cryptoReplaceFfxFpeConfig`` is the one remaining locally-computable
member: FF1 over a declared alphabet, so a ciphertext has exactly the
same length and character set as the plaintext ("format-preserving").
This module implements FF1 from the published NIST spec (SP 800-38G,
Algorithms 7/8) — pinned against NIST's own AES-128 sample vectors in
``tests/test_fpe.py`` — plus the DLP-level conveniences:

- common alphabets (NUMERIC / HEXADECIMAL / UPPER_CASE_ALPHA_NUMERIC /
  ALPHA_NUMERIC), custom alphabets up to 95 printable-ASCII chars, or a
  bare ``radix`` (prefix of the 95-char base alphabet);
- a per-row **context** tweak: equal (value, context) pairs produce
  equal tokens, different contexts different tokens — DLP's
  deterministic-with-context contract;
- **surrogate annotation** ``NAME(<len>):<ciphertext>`` so tokens
  embedded in free text can be found and reversed (re-identification);
  the scanner parses by the declared length, never by guessing at the
  ciphertext body.

Scale posture: pure per-value crypto inside Arrow batches (same shape
as the AES-SIV tokenize hot path) — no shuffle, no driver data. The
FF1 preamble CBC state (the P||tweak-head MAC) is cached per cipher
object keyed by (radix, length, tweak) — bounded at 4096 entries,
cleared when full — so long columns of same-format, same-context
values (the free-form span path always tweaks with ``""``) pay the
AES-CBC-MAC of the varying half only.
"""

from __future__ import annotations

import re

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

__all__ = [
    "ff1_encrypt",
    "ff1_decrypt",
    "FpeCipher",
    "COMMON_ALPHABETS",
    "BASE95_ALPHABET",
    "min_length",
    "wrap_surrogate",
    "reidentify_text",
]

# DLP FfxCommonNativeAlphabet values (public API surface).
COMMON_ALPHABETS = {
    "NUMERIC": "0123456789",
    "HEXADECIMAL": "0123456789ABCDEF",
    "UPPER_CASE_ALPHA_NUMERIC": "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "ALPHA_NUMERIC": (
        "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    ),
}

# The 95 printable ASCII characters, alphanumerics first so that a bare
# ``radix`` config (DLP allows radix ∈ [2, 95]) selects the natural
# prefix: radix 10 = digits, 36 = digits+upper, 62 = alnum, 95 = all.
BASE95_ALPHABET = (
    COMMON_ALPHABETS["ALPHA_NUMERIC"]
    + "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ "
)
assert len(BASE95_ALPHABET) == 95 and len(set(BASE95_ALPHABET)) == 95


def min_length(radix: int) -> int:
    """Smallest plaintext length FF1 permits for ``radix``: the spec
    requires ``radix ** n >= 1_000_000`` and ``n >= 2``."""
    n = 2
    while radix**n < 1_000_000:
        n += 1
    return n


class _AesEcb:
    """Raw AES block encryption (the CIPH_K primitive of SP 800-38G)."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError("FF1 key must be 16, 24, or 32 bytes (AES)")
        self._cipher = Cipher(algorithms.AES(key), modes.ECB())
        # (radix, n, tweak) -> preamble CBC state; see _ff1_rounds
        self.iv_cache: dict[tuple[int, int, bytes], bytes] = {}

    def enc(self, data: bytes) -> bytes:
        e = self._cipher.encryptor()
        return e.update(data) + e.finalize()


def _prf(aes: _AesEcb, data: bytes, iv: bytes = b"\x00" * 16) -> bytes:
    """CBC-MAC over ``data`` (length a multiple of 16), starting from
    chaining value ``iv`` — SP 800-38G's PRF."""
    r = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        blk = int.from_bytes(data[i : i + 16], "big")
        r = int.from_bytes(aes.enc((r ^ blk).to_bytes(16, "big")), "big")
    return r.to_bytes(16, "big")


def _check_params(radix: int, n: int) -> None:
    if not 2 <= radix <= 2**16:
        raise ValueError(f"radix must be in [2, 65536]: {radix}")
    if n < 2 or radix**n < 1_000_000:
        raise ValueError(
            f"FF1 requires len >= 2 and radix**len >= 1e6 "
            f"(radix={radix}, len={n}; min len is {min_length(radix)})"
        )


def _num(digits: list[int], radix: int) -> int:
    x = 0
    for d in digits:
        x = x * radix + d
    return x


def _digits(x: int, radix: int, m: int) -> list[int]:
    out = [0] * m
    for i in range(m - 1, -1, -1):
        x, out[i] = divmod(x, radix)
    return out


def _ff1_rounds(
    key_or_aes, tweak: bytes, radix: int, x: list[int], *, decrypt: bool
) -> list[int]:
    """SP 800-38G Algorithm 7 (encrypt) / 8 (decrypt). ``x`` is the
    numeral string as base-``radix`` digit values."""
    aes = key_or_aes if isinstance(key_or_aes, _AesEcb) else _AesEcb(key_or_aes)
    n, t = len(x), len(tweak)
    _check_params(radix, n)
    u = n // 2
    v = n - u
    A, B = x[:u], x[u:]
    # exact ceil(v·log2(radix)): bit length of radix**v − 1
    b = ((radix**v - 1).bit_length() + 7) // 8
    d = 4 * ((b + 3) // 4) + 4
    P = (
        bytes([1, 2, 1])
        + radix.to_bytes(3, "big")
        + bytes([10, u % 256])
        + n.to_bytes(4, "big")
        + t.to_bytes(4, "big")
    )
    q_pad = tweak + b"\x00" * ((-t - b - 1) % 16)
    # CBC state after absorbing P (and any full 16-byte prefix of the
    # constant tweak padding) is round-invariant — hoist it, and cache
    # it on the cipher object across calls: same-format values under
    # the same tweak (a column of SSNs, free-form spans with the ""
    # tweak) then skip the preamble MAC entirely. Bounded + cleared so
    # high-cardinality context tweaks cannot grow executor memory.
    fixed = P + q_pad
    cut = len(fixed) - (len(fixed) % 16)
    head, tail = fixed[:cut], fixed[cut:]
    cache = getattr(aes, "iv_cache", None)
    ck = (radix, n, tweak)
    if cache is not None and ck in cache:
        iv0 = cache[ck]
    else:
        iv0 = _prf(aes, head) if head else b"\x00" * 16
        if cache is not None:
            if len(cache) >= 4096:
                cache.clear()
            cache[ck] = iv0
    rad_u, rad_v = radix**u, radix**v
    rounds = range(9, -1, -1) if decrypt else range(10)
    for i in rounds:
        src = A if decrypt else B
        Q_var = tail + bytes([i]) + _num(src, radix).to_bytes(b, "big")
        R = _prf(aes, Q_var, iv=iv0)
        S = R
        j = 1
        while len(S) < d:
            S += aes.enc(
                (int.from_bytes(R, "big") ^ j).to_bytes(16, "big")
            )
            j += 1
        y = int.from_bytes(S[:d], "big")
        m_len, m_mod = (u, rad_u) if i % 2 == 0 else (v, rad_v)
        if decrypt:
            c = (_num(B, radix) - y) % m_mod
            A, B = _digits(c, radix, m_len), A
        else:
            c = (_num(A, radix) + y) % m_mod
            A, B = B, _digits(c, radix, m_len)
    return A + B


def ff1_encrypt(key: bytes, tweak: bytes, radix: int, x: list[int]) -> list[int]:
    """FF1.Encrypt (SP 800-38G Algorithm 7) over digit values."""
    return _ff1_rounds(key, tweak, radix, x, decrypt=False)


def ff1_decrypt(key: bytes, tweak: bytes, radix: int, x: list[int]) -> list[int]:
    """FF1.Decrypt (SP 800-38G Algorithm 8) over digit values."""
    return _ff1_rounds(key, tweak, radix, x, decrypt=True)


def _resolve_alphabet(
    alphabet: str | None, common_alphabet: str | None, radix: int | None
) -> str:
    given = [a for a in (alphabet, common_alphabet, radix) if a is not None]
    if len(given) != 1:
        raise ValueError(
            "exactly one of alphabet / common_alphabet / radix is required"
        )
    if common_alphabet is not None:
        try:
            return COMMON_ALPHABETS[common_alphabet]
        except KeyError:
            raise ValueError(
                f"unknown common alphabet {common_alphabet!r}; "
                f"choose from {sorted(COMMON_ALPHABETS)}"
            ) from None
    if radix is not None:
        if not 2 <= radix <= 95:
            raise ValueError(f"radix must be in [2, 95]: {radix}")
        return BASE95_ALPHABET[:radix]
    assert alphabet is not None
    if not 2 <= len(alphabet) <= 95:
        raise ValueError(
            f"custom alphabet must have 2..95 characters: {len(alphabet)}"
        )
    if len(set(alphabet)) != len(alphabet):
        raise ValueError("custom alphabet has duplicate characters")
    return alphabet


class FpeCipher:
    """A key + alphabet binding with DLP ``CryptoReplaceFfxFpeConfig``
    semantics: ``encrypt``/``decrypt`` strings over the alphabet with an
    optional per-call context tweak (equal value+context → equal token).
    """

    def __init__(
        self,
        key: bytes,
        *,
        alphabet: str | None = None,
        common_alphabet: str | None = None,
        radix: int | None = None,
    ):
        self.alphabet = _resolve_alphabet(alphabet, common_alphabet, radix)
        self.radix = len(self.alphabet)
        self.min_length = min_length(self.radix)
        self._aes = _AesEcb(key)
        self._index = {ch: i for i, ch in enumerate(self.alphabet)}

    def _to_digits(self, s: str) -> list[int]:
        try:
            return [self._index[ch] for ch in s]
        except KeyError:
            bad = sorted({ch for ch in s if ch not in self._index})
            raise ValueError(
                f"value contains characters outside the FPE alphabet: {bad}"
            ) from None

    def _from_digits(self, digits: list[int]) -> str:
        return "".join(self.alphabet[d] for d in digits)

    def encrypt(self, value: str, context: str = "") -> str:
        return self._from_digits(
            _ff1_rounds(
                self._aes,
                context.encode("utf-8"),
                self.radix,
                self._to_digits(value),
                decrypt=False,
            )
        )

    def decrypt(self, token: str, context: str = "") -> str:
        return self._from_digits(
            _ff1_rounds(
                self._aes,
                context.encode("utf-8"),
                self.radix,
                self._to_digits(token),
                decrypt=True,
            )
        )

    def can_encrypt(self, value: str) -> bool:
        """True iff ``value`` is long enough for FF1 at this radix and
        every character is in the alphabet (the free-form path skips
        spans that fail this rather than erroring mid-text)."""
        return len(value) >= self.min_length and all(
            ch in self._index for ch in value
        )


# ---------------------------------------------------------------------------
# Surrogate annotation: NAME(<len>):<ciphertext> — DLP's reversible
# free-text embedding.

_SURROGATE_HEAD = re.compile(r"([A-Za-z0-9_]+)\((\d+)\):")


def wrap_surrogate(name: str, token: str) -> str:
    if not re.fullmatch(r"[A-Za-z0-9_]+", name or ""):
        raise ValueError(f"surrogate name must be [A-Za-z0-9_]+: {name!r}")
    return f"{name}({len(token)}):{token}"


def reidentify_text(
    text: str | None, cipher: FpeCipher, surrogate: str, context: str = ""
) -> str | None:
    """Replace every ``surrogate(<len>):<ct>`` annotation in ``text``
    with its decrypted value. Parsing is length-driven (left to right,
    earliest match first); a head whose name differs, whose declared
    length overruns the text, or whose body leaves the alphabet is kept
    verbatim — and scanning resumes ONE character later, not after the
    failed head, because a failed head can CONTAIN a genuine one (the
    name class is greedy: ``IDSSN(9):...`` — a token adjacent to the
    word ``ID`` — matches name ``IDSSN`` first, and the real
    ``SSN(9):`` head starts inside it)."""
    if not text:
        return text
    out: list[str] = []
    pos = 0
    while True:
        m = _SURROGATE_HEAD.search(text, pos)
        if not m:
            out.append(text[pos:])
            return "".join(out)
        out.append(text[pos : m.start()])
        name, ln = m.group(1), int(m.group(2))
        body = text[m.end() : m.end() + ln]
        if (
            name == surrogate
            and len(body) == ln
            and ln >= cipher.min_length
            and cipher.can_encrypt(body)
        ):
            out.append(cipher.decrypt(body, context))
            pos = m.end() + ln
        else:
            out.append(text[m.start()])
            pos = m.start() + 1

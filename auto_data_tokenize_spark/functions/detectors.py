"""DLP-style infoType detection core (pure Python, Spark-free).

Re-creates the semantics of the reference's remote
``dlp.inspectContent`` call (dlp/DlpBatchInspect.java:76-99, min
likelihood LIKELY) as local regex + checksum + structure validators for
the four infoTypes the reference's transcript configs use
(csv_dlp_tokenize_config.json:5-8):

    EMAIL_ADDRESS, PHONE_NUMBER, CREDIT_CARD_NUMBER,
    US_SOCIAL_SECURITY_NUMBER

Detection semantics (deterministic, documented so goldens are
computable):

- Single left-to-right pass with a combined alternation regex.
  The leftmost match wins; overlapping later candidates are never
  re-examined (in particular, nothing inside an emitted token is
  re-detected).
- At equal start offsets, alternation order = precedence:
  EMAIL > CREDIT_CARD > SSN > PHONE.
- Candidates that fail their validator (Luhn for credit cards, SSA
  structure rules for SSNs) are demoted: the text is left unchanged
  and scanning resumes *after* the failed candidate (single pass).

This module is intentionally free of Spark imports so it can be
unit-tested in isolation and reused verbatim by both the Arrow UDF
layer and the pure-Python golden oracle.
"""

from __future__ import annotations

import re
from typing import NamedTuple

EMAIL_ADDRESS = "EMAIL_ADDRESS"
PHONE_NUMBER = "PHONE_NUMBER"
CREDIT_CARD_NUMBER = "CREDIT_CARD_NUMBER"
US_SOCIAL_SECURITY_NUMBER = "US_SOCIAL_SECURITY_NUMBER"

INFO_TYPES = (
    EMAIL_ADDRESS,
    PHONE_NUMBER,
    CREDIT_CARD_NUMBER,
    US_SOCIAL_SECURITY_NUMBER,
)

# --- individual patterns -------------------------------------------------

_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9\-]+(?:\.[A-Za-z0-9\-]+)*\.[A-Za-z]{2,}"

# 13-19 digits, optionally separated by single spaces or dashes.
_CC = r"(?<![\d.])\d(?:[ \-]?\d){12,18}(?![\d.])"

# SSA format with dashes: AAA-GG-SSSS.
_SSN = r"(?<![\d\-])\d{3}-\d{2}-\d{4}(?![\d\-])"

# US phone: optional +1/1, then (415) 555-0143 | 415-555-0143 |
# 415.555.0143 | 415 555 0143. A separator (or parens) is required so a
# bare digit run is never a phone (those are credit-card candidates).
_PHONE = (
    r"(?<![\d\-])(?:\+?1[ \-.])?"
    r"(?:\(\d{3}\)[ \-.]?|\d{3}[ \-.])"
    r"\d{3}[ \-.]\d{4}(?![\d\-])"
)

# Combined single-pass alternation; group name = infoType tag.
COMBINED_RE = re.compile(
    f"(?P<EMAIL>{_EMAIL})|(?P<CC>{_CC})|(?P<SSN>{_SSN})|(?P<PHONE>{_PHONE})"
)

_GROUP_TO_INFO_TYPE = {
    "EMAIL": EMAIL_ADDRESS,
    "CC": CREDIT_CARD_NUMBER,
    "SSN": US_SOCIAL_SECURITY_NUMBER,
    "PHONE": PHONE_NUMBER,
}


def luhn_valid(digits: str) -> bool:
    """Luhn checksum (public ISO/IEC 7812 algorithm)."""
    total = 0
    for i, ch in enumerate(reversed(digits)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def ssn_structure_valid(ssn: str) -> bool:
    """SSA structure rules: area not 000/666/900-999, group != 00,
    serial != 0000 (public SSA randomization rules)."""
    area, group, serial = ssn.split("-")
    if area == "000" or area == "666" or area >= "900":
        return False
    return group != "00" and serial != "0000"


def _validate(group: str, matched: str) -> bool:
    if group == "CC":
        digits = matched.replace(" ", "").replace("-", "")
        return 13 <= len(digits) <= 19 and luhn_valid(digits)
    if group == "SSN":
        return ssn_structure_valid(matched)
    return True


class Span(NamedTuple):
    start: int
    end: int
    info_type: str
    text: str


def find_spans(text: str | None) -> list[Span]:
    """All validated detection spans in ``text``, left to right."""
    if not text:
        return []
    out: list[Span] = []
    for m in COMBINED_RE.finditer(text):
        group = m.lastgroup
        matched = m.group(0)
        if group and _validate(group, matched):
            out.append(Span(m.start(), m.end(), _GROUP_TO_INFO_TYPE[group], matched))
    return out


def make_substitution(repl):
    """Lift ``repl(info_type, matched_text) -> str`` into an ``re.sub``
    callback implementing the validation-demotion semantics.

    Shared by the scalar oracle path (:func:`replace_spans`) and the
    per-row compiled-regex loops inside the Arrow UDFs
    (functions/udfs.py), so the two code paths are definitionally
    aligned.
    """

    def _sub(m: re.Match) -> str:
        group = m.lastgroup
        matched = m.group(0)
        if group and _validate(group, matched):
            return repl(_GROUP_TO_INFO_TYPE[group], matched)
        return matched

    return _sub


def replace_spans(text: str | None, repl) -> str | None:
    """Single-pass replace of every validated span.

    ``repl(info_type, matched_text) -> str``. Failed validations keep
    the original text.
    """
    if not text:
        return text
    return COMBINED_RE.sub(make_substitution(repl), text)

"""DLP-style infoType detection core (pure Python, Spark-free).

Re-creates the semantics of the reference's remote
``dlp.inspectContent`` call (dlp/DlpBatchInspect.java:76-99, min
likelihood LIKELY) as local regex + dictionary + checksum + structure
validators. The DEFAULT set is the four infoTypes of the engine's
north-star contract:

    EMAIL_ADDRESS, PHONE_NUMBER, CREDIT_CARD_NUMBER,
    US_SOCIAL_SECURITY_NUMBER

and the EXTENDED set adds the two the reference's own transcript demo
tokenizes (csv_dlp_tokenize_config.json:5-8; its chat fixture is
pre-tagged with a ``CUSTOM_FIRST_NAME_DETECTOR``, i.e. a first-name
dictionary — test/resources/csv/sample-data-chats.csv):

    PERSON_NAME           (deterministic gazetteer: capitalized first
                           name, optionally followed by a surname)
    DATE_OF_BIRTH         (birth-context word + date, with calendar
                           plausibility validation)

InfoType selection is config-driven (the reference's DlpEncryptConfig
posture, proto:183-205): pass ``info_types=EXTENDED_INFO_TYPES`` (or
any subset) to :func:`find_spans` / :func:`replace_spans`; omitting it
keeps the default four, so the baseline golden outputs are stable.

Detection semantics (deterministic, documented so goldens are
computable):

- Single left-to-right pass with a combined alternation regex.
  The leftmost match wins; overlapping later candidates are never
  re-examined (in particular, nothing inside an emitted token is
  re-detected).
- At equal start offsets, alternation order = precedence:
  EMAIL > CREDIT_CARD > SSN > PHONE > DATE_OF_BIRTH > PERSON_NAME.
- Candidates that fail their validator (Luhn for credit cards, SSA
  structure rules for SSNs, calendar + 1900-2026 plausibility for
  birth dates) are demoted: the text is left unchanged and scanning
  resumes *after* the failed candidate (single pass).
- A DATE_OF_BIRTH match consumes its context prefix ("born",
  "DOB:", "date of birth", ...) but the SPAN — and therefore the
  token — covers only the date itself; replacement preserves the
  context words.

This module is intentionally free of Spark imports so it can be
unit-tested in isolation and reused verbatim by both the Arrow UDF
layer and the pure-Python golden oracle.
"""

from __future__ import annotations

import datetime
import re
from functools import lru_cache
from typing import NamedTuple

EMAIL_ADDRESS = "EMAIL_ADDRESS"
PHONE_NUMBER = "PHONE_NUMBER"
CREDIT_CARD_NUMBER = "CREDIT_CARD_NUMBER"
US_SOCIAL_SECURITY_NUMBER = "US_SOCIAL_SECURITY_NUMBER"
PERSON_NAME = "PERSON_NAME"
DATE_OF_BIRTH = "DATE_OF_BIRTH"

INFO_TYPES = (
    EMAIL_ADDRESS,
    PHONE_NUMBER,
    CREDIT_CARD_NUMBER,
    US_SOCIAL_SECURITY_NUMBER,
)

EXTENDED_INFO_TYPES = INFO_TYPES + (PERSON_NAME, DATE_OF_BIRTH)

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

# PERSON_NAME gazetteer (dictionary detection, the reference demo's
# CUSTOM_FIRST_NAME_DETECTOR shape). Deterministic and shipped with the
# code so goldens are computable; datagen plants exactly these names.
# Case-sensitive capitalized matching: dictionary detection's inherent
# trade — "Grace called" matches, "grace period" does not.
FIRST_NAMES = (
    "Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi",
    "Ivan", "Judy", "Mallory", "Niaj", "Olivia", "Peggy", "Rupert", "Sybil",
)
LAST_NAMES = (
    "Smith", "Johnson", "Williams", "Brown", "Jones",
    "Garcia", "Miller", "Davis", "Lopez", "Wilson",
)

_NAME = (
    r"\b(?:" + "|".join(FIRST_NAMES) + r")"
    r"(?: (?:" + "|".join(LAST_NAMES) + r"))?\b"
)

# DATE_OF_BIRTH: a birth-context word (case-insensitive) immediately
# followed by a date — ISO (YYYY-MM-DD) or US (M/D/YYYY). The context
# requirement mirrors DLP's DATE_OF_BIRTH vs plain DATE distinction;
# the date part is validated for calendar + year plausibility.
_MONTHS = (
    "January", "February", "March", "April", "May", "June", "July",
    "August", "September", "October", "November", "December",
)
_DOB = (
    r"(?P<DOB_CTX>(?i:\b(?:date\s+of\s+birth|birth\s*date|"
    r"born(?:\s+on)?|d\.?o\.?b\.?)\b[:\s]+))"
    r"(?P<DOB_DATE>\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{4}"
    r"|(?:" + "|".join(_MONTHS) + r") \d{1,2}, \d{4})(?!\d)"
)

_PATTERNS = {
    # precedence order = dict order (combined alternation)
    "EMAIL": _EMAIL,
    "CC": _CC,
    "SSN": _SSN,
    "PHONE": _PHONE,
    "DOB": _DOB,
    "NAME": _NAME,
}

_GROUP_TO_INFO_TYPE = {
    "EMAIL": EMAIL_ADDRESS,
    "CC": CREDIT_CARD_NUMBER,
    "SSN": US_SOCIAL_SECURITY_NUMBER,
    "PHONE": PHONE_NUMBER,
    "DOB": DATE_OF_BIRTH,
    "NAME": PERSON_NAME,
}
_INFO_TYPE_TO_GROUP = {v: k for k, v in _GROUP_TO_INFO_TYPE.items()}


@lru_cache(maxsize=64)
def combined_re(info_types: tuple[str, ...]) -> re.Pattern:
    """Single-pass alternation for a configured infoType set, in fixed
    precedence order (the _PATTERNS order, not the caller's)."""
    unknown = [t for t in info_types if t not in _INFO_TYPE_TO_GROUP]
    if unknown:
        raise ValueError(
            f"unknown infoType(s) {unknown}; supported: "
            f"{list(_INFO_TYPE_TO_GROUP)}"
        )
    groups = {_INFO_TYPE_TO_GROUP[t] for t in info_types}
    parts = [
        f"(?P<{g}>{p})" for g, p in _PATTERNS.items() if g in groups
    ]
    return re.compile("|".join(parts))


def _classify(m: re.Match) -> str | None:
    """Top-level group tag of a match. ``lastgroup`` is the LAST named
    group that matched, which for a DOB match is its inner DOB_DATE
    group — map it back to the top-level tag."""
    g = m.lastgroup
    return "DOB" if g in ("DOB_DATE", "DOB_CTX") else g


# Combined single-pass alternation for the DEFAULT set; group name =
# infoType tag.
COMBINED_RE = combined_re(INFO_TYPES)


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


# Plausible birth-year window. The bounds are FIXED constants, not
# derived from the clock, so the span goldens regenerate bit-stable;
# deployments past DOB_MAX_YEAR must bump it (and regenerate goldens
# via datagen ensure_* force=True) or recent birth dates silently
# stop being detected.
DOB_MIN_YEAR = 1900
DOB_MAX_YEAR = 2026


def dob_plausible(date_str: str) -> bool:
    """Calendar-valid date with a plausible birth year
    (``DOB_MIN_YEAR``-``DOB_MAX_YEAR``). ``1987-04-12`` is ISO
    year-month-day; ``4/12/1987`` is US month/day/year; ``April 12,
    1987`` is month-name form (capitalized English month, matching the
    pattern). Feb 30, month 13, year 1830 all demote."""
    try:
        if "," in date_str:
            mon, rest = date_str.split(" ", 1)
            d, y = (int(x) for x in rest.replace(",", "").split())
            mth = _MONTHS.index(mon) + 1
        elif "-" in date_str:
            y, mth, d = (int(x) for x in date_str.split("-"))
        else:
            mth, d, y = (int(x) for x in date_str.split("/"))
        datetime.date(y, mth, d)
    except ValueError:
        return False
    return DOB_MIN_YEAR <= y <= DOB_MAX_YEAR


def _validate(group: str, matched: str) -> bool:
    if group == "CC":
        digits = matched.replace(" ", "").replace("-", "")
        return 13 <= len(digits) <= 19 and luhn_valid(digits)
    if group == "SSN":
        return ssn_structure_valid(matched)
    if group == "DOB":
        return dob_plausible(matched)
    return True


class Span(NamedTuple):
    start: int
    end: int
    info_type: str
    text: str


def _regex_for(info_types: tuple[str, ...] | None) -> re.Pattern:
    return COMBINED_RE if info_types is None else combined_re(tuple(info_types))


def find_spans(
    text: str | None, info_types: tuple[str, ...] | None = None
) -> list[Span]:
    """All validated detection spans in ``text``, left to right.
    ``info_types=None`` keeps the default four; a DOB span covers the
    DATE only (never its context words)."""
    if not text:
        return []
    out: list[Span] = []
    for m in _regex_for(info_types).finditer(text):
        group = _classify(m)
        if group is None:
            continue
        if group == "DOB":
            matched = m.group("DOB_DATE")
            start = m.start("DOB_DATE")
        else:
            matched = m.group(0)
            start = m.start()
        if _validate(group, matched):
            out.append(
                Span(start, m.end(), _GROUP_TO_INFO_TYPE[group], matched)
            )
    return out


def make_substitution(repl):
    """Lift ``repl(info_type, matched_text) -> str`` into an ``re.sub``
    callback implementing the validation-demotion semantics (a DOB
    match keeps its context prefix and substitutes the date only).

    Shared by the scalar oracle path (:func:`replace_spans`) and the
    per-row compiled-regex loops inside the Arrow UDFs
    (functions/udfs.py), so the two code paths are definitionally
    aligned.
    """

    def _sub(m: re.Match) -> str:
        group = _classify(m)
        if group == "DOB":
            date = m.group("DOB_DATE")
            if _validate(group, date):
                return m.group("DOB_CTX") + repl(DATE_OF_BIRTH, date)
            return m.group(0)
        matched = m.group(0)
        if group and _validate(group, matched):
            return repl(_GROUP_TO_INFO_TYPE[group], matched)
        return matched

    return _sub


def replace_spans(
    text: str | None, repl, info_types: tuple[str, ...] | None = None
) -> str | None:
    """Single-pass replace of every validated span.

    ``repl(info_type, matched_text) -> str``. Failed validations keep
    the original text. ``info_types=None`` keeps the default four.
    """
    if not text:
        return text
    return _regex_for(info_types).sub(make_substitution(repl), text)

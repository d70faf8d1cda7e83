"""Property-based tests (hypothesis) over the pure-Python cores —
no SparkSession, so hundreds of examples run in seconds.

Mirrors the reference's unit-test layer for the crypto/detection cores
(DaeadEncryptingValueTokenizerTest, DlpBatchInspectTest): the Spark
operators are thin plans over exactly these functions, so core
properties + the oracle gate together cover the operator surface.
"""

import re

from hypothesis import assume, given, settings, strategies as st

from auto_data_tokenize_spark.functions import detectors
from auto_data_tokenize_spark.functions.tokenizer import (
    DEFAULT_ROOT_KEY,
    TOKEN_RE,
    Tokenizer,
)

_TOK = Tokenizer(DEFAULT_ROOT_KEY)

# printable-ish text including unicode, newlines, digits that may or
# may not form valid PII
texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)
conv_ids = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=20
)


@given(conv_ids, texts)
@settings(max_examples=300, deadline=None)
def test_tokenize_detokenize_roundtrip(conv_id, text):
    # a literal token marker in the INPUT is indistinguishable from a
    # real surrogate — same caveat as the reference's DLP surrogates
    assume("[TOK:" not in text)
    tok = _TOK.tokenize_text(conv_id, text)
    assert _TOK.detokenize_text(conv_id, tok) == text


@given(conv_ids, texts)
@settings(max_examples=300, deadline=None)
def test_tokenize_deterministic(conv_id, text):
    assert _TOK.tokenize_text(conv_id, text) == _TOK.tokenize_text(conv_id, text)


@given(texts)
@settings(max_examples=300, deadline=None)
def test_spans_sorted_disjoint_in_bounds(text):
    spans = detectors.find_spans(text)
    prev_end = 0
    for sp in spans:
        assert 0 <= sp.start < sp.end <= len(text)
        assert sp.start >= prev_end  # sorted and non-overlapping
        assert text[sp.start : sp.end] == sp.text
        prev_end = sp.end


_PII_SAMPLES = [
    "jane.doe@example.com",
    "support_42@mail.example.org",
    "(212) 555-0184",
    "+1 415 555 0132",
    "4539 1488 0343 6467",  # Luhn-valid
    "371449635398431",      # Luhn-valid amex shape
    "212-55-6789",
]
_pad = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                           blacklist_characters="[@0123456789"),
    max_size=60,
)


@given(conv_ids, _pad, st.sampled_from(_PII_SAMPLES), _pad)
@settings(max_examples=200, deadline=None)
def test_tokens_parse_and_hide_plaintext(conv_id, prefix, pii, suffix):
    text = f"{prefix} {pii} {suffix}"
    spans = detectors.find_spans(text)
    assume(spans)
    tok = _TOK.tokenize_text(conv_id, text)
    # every produced marker parses under the wire-format regex
    markers = TOKEN_RE.findall(tok)
    assert len(markers) == len(spans)
    # no detected plaintext survives (8+ char spans can't be substrings
    # of the base64 body by accident at any plausible rate)
    for sp in spans:
        if len(sp.text) >= 8:
            assert sp.text not in tok


@given(conv_ids, st.text(min_size=0, max_size=120))
@settings(max_examples=300, deadline=None)
def test_value_token_roundtrip(scope, value):
    t = _TOK.token(scope, "COL_X", value)
    m = re.fullmatch(r"\[TOK:COL_X:([A-Za-z0-9_\-]+=*)\]", t)
    assert m, t
    assert _TOK.detoken(scope, "COL_X", m.group(1)) == value


@given(conv_ids, conv_ids, st.text(min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_scope_isolation(scope_a, scope_b, value):
    """Tokens are scope-bound: the same value under different scopes
    yields different tokens (blast-radius bounding of the key
    hierarchy)."""
    assume(scope_a != scope_b)
    ta = _TOK.token(scope_a, "COL_X", value)
    tb = _TOK.token(scope_b, "COL_X", value)
    assert ta != tb


# -- Avro codec property tests -------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_AVRO_PROP_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "i", "type": ["null", "long"]},
        {"name": "s", "type": ["null", "string"]},
        {"name": "f", "type": ["null", "double"]},
        {"name": "b", "type": ["null", "bytes"]},
        {"name": "l", "type": {"type": "array", "items": ["null", "long"]}},
    ],
}

_row = st.fixed_dictionaries(
    {
        "i": st.none() | st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.none() | st.text(max_size=80),
        "f": st.none()
        | st.floats(allow_nan=False, allow_infinity=False, width=64),
        "b": st.none() | st.binary(max_size=64),
        "l": st.lists(
            st.none() | st.integers(min_value=-(2**31), max_value=2**31),
            max_size=8,
        ),
    }
)


@settings(max_examples=150, deadline=None)
@given(rows=st.lists(_row, max_size=25))
def test_avro_container_roundtrip_property(rows):
    """encode→decode is the identity for arbitrary nullable rows —
    covers zigzag edge values (int64 min/max), empty strings/arrays,
    unicode, NaN-free doubles, and multi-row block packing."""
    from auto_data_tokenize_spark.sources import avro_io as A

    data, n = A.encode_container(iter(rows), _AVRO_PROP_SCHEMA, "deflate")
    assert n == len(rows)
    _, got = A.decode_container(data)
    assert got == rows


# -- prefix-filter lemma (setsim_join's exactness core) --------------------
#
# The Spark operator's candidate generation is a plan over exactly this
# arithmetic: rank shingles by (global df, shingle), keep the first
# sz - ceil(t*sz - 1e-9) + 1 per set, join on shared prefix shingles
# with the length filter min >= t*max - 1e-9. The lemma: every pair
# whose ROUNDED Jaccard reaches t shares a prefix shingle and passes
# the length filter. Hundreds of random set families check it here in
# pure Python; tests/test_dedup.py checks the Spark plan computes the
# same thing on two corpora.

import math as _math


@given(
    st.lists(
        st.frozensets(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.3, 0.5, 0.6, 0.7, 0.8, 0.9]),
)
@settings(max_examples=300, deadline=None)
def test_prefix_filter_lemma(sets, t):
    df_count = {}
    for s in sets:
        for g in s:
            df_count[g] = df_count.get(g, 0) + 1
    order = lambda g: (df_count[g], g)

    def prefix(s):
        sz = len(s)
        plen = sz - _math.ceil(t * sz - 1e-9) + 1
        return set(sorted(s, key=order)[:plen])

    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            jac = round(len(a & b) / len(a | b), 6)
            if jac >= t:
                # length filter must keep the pair...
                assert min(len(a), len(b)) >= t * max(len(a), len(b)) - 1e-9
                # ...and the prefixes must intersect
                assert prefix(a) & prefix(b), (
                    f"qualifying pair lost: J={jac} t={t} a={sorted(a)} b={sorted(b)}"
                )


def _snappy_literal_encode(data: bytes) -> bytes:
    """Minimal VALID snappy encoder (literals only) — exists solely to
    fuzz the decompressor with arbitrary payloads."""
    import io as _io

    out = _io.BytesIO()
    n = len(data)
    u = n
    while True:  # uvarint preamble
        b = u & 0x7F
        u >>= 7
        out.write(bytes([b | 0x80] if u else [b]))
        if not u:
            break
    pos = 0
    while pos < n:  # chop into max-size literal elements
        chunk = data[pos : pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.write(bytes([ln << 2]))
        elif ln < 256:
            out.write(bytes([60 << 2, ln]))
        else:
            out.write(bytes([61 << 2]) + ln.to_bytes(2, "little"))
        out.write(chunk)
        pos += len(chunk)
    return out.getvalue()


@given(st.binary(min_size=0, max_size=200_000))
@settings(max_examples=150, deadline=None)
def test_snappy_decompress_literal_identity(data):
    """Any byte string encoded as literal elements must decode to
    itself (pinning length handling across the 1/2-byte extended
    literal encodings and multi-element streams)."""
    from auto_data_tokenize_spark.sources.avro_io import snappy_decompress

    assert snappy_decompress(_snappy_literal_encode(data)) == data


@given(
    st.binary(min_size=1, max_size=64),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=300),
)
@settings(max_examples=150, deadline=None)
def test_snappy_decompress_copy_semantics(seed, off, ln):
    """A copy (len, off) must replay byte-at-a-time history — the
    run-length overlap case included. Build the stream with a 2-byte-
    offset copy and compare against the reference semantics."""
    import io as _io

    from auto_data_tokenize_spark.sources.avro_io import snappy_decompress

    off = min(off, len(seed))
    want = bytearray(seed)
    for _ in range(ln):
        want.append(want[-off])

    out = _io.BytesIO()
    total = len(want)
    u = total
    while True:
        b = u & 0x7F
        u >>= 7
        out.write(bytes([b | 0x80] if u else [b]))
        if not u:
            break
    lit = len(seed) - 1
    if lit < 60:
        out.write(bytes([lit << 2]))
    else:
        out.write(bytes([60 << 2, lit]))
    out.write(seed)
    remaining = ln
    while remaining > 0:  # copy elements carry at most 64 bytes each
        take = min(remaining, 64)
        out.write(bytes([(take - 1) << 2 | 2]) + off.to_bytes(2, "little"))
        remaining -= take
    assert snappy_decompress(out.getvalue()) == bytes(want)


@given(
    st.binary(min_size=0, max_size=5_000),
    st.integers(min_value=1, max_value=40),
)
@settings(max_examples=200, deadline=None)
def test_snappy_compress_roundtrip_property(chunk, reps):
    """decompress(compress(x)) == x for arbitrary bytes, including
    repetitive inputs that exercise the copy-emission path (the WRITE
    side of the Avro snappy codec)."""
    from auto_data_tokenize_spark.sources.avro_io import (
        snappy_compress,
        snappy_decompress,
    )

    data = chunk * reps
    assert snappy_decompress(snappy_compress(data)) == data


@given(st.text(alphabet=st.characters(min_codepoint=9, max_codepoint=126),
               max_size=80))
@settings(max_examples=300, deadline=None)
def test_normalized_text_duckdb_matches_python_mirror(text):
    """Fuzz the q81 normalization contract: DuckDB's RE2 evaluation of
    duckdb_normalized_text_sql must equal the plain-Python ASCII mirror
    (lower → strip non-[a-z0-9\\s] → collapse ws → trim) on the ASCII
    range where the key space lives."""
    import re

    import duckdb

    from auto_data_tokenize_spark.operators.corpus import (
        duckdb_normalized_text_sql,
    )

    # explicit class, mirroring corpus._NORM_WS: Python's \s (even with
    # re.ASCII) includes \x0b while RE2's does not
    ws = " \t\n\x0b\f\r"
    mirror = re.sub(
        f"[{ws}]+", " ", re.sub(f"[^a-z0-9{ws}]", "", text.lower())
    ).strip()
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {duckdb_normalized_text_sql('?')}", [text]
    ).fetchone()[0]
    assert got == mirror


# --- image aHash spec: numpy operator == pure-Python golden ---------------


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(4, 40), st.integers(4, 40))
def test_ahash_numpy_matches_pure_python_spec(seed, w, h):
    """The integer aHash spec has two independent implementations (the
    numpy decode-path operator and datagen's pure-Python-loop golden);
    they must agree bit-for-bit on ARBITRARY image dims/content, not
    just the synth corpus — encode_bmp/parse_bmp round-trip included."""
    import numpy as _np

    from auto_data_tokenize_spark.operators.multimodal import (
        encode_bmp,
        parse_bmp,
    )

    rng = _np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=_np.uint8)

    # numpy path over the DECODED bytes (the operator's arithmetic)
    dec = parse_bmp(encode_bmp(rgb)).astype(_np.int64)
    assert (dec == rgb).all()
    grid = 8
    gray = (dec[..., 0] * 299 + dec[..., 1] * 587 + dec[..., 2] * 114) // 1000
    ys = (_np.arange(grid) * h) // grid
    xs = (_np.arange(grid) * w) // grid
    g = gray[_np.ix_(ys, xs)]
    m = int(g.sum()) // (grid * grid)
    v = 0
    for b in (g > m).ravel():
        v = (v << 1) | int(b)
    got = v - (1 << 64) if v >= (1 << 63) else v

    # pure-Python spec loop (golden arithmetic) over the raw pixels
    gray2 = [
        [
            (int(rgb[y][x][0]) * 299 + int(rgb[y][x][1]) * 587
             + int(rgb[y][x][2]) * 114) // 1000
            for x in range(w)
        ]
        for y in range(h)
    ]
    lattice = [
        gray2[(ty * h) // grid][(tx * w) // grid]
        for ty in range(grid)
        for tx in range(grid)
    ]
    mean = sum(lattice) // (grid * grid)
    want = 0
    for gv in lattice:
        want = (want << 1) | (1 if gv > mean else 0)
    if want >= 1 << 63:
        want -= 1 << 64
    assert got == want


# ---- conversation_windows integer algebra ---------------------------------
# Pure-Python mirror of the window assignment both engines implement
# (operators/conversations.py conversation_windows and its DuckDB twin);
# the engine-parity tests pin the implementations to each other, this
# pins the ALGEBRA: budget-exactness, completeness, and the coverage
# guarantee for turns of at most chunk - stride + 1 tokens.


def _win_range(tok_start, tok_end, n, chunk, stride):
    def ceil_div_pos(x):
        return 0 if x <= 0 else (x + stride - 1) // stride

    w_last = ceil_div_pos(n - chunk)
    w_min = ceil_div_pos(tok_end - chunk)
    w_max = min(tok_start // stride, w_last)
    return w_min, w_max, w_last


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=200),  # chunk
    st.integers(min_value=1, max_value=200),  # stride (clamped to chunk)
    st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=30),
)
def test_conversation_window_algebra(chunk, stride, lens):
    stride = min(stride, chunk)
    starts, n = [], 0
    for ln in lens:
        starts.append((n, n + ln))
        n += ln
    for tok_start, tok_end in starts:
        w_min, w_max, w_last = _win_range(tok_start, tok_end, n, chunk, stride)
        member = list(range(w_min, w_max + 1))
        # budget: every assigned window fully contains the turn
        for w in member:
            assert w * stride <= tok_start
            assert tok_end <= w * stride + chunk
        # completeness: no containing window below W_last is missed
        for w in range(0, w_last + 1):
            if w * stride <= tok_start and tok_end <= w * stride + chunk:
                assert w in member
        # coverage: short-enough turns are never quarantined
        if tok_end - tok_start <= chunk - stride + 1:
            assert member, (tok_start, tok_end, n, chunk, stride)

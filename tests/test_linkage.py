"""Record linkage / DSAR layer (operators/linkage.py).

The load-bearing claim is blocking COMPLETENESS: the prefix/suffix
pigeonhole self-join must surface every Levenshtein<=1 pair, because
the driver oracle brute-forces all O(n^2) pairs in SQL and compares by
value hash. The hypothesis test here attacks exactly that claim with
adversarial edits; the Spark tests pin the end-to-end operator against
an in-test brute force and the plan shape (pure JVM, broadcast where
promised)."""

import hypothesis.strategies as st
import pandas as pd
import pytest
from hypothesis import given, settings
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.linkage import (
    ed1_link_pairs,
    erasure_conv_ids,
    normalize_identity,
    subject_access_map,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[n]


def _keys(s: str) -> set[tuple[str, int, str]]:
    """Pure-Python mirror of linkage._blocking_keys."""
    out = set()
    for k in {len(s) // 2, (len(s) - 1) // 2}:
        k = max(k, 0)
        out.add(("P", k, s[:k]))
        out.add(("S", k, s[len(s) - k :] if k else ""))
    return out


@st.composite
def _ed1_pair(draw):
    """A string plus a single-edit variant (sub / insert / delete)."""
    alphabet = "ab "  # tiny alphabet maximizes collisions/edge cases
    s = draw(st.text(alphabet=alphabet, min_size=1, max_size=12))
    op = draw(st.sampled_from(["sub", "ins", "del"]))
    i = draw(st.integers(0, max(len(s) - 1, 0)))
    c = draw(st.sampled_from(alphabet))
    if op == "sub":
        t = s[:i] + c + s[i + 1 :]
    elif op == "ins":
        t = s[:i] + c + s[i:]
    else:
        t = s[:i] + s[i + 1 :]
    return s, t


@given(_ed1_pair())
@settings(max_examples=400, deadline=None)
def test_blocking_complete_for_single_edit(pair):
    s, t = pair
    if not s or not t:  # deletions can empty the string; operator filters those
        return
    assert _lev(s, t) <= 1
    assert _keys(s) & _keys(t), (s, t, _keys(s), _keys(t))


def test_ed1_pairs_equal_brute_force(spark):
    names = [
        "alice", "alise", "alice ", "bob", "rob", "bobb", "b",
        "a", "ab", "ba", "jon doe", "john doe", "jon  doe",
        "x" * 30, "x" * 29 + "y", "completely different",
    ]
    df = spark.createDataFrame(pd.DataFrame({"name": names}))
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in ed1_link_pairs(df).collect()
    }
    norm = sorted(
        {" ".join(n.lower().strip().split()) for n in names if n.strip()}
    )
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(norm)
        for b in norm[i + 1 :]
        if _lev(a, b) <= 1
    }
    assert got == want
    assert ("alice", "alise", 1) in got and ("john doe", "jon doe", 1) in got


def test_ed1_pairs_plan_is_jvm_only(spark):
    df = spark.createDataFrame(pd.DataFrame({"name": ["alice", "alise"]}))
    plan = _executed(ed1_link_pairs(df))
    assert "PythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "levenshtein" in plan.lower()


def test_ed1_rejects_unproven_distance(spark):
    df = spark.createDataFrame(pd.DataFrame({"name": ["a"]}))
    with pytest.raises(ValueError, match="max_dist=1"):
        ed1_link_pairs(df, max_dist=2)


@pytest.fixture()
def _dsar_frames(spark):
    tr = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c1", "c2", "c3"],
                "turn_idx": pd.array([1, 2, 1, 1], dtype="int32"),
                "text": [
                    "mail me at A@x.com now",
                    "no pii here",
                    "cc A@X.COM please",
                    "reach B@y.org instead",
                ],
            }
        )
    )
    # spans for the e-mails above: (start, end) byte offsets
    det = spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": ["c1", "c2", "c3"],
                "turn_idx": pd.array([1, 1, 1], dtype="int32"),
                "info_type": ["EMAIL_ADDRESS"] * 3,
                "start": pd.array([11, 3, 6], dtype="int32"),
                "end": pd.array([18, 10, 13], dtype="int32"),
                "ts": pd.to_datetime(
                    ["2026-01-01 00:00:01", "2026-01-01 00:00:02", "2026-01-01 00:00:03"]
                ),
            }
        )
    )
    return det, tr


def test_subject_access_map_golden(spark, _dsar_frames):
    det, tr = _dsar_frames
    rows = {
        r.identity: r for r in subject_access_map(det, tr).collect()
    }
    assert set(rows) == {"a@x.com", "b@y.org"}
    a = rows["a@x.com"]
    assert a.n_convs == 2 and a.n_mentions == 2 and a.convs == ["c1", "c2"]
    assert a.first_seen < a.last_seen
    b = rows["b@y.org"]
    assert b.n_convs == 1 and b.convs == ["c3"]


def test_match_stream_semantics_on_batch(spark):
    """ed1_match_stream's plan is stream-agnostic: on a batch frame it
    must reproduce the brute-force ed<=1 match set (windowed), with
    multi-key candidates deduped to one row."""
    from auto_data_tokenize_spark.operators.linkage import ed1_match_stream

    catalog = spark.createDataFrame(
        pd.DataFrame({"name": ["alice", "bob", "carol"]})
    )
    feed = pd.DataFrame(
        {
            "mention": ["alise", "alice", "bob", "dave"],
            "ts": pd.to_datetime(["2026-01-01 00:00:05"] * 4),
        }
    )
    out = ed1_match_stream(spark.createDataFrame(feed), catalog).collect()
    got = {(r.mention, r.matched_name, r.dist) for r in out}
    assert got == {("alise", "alice", 1), ("alice", "alice", 0), ("bob", "bob", 0)}
    # exactly one row per (mention, match) despite shared prefix+suffix keys
    assert len(out) == len(got)


def test_erasure_fanout_broadcasts_requests(spark, _dsar_frames):
    det, tr = _dsar_frames
    req = spark.createDataFrame(pd.DataFrame({"identity": ["a@x.com"]}))
    out = erasure_conv_ids(det, tr, req)
    got = sorted(r.conv_id for r in out.collect())
    assert got == ["c1", "c2"]
    plan = _executed(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan

"""Session-level (conversation) near-dup dedup: the set_jaccard_join
kernel against driver-side brute force, and the conversation family's
fixture semantics (NULL turns, dropped-turn variants, transitivity)."""

import random

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.conversations import (
    conversation_dedup,
    conversation_fingerprints,
    conversation_near_dups,
)
from auto_data_tokenize_spark.operators.dedup import set_jaccard_join


def _brute_set_jaccard(rows, threshold):
    """All-pairs exact Jaccard over {id: set(tokens)}, same
    round(J, 6) >= t emission as the operator."""
    sets = {}
    for i, tok in rows:
        if tok is not None:
            sets.setdefault(i, set()).add(tok)
    ids = sorted(sets)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= threshold:
                out.add((a, b, j))
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.8])
def test_set_jaccard_join_matches_bruteforce(spark, threshold):
    # seeded population with heavy-df shared tokens (the canned-phrase
    # regime) AND near-identical planted sets
    rng = random.Random(7)
    rows = []
    vocab = [f"t{i}" for i in range(40)]
    for i in range(60):
        cid = f"c{i:03d}"
        size = rng.randint(1, 12)
        for tok in rng.sample(vocab, size):
            rows.append((cid, tok))
    # planted near-dup: c900 is c901 plus one extra token
    base = rng.sample(vocab, 8)
    rows += [("c900", t) for t in base] + [("c901", t) for t in base[:-1]]
    # duplicate membership rows must not corrupt set sizes
    rows += rows[:5]
    df = spark.createDataFrame(rows, "id string, token string")
    got = {
        (r.a, r.b, r.jaccard)
        for r in set_jaccard_join(df, "id", "token", threshold).collect()
    }
    assert got == _brute_set_jaccard(rows, threshold)
    assert ("c900", "c901", round(7 / 8, 6)) in got or threshold > 7 / 8


def test_set_jaccard_join_ignores_null_tokens(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("b", "x"), ("b", None)],
        "id string, token string",
    )
    got = set_jaccard_join(df, "id", "token", 0.5).collect()
    assert [(r.a, r.b, r.jaccard) for r in got] == [("a", "b", 1.0)]


def _turns(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")


def test_conversation_fingerprints_distinct_and_null_free(spark):
    t = _turns(
        spark,
        [("c1", 1, "hi"), ("c1", 2, "hi"), ("c1", 3, None), ("c2", 1, "yo")],
    )
    fp = conversation_fingerprints(t).collect()
    by_conv = {}
    for r in fp:
        by_conv.setdefault(r.conv_id, []).append(r.tfp)
    assert len(by_conv["c1"]) == 1  # repeated text collapses, NULL ignored
    assert len(by_conv["c2"]) == 1


def test_conversation_near_dups_finds_dropped_turn_variant(spark):
    texts = [f"turn {i}" for i in range(5)]
    rows = [("orig", i, s) for i, s in enumerate(texts)]
    rows += [("relog", i, s) for i, s in enumerate(texts[:-1])]
    rows += [("other", i, f"different {i}") for i in range(5)]
    got = conversation_near_dups(_turns(spark, rows), threshold=0.8).collect()
    assert [(r.a, r.b, r.jaccard) for r in got] == [("orig", "relog", 0.8)]


def test_conversation_dedup_transitive_chain(spark):
    # nested drop-chains: J(a,b)=9/10, J(b,c)=8/9 (both >= 0.85) but
    # J(a,c)=8/10 < 0.85 — one cluster only via the transitive closure
    base = [f"s{i}" for i in range(10)]
    rows = (
        [("a", i, t) for i, t in enumerate(base[0:10])]
        + [("b", i, t) for i, t in enumerate(base[0:9])]
        + [("c", i, t) for i, t in enumerate(base[0:8])]
        + [("solo", 0, "alone")]
    )
    got = {
        r.conv_id: r.canon
        for r in conversation_dedup(_turns(spark, rows), threshold=0.85).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "solo": "solo"}


def test_conversation_near_dups_plan_is_jvm_only(spark, transcripts_small):
    df = conversation_near_dups(transcripts_small, threshold=0.8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan

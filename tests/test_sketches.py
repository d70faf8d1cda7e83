"""KMV distinct-count sketch: estimator accuracy, determinism,
merge-equivalence of the bottom-k property, and exact-below-k."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i % 40}") for i in range(500)], "g string, v string"
    )
    r = kmv_distinct(df, "g", "v", k=256).first()
    assert r["n_hashes"] == 40 and r["kmv_est"] == 40.0


def test_kmv_estimates_within_tolerance(spark):
    """10k distinct values, k=256 → relative error ~ 1/sqrt(k) ≈ 6%;
    assert within 20% (deterministic hash: no flakiness)."""
    df = spark.createDataFrame(
        [("g", f"value_{i}") for i in range(10_000)], "g string, v string"
    )
    r = kmv_distinct(df, "g", "v", k=256).first()
    assert r["n_hashes"] == 256
    assert abs(r["kmv_est"] - 10_000) / 10_000 < 0.20, r["kmv_est"]


def test_kmv_is_duplicate_insensitive_and_deterministic(spark):
    base = [("a", f"x{i}") for i in range(1000)]
    df1 = spark.createDataFrame(base, "g string, v string")
    df2 = spark.createDataFrame(base * 3, "g string, v string").repartition(7)
    r1 = kmv_distinct(df1, "g", "v").first()
    r2 = kmv_distinct(df2, "g", "v").first()
    assert (r1["n_hashes"], r1["kmv_est"]) == (r2["n_hashes"], r2["kmv_est"])


def test_kmv_matches_pure_python(spark):
    """Bottom-k minima and the estimate equal an independent pure-
    Python recomputation — the cross-engine contract the DuckDB oracle
    relies on."""
    import hashlib

    k = 16
    vals = [f"tok{i}" for i in range(300)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    hs = sorted(
        {
            (int.from_bytes(hashlib.md5(v.encode()).digest()[:4], "big") + 1.0)
            / 4_294_967_296
            for v in vals
        }
    )[:k]
    want = round((k - 1) / hs[-1], 6)
    r = kmv_distinct(df, "g", "v", k=k).first()
    assert r["kmv_est"] == want


def test_kmv_rejects_tiny_k(spark):
    df = spark.createDataFrame([("g", "v")], "g string, v string")
    with pytest.raises(ValueError, match="k must"):
        kmv_distinct(df, "g", "v", k=1)


def test_kmv_ignores_nulls(spark):
    """NULLs are not elements (countDistinct semantics) and must never
    reach the bottom-k window (the engines disagree on NULL ordering)."""
    rows = [("g", f"v{i}") for i in range(50)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "g string, v string")
    r = kmv_distinct(df, "g", "v", k=16).first()
    clean = kmv_distinct(
        spark.createDataFrame(rows[:50], "g string, v string"), "g", "v", k=16
    ).first()
    assert (r["n_hashes"], r["kmv_est"]) == (clean["n_hashes"], clean["kmv_est"])


# -- Bloom ingest pre-gate -------------------------------------------------


def test_bloom_gate_no_false_negatives_and_determinism(spark):
    from auto_data_tokenize_spark.operators.sketches import bloom_gate

    corpus = spark.createDataFrame(
        [(i, f"corpus document number {i}") for i in range(200)],
        "doc_id long, text string",
    )
    incoming = spark.createDataFrame(
        # 100 fresh + 50 exact copies of corpus texts
        [(1000 + i, f"fresh incoming text {i}") for i in range(100)]
        + [(2000 + i, f"corpus document number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["bloom_maybe"], r["is_dup"])
        for r in bloom_gate(incoming, corpus, m_bits=1024).collect()
    }
    assert len(out) == 150
    # every true dup is flagged maybe (structural no-false-negatives)
    for i in range(50):
        assert out[2000 + i] == (True, True)
    # fresh rows are never is_dup; bloom_maybe ⊇ is_dup always
    for i in range(100):
        maybe, dup = out[1000 + i]
        assert dup is False
    assert all(m or not d for m, d in out.values())
    # deterministic under repartitioning (bit OR is order-independent)
    again = {
        r["doc_id"]: (r["bloom_maybe"], r["is_dup"])
        for r in bloom_gate(
            incoming.repartition(7), corpus.repartition(5), m_bits=1024
        ).collect()
    }
    assert again == out


def test_bloom_small_m_produces_deterministic_false_positives(spark):
    """With a deliberately tiny filter the maybe-set strictly contains
    the dup-set — the FP path is real, and identical across runs."""
    from auto_data_tokenize_spark.operators.sketches import bloom_gate

    corpus = spark.createDataFrame(
        [(i, f"doc {i} padding words") for i in range(300)],
        "doc_id long, text string",
    )
    fresh = spark.createDataFrame(
        [(5000 + i, f"unseen {i}") for i in range(300)],
        "doc_id long, text string",
    )
    out = bloom_gate(fresh, corpus, m_bits=256, k=2).collect()
    fps = [r["doc_id"] for r in out if r["bloom_maybe"]]
    assert all(not r["is_dup"] for r in out)
    assert fps  # 256 bits / 300 docs: false positives must occur
    out2 = bloom_gate(fresh, corpus, m_bits=256, k=2).collect()
    assert sorted(fps) == sorted(r["doc_id"] for r in out2 if r["bloom_maybe"])


def test_bloom_build_is_bounded(spark):
    from auto_data_tokenize_spark.operators.sketches import bloom_build

    corpus = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id long, text string"
    )
    words = bloom_build(corpus, m_bits=2048).collect()
    assert len(words) <= 2048 // 32  # summary size bounded by m, not corpus
    assert all(w["word"] != 0 for w in words)


def test_bloom_gate_duplicate_ids_keep_independent_verdicts(spark):
    """Two incoming rows sharing an id must NOT have their probe bits
    conflated — a corpus text paired with a fresh text under the same
    id stays (maybe=True, dup=True) for the dup row (the review-found
    false-negative path)."""
    from auto_data_tokenize_spark.operators.sketches import bloom_gate

    corpus = spark.createDataFrame(
        [(i, f"known text {i}") for i in range(50)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(1, "known text 7"), (1, "completely fresh text")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["bloom_maybe"], r["is_dup"])
        for r in bloom_gate(incoming, corpus, m_bits=4096).collect()
    )
    # one row per (id, value): the dup is flagged, the fresh one is not
    assert len(rows) == 2
    assert (True, True) in rows
    assert all(m or not d for m, d in rows)


def test_bloom_maybe_expr_agrees_with_gate_and_is_pure_codegen(spark):
    """The literal-expression filter must give the exact verdicts the
    join-based gate gives, with NO join/exchange/Python in its plan."""
    from auto_data_tokenize_spark.operators.sketches import (
        bloom_gate,
        bloom_maybe_expr,
        bloom_words_array,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(200)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(1000 + i, f"probe {i}") for i in range(200)]
        + [(2000 + i, f"doc body {i}") for i in range(40)],
        "doc_id long, text string",
    )
    want = {
        r["doc_id"]: r["bloom_maybe"]
        for r in bloom_gate(incoming, corpus, m_bits=1024).collect()
    }
    words = bloom_words_array(corpus, m_bits=1024)
    assert len(words) == 1024 // 32
    flt = incoming.withColumn(
        "bloom_maybe", bloom_maybe_expr("text", words, m_bits=1024)
    )
    got = {r["doc_id"]: r["bloom_maybe"] for r in flt.collect()}
    assert got == want
    plan = (
        incoming.filter(bloom_maybe_expr("text", words, m_bits=1024))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan and "Python" not in plan


# ---------------------------------------------------------------- heavy hitters


def _exact_hh(stream, num, den):
    from collections import Counter

    c = Counter(stream)
    n = len(stream)
    return {v: k for v, k in c.items() if k * den >= num * n}


def test_heavy_hitters_equals_brute_force(spark):
    from auto_data_tokenize_spark.operators.sketches import heavy_hitters

    # zipf-ish stream: token i appears 1000//(i+1) times
    stream = [f"t{i}" for i in range(60) for _ in range(1000 // (i + 1))]
    df = spark.createDataFrame([(v,) for v in stream], "token string")
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitters(df, "token", num=1, den=50).collect()
    }
    assert got == _exact_hh(stream, 1, 50)


def test_heavy_hitters_partitioning_invariant(spark):
    """The candidate set varies with partitioning; the OUTPUT must
    not — the superset guarantee is what the oracle gate leans on."""
    from auto_data_tokenize_spark.operators.sketches import heavy_hitters

    stream = [f"w{i % 37}" for i in range(2000)] + ["hot"] * 300
    rows = [(v,) for v in stream]
    df1 = spark.createDataFrame(rows, "token string").coalesce(1)
    df2 = spark.createDataFrame(rows, "token string").repartition(16)
    r1 = sorted(
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters(df1, "token", 1, 10).collect()
    )
    r2 = sorted(
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters(df2, "token", 1, 10).collect()
    )
    assert r1 == r2 and r1, r1


def test_heavy_hitters_nulls_excluded_and_guards(spark):
    from auto_data_tokenize_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "token string"
    )
    rows = heavy_hitters(df, "token", num=1, den=2).collect()
    # n_total = 3 (nulls out); only 'a' (2/3) clears 1/2
    assert [(r["token"], r["cnt"], r["n_total"]) for r in rows] == [
        ("a", 2, 3)
    ]
    with pytest.raises(ValueError, match="rational"):
        heavy_hitters(df, "token", num=0, den=10)
    with pytest.raises(ValueError, match="rational"):
        heavy_hitters(df, "token", num=3, den=2)
    with pytest.raises(ValueError, match="max_capacity"):
        heavy_hitters(df, "token", num=1, den=10_000_000)


def test_heavy_hitters_adversarial_mg_reduction(spark):
    """More distinct values than capacity per partition, with the true
    heavy hitter arriving LAST so it survives only via the
    mergeable-summaries bound, not by luck of arrival order."""
    from auto_data_tokenize_spark.operators.sketches import heavy_hitters

    noise = [f"n{i}" for i in range(500)]  # 500 singletons
    stream = noise + ["hh"] * 250  # hh = 250/750 = 1/3 of the stream
    df = spark.createDataFrame([(v,) for v in stream], "token string").coalesce(1)
    got = {
        r["token"]: r["cnt"]
        for r in heavy_hitters(df, "token", num=1, den=4).collect()
    }
    assert got == {"hh": 250}


def test_heavy_hitters_shuffle_join_path_same_answer(spark):
    """broadcast_max_rows=0 forces the plain-join scale path; the
    answer must not change."""
    from auto_data_tokenize_spark.operators.sketches import heavy_hitters

    stream = [f"t{i % 9}" for i in range(900)] + ["big"] * 300
    df = spark.createDataFrame([(v,) for v in stream], "token string")
    a = sorted(
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters(df, "token", 1, 8).collect()
    )
    b = sorted(
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters(
            df, "token", 1, 8, broadcast_max_rows=0
        ).collect()
    )
    assert a == b and a

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

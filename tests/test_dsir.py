"""DSIR hashed n-gram importance resampling (operators/dsir.py):
hand-checkable gram/bucket math, direction-of-effect goldens,
determinism, validation, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_select,
    dsir_weights,
    hashed_gram_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_bucket_counts(spark):
    # "a b c" -> unigrams a,b,c + bigrams "a b","b c" = 5 occurrences
    out = hashed_gram_buckets(_docs(spark, [(1, "a b c")]), n_buckets=8)
    assert out.agg(F.sum("cnt")).first()[0] == 5
    # one-token doc -> 1 unigram, no bigram
    out1 = hashed_gram_buckets(_docs(spark, [(1, "solo")]), n_buckets=8)
    assert out1.agg(F.sum("cnt")).first()[0] == 1


def test_ratio_math_single_bucket(spark):
    # raw = target = the same one-token doc: every term cancels except
    # the totals; with identical corpora the ratio is exactly 0
    d = _docs(spark, [(1, "x")])
    r = dsir_log_ratios(d, d, n_buckets=16).collect()
    assert len(r) == 1 and r[0].ratio_micro6 == 0


def test_ratio_math_by_hand(spark):
    # raw: two docs "x" and "y" (two buckets, 1 occurrence each,
    # rtot=2); target: one doc "x" (ttot=1). B=16, alpha=1:
    #   bucket(x): ln(2/17) - ln(2/18);  bucket(y): ln(1/17) - ln(2/18)
    raw = _docs(spark, [(1, "x"), (2, "y")])
    tgt = _docs(spark, [(10, "x")])
    w = {r.doc_id: r.logw_micro6 for r in
         dsir_weights(raw, tgt, n_buckets=16).collect()}
    exp_x = round(round(math.log(2 / 17) - math.log(2 / 18), 6) * 1e6)
    exp_y = round(round(math.log(1 / 17) - math.log(2 / 18), 6) * 1e6)
    assert w == {1: exp_x, 2: exp_y}
    assert w[1] > w[2]  # the target-matching doc scores higher


def test_select_is_deterministic_total_order(spark):
    raw = _docs(
        spark,
        [(i, "alpha beta gamma") for i in range(5)]
        + [(i + 100, "zeta eta theta") for i in range(5)],
    )
    tgt = _docs(spark, [(0, "alpha beta gamma")])
    top = dsir_select(raw, tgt, k=5, n_buckets=64)
    ids = [r.doc_id for r in top.collect()]
    # the five target-identical docs win, tie-broken by doc_id asc
    assert ids == [0, 1, 2, 3, 4]
    assert ids == [r.doc_id for r in top.collect()]  # stable re-run


def test_validation(spark):
    d = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_gram_buckets(d, n_buckets=1)
    with pytest.raises(ValueError, match="k must"):
        dsir_select(d, d, k=0)


def test_weights_cover_every_raw_doc(spark):
    raw = _docs(spark, [(1, "a b"), (2, ""), (3, "q")])
    tgt = _docs(spark, [(9, "a")])
    assert dsir_weights(raw, tgt, n_buckets=32).count() == 3


def test_plan_is_python_free_and_broadcasts(spark):
    raw = _docs(spark, [(1, "a b"), (2, "c d")])
    tgt = _docs(spark, [(9, "a b")])
    plan = (
        dsir_weights(raw, tgt, n_buckets=32)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan  # the B-row ratio table side


def test_static_scoring_default_for_oov(spark):
    from auto_data_tokenize_spark.operators.dsir import (
        dsir_default_ratio_micro6,
        dsir_log_ratios,
        score_against_ratios,
    )

    raw = _docs(spark, [(1, "x y"), (2, "y z")])
    tgt = _docs(spark, [(9, "x")])
    ratios = dsir_log_ratios(raw, tgt, n_buckets=32)
    d = dsir_default_ratio_micro6(raw, tgt, n_buckets=32).first()[0]
    # rtot = 6 gram occurrences (x,y,"x y",y,z,"y z"); ttot = 1 (x)
    assert d == round(round(math.log(6 + 32) - math.log(1 + 32), 6) * 1e6)
    # a fully-OOV doc: "zz qq" -> grams zz, qq, "zz qq" = 3 defaults
    oov = _docs(spark, [(100, "zz qq")])
    row = score_against_ratios(oov, ratios, d, n_buckets=32).first()
    assert row.n_grams == 3 and row.logw_micro6 == 3 * d


def test_static_scoring_equals_batch_on_known_docs(spark):
    from auto_data_tokenize_spark.operators.dsir import (
        dsir_default_ratio_micro6,
        dsir_log_ratios,
        score_against_ratios,
    )

    raw = _docs(spark, [(i, f"alpha beta w{i}") for i in range(6)])
    tgt = _docs(spark, [(0, "alpha beta")])
    ratios = dsir_log_ratios(raw, tgt, n_buckets=64)
    d = dsir_default_ratio_micro6(raw, tgt, n_buckets=64).first()[0]
    batch = {r.doc_id: (r.n_grams, r.logw_micro6) for r in
             dsir_weights(raw, tgt, n_buckets=64).collect()}
    static = {r.doc_id: (r.n_grams, r.logw_micro6) for r in
              score_against_ratios(raw, ratios, d, n_buckets=64).collect()}
    assert batch == static


def test_ratio_table_covers_target_only_buckets(spark):
    from auto_data_tokenize_spark.operators.dsir import (
        dsir_log_ratios,
        score_against_ratios,
    )

    # "t" appears ONLY in the target; a new doc using it must get its
    # true smoothed ratio from the table, not the both-zero default
    raw = _docs(spark, [(1, "x")])
    tgt = _docs(spark, [(9, "t")])
    ratios = dsir_log_ratios(raw, tgt, n_buckets=32)
    row = score_against_ratios(
        _docs(spark, [(5, "t")]), ratios, default_ratio_micro6=0,
        n_buckets=32,
    ).first()
    # rc=0, tc=1, rtot=1, ttot=1:
    want = round(round(
        math.log(2) - math.log(33) - math.log(1) + math.log(33), 6) * 1e6)
    assert row.logw_micro6 == want

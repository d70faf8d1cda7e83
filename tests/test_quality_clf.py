"""Naive-Bayes quality classifier: exact micro-unit arithmetic,
fail-fast training guards, separation on a planted corpus."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.quality_clf import (
    score_nb,
    train_nb,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "the quick brown fox reads good clean prose", True))
        else:
            rows.append((i, "click here buy now spam spam casino offer", False))
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_nb_separates_planted_classes(spark, labeled):
    model = train_nb(labeled)
    scored = {
        r["doc_id"]: r["score_micro6"]
        for r in score_nb(labeled, model).collect()
    }
    for i in range(40):
        if i % 2 == 0:
            assert scored[i] > 0
        else:
            assert scored[i] < 0


def test_nb_matches_hand_arithmetic(spark):
    """2-doc corpus: every count is hand-checkable. vocab = {a, b},
    N1 = 2 (a a), N0 = 1 (b); doc 'a b' scores
    ratio(a) + ratio(b) + prior with Laplace alpha=1."""
    import math

    lab = spark.createDataFrame(
        [(1, "a a", True), (2, "b", False)],
        "doc_id long, text string, label boolean",
    )
    model = train_nb(lab)
    got = {
        r["doc_id"]: r["score_micro6"]
        for r in score_nb(
            spark.createDataFrame([(9, "a b")], "doc_id long, text string"),
            model,
        ).collect()
    }
    m = lambda x: int(round(round(x, 6) * 1e6))  # noqa: E731
    ra = m(math.log(2 + 1) - math.log(2 + 2) - math.log(0 + 1) + math.log(1 + 2))
    rb = m(math.log(0 + 1) - math.log(2 + 2) - math.log(1 + 1) + math.log(1 + 2))
    prior = m(math.log(1) - math.log(1))
    assert got[9] == ra + rb + prior


def test_nb_unseen_token_gets_smoothing_floor(spark, labeled):
    model = train_nb(labeled)
    default = model.defaults.first()["default_ratio_micro6"]
    one = score_nb(
        spark.createDataFrame(
            [(99, "zzzunseen")], "doc_id long, text string"
        ),
        model,
    ).first()
    prior = model.defaults.first()["prior_micro6"]
    assert one["score_micro6"] == default + prior
    assert one["n_tokens"] == 1


def test_nb_single_class_fails_fast(spark):
    lab = spark.createDataFrame(
        [(1, "a", True), (2, "b", True)],
        "doc_id long, text string, label boolean",
    )
    with pytest.raises(ValueError, match="BOTH classes"):
        train_nb(lab)


def test_nb_min_count_prunes_vocab(spark, labeled):
    model_all = train_nb(labeled, min_count=1)
    model_cut = train_nb(labeled, min_count=21)
    assert model_cut.ratios.count() < model_all.ratios.count()

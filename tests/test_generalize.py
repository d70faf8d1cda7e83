"""Ladder-based generalization to k-anonymity (operators/generalize.py)."""

import pytest
from pyspark.sql import Row

from auto_data_tokenize_spark.operators import risk
from auto_data_tokenize_spark.operators.generalize import (
    generalize_to_k,
    generalized_classes,
)

LADDERS = {
    "bal": [("raw",), ("bucket", 10.0), ("bucket", 100.0), ("suppress",)],
    "seg": [("raw",), ("raw",), ("raw",), ("suppress",)],
}


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        Row(seg="A", bal=11.0),
        Row(seg="A", bal=12.0),
        Row(seg="A", bal=19.0),
        Row(seg="A", bal=23.0),
        Row(seg="B", bal=14.0),
        Row(seg="B", bal=18.0),
    ]
    return spark.createDataFrame(rows)


def test_picks_lowest_sufficient_level(people):
    # raw: min class 1. bucket 10: classes (A,[10,20))=3, (A,[20,30))=1,
    # (B,[10,20))=2 -> min 1. bucket 100: (A,[0,100))=4, (B,[0,100))=2
    # -> min 2 >= k=2.
    out, level = generalize_to_k(people, LADDERS, k=2)
    assert level == 2
    classes = {
        (r.seg, r.bal_low, r.bal_high): r.class_size
        for r in generalized_classes(people, LADDERS, k=2).collect()
    }
    assert classes == {("A", 0.0, 100.0): 4, ("B", 0.0, 100.0): 2}


def test_level_zero_when_already_anonymous(people):
    out, level = generalize_to_k(people, LADDERS, k=1)
    assert level == 0
    # raw level keeps low == high == value
    row = out.where("seg = 'B' and bal_low = 14.0").collect()[0]
    assert row.bal_low == row.bal_high == 14.0


def test_suppress_level_collapses_to_one_class(people):
    cls = generalized_classes(people, LADDERS, k=6).collect()
    assert len(cls) == 1
    r = cls[0]
    assert (r.seg, r.bal_low, r.bal_high, r.class_size, r.level) == (
        "*", None, None, 6, 3
    )


def test_result_is_k_anonymous(people):
    out, level = generalize_to_k(people, LADDERS, k=2)
    names = ["bal_low", "bal_high", "seg"]
    sizes = [
        r.class_size for r in risk.k_anonymity(out, names).collect()
    ]
    assert min(sizes) >= 2


def test_unreachable_k_raises(people):
    with pytest.raises(ValueError, match="no ladder level"):
        generalize_to_k(people, LADDERS, k=7)


def test_prefix_ladder(spark):
    df = spark.createDataFrame(
        [Row(zip="94105"), Row(zip="94107"), Row(zip="94110"), Row(zip="10001")]
    )
    ladders = {"zip": [("raw",), ("prefix", 3), ("suppress",)]}
    out, level = generalize_to_k(df, ladders, k=2)
    assert level == 2  # prefix-3 still leaves '100' alone at size 1
    assert [r.zip for r in out.collect()] == ["*"] * 4
    out2, level2 = generalize_to_k(df.where("zip like '941%'"), ladders, k=3)
    assert level2 == 1
    assert {r.zip for r in out2.collect()} == {"941"}


def test_validates_ladders(people):
    with pytest.raises(ValueError, match="same number of levels"):
        generalize_to_k(people, {"bal": [("raw",)], "seg": []}, k=2)
    with pytest.raises(ValueError, match="not in DataFrame"):
        generalize_to_k(people, {"nope": [("raw",)]}, k=2)
    with pytest.raises(ValueError, match="positive width"):
        generalize_to_k(people, {"bal": [("bucket", 0)]}, k=2)
    with pytest.raises(ValueError, match="k must be"):
        generalize_to_k(people, LADDERS, k=0)


def test_non_ladder_columns_pass_through(people):
    df = people.withColumn("id", people.bal + 1)
    out, _ = generalize_to_k(df, LADDERS, k=2)
    assert "id" in out.columns and out.count() == 6

"""Determinism + shape tests for the synthetic transcript generator."""

import pandas as pd

from auto_data_tokenize_spark import datagen
from auto_data_tokenize_spark.functions import detectors


def test_schema_and_shape():
    df = datagen.gen_transcripts(0.0005)  # ~1000 turns
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert df["turn_idx"].dtype == "int32"
    assert str(df["ts"].dtype) == "datetime64[us]"
    assert len(df) >= 200
    # turn_idx is 1-based and dense per conversation
    g = df.groupby("conv_id")["turn_idx"]
    assert (g.min() == 1).all()
    assert (g.max() == g.count()).all()


def test_deterministic():
    a = datagen.gen_transcripts(0.0005)
    b = datagen.gen_transcripts(0.0005)
    pd.testing.assert_frame_equal(a, b)


def test_hot_keys_exist():
    df = datagen.gen_transcripts(0.001)
    counts = df["conv_id"].value_counts()
    hot = counts[counts.index.str.startswith("conv_hot_")]
    assert len(hot) == datagen.HOT_CONVS
    # each hot conv is much larger than the tail median
    assert hot.min() > 2 * counts.median()


def test_pii_planted_and_detectable():
    df = datagen.gen_transcripts(0.0005)
    det = datagen.golden_detections(df)
    assert set(det["info_type"]) == set(detectors.INFO_TYPES)
    # a healthy share of turns carries PII
    assert det[["conv_id", "turn_idx"]].drop_duplicates().shape[0] > 0.3 * len(df)


def test_golden_tokenized_sorted_and_clean():
    df = datagen.gen_transcripts(0.0005)
    gold = datagen.golden_tokenized(df)
    assert (
        gold[["conv_id", "turn_idx"]]
        .apply(tuple, axis=1)
        .is_monotonic_increasing
    )
    joined = " ".join(gold["text_tok"].dropna())
    # no raw PII survives in goldens
    assert "@example." not in joined


def test_token_dictionary_unique_and_lagged():
    df = datagen.gen_transcripts(0.0005)
    det = datagen.golden_detections(df)
    d = datagen.token_dictionary(det)
    assert d["token"].is_unique
    assert set(d.columns) == {"token", "info_type", "conv_id", "ts"}


def test_late_rows_present():
    df = datagen.gen_transcripts(0.001)
    # within a conversation ts is mostly increasing; late rows break order
    lateness = (
        df.groupby("conv_id")["ts"].apply(lambda s: (s.diff() < pd.Timedelta(0)).sum()).sum()
    )
    assert lateness > 0

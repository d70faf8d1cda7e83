"""Multimodal plumbing: binary payload columns through mapInPandas
(decode stubbed deterministically)."""

import pytest

from auto_data_tokenize_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.synth_media(spark, n=30)


def test_extract_features_shape(spark, media):
    out = multimodal.extract_features(media, dim=16).collect()
    assert len(out) == 30
    for r in out:
        assert r["feat_dim"] == 16
        assert len(r["feature"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_features_deterministic(spark, media):
    a = multimodal.extract_features(media, dim=8).orderBy("media_id").collect()
    b = multimodal.extract_features(media.repartition(5), dim=8).orderBy(
        "media_id"
    ).collect()
    assert [r["feature"] for r in a] == [r["feature"] for r in b]


def test_real_decoder_gated(spark, media):
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(media, decoder="pil")


def test_resize_schema(spark, media):
    out = multimodal.resize_images(media, 32, 32)
    assert out.schema == multimodal.MEDIA_SCHEMA
    rows = out.limit(3).collect()
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)


def test_frame_sampling_udtf_shape(spark, media):
    frames = multimodal.sample_frames(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    # only videos (duration 5000ms) produce frames: 5 each
    assert all(r["count"] == 5 for r in got)
    assert len(got) == 10


def test_binary_column_pruned_before_python(spark, media):
    """The Python stage must receive only the pruned columns."""
    plan = (
        multimodal.extract_features(media, dim=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    map_line = next(ln for ln in plan.splitlines() if "MapInPandas" in ln)
    assert "mime" not in map_line and "duration_ms" not in map_line


def test_fake_decode_matches_independent_golden(spark):
    """datagen.golden_media_features re-implements the decode spec
    separately (different code path, same sha256-seeded definition) —
    the q30 oracle's independence rests on this agreement."""
    from pyspark.sql import functions as F

    from auto_data_tokenize_spark import datagen
    from auto_data_tokenize_spark.operators.multimodal import extract_features

    media_pd = datagen.gen_media(0.001)
    golden = datagen.golden_media_features(media_pd, dim=16)
    media = spark.createDataFrame(media_pd)
    got = (
        extract_features(media, dim=16)
        .select(
            "media_id",
            "feat_dim",
            F.round(
                F.expr(
                    "aggregate(transform(feature, x -> cast(x as double)),"
                    " cast(0.0 as double), (a, v) -> a + v)"
                ),
                6,
            ).alias("feat_sum"),
        )
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    want = golden.sort_values("media_id").reset_index(drop=True).astype(got.dtypes)
    assert got.equals(want)

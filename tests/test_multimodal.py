"""Multimodal plumbing: binary payload columns through mapInPandas
(fake decoder for opaque payloads; REAL stdlib WAV/BMP decoders)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

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


# -- real stdlib decoders (WAV / BMP) --------------------------------------


def test_bmp_codec_roundtrip_exact():
    from auto_data_tokenize_spark.operators.multimodal import encode_bmp, parse_bmp

    rng = np.random.default_rng(7)
    for w, h in [(16, 12), (13, 5), (1, 1), (31, 2)]:  # odd widths hit padding
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(parse_bmp(encode_bmp(rgb)), rgb)


def test_wav_parse_matches_synth():
    from auto_data_tokenize_spark.operators.multimodal import parse_wav, synth_wav

    rate, x = parse_wav(synth_wav(3, ms=50, rate=8000))
    assert rate == 8000 and len(x) == 400
    t = np.arange(400) / 8000
    want = np.sin(2 * np.pi * (220.0 + 55.0 * 3) * t) * 0.5
    assert np.max(np.abs(x - want)) < 2 / 32767


def test_media_metadata_parses_real_payloads(spark):
    from auto_data_tokenize_spark.operators.multimodal import (
        media_metadata,
        synth_real_media,
    )

    media = synth_real_media(spark, n=12)
    rows = {r["media_id"]: r for r in media_metadata(media).collect()}
    assert len(rows) == 12
    for i, r in rows.items():
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            assert (r["fmt"], r["width"], r["height"]) == ("bmp", 16, 12)
            assert 0.0 < r["mean_intensity"] < 1.0
        elif kind == "audio":
            assert (r["fmt"], r["sample_rate"], r["n_samples"]) == ("wav", 8000, 400)
            assert r["duration_ms"] == 50
            assert abs(r["mean_intensity"] - 0.5 / np.sqrt(2)) < 0.01  # sine RMS
        else:  # opaque container: quarantined as nulls, not a crash
            assert r["fmt"] is None


def test_extract_features_real_decoders_match_driver_golden(spark):
    from auto_data_tokenize_spark.operators.multimodal import (
        _bmp_features,
        _wav_features,
        extract_features,
        synth_bmp,
        synth_real_media,
        synth_wav,
    )

    media = synth_real_media(spark, n=12)
    for kind, dec, synth in [
        ("image", "bmp", synth_bmp),
        ("audio", "wav", synth_wav),
    ]:
        sub = media.filter(F.col("kind") == kind)
        got = {
            r["media_id"]: np.array(r["feature"], dtype=np.float32)
            for r in extract_features(sub, dim=16, decoder=dec).collect()
        }
        assert len(got) == 4  # 12 media ids, every third is this kind
        fgold = {"bmp": _bmp_features, "wav": _wav_features}[dec]
        for mid, feat in got.items():
            assert np.allclose(feat, fgold(synth(mid), 16), atol=1e-6)


def test_resize_images_real_bmp(spark):
    from auto_data_tokenize_spark.operators.multimodal import (
        parse_bmp,
        resize_images,
        resize_nearest,
        synth_bmp,
        synth_real_media,
    )

    media = synth_real_media(spark, n=9).filter(F.col("kind") == "image")
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(media, 8, 6, decoder="bmp").collect()
    }
    assert out  # images exist in the first 9 ids
    for mid, payload in out.items():
        got = parse_bmp(payload)
        want = resize_nearest(parse_bmp(synth_bmp(mid)), 8, 6)
        assert got.shape == (6, 8, 3) and np.array_equal(got, want)


def test_unknown_decoder_still_gated(spark):
    from auto_data_tokenize_spark.operators.multimodal import (
        extract_features,
        synth_real_media,
    )

    with pytest.raises(NotImplementedError):
        extract_features(synth_real_media(spark, n=3), decoder="pil")


def test_streaming_media_ingest_matches_batch(spark, tmp_path):
    """File-drop ingest of REAL media: .bmp/.wav files land in a dir,
    a binaryFile stream decodes them with media_metadata, and the
    result equals the batch read of the same directory."""
    from auto_data_tokenize_spark.operators.multimodal import (
        media_metadata,
        synth_bmp,
        synth_wav,
    )

    d = tmp_path / "drop"
    d.mkdir()
    for i in range(4):
        (d / f"img_{i}.bmp").write_bytes(synth_bmp(i))
        (d / f"aud_{i}.wav").write_bytes(synth_wav(i))

    def to_media(df):
        return df.selectExpr("abs(hash(path)) as media_id", "content as payload")

    batch = {
        tuple(r)
        for r in media_metadata(
            to_media(spark.read.format("binaryFile").load(str(d)))
        ).collect()
    }

    # binaryFile STREAMING requires the explicit source schema
    st = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("maxFilesPerTrigger", 3)
        .load(str(d))
    )
    got = set()
    q = (
        media_metadata(to_media(st))
        .writeStream.foreachBatch(
            lambda df, _eid: got.update(tuple(r) for r in df.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == batch and len(got) == 8
    fmts = {r[1] for r in got}
    assert fmts == {"bmp", "wav"}


def test_poison_payloads_quarantine_not_crash(spark):
    """Null / truncated / wrong-format payloads must yield NULL
    outputs, never fail the stage (the 100 TB contract)."""
    from auto_data_tokenize_spark.operators.multimodal import (
        extract_features,
        resize_images,
        synth_bmp,
    )

    rows = [
        (0, "image", "image/bmp", 0, 0, 0, synth_bmp(0)),   # good
        (1, "image", "image/bmp", 0, 0, 0, None),            # null
        (2, "image", "image/bmp", 0, 0, 0, b"BM\x01trunc"),  # truncated
        (3, "image", "image/bmp", 0, 0, 0, b"not a bitmap"), # wrong format
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    feats = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, dim=4, decoder="bmp").collect()
    }
    assert len(feats) == 4
    assert feats[0] is not None and all(feats[i] is None for i in (1, 2, 3))

    resized = {
        r["media_id"]: r["payload"]
        for r in resize_images(media, 4, 3, decoder="bmp").collect()
    }
    assert len(resized) == 4
    assert resized[0] is not None and all(resized[i] is None for i in (1, 2, 3))

    # the fake branch shares the quarantine contract (r3 ADVICE): a
    # NULL payload quarantines as NULL (never a fabricated image);
    # non-null opaque bytes fake-decode fine
    fake = {
        r["media_id"]: r["payload"]
        for r in resize_images(media, 4, 3, decoder="fake").collect()
    }
    assert len(fake) == 4
    assert fake[1] is None  # null payload stays null
    assert all(fake[i] is not None for i in (0, 2, 3))
    assert fake[2] != fake[3]  # payload-dependent
    rerun = {
        r["media_id"]: r["payload"]
        for r in resize_images(media, 4, 3, decoder="fake").collect()
    }
    assert rerun == fake  # deterministic across runs


def test_image_ahash_matches_independent_golden(spark):
    """The numpy decode-path aHash must equal the pure-Python-loop
    spec arithmetic over the same pixels (q99's oracle contract)."""
    from auto_data_tokenize_spark.datagen import golden_image_ahash
    from auto_data_tokenize_spark.operators.multimodal import (
        image_ahash,
        synth_image_corpus,
    )

    imgs = synth_image_corpus(spark, n_base=10, n_copies=5)
    got = {
        r["media_id"]: r["ahash"]
        for r in image_ahash(imgs).collect()
    }
    want = golden_image_ahash(list(range(10)) + [1000 + i for i in range(5)])
    assert got == dict(zip(want["media_id"], want["ahash"]))


def test_image_near_dups_finds_planted_copies(spark):
    """Every planted (i, 1000+i) pair is within the hamming budget;
    no independent-noise pair sneaks under it; block join == brute
    force (pigeonhole completeness check)."""
    from auto_data_tokenize_spark.operators.multimodal import (
        image_ahash,
        image_near_dups,
        synth_image_corpus,
    )

    imgs = synth_image_corpus(spark, n_base=20, n_copies=10)
    hashes = image_ahash(imgs).collect()
    hs = {r["media_id"]: r["ahash"] for r in hashes}
    brute = {
        (a, b)
        for a in hs
        for b in hs
        if a < b and bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= 8
    }
    got = {
        (r["a"], r["b"])
        for r in image_near_dups(
            image_ahash(imgs), max_hamming=8
        ).collect()
    }
    assert got == brute
    planted = {(i, 1000 + i) for i in range(10)}
    assert planted <= got
    # no pair of two independent base images
    assert not any(a < 1000 and b < 1000 for a, b in got)


def test_image_ahash_quarantines_poison(spark):
    from auto_data_tokenize_spark.operators.multimodal import image_ahash

    df = spark.createDataFrame(
        [(1, b"not a bmp"), (2, None)], "media_id long, payload binary"
    )
    rows = image_ahash(df).collect()
    assert all(r["ahash"] is None for r in rows) and len(rows) == 2

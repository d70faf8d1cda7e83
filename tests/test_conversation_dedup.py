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


def _stage(tmp_path, pdf, n_files, label=""):
    import os
    import time as _t

    import numpy as np

    staged = str(tmp_path / f"in{label}{n_files}")
    os.makedirs(staged)
    t0 = _t.time() - 100
    for k, chunk in enumerate(np.array_split(pdf, n_files)):
        p = f"{staged}/part-{k:03d}.parquet"
        chunk.to_parquet(p)
        os.utime(p, (t0 + k, t0 + k))
    return staged


def _containment_run(spark, staged, corpus, tmp_base, max_files):
    from auto_data_tokenize_spark.operators.conversations import (
        turn_containment_stream,
    )
    from auto_data_tokenize_spark.streaming import pipeline
    from auto_data_tokenize_spark.streaming.sink import ExactlyOnceSink

    st = (
        spark.readStream.schema("conv_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", max_files)
        .parquet(staged)
    )
    sink = ExactlyOnceSink(f"{tmp_base}/out{max_files}")
    pipeline.run_to_sink(
        turn_containment_stream(st, corpus, threshold=0.8),
        sink,
        f"{tmp_base}/ckpt{max_files}",
        shuffle_partitions=4,
    )
    return sink.read_committed(spark)


def test_turn_containment_gate_matches_twin_and_slicing(spark, tmp_path):
    """Re-logged sessions are rejected (containment 1.0), novel ones
    admitted; different micro-batch slicings agree; and the stream
    equals the batch twin under the closed-window contract."""
    import pandas as pd

    corpus = spark.createDataFrame(
        [(f"known {i}",) for i in range(5)] + [(None,)], "text string"
    )
    t0 = pd.Timestamp("2026-01-01")
    rows = [
        ("dup", "known 0", t0),
        ("dup", "known 1", t0 + pd.Timedelta(seconds=5)),
        ("dup", "known 2", t0 + pd.Timedelta(seconds=10)),
        ("mix", "known 0", t0 + pd.Timedelta(seconds=15)),
        ("mix", "novel a", t0 + pd.Timedelta(seconds=20)),
        ("new", "novel b", t0 + pd.Timedelta(seconds=25)),
        ("new", "novel c", t0 + pd.Timedelta(seconds=30)),
        # watermark pusher in a later window (never closes, filtered)
        ("late", "novel d", t0 + pd.Timedelta(minutes=5)),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "text", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")

    from pyspark.sql import functions as F

    final_wm = pd.Timestamp(pdf["ts"].max()) - pd.Timedelta(seconds=30)
    closed = F.col("window_start") + F.expr("INTERVAL 1 MINUTE") <= F.lit(
        final_wm
    )
    results = {}
    for max_files in (1, 3):
        staged = _stage(tmp_path, pdf, 4, label=f"mf{max_files}_")
        got = _containment_run(
            spark, staged, corpus, str(tmp_path / f"b{max_files}"), max_files
        )
        results[max_files] = {
            tuple(r) for r in got.filter(closed).collect()
        }
    assert results[1] == results[3]
    by_conv = {r[1]: r for r in results[1]}
    assert set(by_conv) == {"dup", "mix", "new"}
    assert by_conv["dup"][2:] == (3, 3, 1.0, False)
    assert by_conv["mix"][2:] == (2, 1, 0.5, True)
    assert by_conv["new"][2:] == (2, 0, 0.0, True)

    # batch twin: same op body on the static frame
    from auto_data_tokenize_spark.operators.conversations import (
        turn_containment_stream,
    )

    batch = spark.createDataFrame(pdf)
    want = {
        tuple(r)
        for r in turn_containment_stream(batch, corpus, threshold=0.8)
        .filter(closed)
        .collect()
    }
    assert results[1] == want

    # broadcast_index (the q142 plan shape) must not change the rows
    from auto_data_tokenize_spark.operators.conversations import (
        corpus_fingerprint_index,
    )

    idx = corpus_fingerprint_index(corpus)
    got_b = {
        tuple(r)
        for r in turn_containment_stream(
            batch, threshold=0.8, index=idx, broadcast_index=True
        )
        .filter(closed)
        .collect()
    }
    assert got_b == want

"""Error-split operator + plan-quality assertions (pushdown, pruning,
codegen) — the .explain-driven guarantees the 100 TB story rests on."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators import errors
from auto_data_tokenize_spark.operators.tokenize import tokenize_turns


def test_split_errors(spark):
    rows = [
        ("c1", 1, "ok text", "2026-01-01 00:00:00"),
        (None, 2, "no conv", "2026-01-01 00:00:00"),
        ("c3", 0, "bad idx", "2026-01-01 00:00:00"),
        ("c4", 4, "no ts", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string, s string")
    df = df.withColumn("ts", F.col("s").cast("timestamp")).drop("s")
    good, bad = errors.split_errors(df, errors.transcript_validity_checks(df))
    assert good.count() == 1
    got = {r["conv_id"]: r["error"] for r in bad.collect()}
    assert got == {None: "null_conv_id", "c3": "bad_turn_idx", "c4": "null_ts"}
    assert "_error" not in good.columns


def test_error_reason_is_first_failing_check(spark):
    df = spark.createDataFrame([(None, 0, "x", None)],
                               "conv_id string, turn_idx int, text string, ts timestamp")
    _, bad = errors.split_errors(df, errors.transcript_validity_checks(df))
    assert bad.collect()[0]["error"] == "null_conv_id"


# --- plan quality ----------------------------------------------------------


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark, sf_dir_small):
    df = spark.read.parquet(f"{sf_dir_small}/transcripts.parquet")
    plan = _executed(df.filter(F.col("conv_id") == "conv_000042").select("turn_idx"))
    assert "PushedFilters: [IsNotNull(conv_id), EqualTo(conv_id,conv_000042)]" in plan


def test_column_pruning_reaches_scan(spark, sf_dir_small):
    df = spark.read.parquet(f"{sf_dir_small}/transcripts.parquet")
    plan = _executed(tokenize_turns(df).select("conv_id", "turn_idx", "text_tok"))
    # only the three needed input columns are read, not role/tool/ts
    assert "ReadSchema: struct<conv_id:string,turn_idx:int,text:string>" in plan


def test_tokenize_plan_shape(spark, sf_dir_small):
    """The 100 TB tokenize pass: scan → ArrowEvalPython → project.
    No exchange, no sort, no join."""
    df = spark.read.parquet(f"{sf_dir_small}/transcripts.parquet")
    plan = _executed(tokenize_turns(df))
    assert "ArrowEvalPython" in plan
    for bad in ("Exchange", "Sort", "Join"):
        assert bad not in plan, bad


def test_textstats_whole_stage_codegen(spark, sf_dir_small):
    from auto_data_tokenize_spark.operators.textstats import quality_features

    df = spark.read.parquet(f"{sf_dir_small}/transcripts.parquet").withColumnRenamed(
        "text", "t"
    ).withColumnRenamed("conv_id", "doc")
    plan = _executed(quality_features(df, text_col="t"))
    # "*(n)" prefixes mark whole-stage-codegen spans in the compact form
    assert "*(1)" in plan
    assert "Python" not in plan


def test_broadcast_join_for_small_queries(spark, sf_dir_small):
    from auto_data_tokenize_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = _executed(cosine_topk(emb, q, k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

def test_prepare_corpus_filters_then_dedups(spark):
    """Quality/language filters drop junk; near-dup clusters keep one
    representative (smallest id); filters run BEFORE the shuffling
    dedup stage in the plan."""
    from auto_data_tokenize_spark.plans.pipelines import (
        CorpusPrepConfig,
        prepare_corpus,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside "
        "the old house near the river bank under a bright morning sky"
    )
    rows = [
        (0, base),
        (1, base),                              # exact dup of 0 -> dropped
        # tail edit: shingle-jaccard stays >= 0.7 -> near dup, dropped
        (2, base.replace("bright morning", "dark evening")),
        (3, "short"),                           # fails quality gate
        (4, "el gato y el perro en la casa con una mesa y una silla para " * 3),  # not English
        (5, "a completely different quality document about the weather and "
            "the seasons with enough words to pass every quality check"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(r["doc_id"] for r in prepare_corpus(df, CorpusPrepConfig()).collect())
    assert got == [0, 5]


def test_round4_operators_stay_jvm_side(spark):
    """The round-4 corpus/text operators must plan with zero Python
    eval nodes — whole-stage codegen end to end."""
    from auto_data_tokenize_spark.operators.corpus import (
        decontaminate,
        mix_sources,
    )
    from auto_data_tokenize_spark.operators.textstats import (
        dataset_report,
        repetition_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter("doc_id % 29 = 0").select("doc_id", "text")
    corpus = docs.filter("doc_id % 29 != 0").select("doc_id", "text")
    for df in (
        repetition_stats(docs),
        dataset_report(docs),
        mix_sources(docs, {"src0": 0.5}),
        decontaminate(corpus, ev),
    ):
        plan = _executed(df)
        for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert bad not in plan, plan


def test_asof_tolerance_single_shuffle(spark):
    """direction/tolerance must not change the plan shape: exactly one
    Exchange (the key window shuffle), no join, no Python."""
    from auto_data_tokenize_spark.operators.asof import asof_join

    l = spark.createDataFrame([(1, 10.0)], "k int, ts double")
    r = spark.createDataFrame([(1, 12.0, 3)], "k int, ts double, v int")
    plan = _executed(
        asof_join(l, r, on="k", right_cols=["v"], how="left",
                  direction="forward", tolerance=5.0)
    )
    # local createDataFrame parallelizes without scan exchanges; the
    # only shuffle is the window partitioning on the key
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("Join", "ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, plan


def test_upsert_resolution_single_shuffle(spark, tmp_path):
    """Merge-on-read resolution is one key shuffle + window filter."""
    from auto_data_tokenize_spark.streaming.sink import ExactlyOnceSink

    sink = ExactlyOnceSink(str(tmp_path / "t"), key_cols=("k",), version_col="v")
    sink.foreach_batch(spark.createDataFrame([(1, 1, "a")], "k int, v int, val string"), 0)
    sink.foreach_batch(spark.createDataFrame([(1, 2, "b")], "k int, v int, val string"), 1)
    plan = _executed(sink.read_committed(spark))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan


def test_round5_nb_and_mix_stay_jvm_side(spark):
    """q97/q100-family plans must have zero Python eval nodes: NB
    train/score are explode + hash-join + partial agg, temperature
    mixing is a pure filter."""
    from auto_data_tokenize_spark.operators.corpus import (
        mix_sources,
        temperature_rates,
    )
    from auto_data_tokenize_spark.operators.quality_clf import (
        score_nb,
        train_nb,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang", "source")
    with train_nb(
        docs.withColumn("label", F.col("lang") == "en"), min_count=2
    ) as model:
        for df in (
            score_nb(docs, model),
            mix_sources(docs, temperature_rates(docs), default_rate=0.0),
        ):
            plan = _executed(df)
            for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
                assert bad not in plan, plan
        # the vocabulary table must broadcast into the score join
        assert "BroadcastHashJoin" in _executed(score_nb(docs, model))


def test_image_near_dups_python_free_after_hash(spark):
    """q99: the only Python node is the decode+hash mapInPandas; the
    block join, dedupe and bit_count verify are pure JVM."""
    from auto_data_tokenize_spark.operators.multimodal import (
        image_ahash,
        image_near_dups,
        synth_image_corpus,
    )

    hashes = image_ahash(synth_image_corpus(spark, n_base=10, n_copies=5))
    plan = _executed(image_near_dups(hashes, max_hamming=8))
    assert plan.count("MapInPandas") == 2  # once per join side, pre-hash
    for bad in ("ArrowEvalPython", "BatchEvalPython"):
        assert bad not in plan, plan


def test_semantic_dedup_rescore_python_free(spark):
    """q96: Python appears only in the centroid-assignment
    ArrowEvalPython stages; the candidate join, dedupe and cosine
    rescore are pure JVM (per-vector norms, codegen arithmetic)."""
    from auto_data_tokenize_spark.operators import similarity
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 8))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    plan = _executed(similarity.semantic_dedup(corpus, nlist=4, nprobe=2))
    assert "BatchEvalPython" not in plan, plan  # no row-at-a-time Python
    assert "MapInPandas" not in plan, plan


def test_heavy_hitters_plan_shape(spark):
    """q107: the exact rescore joins the corpus against BROADCAST
    candidates (left-semi) — the token-universe-wide shuffle a naive
    groupBy(token) would pay never appears; the only hash exchange is
    the candidates-only count."""
    from auto_data_tokenize_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(f"t{i % 20}",) for i in range(400)], "token string"
    )
    plan = _executed(heavy_hitters(df, "token", num=1, den=10))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert "BatchEvalPython" not in plan, plan  # MG pass is Arrow-batched


def test_epoch_shuffle_plan_shape(spark):
    """q108: one hash exchange on (epoch, shard) — no global sort, no
    join, no Python anywhere (placement is pure codegen md5)."""
    from auto_data_tokenize_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    plan = _executed(epoch_shuffle(df, 2, 4))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Join"):
        assert bad not in plan, plan


def test_corpus_delta_plan_shape(spark):
    """q109: the diff carries only (id, fixed-width hash) into the
    full-outer join — document payloads are pruned before the
    exchange, and no Python appears."""
    from auto_data_tokenize_spark.operators.versioning import corpus_delta

    rows = [(i, f"text {i}", "en") for i in range(100)]
    old = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    new = spark.createDataFrame(rows[5:], "doc_id long, text string, lang string")
    df = corpus_delta(old, new, ["text", "lang"])
    plan = _executed(df)
    assert "FullOuter" in plan, plan
    for bad in ("ArrowEvalPython", "BatchEvalPython", "CartesianProduct"):
        assert bad not in plan, plan


def test_chunk_documents_plan_shape(spark):
    """q110: projection + generator only — zero exchanges, zero
    Python; the token array is split once per row, not per window."""
    from auto_data_tokenize_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(50)],
        "doc_id long, text string",
    )
    plan = _executed(chunk_documents(df, chunk_tokens=4, stride=2))
    for bad in ("Exchange", "ArrowEvalPython", "BatchEvalPython", "Join"):
        assert bad not in plan, plan
    assert plan.count("split(") <= 2, plan  # generator + project, not per-window


def test_skew_stats_exact_and_tiebreak(spark):
    """hot=6/10 rows under 5 partitions (uniform quota 2) -> salts
    ceil(0.6*5)=3; b and c tie at 2 rows -> key-ascending order."""
    import duckdb
    import pandas as pd

    from auto_data_tokenize_spark.operators.skew import (
        duckdb_skew_sql,
        skew_stats,
    )

    pdf = pd.DataFrame({"k": ["hot"] * 6 + ["b"] * 2 + ["c"] * 2})
    got = skew_stats(
        spark.createDataFrame(pdf), "k", top_n=2, partitions=5
    ).collect()
    assert [(r["k"], r["n_rows"], r["share"], r["rec_salts"]) for r in got] == [
        ("hot", 6, 0.6, 3),
        ("b", 2, 0.2, 1),
    ]

    duck = duckdb.connect()
    duck.register("skw", pdf)
    want = duck.execute(duckdb_skew_sql("skw", "k", 2, 5)).df()
    assert [tuple(r) for r in want.itertuples(index=False)] == [
        ("hot", 6, 0.6, 3),
        ("b", 2, 0.2, 1),
    ]


def test_skew_stats_plan_has_no_global_sort_shuffle(spark):
    """top-n must be TakeOrdered (per-partition heads merged on the
    driver), and the totals side must broadcast — a rangepartitioned
    full sort or a shuffled totals join would not survive 10^12 rows."""
    from auto_data_tokenize_spark.operators.skew import skew_stats

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    plan = (
        skew_stats(df, "k")._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_skew_stats_validates_args(spark):
    import pytest

    from auto_data_tokenize_spark.operators.skew import skew_stats

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        skew_stats(df, "k", top_n=0)
    with pytest.raises(ValueError):
        skew_stats(df, "k", partitions=0)


def test_residual_leak_audit_counts_survivors(spark):
    """The audit recovers each RAW span from (start, end) offsets into
    the original text — NOT the detections' token column, which holds
    the tokenized replacement and always appears in the output. One
    doctored 'tokenized' row keeps its raw span -> that detection
    leaks; the properly tokenized turn reports clean. The containment
    test must stay codegen (no Python nodes)."""
    from auto_data_tokenize_spark.operators.tokenize import (
        residual_leak_audit,
    )

    tokenized = spark.createDataFrame(
        [
            ("c1", 0, "call me at 555-0100 ok", "call me at <tok:abc> ok"),
            (
                "c2", 0,
                "ssn 123-45-6789 left in place",
                "ssn 123-45-6789 left in place",
            ),
        ],
        "conv_id string, turn_idx int, text string, text_tok string",
    )
    detections = spark.createDataFrame(
        [
            ("c1", 0, "PHONE_NUMBER", 11, 19),
            ("c2", 0, "US_SOCIAL_SECURITY_NUMBER", 4, 15),
        ],
        "conv_id string, turn_idx int, info_type string, start int, end int",
    )
    out = residual_leak_audit(tokenized, detections)
    rows = {r["info_type"]: (r["n_detections"], r["n_leaked"]) for r in out.collect()}
    assert rows["PHONE_NUMBER"] == (1, 0)
    assert rows["US_SOCIAL_SECURITY_NUMBER"] == (1, 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_residual_leak_audit_ignores_degenerate_spans(spark):
    """Zero-width (end == start) and inverted (end < start) spans must
    not count as leaks: '' matches everywhere (instr/strpos = 1) and
    the engines extract DIFFERENT text for negative lengths — the
    end > start guard keeps both sides honest."""
    from auto_data_tokenize_spark.operators.tokenize import (
        residual_leak_audit,
    )

    tokenized = spark.createDataFrame(
        [("c1", 0, "abcdef", "abcdef")],
        "conv_id string, turn_idx int, text string, text_tok string",
    )
    detections = spark.createDataFrame(
        [
            ("c1", 0, "X", 2, 2),   # zero-width
            ("c1", 0, "X", 4, 2),   # inverted
        ],
        "conv_id string, turn_idx int, info_type string, start int, end int",
    )
    row = residual_leak_audit(tokenized, detections).collect()[0]
    assert (row["n_detections"], row["n_leaked"]) == (2, 0)


def test_skew_stats_null_key_sorts_last_both_engines(spark):
    """A NULL key tying at the cutoff must land in the same slot on
    both engines (Spark default sorts NULL first, DuckDB last — the
    operator pins NULLS LAST on both)."""
    import duckdb
    import pandas as pd

    from auto_data_tokenize_spark.operators.skew import (
        duckdb_skew_sql,
        skew_stats,
    )

    pdf = pd.DataFrame({"k": [None] * 3 + ["a"] * 3 + ["b"] * 2})
    got = [
        r["k"]
        for r in skew_stats(
            spark.createDataFrame(pdf, "k string"), "k", top_n=2, partitions=4
        ).collect()
    ]
    duck = duckdb.connect()
    duck.register("skwn", pdf)
    want = [r[0] for r in duck.execute(duckdb_skew_sql("skwn", "k", 2, 4)).fetchall()]
    assert got == want == ["a", None]


def test_hot_keys_monitor_threshold_and_buckets(spark):
    """Batch-mode semantics: keys at/above min_count within their own
    hour emit; the same key spread across hours doesn't."""
    import datetime as dt

    from auto_data_tokenize_spark.operators.skew import hot_keys_monitor

    t0 = dt.datetime(2026, 1, 1)
    rows = (
        [("flood", t0 + dt.timedelta(minutes=i)) for i in range(3)]
        + [("quiet", t0)]
        + [("split", t0), ("split", t0 + dt.timedelta(hours=1)),
           ("split", t0 + dt.timedelta(hours=2))]
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        (r["k"], r["window_start"].hour): r["n_rows"]
        for r in hot_keys_monitor(df, "k", min_count=3).collect()
    }
    assert got == {("flood", 0): 3}

    import pytest

    with pytest.raises(ValueError):
        hot_keys_monitor(df, "k", min_count=0)


def test_completeness_monitor_exact(spark):
    """Hand-checked per-window null counts in long form; empty cols
    list rejected."""
    import datetime as dt

    import pytest

    from auto_data_tokenize_spark.operators.errors import completeness_monitor

    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", "en", t0),
            (None, "en", t0 + dt.timedelta(seconds=10)),
            (None, None, t0 + dt.timedelta(minutes=1)),
        ],
        "text string, lang string, ts timestamp",
    )
    got = {
        (r["window_start"].minute, r["column_name"]): (
            r["n_rows"], r["n_null"], r["null_rate"]
        )
        for r in completeness_monitor(df, ["text", "lang"]).collect()
    }
    assert got[(0, "text")] == (2, 1, 0.5)
    assert got[(0, "lang")] == (2, 0, 0.0)
    assert got[(1, "text")] == (1, 1, 1.0)
    assert got[(1, "lang")] == (1, 1, 1.0)
    with pytest.raises(ValueError):
        completeness_monitor(df, [])


def test_completeness_monitor_nonplain_column_names(spark):
    """Generated identifiers are quoted on both engines, so a
    dash-named column monitors cleanly; duplicates are rejected."""
    import datetime as dt

    import duckdb
    import pytest

    from auto_data_tokenize_spark.operators.errors import (
        completeness_monitor,
        duckdb_completeness_sql,
    )

    df = spark.createDataFrame(
        [(None, dt.datetime(2026, 1, 1)), ("x", dt.datetime(2026, 1, 1))],
        "`content-type` string, ts timestamp",
    )
    rows = completeness_monitor(df, ["content-type"]).collect()
    assert (rows[0]["column_name"], rows[0]["n_null"]) == ("content-type", 1)

    duck = duckdb.connect()
    sql = duckdb_completeness_sql(
        "(SELECT TIMESTAMP '2026-01-01' AS ts,"
        " NULL::VARCHAR AS \"content-type\") src",
        ["content-type"],
    )
    want = duck.execute(sql).fetchall()
    assert [(r[1], r[3]) for r in want] == [("content-type", 1)]
    with pytest.raises(ValueError):
        completeness_monitor(df, ["content-type", "content-type"])
    with pytest.raises(ValueError):
        duckdb_completeness_sql("b", [])


def test_token_scope_ops_plan_shapes(spark):
    """q133/q134: the audit is join + two partial-agg groupBys, the
    monitor is a stateless fan-out + three window groupBys — pure
    codegen, no Python node anywhere, and every aggregate exchange
    carries map-side partials (partial_count before the shuffle)."""
    from auto_data_tokenize_spark.operators.tokenize import (
        token_scope_audit,
        token_scope_monitor,
    )

    det = spark.createDataFrame(
        [("c1", 0, "EMAIL", 0, 2, "t1")],
        "conv_id string, turn_idx int, info_type string, "
        "start int, end int, token string",
    )
    tr = spark.createDataFrame(
        [("c1", 0, "ab")], "conv_id string, turn_idx int, text string"
    )
    plan = _executed(token_scope_audit(det, tr))
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                "CartesianProduct"):
        assert bad not in plan, plan

    ev = spark.createDataFrame(
        [("2026-01-01 00:00:01", "EMAIL", "v", "c1", "t1")],
        "ts_s string, info_type string, value_hash string, "
        "scope string, token string",
    ).selectExpr("CAST(ts_s AS timestamp) AS ts", "info_type",
                 "value_hash", "scope", "token")
    plan = _executed(token_scope_monitor(ev))
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                "Join"):
        assert bad not in plan, plan
    assert "partial_count" in plan, plan

"""Corpus-assembly operators: deterministic splits and sequence packing."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.corpus import (
    pack_sequences,
    split_assign,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, "en" if i % 3 else "de", " ".join(f"w{i}_{j}" for j in range(5 + i % 7)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_split_assign_total_and_proportions(spark, docs):
    out = split_assign(docs).groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in out}
    assert sum(counts.values()) == 200  # every doc assigned, none null
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)


def test_split_assign_stable_under_growth_and_partitioning(spark, docs):
    full = {
        r["doc_id"]: r["split"] for r in split_assign(docs).collect()
    }
    subset = docs.filter(F.col("doc_id") < 50)
    sub = {
        r["doc_id"]: r["split"]
        for r in split_assign(subset.repartition(7)).collect()
    }
    # membership is a pure function of (seed, id): the first 50 docs
    # get identical splits whether or not the other 150 exist
    assert sub == {k: v for k, v in full.items() if k < 50}


def test_split_assign_seed_changes_assignment(spark, docs):
    a = {r["doc_id"]: r["split"] for r in split_assign(docs, seed="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(docs, seed="s2").collect()}
    assert a != b  # different seed, different (valid) partition


def test_pack_sequences_hand_checked(spark):
    rows = [
        (1, "en", " ".join(["a"] * 300)),
        (2, "en", " ".join(["b"] * 300)),
        (3, "en", " ".join(["c"] * 100)),
        (4, "de", " ".join(["d"] * 600)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["offset"], r["pack_id"])
        for r in pack_sequences(df, target_tokens=512).collect()
    }
    # en stream: doc1 at 0 (pack 0), doc2 at 300 (pack 0), doc3 at 600 (pack 1)
    assert got[1] == (300, 0, 0)
    assert got[2] == (300, 300, 0)
    assert got[3] == (100, 600, 1)
    # de stream is independent
    assert got[4] == (600, 0, 0)


def test_pack_sequences_partition_independence(spark, docs):
    a = sorted(
        (r["doc_id"], r["offset"], r["pack_id"])
        for r in pack_sequences(docs).collect()
    )
    b = sorted(
        (r["doc_id"], r["offset"], r["pack_id"])
        for r in pack_sequences(docs.repartition(13)).collect()
    )
    assert a == b


def test_plans_are_jvm_only(spark, docs):
    for df in (split_assign(docs), pack_sequences(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


def test_pack_sequences_stream_continues_across_micro_batches(spark, tmp_path):
    """Ordered append-log ingest: the streaming packer's state carries
    the per-lang offset across micro-batches, so the union of
    micro-batch outputs equals the batch packer over the same corpus —
    at ANY micro-batch slicing."""
    from auto_data_tokenize_spark.operators.corpus import (
        pack_sequences,
        pack_sequences_stream,
    )

    rows = [
        (i, "en" if i % 3 else "de", " ".join(f"w{i}_{j}" for j in range(4 + i % 5)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    want = {
        (r["lang"], r["doc_id"], r["n_tokens"], r["offset"], r["pack_id"])
        for r in pack_sequences(df, target_tokens=64).collect()
    }

    # stage as ordered files: file k holds doc_ids [20k, 20k+20)
    import os
    import time

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    t0 = time.time() - 100
    for k in range(6):
        chunk = df.filter(
            (F.col("doc_id") >= 20 * k) & (F.col("doc_id") < 20 * (k + 1))
        )
        p = str(in_dir / f"part-{k:03d}.parquet")
        chunk.toPandas().to_parquet(p)
        # FileStreamSource orders by mtime; ties break arbitrarily —
        # pin strictly increasing times so delivery order is the
        # append-log contract the operator documents
        os.utime(p, (t0 + k, t0 + k))

    for max_files in (2, 6):  # two different slicings
        st = (
            spark.readStream.schema("doc_id long, lang string, text string")
            .option("maxFilesPerTrigger", max_files)
            .option("latestFirst", "false")
            .parquet(str(in_dir))
        )
        got = set()
        q = (
            pack_sequences_stream(st, target_tokens=64)
            .writeStream.foreachBatch(
                lambda bdf, _eid: got.update(
                    (r["lang"], r["doc_id"], r["n_tokens"], r["offset"], r["pack_id"])
                    for r in bdf.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / f"ckpt_{max_files}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert got == want, f"slicing maxFiles={max_files} diverged"


def test_decontaminate_flags_planted_overlap(spark):
    from auto_data_tokenize_spark.operators.corpus import decontaminate

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix words the quick brown fox jumps over and more"),  # hit
            (2, "completely unrelated text with no overlap at all here"),  # clean
            (3, "the quick brown fox jumps over the lazy dog"),  # exact copy
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontaminate(corpus, ev, k=5).collect()}
    assert got[1]["contaminated"] and got[1]["n_hit_shingles"] >= 1
    assert not got[2]["contaminated"] and got[2]["n_hit_shingles"] == 0
    assert got[3]["contaminated"]
    # the exact copy shares every eval shingle
    assert got[3]["n_hit_shingles"] == 5  # 9 words -> 5 distinct 5-shingles


def test_decontaminate_broadcasts_eval_side(spark):
    """The eval side must reach the corpus join as a broadcast — the
    100 TB contract is no corpus-side shuffle for the semi-join."""
    from auto_data_tokenize_spark.operators.corpus import decontaminate

    ev = spark.createDataFrame([(9, "a b c d e f")], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    plan = decontaminate(corpus, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_mix_sources_rates_and_monotonicity(spark):
    from auto_data_tokenize_spark.operators.corpus import mix_sources

    df = spark.createDataFrame(
        [(i, f"src{i % 2}") for i in range(2000)], "doc_id long, source string"
    )
    half = mix_sources(df, {"src0": 1.0, "src1": 0.5})
    kept = half.groupBy("source").count().collect()
    by_src = {r["source"]: r["count"] for r in kept}
    assert by_src["src0"] == 1000            # full source untouched
    assert 400 < by_src["src1"] < 600        # ~50% of 1000

    # monotone: the kept set at 0.25 is a subset of the kept set at 0.5
    quarter_ids = {
        r["doc_id"]
        for r in mix_sources(df, {"src0": 1.0, "src1": 0.25}).collect()
    }
    half_ids = {r["doc_id"] for r in half.collect()}
    assert quarter_ids <= half_ids

    # stable: re-evaluation keeps exactly the same documents
    assert {r["doc_id"] for r in half.collect()} == half_ids


def test_mix_sources_is_shuffle_free(spark):
    from auto_data_tokenize_spark.operators.corpus import mix_sources

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = mix_sources(df, {"a": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mix_sources_default_rate(spark):
    from auto_data_tokenize_spark.operators.corpus import mix_sources

    df = spark.createDataFrame(
        [(i, "unknown") for i in range(100)], "doc_id long, source string"
    )
    assert mix_sources(df, {"src0": 0.1}).count() == 100  # default keeps all
    assert mix_sources(df, {"src0": 0.1}, default_rate=0.0).count() == 0


def test_mix_sources_validates_rates(spark):
    from auto_data_tokenize_spark.operators.corpus import mix_sources

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match=r"rate for 'a'"):
        mix_sources(df, {"a": 35})  # "35%" typo would silently keep all
    with pytest.raises(ValueError, match=r"rate for 'a'"):
        mix_sources(df, {"a": -0.1})  # would silently drop the source
    with pytest.raises(ValueError, match="default_rate"):
        mix_sources(df, {"a": 0.5}, default_rate=2.0)


def test_duckdb_mix_sql_edges():
    """Empty rates and quote-bearing source names must stay valid SQL
    (the Spark side handles both; the twin may not diverge)."""
    import duckdb

    from auto_data_tokenize_spark.operators.corpus import duckdb_mix_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1, 'o''brien'), (2, 'x'))"
        " v(doc_id, source)"
    )
    assert con.execute(duckdb_mix_sql("t", {})).fetchdf().shape[0] == 2
    out = con.execute(
        duckdb_mix_sql("t", {"o'brien": 0.0})
    ).fetchdf()
    assert set(out["source"]) <= {"x"}


def test_decontamination_gate_matches_batch(spark):
    """The streaming gate's (id, shingle) hit pairs imply exactly the
    batch operator's contaminated set, and the pair counts equal
    n_hit_shingles (the gate is the stateless ingest twin of q53)."""
    from auto_data_tokenize_spark.operators.corpus import (
        DecontaminationGate,
        decontaminate,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely unrelated content with its own words here"),
        (3, "we saw the quick brown fox jumps over the fence"),
        (4, None),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "a tale where the quick brown fox jumps over everything")],
        "doc_id long, text string",
    )
    batch = {
        r["doc_id"]: r["n_hit_shingles"]
        for r in decontaminate(corpus, ev, k=5).collect()
    }
    with DecontaminationGate(ev, k=5) as gate:
        pairs = gate.apply(corpus).collect()
    got = {}
    for r in pairs:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
    assert {k for k, v in batch.items() if v > 0} == set(got)
    for k, v in got.items():
        assert batch[k] == v
    assert batch[2] == 0 and batch[4] == 0


def test_extended_fixture_deterministic_and_negative_clean():
    """gen_transcripts_ext regenerates byte-identically and plants all
    six infoTypes; the planted negatives yield zero detections."""
    import pandas as pd

    from auto_data_tokenize_spark import datagen

    a = datagen.gen_transcripts_ext(0.001)
    b = datagen.gen_transcripts_ext(0.001)
    pd.testing.assert_frame_equal(a, b)
    det = datagen.golden_detections_ext(a)
    assert {
        "PERSON_NAME", "DATE_OF_BIRTH", "EMAIL_ADDRESS",
        "PHONE_NUMBER", "CREDIT_CARD_NUMBER",
    } <= set(det["info_type"])
    neg = a["text"].str.contains(
        "2026-02-31|1/1/1880|grace period|meeting scheduled"
    )
    hits = a.loc[neg, ["conv_id", "turn_idx"]].merge(
        det, on=["conv_id", "turn_idx"]
    )
    assert hits.empty


def test_decontamination_gate_plan_broadcasts_eval(spark):
    """The gate's 100 TB contract: the eval shingle side is broadcast
    (no corpus-side shuffle for the join) and the whole plan is
    Python-free."""
    from auto_data_tokenize_spark.operators.corpus import DecontaminationGate

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon eta")], "doc_id long, text string"
    )
    with DecontaminationGate(ev, k=5) as gate:
        plan = gate.apply(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_pii_density_gate_counts_and_verdict(spark):
    from auto_data_tokenize_spark.operators.corpus import pii_density_gate

    docs = spark.createDataFrame(
        [
            ("a", 1, "one two three four"),          # 4 tokens
            ("a", 2, "five six"),                    # 2 tokens -> conv a: 6
            ("b", 1, "just words here"),             # conv b: 3 tokens, 0 pii
        ],
        "conv_id string, turn_idx int, text string",
    )
    det = spark.createDataFrame(
        [("a", 1, "EMAIL_ADDRESS"), ("a", 2, "PHONE_NUMBER")],
        "conv_id string, turn_idx int, info_type string",
    )
    out = {
        r.conv_id: (r.n_pii, r.n_tokens, r.pii_per_1k, r.passes)
        for r in pii_density_gate(
            docs, det, key_cols=["conv_id"], max_per_1k_tokens=400.0
        ).collect()
    }
    # conv a: 2 findings / 6 tokens = 333.333/1k -> passes at 400
    assert out["a"] == (2, 6, round(2000.0 / 6, 6), True)
    # conv b: zero findings survive the left join as 0, passes
    assert out["b"] == (0, 3, 0.0, True)
    strict = {
        r.conv_id: r.passes
        for r in pii_density_gate(
            docs, det, key_cols=["conv_id"], max_per_1k_tokens=100.0
        ).collect()
    }
    assert strict == {"a": False, "b": True}


def test_pii_density_gate_validates(spark):
    from auto_data_tokenize_spark.operators.corpus import pii_density_gate

    docs = spark.createDataFrame([("a", "x")], "conv_id string, text string")
    with pytest.raises(ValueError, match="key columns"):
        pii_density_gate(docs, docs, key_cols=["nope"])
    with pytest.raises(ValueError, match=">= 0"):
        pii_density_gate(docs, docs, key_cols=["conv_id"], max_per_1k_tokens=-1)


def test_normalized_dedup_collapses_variants(spark):
    from auto_data_tokenize_spark.operators.corpus import normalized_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "a genuinely different document"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_dupes"] for r in normalized_dedup(docs).collect()}
    assert got == {1: 3, 4: 1}  # min id survives, variants counted


def test_normalized_dedup_partition_invariant(spark):
    from auto_data_tokenize_spark.operators.corpus import normalized_dedup

    docs = spark.createDataFrame(
        [(i, f"doc {i % 7}!") for i in range(100)], "doc_id long, text string"
    )
    a = sorted(map(tuple, normalized_dedup(docs).collect()))
    b = sorted(map(tuple, normalized_dedup(docs.repartition(13)).collect()))
    assert a == b and len(a) == 7


def test_stratified_sample_deterministic_and_subset_stable(spark):
    from auto_data_tokenize_spark.operators.corpus import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", f"s{i % 3}") for i in range(300)],
        "doc_id long, lang string, source string",
    )
    pick = lambda df: sorted(
        r["doc_id"]
        for r in stratified_sample(df, ["lang", "source"], 5).collect()
    )
    a = pick(docs)
    assert len(a) == 30  # 2 langs x 3 sources x 5
    assert a == pick(docs.repartition(17))  # layout-independent
    # dropping an unrelated stratum never changes another stratum's picks
    sub = pick(docs.filter(F.col("lang") == "en"))
    assert sub == [d for d in a if d % 2 == 1]


def test_stratified_sample_seed_changes_picks(spark):
    from auto_data_tokenize_spark.operators.corpus import stratified_sample

    docs = spark.createDataFrame(
        [(i, "en") for i in range(200)], "doc_id long, lang string"
    )
    a = {r["doc_id"] for r in stratified_sample(docs, ["lang"], 10).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(docs, ["lang"], 10, seed="other").collect()
    }
    assert len(a) == len(b) == 10 and a != b


def test_normalized_text_cross_engine_contract(spark):
    """The dedup-key normalization must agree byte-for-byte between
    Spark (Java regex) and DuckDB (RE2) — a silent fork here splits the
    q81 key space without any error."""
    import duckdb
    import pandas as pd

    from auto_data_tokenize_spark.operators.corpus import (
        duckdb_normalized_text_sql,
        normalized_text_expr,
    )

    cases = [
        "", " ", "Hello, World!", "a\t\nb", "umlauts äöü",
        "数字123", "a--b__c", "x  y   z", "don't", "café",
        "line1\nline2", "!@#$%^&*()", "MiXeD CaSe 42", " nbsp",
        "emoji \U0001f642 end", "tabs\t\ttabs", "0  leading", "trail  9 ",
        "0\x0b0", "vt\x0bmix \x0b!", "\f\r form feeds",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, text string"
    )
    got_spark = {
        r["i"]: r["n"]
        for r in df.select("i", normalized_text_expr("text").alias("n")).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(cases)), "text": cases}))
    got_duck = dict(
        con.execute(
            f"SELECT i, {duckdb_normalized_text_sql('text')} FROM t"
        ).fetchall()
    )
    assert got_spark == got_duck


def test_temperature_rates_exact_integer_thresholds(spark):
    """Hand-computed micro-unit arithmetic: 900/100 split at a half
    budget — the sqrt weighting upsamples the tail source to rate 1.0
    while the head source lands on the exact floor-division bucket."""
    from auto_data_tokenize_spark.operators.corpus import (
        mix_sources,
        temperature_rates,
    )

    rows = [(i, "A" if i < 900 else "B") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = temperature_rates(df, budget_num=1, budget_den=2)
    # sw_A=30_000_000, sw_B=10_000_000, ssw=40_000_000, T=500
    # thr_A = (500*10000*3e7)//(900*4e7) = 4166; thr_B caps at 10000
    assert rates == {"A": 4166 / 10000.0, "B": 1.0}
    kept = mix_sources(df, rates, default_rate=0.0).groupBy("source").count()
    by = {r["source"]: r["count"] for r in kept.collect()}
    assert by["B"] == 100           # tail source fully kept
    assert 330 <= by["A"] <= 420    # ~0.4166 of 900 via md5 buckets
    assert temperature_rates(df.limit(0)) == {}


def test_temperature_rates_rejects_null_sources(spark):
    """A NULL source key can never match mix_sources' when-chain, so
    it must fail fast instead of silently skewing the budget."""
    from auto_data_tokenize_spark.operators.corpus import temperature_rates

    df = spark.createDataFrame(
        [(1, "A"), (2, None), (3, "B")], "doc_id long, source string"
    )
    with pytest.raises(ValueError, match="NULL"):
        temperature_rates(df)


# ------------------------------------------------------ token budget
def test_take_token_budget_boundary_and_order(spark):
    """Docs are taken by (order DESC, id ASC) until the running token
    total would exceed the budget; the crossing doc is EXCLUDED."""
    from auto_data_tokenize_spark.operators.corpus import take_token_budget

    rows = [
        # lang en, priority by n_chars desc: d1(4 toks), d2(3), d3(2)
        (1, "en", 40, "a b c d"),
        (2, "en", 30, "a b c"),
        (3, "en", 20, "a b"),
        # lang fr: one doc that alone exceeds the budget
        (4, "fr", 99, "un deux trois quatre cinq six sept huit"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"])
        for r in take_token_budget(df, 7, key_col="lang").collect()
    }
    # en: 4 + 3 = 7 <= 7 kept; d3 would make 9 -> excluded
    assert got == {1: (4, 4), 2: (3, 7)}
    with pytest.raises(ValueError, match="budget_tokens"):
        take_token_budget(df, 0)


def test_take_token_budget_single_key_exchange_python_free(spark):
    from auto_data_tokenize_spark.operators.corpus import take_token_budget

    df = spark.createDataFrame(
        [(1, "en", 5, "a b")], "doc_id long, lang string, n_chars long, text string"
    )
    plan = (
        take_token_budget(df, 100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Python" not in plan


# ------------------------------------------------- contamination report
def test_contamination_report_fracs_by_hand(spark):
    from auto_data_tokenize_spark.operators.corpus import (
        contamination_report,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            # fully contained span -> every shingle hits
            (100, "quick brown fox jumps over the lazy"),
            # disjoint text -> zero hits
            (101, "entirely different words about nothing in particular"),
            # shorter than k words -> ONE whole-text shingle (the
            # shared word_shingles contract), which misses here
            (102, "too short"),
            # NULL text -> no shingles at all -> 0/0 -> frac 0.0
            (103, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hit"], r["contaminated_frac"])
        for r in contamination_report(corpus, ev, k=5).collect()
    }
    assert got[100] == (3, 3, 1.0)
    assert got[101][1] == 0 and got[101][2] == 0.0
    assert got[102] == (1, 0, 0.0)
    assert got[103] == (0, 0, 0.0)


# ---------------------------------------------------------------- epoch shuffle


def test_epoch_shuffle_is_a_permutation_per_epoch(spark):
    from auto_data_tokenize_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = epoch_shuffle(df, n_epochs=2, n_shards=4, seed="s").collect()
    assert len(out) == 400
    for e in (0, 1):
        rows = [r for r in out if r["epoch"] == e]
        # every doc placed exactly once per epoch
        assert sorted(r["doc_id"] for r in rows) == list(range(200))
        # positions are 1..n contiguous within each shard
        for s in range(4):
            pos = sorted(r["position"] for r in rows if r["shard"] == s)
            assert pos == list(range(1, len(pos) + 1))


def test_epoch_shuffle_differs_across_epochs_and_reproduces(spark):
    from auto_data_tokenize_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    a = {
        (r["epoch"], r["doc_id"]): (r["shard"], r["position"])
        for r in epoch_shuffle(df, 2, 8, seed="x").collect()
    }
    b = {
        (r["epoch"], r["doc_id"]): (r["shard"], r["position"])
        for r in epoch_shuffle(df.repartition(13), 2, 8, seed="x").collect()
    }
    assert a == b  # placement depends only on (seed, epoch, id)
    e0 = [a[(0, i)] for i in range(300)]
    e1 = [a[(1, i)] for i in range(300)]
    assert e0 != e1  # different order each epoch
    c = epoch_shuffle(df, 1, 8, seed="y").collect()
    assert {(r["doc_id"],): None for r in c} and any(
        (r["shard"], r["position"]) != a[(0, r["doc_id"])] for r in c
    )  # different seed, different placement


def test_epoch_shuffle_guards(spark):
    import pytest
    from auto_data_tokenize_spark.operators.corpus import epoch_shuffle

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="n_epochs"):
        epoch_shuffle(df, 0, 4)
    with pytest.raises(ValueError, match="n_shards"):
        epoch_shuffle(df, 1, 0)


# ---------------------------------------------------------------- chunking


def test_chunk_documents_windows_and_coverage(spark):
    from auto_data_tokenize_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=8, stride=4).collect(),
        key=lambda r: r["chunk_start"],
    )
    # starts 0 and 4 only: a window at 8 would be contained in window@4
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in rows] == [
        (0, 8),
        (4, 6),
    ]
    assert rows[0]["chunk_text"] == " ".join(f"w{i}" for i in range(8))
    assert rows[1]["chunk_text"] == " ".join(f"w{i}" for i in range(4, 10))
    # every token covered
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(10)}


def test_chunk_documents_short_null_and_blank(spark):
    from auto_data_tokenize_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "   "), (4, "only")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, chunk_tokens=8, stride=4).collect()
    got = {r["doc_id"]: (r["chunk_idx"], r["n_chunk_tokens"]) for r in rows}
    # null/blank -> zero chunks; short docs -> exactly one window
    assert got == {1: (0, 2), 4: (0, 1)}


def test_chunk_documents_guards(spark):
    import pytest
    from auto_data_tokenize_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0, stride=1)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_tokens=4, stride=0)


def test_chunk_documents_disjoint_stride_equals_chunk(spark):
    from auto_data_tokenize_spark.operators.corpus import chunk_documents

    text = " ".join(str(i) for i in range(9))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, stride=4).collect(),
        key=lambda r: r["chunk_start"],
    )
    # disjoint cover: 4 + 4 + 1
    assert [(r["chunk_idx"], r["n_chunk_tokens"]) for r in rows] == [
        (0, 4),
        (1, 4),
        (2, 1),
    ]
    assert " ".join(r["chunk_text"] for r in rows) == text


def test_duckdb_chunk_sql_guards():
    import pytest
    from auto_data_tokenize_spark.operators.corpus import duckdb_chunk_sql

    with pytest.raises(ValueError, match="stride"):
        duckdb_chunk_sql("SELECT 1", chunk_tokens=4, stride=6)
    with pytest.raises(ValueError, match="chunk_tokens"):
        duckdb_chunk_sql("SELECT 1", chunk_tokens=0, stride=1)


def test_source_overlap_exact_jaccard(spark):
    """Hand-computable pair: sources A and B share exactly one distinct
    3-shingle; NULL and blank docs contribute nothing."""
    from auto_data_tokenize_spark.operators.corpus import source_overlap

    df = spark.createDataFrame(
        [
            (1, "a b c d", "A"),      # shingles: "a b c", "b c d"
            (2, "b c d e", "B"),      # shingles: "b c d", "c d e"
            (3, None, "A"),           # no shingles
            (4, "   ", "B"),          # blank -> '' shingle, dropped
            (5, "x y z", "C"),        # one shingle, no overlap
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap(df, k=3).collect()
    }
    assert set(rows) == {("A", "B")}
    r = rows[("A", "B")]
    assert (r["n_common"], r["n_a"], r["n_b"]) == (1, 2, 2)
    assert abs(r["jaccard"] - round(1 / 3, 6)) < 1e-9


def test_source_overlap_matches_duckdb_twin(spark):
    import duckdb

    from auto_data_tokenize_spark.operators.corpus import (
        duckdb_source_overlap_sql,
        source_overlap,
    )

    pdf = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("source", "text")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        map(
            tuple,
            con.execute(
                duckdb_source_overlap_sql("SELECT source, text FROM docs")
            ).fetchall(),
        )
    )
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(map(tuple, source_overlap(df).collect()))
    assert got == want and len(got) > 0


def test_source_overlap_validates_k():
    import pytest as _pytest

    from auto_data_tokenize_spark.operators.corpus import source_overlap

    with _pytest.raises(ValueError, match="k must be"):
        source_overlap(None, k=0)


def test_pack_utilization_exact(spark):
    """Hand-computed layout at target=4: en stream 3+2+4 = 9 tokens ->
    3 sequences, utilization 9/12; doc 2 (offset 3, len 2) straddles
    the 4-boundary, doc 3 (offset 5, len 4) straddles 8 -> 2 split."""
    from auto_data_tokenize_spark.operators.corpus import pack_utilization

    df = spark.createDataFrame(
        [
            (1, "a b c", "en"),
            (2, "d e", "en"),
            (3, "f g h i", "en"),
            (4, None, "de"),  # NULL text: the zero-token branch
        ],
        "doc_id long, text string, lang string",
    )
    rows = {
        r["lang"]: r
        for r in pack_utilization(df, target_tokens=4).collect()
    }
    en = rows["en"]
    assert (en["n_docs"], en["total_tokens"], en["n_seqs"]) == (3, 9, 3)
    assert en["utilization"] == round(9 / 12, 6)
    assert (en["n_docs_split"], en["split_frac"]) == (2, round(2 / 3, 6))
    # all-NULL-text group: SUM over only NULLs is NULL (the shared
    # NULL-text contract, same as the SQL twin); the derived measures
    # fall back to their empty values through the NULL comparisons
    de = rows["de"]
    assert (de["total_tokens"], de["n_seqs"], de["utilization"]) == (
        None, 0, 0.0,
    )
    assert de["n_docs_split"] == 0


def test_pack_utilization_matches_duckdb_twin(spark):
    """Cross-engine on a fuller corpus: Spark vs the SQL twin."""
    import duckdb
    import pandas as pd

    from auto_data_tokenize_spark.operators.corpus import (
        duckdb_pack_utilization_sql,
        pack_utilization,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                " ".join(f"w{j}" for j in range(1 + (7 * i) % 13))
                for i in range(40)
            ],
            "lang": ["en", "de", "fr", "en"] * 10,
        }
    )
    duck = duckdb.connect()
    duck.register("pu_docs", pdf)
    want = (
        duck.execute(duckdb_pack_utilization_sql("pu_docs", target_tokens=8))
        .df()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    got = (
        pack_utilization(spark.createDataFrame(pdf), target_tokens=8)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )

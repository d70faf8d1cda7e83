"""Text-analysis operators: token counts, quality, language ID,
fingerprints."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The cat and the dog are in the house, it is warm."),
        (1, "Der Hund und die Katze sind nicht in dem Haus."),
        (2, "El perro y la gata es que no en una casa."),
        (3, "Le chien et la chatte est dans les maisons pour un an."),
        (4, "xyzzy qwerty plugh"),
        (5, "  "),
        (6, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark, docs):
    out = {r["doc_id"]: r for r in textstats.token_counts(docs).collect()}
    assert out[0]["n_ws_tokens"] == 12
    assert out[0]["n_chars"] == len("The cat and the dog are in the house, it is warm.")
    # BPE-ish: words + comma + period
    assert out[0]["n_bpeish_tokens"] == 14
    assert out[6]["n_ws_tokens"] == 1


def test_quality_gate(spark, docs):
    out = {r["doc_id"]: r["is_quality"] for r in
           textstats.quality_features(docs).collect()}
    assert out[0] is True
    assert out[4] is False   # no stopwords
    assert out[6] is False   # too short


def test_language_id(spark, docs):
    out = {r["doc_id"]: r["pred_lang"] for r in
           textstats.language_id(docs).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "es"
    assert out[3] == "fr"
    assert out[4] == "unknown"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, " HELLO\tWORLD ")],
        "doc_id long, text string",
    )
    fps = [r["fingerprint"] for r in
           textstats.fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]


def test_all_jvm_side_no_python(spark, docs):
    """These operators must stay in whole-stage codegen (no BatchEvalPython
    / ArrowEvalPython in the plan)."""
    for op in (textstats.token_counts, textstats.quality_features,
               textstats.language_id, textstats.fingerprint):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan, op.__name__


def _winnow_python(text, k=8, w=4):
    """Independent pure-Python winnowing (Schleimer et al. fig. 5
    semantics with min-per-window selection) for cross-checking."""
    import hashlib
    import re as _re

    n = " ".join(_re.split(r"\s+", text.strip().lower()))
    grams = [
        int(hashlib.md5(n[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(n) - k + 1)
    ]
    if len(grams) < w:
        return set()
    return {min(grams[j : j + w]) for j in range(len(grams) - w + 1)}


def test_winnowing_matches_pure_python(spark, docs):
    got = {}
    for r in textstats.winnowing_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for r in docs.collect():
        want = _winnow_python(r["text"])
        assert got.get(r["doc_id"], set()) == want, r["doc_id"]


def test_winnowing_overlap_guarantee(spark):
    """Docs sharing a substring of >= w + k - 1 = 11 normalized chars
    must share >= 1 fingerprint (the SIGMOD'03 winnowing guarantee);
    disjoint-alphabet docs share none; sub-k docs yield no rows."""
    shared = "zqxjkvbwpyg"  # 11 chars, appears verbatim in 0 and 1
    df = spark.createDataFrame(
        [
            (0, f"aaaa {shared} bbbb"),
            (1, f"cccc dddd {shared}"),
            (2, "eeee ffff gggg hhhh"),
            (3, "hi"),  # shorter than k -> no fingerprints
        ],
        "doc_id long, text string",
    )
    fps = {}
    for r in textstats.winnowing_fingerprints(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[0] & fps[1]
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    assert 3 not in fps


def test_winnowing_is_jvm_side(spark, docs):
    plan = (
        textstats.winnowing_fingerprints(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_length_quantiles_exact_interpolation(spark):
    """percentile() must interpolate continuously (quantile_cont
    definition): 4 docs of 1/2/3/4 tokens -> p50 = 2.5."""
    df = spark.createDataFrame(
        [(i, "the " * (i + 1)) for i in range(4)], "doc_id long, text string"
    )
    r = textstats.length_quantiles_by_lang(df).collect()
    assert len(r) == 1 and r[0]["pred_lang"] == "en"
    assert r[0]["n_docs"] == 4
    assert r[0]["p25"] == 1.75 and r[0]["p50"] == 2.5 and r[0]["p95"] == 3.85


# -- tfidf_top_terms -------------------------------------------------------


def test_tfidf_top_terms_hand_checked(spark):
    import math

    from auto_data_tokenize_spark.operators.textstats import tfidf_top_terms

    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry date"),
        (3, "egg egg egg apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"], r["rank"])
        for r in tfidf_top_terms(df, k=2).collect()
    }

    def score(tf, dfreq, n=3):
        return round(tf * (math.log((n + 1) / (dfreq + 1)) + 1), 6)

    # doc 1: apple tf=2 df=2, banana tf=1 df=2, cherry tf=1 df=2
    assert got[(1, "apple")] == (2, score(2, 2), 1)
    # banana beats cherry only by the lexicographic tie-break
    assert got[(1, "banana")] == (1, score(1, 2), 2)
    assert (1, "cherry") not in got  # k=2 cut
    # doc 3: egg tf=3 df=1 dominates
    assert got[(3, "egg")] == (3, score(3, 1), 1)
    assert got[(3, "apple")] == (1, score(1, 2), 2)


def test_tfidf_empty_and_whitespace_docs(spark):
    from auto_data_tokenize_spark.operators.textstats import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "only doc with words"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=3).collect()
    # token-less docs emit nothing but still count toward N
    assert {r["doc_id"] for r in out} == {1}
    import math

    assert out[0]["tfidf"] == round(1 * (math.log(4 / 2) + 1), 6)


def test_repetition_stats_known_fracs(spark):
    from auto_data_tokenize_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 2 distinct / 6 words; "a b" bigram x3 of 5
            (2, "u v w x y z"),      # no repetition at all
            (3, "same same same"),   # 1 distinct / 3; "same same" x2 of 2
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    assert got[1]["dup_word_frac"] == round(1 - 2 / 6, 6)
    assert got[1]["top_ngram_frac"] == round(3 / 5, 6)
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_ngram_frac"] == 0.2  # every bigram unique: 1 of 5
    assert got[3]["dup_word_frac"] == round(1 - 1 / 3, 6)
    assert got[3]["top_ngram_frac"] == 1.0


def test_repetition_tiebreak_is_deterministic(spark):
    """Two bigrams tie at the max count: both engines must pick the
    lexicographically greatest — pinned here against the struct-max."""
    from auto_data_tokenize_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [(1, "p q p q z z z")], "doc_id long, text string"
    )
    # bigrams: "p q" x2, "q p" x1, "q z" x1, "z z" x2 -> tie; frac same
    row = repetition_stats(df, n=2).collect()[0]
    assert row["top_ngram_frac"] == round(2 / 6, 6)


def test_null_text_contract_repetition_and_ws_tokens(spark):
    """NULL-text docs vanish from repetition_stats exactly like the
    DuckDB twin's inner join over zero unnested grams (regression:
    Spark fabricated a NULL-gram group with top_ngram_frac=1.0), and
    ws_tokens_expr yields NULL for NULL text regardless of ANSI mode
    (the twin's length(NULL) contract)."""
    df = spark.createDataFrame(
        [(1, None), (2, "a a b")], "doc_id long, text string"
    )
    reps = textstats.repetition_stats(df)
    assert {r["doc_id"] for r in reps.collect()} == {2}
    toks = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in textstats.token_counts(df).collect()
    }
    assert toks[1] is None and toks[2] == 3


def test_baseline_shares_and_drift_batch(spark):
    """Known mixture: baseline 50/25/25 over (en,de,fr); a window
    holding only 'en' docs drifts by |1-0.5| + nothing-for-absent =
    0.5; a window matching the baseline drifts 0. A category missing
    from the baseline contributes its full window share."""
    import datetime as dt

    from auto_data_tokenize_spark.operators.textstats import (
        baseline_shares,
        distribution_drift_monitor,
    )

    t0 = dt.datetime(2026, 1, 1)
    docs = spark.createDataFrame(
        [("en",), ("en",), ("de",), ("fr",)], "lang string"
    )
    base = baseline_shares(docs, "lang")
    assert {
        (r["lang"], r["base_share"]) for r in base.collect()
    } == {("en", 0.5), ("de", 0.25), ("fr", 0.25)}

    stream_like = spark.createDataFrame(
        [
            # minute 0: all-en -> L1 = |1 - 0.5| = 0.5
            ("en", t0), ("en", t0 + dt.timedelta(seconds=10)),
            # minute 1: matches baseline exactly -> 0
            ("en", t0 + dt.timedelta(seconds=60)),
            ("en", t0 + dt.timedelta(seconds=61)),
            ("de", t0 + dt.timedelta(seconds=62)),
            ("fr", t0 + dt.timedelta(seconds=63)),
            # minute 2: unseen category -> |1 - 0| = 1.0
            ("xx", t0 + dt.timedelta(seconds=120)),
        ],
        "lang string, ts timestamp",
    )
    out = {
        r["window_start"].second + r["window_start"].minute * 60: (
            r["n_docs"], r["n_cats"], r["l1_drift"]
        )
        for r in distribution_drift_monitor(
            stream_like, "lang", base, window="1 minute"
        ).collect()
    }
    assert out[0] == (2, 1, 0.5)
    assert out[60] == (4, 3, 0.0)
    assert out[120] == (1, 1, 1.0)


def test_drift_monitor_broadcasts_baseline(spark):
    """The baseline side must broadcast — a shuffle join on the
    category key would serialize the monitor behind a tiny dim."""
    from auto_data_tokenize_spark.operators.textstats import (
        baseline_shares,
        distribution_drift_monitor,
    )

    docs = spark.createDataFrame([("en",), ("de",)], "lang string")
    df = spark.createDataFrame(
        [("en", __import__("datetime").datetime(2026, 1, 1))],
        "lang string, ts timestamp",
    )
    plan = distribution_drift_monitor(
        df, "lang", baseline_shares(docs, "lang")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_drift_monitor_null_category_is_a_real_stratum(spark):
    """A NULL category (language-id failed) carries a baseline share;
    a window reproducing the baseline mix must drift 0, not by the
    NULL stratum's share (null-safe join regression)."""
    import datetime as dt

    from auto_data_tokenize_spark.operators.textstats import (
        baseline_shares,
        distribution_drift_monitor,
    )

    docs = spark.createDataFrame(
        [("en",), ("en",), (None,), (None,)], "lang string"
    )
    base = baseline_shares(docs, "lang")
    assert {
        (r["lang"], r["base_share"]) for r in base.collect()
    } == {("en", 0.5), (None, 0.5)}

    t0 = dt.datetime(2026, 1, 1)
    window_rows = spark.createDataFrame(
        [("en", t0), (None, t0)], "lang string, ts timestamp"
    )
    out = distribution_drift_monitor(
        window_rows, "lang", base, window="1 minute"
    ).collect()
    assert len(out) == 1
    assert (out[0]["n_docs"], out[0]["n_cats"], out[0]["l1_drift"]) == (2, 2, 0.0)


def test_oov_rate_monitor_hand_checked(spark):
    """Vocab = {a, b} (min_df 2 over the corpus slice); a window of
    'a b xx' reports 1/3 OOV; an all-vocab window reports 0."""
    import datetime as dt

    from auto_data_tokenize_spark.operators.textstats import (
        oov_rate_monitor,
        vocab_from_corpus,
    )

    corpus = spark.createDataFrame(
        [("a b",), ("a b",), ("c",)], "text string"
    )
    vocab = vocab_from_corpus(corpus, min_df=2)
    assert {r["token"] for r in vocab.collect()} == {"a", "b"}

    t0 = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [
            ("A b XX", t0),                     # case-folds; xx is OOV
            ("a a b", t0 + dt.timedelta(minutes=1)),
            (None, t0 + dt.timedelta(minutes=1)),  # NULL text: no tokens
        ],
        "text string, ts timestamp",
    )
    out = {
        r["window_start"].minute: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_rate_monitor(df, vocab).collect()
    }
    assert out[0] == (3, 1, round(1 / 3, 6))
    assert out[1] == (3, 0, 0.0)


def test_vocab_min_df_validated(spark):
    import pytest

    from auto_data_tokenize_spark.operators.textstats import vocab_from_corpus

    with pytest.raises(ValueError):
        vocab_from_corpus(
            spark.createDataFrame([("x",)], "text string"), min_df=0
        )


def test_vocab_top_k_truncation_matches_twin(spark):
    """top_k keeps the count-desc, token-asc head on BOTH engines —
    the finite-vocab truncation real tokenizers ship with."""
    import duckdb
    import pandas as pd

    from auto_data_tokenize_spark.operators.textstats import (
        duckdb_vocab_sql,
        vocab_from_corpus,
    )

    pdf = pd.DataFrame({"text": ["a a a b b c", "b c d", "a d"]})
    # counts: a=4, b=3, c=2, d=2 -> top3 = a, b, c (c beats d on tie)
    got = {
        r["token"]
        for r in vocab_from_corpus(
            spark.createDataFrame(pdf), top_k=3
        ).collect()
    }
    duck = duckdb.connect()
    duck.register("vt", pdf)
    want = {r[0] for r in duck.execute(duckdb_vocab_sql("vt", top_k=3)).fetchall()}
    assert got == want == {"a", "b", "c"}


def test_explode_tokens_no_collision_and_keep_guard(spark):
    """The shared explosion projects only requested columns, so caller
    frames carrying their own helper columns (even one named 'token')
    can't collide; asking to keep 'token' itself is rejected."""
    import datetime as dt

    import pytest

    from auto_data_tokenize_spark.operators.textstats import (
        explode_tokens,
        oov_rate_monitor,
        vocab_from_corpus,
    )

    df = spark.createDataFrame(
        [("a b", dt.datetime(2026, 1, 1), "collide", 7)],
        "text string, ts timestamp, token string, _token int",
    )
    out = explode_tokens(df, keep=["ts"])
    assert out.columns == ["ts", "token"]
    assert {r["token"] for r in out.collect()} == {"a", "b"}
    vocab = vocab_from_corpus(spark.createDataFrame([("a",)], "text string"))
    mon = oov_rate_monitor(df, vocab).collect()
    assert (mon[0]["n_tokens"], mon[0]["n_oov"]) == (2, 1)
    with pytest.raises(ValueError):
        explode_tokens(df, keep=["token"])

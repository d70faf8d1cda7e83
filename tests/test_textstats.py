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

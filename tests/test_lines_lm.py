"""Line-level corpus hygiene (lines.py) and the Stupid Backoff n-gram
LM (lm.py): hand-computable goldens, edge cases (empty docs, trailing
newlines, all-lines-removed), and plan shape (no Python nodes)."""

import math

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.lines import (
    c4_clean_lines,
    remove_duplicated_spans,
    remove_repeated_lines,
    repeated_line_hashes,
    split_lines,
)
from auto_data_tokenize_spark.operators.lm import (
    BACKOFF,
    UNSEEN_COUNT,
    score_stupid_backoff,
    train_stupid_backoff,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# lines
# ---------------------------------------------------------------------------


def test_split_lines_keeps_trailing_empties(spark):
    out = split_lines(_docs(spark, [(1, "a\nb\n")])).collect()
    assert [(r.line_idx, r.line) for r in out] == [(0, "a"), (1, "b"), (2, "")]


def test_repeated_line_census_counts_distinct_docs(spark):
    # "x" twice in doc 1 must count once; min_docs=2 needs two DOCS
    docs = _docs(spark, [(1, "x\nx"), (2, "y"), (3, "x\nz")])
    lines = split_lines(docs)
    boiler = {r.line_hash for r in repeated_line_hashes(lines, 2).collect()}
    [xh] = [
        r.h for r in lines.select(F.md5("line").alias("h"), "line")
        .filter("line = 'x'").limit(1).collect()
    ]
    assert boiler == {xh}


def test_remove_repeated_lines_golden(spark):
    docs = _docs(
        spark,
        [
            (1, "boiler\nunique one\nboiler2"),
            (2, "boiler\nunique two\nboiler2"),
            (3, "boiler\nboiler2"),
        ],
    )
    got = {
        r.doc_id: (r.text, r.n_kept, r.n_removed)
        for r in remove_repeated_lines(docs, min_docs=3).collect()
    }
    assert got == {
        1: ("unique one", 1, 2),
        2: ("unique two", 1, 2),
        3: ("", 0, 2),  # fully-boilerplate doc survives with empty text
    }


def test_c4_clean_golden(spark):
    docs = _docs(
        spark,
        [
            (
                1,
                "a good long sentence here.\n"
                "no.\n"  # < 3 words
                "missing terminal punct\n"
                "lorem ipsum dolor sit amet.\n"
                "enable javascript to view.\n"
                "config { x } is set here.",
            )
        ],
    )
    got = c4_clean_lines(docs, min_words=3).collect()[0]
    assert got.text == "a good long sentence here."
    assert (got.n_kept, got.n_removed) == (1, 5)


def test_lines_plan_is_python_free(spark):
    docs = _docs(spark, [(1, "a\nb"), (2, "a\nc")])
    plan = remove_repeated_lines(docs, min_docs=2)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_min_docs_validation(spark):
    with pytest.raises(ValueError, match="min_docs"):
        repeated_line_hashes(split_lines(_docs(spark, [(1, "a")])), 0)


# ---------------------------------------------------------------------------
# duplicated-span removal (ExactSubstr-style)
# ---------------------------------------------------------------------------


def test_span_dedup_golden_by_hand(spark):
    # k=3: docs 1 and 2 share the run "p q r s" → dup 3-windows
    # (p,q,r) and (q,r,s) cover p q r s in both docs; the unique
    # tails survive. doc 3 has no 3-window shared with another doc.
    docs = _docs(
        spark,
        [
            (1, "p q r s alpha beta"),
            (2, "gamma p q r s delta"),
            (3, "p q x y z"),
        ],
    )
    out = {
        r.doc_id: (r.text, r.n_kept, r.n_removed)
        for r in remove_duplicated_spans(docs, k=3).collect()
    }
    assert out[1] == ("alpha beta", 2, 4)
    assert out[2] == ("gamma delta", 2, 4)
    assert out[3] == ("p q x y z", 5, 0)


def test_span_dedup_within_doc_repeat_not_removed(spark):
    # the census counts DISTINCT docs: a span repeated inside ONE doc
    # is not cross-document boilerplate and must survive
    docs = _docs(spark, [(1, "a b c a b c"), (2, "x y z w v u")])
    out = {r.doc_id: r.n_removed for r in
           remove_duplicated_spans(docs, k=3).collect()}
    assert out == {1: 0, 2: 0}


def test_span_dedup_short_and_empty_docs_untouched(spark):
    # docs with < k tokens produce no windows; empty text round-trips
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "")])
    out = {r.doc_id: (r.text, r.n_removed) for r in
           remove_duplicated_spans(docs, k=3).collect()}
    assert out[1] == ("a b", 0)
    assert out[2] == ("a b", 0)
    assert out[3] == ("", 0)


def test_span_dedup_whole_doc_removed(spark):
    # two identical docs of >= k tokens lose every token
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    out = {r.doc_id: (r.text, r.n_kept, r.n_removed) for r in
           remove_duplicated_spans(docs, k=3).collect()}
    assert out[1] == ("", 0, 4)
    assert out[2] == ("", 0, 4)


def test_span_dedup_validation(spark):
    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="k must"):
        remove_duplicated_spans(docs, k=1)
    with pytest.raises(ValueError, match="min_docs"):
        remove_duplicated_spans(docs, min_docs=1)


def test_span_dedup_plan_is_python_free(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
    plan = (
        remove_duplicated_spans(docs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# lm
# ---------------------------------------------------------------------------


def test_lm_counts_golden(spark):
    docs = _docs(spark, [(1, "a b a b c"), (2, "a b")])
    lm = train_stupid_backoff(docs)
    uni = {r.gram: r.cnt for r in lm.uni.collect()}
    bi = {r.gram: r.cnt for r in lm.bi.collect()}
    tri = {r.gram: r.cnt for r in lm.tri.collect()}
    assert uni == {"a": 3, "b": 3, "c": 1}
    assert bi == {"a b": 3, "b a": 1, "b c": 1}
    assert tri == {"a b a": 1, "b a b": 1, "a b c": 1}
    assert lm.total.collect()[0].total == 7


def test_lm_min_count_prunes(spark):
    docs = _docs(spark, [(1, "a b a b c")])
    lm = train_stupid_backoff(docs, min_count=2)
    assert {r.gram for r in lm.uni.collect()} == {"a", "b"}
    assert {r.gram for r in lm.bi.collect()} == {"a b"}
    assert lm.tri.count() == 0
    with pytest.raises(ValueError, match="min_count"):
        train_stupid_backoff(docs, min_count=0)


def test_lm_score_golden_by_hand(spark):
    """Score 'a b c' with the model trained on it: pos0 unigram
    1/3, pos1 bigram 1/1, pos2 trigram 1/1 — all hits, no penalty."""
    docs = _docs(spark, [(1, "a b c")])
    lm = train_stupid_backoff(docs)
    r = score_stupid_backoff(docs, lm).collect()[0]
    assert (r.n_tokens, r.n_hit3, r.n_hit2, r.n_hit1) == (3, 1, 1, 1)
    expected = (
        round(math.log(1 / 3), 6) + round(math.log(1.0), 6) + round(math.log(1.0), 6)
    ) / 3
    assert r.avg_logp == pytest.approx(round(expected, 4), abs=1e-4)


def test_lm_score_backoff_and_unseen(spark):
    """Score 'b a' + OOV 'q' against a model of 'a b': 'b a' backs
    off (bigram 'b a' unseen -> 0.4 * unigram), 'q' takes the
    half-count unseen path."""
    train = _docs(spark, [(1, "a b")])
    lm = train_stupid_backoff(train)
    got = {
        r.doc_id: r
        for r in score_stupid_backoff(
            _docs(spark, [(2, "b a"), (3, "q")]), lm
        ).collect()
    }
    r2 = got[2]
    assert (r2.n_hit3, r2.n_hit2, r2.n_hit1) == (0, 0, 2)
    # pos0: uni b = 1/2 (no penalty); pos1: backoff from bigram ->
    # 0.4 * uni a = 0.4 * 1/2
    exp2 = (
        round(math.log(0.5), 6) + round(math.log(BACKOFF * 0.5), 6)
    ) / 2
    assert r2.avg_logp == pytest.approx(round(exp2, 4), abs=1e-4)
    r3 = got[3]
    assert (r3.n_hit3, r3.n_hit2, r3.n_hit1) == (0, 0, 1)
    assert r3.avg_logp == pytest.approx(
        round(round(math.log(UNSEEN_COUNT / 2), 6), 4), abs=1e-4
    )


def test_lm_plan_is_python_free(spark):
    docs = _docs(spark, [(1, "a b c d"), (2, "b c d e")])
    lm = train_stupid_backoff(docs)
    plan = score_stupid_backoff(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan

"""Distributed BPE training/application (operators/bpe.py)."""

import pytest

from auto_data_tokenize_spark.operators.bpe import (
    END_OF_WORD,
    apply_bpe,
    train_bpe,
    train_bpe_golden,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )


def test_train_matches_pure_python_golden(docs):
    got = [
        (r.rank, r.left, r.right)
        for r in train_bpe(docs, n_merges=12).orderBy("rank").collect()
    ]
    want = train_bpe_golden(CORPUS, n_merges=12)
    assert got == want
    assert len(got) > 0


def test_first_merges_hand_checked(docs):
    """(e,w) dominates: lower x2 + newest x6 + new x2 = 10; then the
    merged 'ew' pairs with its 'n' prefix (newest + new), then low."""
    got = [
        (r.left, r.right)
        for r in train_bpe(docs, n_merges=3).orderBy("rank").collect()
    ]
    assert got == [("e", "w"), ("n", "ew"), ("l", "o")]


def test_adjacent_double_merge_in_one_round(spark):
    """[a, a, a, a] must merge BOTH (a,a) pairs in the round that
    picks (a,a) — the greedy-left list semantics the sentinel-wrapped
    replace() reproduces. Observable in round 2: (aa,</w>) beats
    (aa,aa) only on the lexicographic tie at count 2, which requires
    the word to have become [aa, aa, </w>]."""
    texts = ["aaaa aaaa"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id int, text string")
    got = [
        (r.rank, r.left, r.right)
        for r in train_bpe(df, n_merges=2).orderBy("rank").collect()
    ]
    assert got == train_bpe_golden(texts, n_merges=2)
    assert got == [(0, "a", "a"), (1, "aa", END_OF_WORD)]
    # the apply path shares the greedy-left contract
    enc = apply_bpe(df, [("a", "a")]).collect()[0].bpe_tokens
    assert enc == ["aa", "aa", END_OF_WORD] * 2


def test_early_stop_when_nothing_repeats(spark):
    df = spark.createDataFrame([(0, "xy")], "doc_id int, text string")
    # the one word has freq 1 -> no pair reaches count 2 -> no merges
    assert train_bpe(df, n_merges=5).count() == 0


def test_train_validates(docs):
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(docs, n_merges=0)


def test_apply_bpe_roundtrip_consistency(docs):
    merges = [
        (r.left, r.right)
        for r in train_bpe(docs, n_merges=12).orderBy("rank").collect()
    ]
    out = {
        r.doc_id: r.bpe_tokens
        for r in apply_bpe(docs, merges).collect()
    }
    # every word ends with a token carrying </w>; re-joining tokens
    # and stripping </w> reconstructs the original text
    for i, text in enumerate(CORPUS):
        toks = out[i]
        rebuilt = "".join(toks).replace(END_OF_WORD, " ").strip()
        assert rebuilt == text
    # the dominant word 'newest' should encode compactly
    newest = apply_bpe(
        docs.limit(0).sparkSession.createDataFrame(
            [(0, "newest")], "doc_id int, text string"
        ),
        merges,
    ).collect()[0].bpe_tokens
    assert len(newest) < len("newest") + 1


def test_apply_bpe_empty_and_null(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, None), (2, "ab")], "doc_id int, text string"
    )
    out = {r.doc_id: r.bpe_tokens for r in apply_bpe(df, [("a", "b")]).collect()}
    assert out[0] == []
    assert out[1] == []
    assert out[2] == ["ab", END_OF_WORD]


def test_unicode_whitespace_pinned_to_ascii_class(spark):
    """NBSP (and any other UNICODE-only whitespace) is NOT a word
    boundary: Java \\s is the ASCII class, so the Spark word table
    keeps 'foo\\u00a0bar' whole — the Python golden and encoders must
    match (regression: str.split() split it, so goldens disagreed
    with the Spark-trained merges on scraped-HTML corpora)."""
    from auto_data_tokenize_spark.operators.bpe import encode_text

    texts = ["foo\u00a0bar foo\u00a0bar", "foo\u00a0bar baz baz"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(docs, n_merges=6).orderBy("rank").collect()
    ]
    golden = [(l, r) for _, l, r in train_bpe_golden(texts, n_merges=6)]
    assert merges == golden
    # the NBSP word is ONE word on both paths: its encode reassembles
    # to the full word + end-of-word, never split at the NBSP
    toks = encode_text("foo\u00a0bar", merges)
    assert "".join(toks) == "foo\u00a0bar" + END_OF_WORD
    applied = apply_bpe(docs, merges).orderBy("doc_id").collect()
    assert list(applied[0]["bpe_tokens"]) == encode_text(texts[0], merges)

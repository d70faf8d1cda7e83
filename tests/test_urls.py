"""URL hygiene (operators/urls.py): canonicalization cases by hand,
dedup/blocklist/cap goldens, DuckDB twin lock-step, and plan shape."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.urls import (
    blocklist_filter,
    canonical_url_expr,
    domain_cap,
    domain_expr,
    duckdb_canonical_url_sql,
    duckdb_url_pipeline_sql,
    url_dedup,
    url_pipeline,
)

CASES = [
    # (raw, canonical)
    ("https://example.com/a", "https://example.com/a"),
    ("HTTPS://WWW.Example.COM/a", "https://example.com/a"),
    ("https://example.com/a/", "https://example.com/a"),
    ("https://example.com/", "https://example.com/"),  # root slash kept
    ("https://example.com/a#frag", "https://example.com/a"),
    (
        "https://example.com/a?utm_source=x&id=7",
        "https://example.com/a?id=7",
    ),
    (
        "https://example.com/a?b=2&a=1",
        "https://example.com/a?a=1&b=2",  # params sorted
    ),
    (
        "https://example.com/a?gclid=z&fbclid=y&ref=t&utm_campaign=c",
        "https://example.com/a",  # all tracking -> no query
    ),
    ("http://sub.www.example.com/x", "http://sub.www.example.com/x"),
    # only a LEADING www. strips
]


def _pages(spark, urls):
    return spark.createDataFrame(
        [(i, u, 10 + i) for i, u in enumerate(urls)],
        "doc_id long, url string, n_chars long",
    )


def test_canonicalization_cases(spark):
    df = _pages(spark, [c[0] for c in CASES]).select(
        "doc_id", canonical_url_expr().alias("c")
    )
    got = {r.doc_id: r.c for r in df.collect()}
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_canonicalization_matches_duckdb(spark):
    pdf = pd.DataFrame({"url": [c[0] for c in CASES]})
    con = duckdb.connect()
    con.register("u", pdf)
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {duckdb_canonical_url_sql('url')} FROM u"
        ).fetchall()
    ]
    assert duck == [c[1] for c in CASES]


def test_url_dedup_min_id_wins(spark):
    pages = _pages(
        spark,
        [
            "https://www.a.com/x?utm_source=1",
            "https://A.com/x/",
            "https://a.com/y",
        ],
    )
    out = {r.canon_url: (r.keep_id, r.n_crawls) for r in
           url_dedup(pages).collect()}
    assert out == {
        "https://a.com/x": (0, 2),
        "https://a.com/y": (2, 1),
    }


def test_blocklist_and_cap(spark):
    pages = _pages(
        spark,
        [f"https://blocked.com/{i}" for i in range(3)]
        + [f"https://ok.com/{i}" for i in range(4)],
    )
    blocked = spark.createDataFrame([("blocked.com",)], "domain string")
    left = blocklist_filter(pages, blocked)
    assert {r.domain for r in left.collect()} == {"ok.com"}
    # cap 2 by n_chars desc (higher doc_id has higher n_chars)
    capped = domain_cap(left, n=2, order_col="n_chars")
    assert sorted(r.doc_id for r in capped.collect()) == [5, 6]
    with pytest.raises(ValueError, match="n must"):
        domain_cap(pages, n=0, order_col="n_chars")


def test_pipeline_matches_duckdb_twin(spark):
    urls = [
        "https://www.a.com/p?utm_source=s&id=1",
        "https://A.com/p/?id=1",          # same canon as above
        "https://a.com/q",
        "https://bad.com/r",
        "https://b.com/s1", "https://b.com/s2", "https://b.com/s3",
    ]
    pages = _pages(spark, urls)
    blocked_df = spark.createDataFrame([("bad.com",)], "domain string")
    got = (
        url_pipeline(pages, blocked_df, cap_n=2, order_col="n_chars")
        .orderBy("canon_url")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    want = (
        con.sql(duckdb_url_pipeline_sql(
            "SELECT * FROM pages", ("bad.com",), 2, "n_chars"))
        .df()
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)


def test_pipeline_plan_is_python_free(spark):
    pages = _pages(spark, ["https://a.com/x", "https://a.com/y"])
    blocked = spark.createDataFrame([("z.com",)], "domain string")
    plan = (
        url_pipeline(pages, blocked, cap_n=1, order_col="n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_fragment_question_mark_is_not_query(spark):
    """RFC 3986 §3.5: a '?' after '#' is fragment content — it must
    not leak into the canonical query (regression: _QUERY_RE once
    matched the FIRST '?' anywhere, re-attaching fragment text as a
    query and splitting the dedup group for the same page)."""
    cases = [
        ("http://example.com/page#section?x=1", "http://example.com/page"),
        ("http://example.com/page?a=1#sec?x=2",
         "http://example.com/page?a=1"),
    ]
    df = _pages(spark, [c[0] for c in cases]).select(
        "doc_id", canonical_url_expr().alias("c")
    )
    got = {r.doc_id: r.c for r in df.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"
    con = duckdb.connect()
    con.register("u", pd.DataFrame({"url": [c[0] for c in cases]}))
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {duckdb_canonical_url_sql('url')} FROM u"
        ).fetchall()
    ]
    assert duck == [c[1] for c in cases]


def test_empty_blocklist_twin_is_noop(spark):
    """An empty blocklist keeps EVERY row in both engines — including
    the ''-domain degenerate a malformed URL canonicalizes to
    (regression: the twin rendered NOT IN ('') and silently dropped
    it). Quote-bearing domains must render as doubled-quote SQL
    literals."""
    pages = _pages(spark, ["https://a.com/x", "not-a-url"])
    empty = spark.createDataFrame([], "domain string")
    got = (
        url_pipeline(pages, empty, cap_n=5, order_col="n_chars")
        .orderBy("canon_url")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("pages", pages.toPandas())
    want = (
        con.sql(duckdb_url_pipeline_sql("SELECT * FROM pages", (), 5,
                                        "n_chars"))
        .df()
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns], check_dtype=False)
    assert len(got) == 2  # the malformed ''-domain row survives too
    sql = duckdb_url_pipeline_sql("SELECT 1", ("o'brien.com",), 1, "n")
    assert "o''brien.com" in sql


def test_domain_curation_report_by_hand(spark):
    from auto_data_tokenize_spark.operators.urls import (
        domain_curation_report,
    )

    q_text = "the cat and the dog were there, honestly quite often."
    pages = spark.createDataFrame(
        [
            (1, "https://a.com/1", q_text),       # quality
            (2, "https://WWW.A.com/2", "tiny"),   # not quality, same domain
            (3, "https://b.com/1", q_text),       # quality
        ],
        "doc_id long, url string, text string",
    )
    got = {
        r["domain"]: (
            r["n_pages"], r["n_quality"], r["quality_rate"], r["n_tokens"]
        )
        for r in domain_curation_report(pages).collect()
    }
    n_tok = len(q_text.split())
    assert got["a.com"] == (2, 1, 0.5, n_tok + 1)
    assert got["b.com"] == (3 - 2, 1, 1.0, n_tok)

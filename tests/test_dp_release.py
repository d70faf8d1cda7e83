"""Differentially-private release (operators/risk.py dp_histogram /
dp_histogram_monitor) and incremental dataset-card maintenance
(operators/textstats.py merge_dataset_reports).

The DP noise contract is fully deterministic — a public inverse-CDF
Laplace transform of the one cross-engine md5 fragment — so every test
here checks EXACT values (a hand-computed draw, a DuckDB twin, batch
window semantics), plus distribution-shape sanity over many keys.
"""

from __future__ import annotations

import datetime
import hashlib
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators import risk
from auto_data_tokenize_spark.operators.textstats import (
    dataset_report,
    dataset_report_partial,
    merge_dataset_reports,
    merge_report_partials,
)


def expected_laplace(key: str, b: float) -> float:
    """Reference implementation of the documented draw."""
    u32 = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    u = (u32 + 0.5) / 2**32
    v = u - 0.5
    return -b * math.copysign(1.0, v) * math.log(1.0 - 2.0 * abs(v))


def test_dp_histogram_exact_single_key(spark):
    """The released value IS true_count + the documented draw."""
    df = spark.createDataFrame([("a",)] * 7, "src string")
    row = risk.dp_histogram(
        df, ["src"], epsilon=0.5, seed="s1", sensitivity=1.0
    ).collect()[0]
    want = round(7 + expected_laplace("s1\x1fa", 1.0 / 0.5), 6)
    assert row.noisy_count == pytest.approx(want, abs=1e-9)
    assert row.released_count == max(0, round(row.noisy_count))


def test_dp_histogram_deterministic_and_shape(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", None), ("b", "y")],
        "src string, lang string",
    )
    out1 = risk.dp_histogram(df, ["src", "lang"], epsilon=1.0)
    out2 = risk.dp_histogram(df, ["src", "lang"], epsilon=1.0)
    assert out1.columns == [
        "src", "lang", "noisy_count", "released_count"
    ]
    r1 = sorted(map(tuple, out1.collect()), key=repr)
    assert r1 == sorted(map(tuple, out2.collect()), key=repr)
    assert len(r1) == 3  # (a,x), (b,NULL), (b,y) — NULL is a category
    assert all(r[3] >= 0 for r in r1)
    # different seeds -> different draws (overwhelmingly)
    r3 = sorted(
        map(tuple, risk.dp_histogram(df, ["src", "lang"], seed="other").collect()),
        key=repr,
    )
    assert r3 != r1


def test_dp_histogram_distribution_shape(spark):
    """Across many categories the draws look Laplace(b): symmetric,
    median |noise| near b*ln2 (the Laplace MAD)."""
    b = 2.0
    df = spark.range(2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("cat")
    )
    rows = risk.dp_histogram(
        df, ["cat"], epsilon=1.0 / b, sensitivity=1.0
    ).collect()
    noises = sorted(r.noisy_count - 1 for r in rows)  # every true count is 1
    n = len(noises)
    med_abs = sorted(abs(x) for x in noises)[n // 2]
    assert med_abs == pytest.approx(b * math.log(2), rel=0.15)
    pos = sum(1 for x in noises if x > 0)
    assert 0.45 < pos / n < 0.55


def test_dp_histogram_duckdb_twin(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "src": ["a", "a", "b", "b", "b", None],
            "lang": ["en", "en", "de", None, "de", "en"],
        }
    )
    df = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))
    got = {
        tuple(r[:2]): (r.noisy_count, r.released_count)
        for r in risk.dp_histogram(
            df, ["src", "lang"], epsilon=0.7, seed="tw"
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    sql = risk.duckdb_dp_histogram_sql(
        "t", ["src", "lang"], epsilon=0.7, seed="tw"
    )
    want = {
        (r[0], r[1]): (r[2], r[3]) for r in con.execute(sql).fetchall()
    }
    assert got == want


def test_dp_monitor_batch_windows_and_twin(spark):
    """Batch semantics of the windowed release + the DuckDB twin: the
    same category in different windows gets an INDEPENDENT draw."""
    import pandas as pd

    rows = [
        ("a", datetime.datetime(2026, 1, 1, 10, 0, 5)),
        ("a", datetime.datetime(2026, 1, 1, 10, 0, 25)),
        ("b", datetime.datetime(2026, 1, 1, 10, 0, 45)),
        ("a", datetime.datetime(2026, 1, 1, 10, 1, 5)),
    ]
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    out = risk.dp_histogram_monitor(
        df, ["src"], window="1 minute", epsilon=1.0, seed="m1"
    )
    got = {
        (r.window_start, r.src): (r.noisy_count, r.released_count)
        for r in out.collect()
    }
    assert len(got) == 3
    # same category, different windows -> different noise
    w0 = datetime.datetime(2026, 1, 1, 10, 0)
    w1 = datetime.datetime(2026, 1, 1, 10, 1)
    assert got[(w0, "a")][0] - 2 != pytest.approx(got[(w1, "a")][0] - 1)

    pdf = pd.DataFrame(rows, columns=["src", "ts"])
    con = duckdb.connect()
    con.register("t", pdf)
    sql = risk.duckdb_dp_histogram_monitor_sql(
        "t", ["src"], epsilon=1.0, seed="m1"
    )
    want = {
        (r[0], r[2]): (r[3], r[4]) for r in con.execute(sql).fetchall()
    }
    assert {(k[0], k[1]): v for k, v in got.items()} == want


def test_dp_validation(spark):
    df = spark.createDataFrame([("a",)], "src string")
    with pytest.raises(ValueError, match="epsilon"):
        risk.dp_histogram(df, ["src"], epsilon=0.0)
    with pytest.raises(ValueError, match="sensitivity"):
        risk.dp_histogram(df, ["src"], sensitivity=-1.0)
    with pytest.raises(ValueError, match="not in DataFrame"):
        risk.dp_histogram(df, ["nope"])
    with pytest.raises(ValueError, match="epsilon"):
        risk.duckdb_dp_histogram_sql("t", ["src"], epsilon=-2.0)


def test_dp_histogram_plan_is_jvm_only(spark):
    """100 TB contract: one partial-agg groupBy, noise as pure codegen
    — no Python stage anywhere in the plan."""
    df = spark.createDataFrame([("a",)], "src string")
    plan = risk.dp_histogram(df, ["src"])._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, plan
    assert "partial_count" in plan.lower() or "HashAggregate" in plan


def test_merge_dataset_reports_equals_full_recompute(spark):
    """partial(base) + partial(delta) merged == one-shot full report,
    bit-for-bit — including NULL-text documents (counted in n_docs,
    excluded from the mean's denominator: the case a card-only merge
    gets wrong) and a group present in only one slice."""
    rows = [
        (1, "one two three", "en", "web"),
        (2, "four five", "en", "web"),
        (3, "sechs", "de", "web"),
        (4, "sept huit neuf dix", "fr", "books"),
        (5, "eleven twelve", "en", "web"),
        (6, "treize", "fr", "books"),
        (7, None, "en", "web"),  # NULL text in base slice
        (9, None, "en", "web"),  # NULL text in delta slice
        (10, None, "xx", "web"),  # all-NULL-text group
        (12, None, "xx", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    base = df.filter(F.col("doc_id") % 3 != 0)
    delta = df.filter(F.col("doc_id") % 3 == 0)
    merged = merge_dataset_reports(
        dataset_report_partial(base), dataset_report_partial(delta)
    )
    full = dataset_report(df)
    assert merged.columns == full.columns
    key = lambda r: (r[0], r[1])  # noqa: E731
    m = {key(r): tuple(r) for r in merged.collect()}
    f = {key(r): tuple(r) for r in full.collect()}
    assert m == f
    # the NULL-text docs really exercise the distinct denominators
    en = f[("en", "web")]
    # n_docs counts the NULL-text docs; avg divides by the 3 docs WITH
    # text (tokens 3+2+2=7), not by 5
    assert en[2] == 5 and en[5] == pytest.approx(round(7 / 3, 6))
    assert f[("xx", "web")][5] is None  # all-NULL group: NULL mean
    # single-partial merge is the identity; partial merge is closed
    part = dataset_report_partial(df)
    solo = {key(r): tuple(r) for r in merge_dataset_reports(part).collect()}
    assert solo == f
    twice = merge_report_partials(
        merge_report_partials(dataset_report_partial(base)),
        dataset_report_partial(delta),
    )
    assert {
        key(r): tuple(r) for r in merge_dataset_reports(twice).collect()
    } == f


def test_merge_dataset_reports_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        merge_dataset_reports()
    df = spark.createDataFrame([("en", "web", 1)], "lang string, source string, n_docs long")
    with pytest.raises(ValueError, match="missing columns"):
        merge_dataset_reports(df)
    # extra columns are projected away, not a unionByName crash
    p = dataset_report_partial(
        spark.createDataFrame(
            [(1, "a b", "en", "web")],
            "doc_id long, text string, lang string, source string",
        )
    )
    out = merge_dataset_reports(p.withColumn("extra", F.lit(1)), p)
    assert out.columns[:2] == ["lang", "source"]
    assert out.collect()[0].n_docs == 2


def test_dp_histogram_public_domain(spark):
    """With a public domain: absent categories release noisy zeros,
    out-of-domain data categories are dropped, NULL domain categories
    match NULL data groups (null-safe join)."""
    df = spark.createDataFrame(
        [("a",), ("a",), ("z",), (None,)], "src string"
    )
    dom = spark.createDataFrame(
        [("a",), ("b",), (None,)], "src string"
    )
    rows = {
        r.src: r
        for r in risk.dp_histogram(
            df, ["src"], epsilon=0.5, seed="d1", domain=dom
        ).collect()
    }
    assert set(rows) == {"a", "b", None}  # 'z' dropped, 'b' noisy zero
    b = 1.0 / 0.5
    assert rows["b"].noisy_count == pytest.approx(
        round(0 + expected_laplace("d1\x1fb", b), 6), abs=1e-9
    )
    assert rows[None].noisy_count == pytest.approx(
        round(1 + expected_laplace("d1\x1f\x1e", b), 6), abs=1e-9
    )
    assert all(r.released_count >= 0 for r in rows.values())


def test_dp_monitor_subsecond_windows_independent(spark):
    """Sub-second windows must get distinct draws (the noise key is
    the window-start epoch MICROsecond, not second)."""
    rows = [
        ("a", datetime.datetime(2026, 1, 1, 10, 0, 0, 100_000)),
        ("a", datetime.datetime(2026, 1, 1, 10, 0, 0, 600_000)),
    ]
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    out = risk.dp_histogram_monitor(
        df, ["src"], window="500 milliseconds", epsilon=1.0, seed="sub"
    ).collect()
    assert len(out) == 2
    noises = {r.noisy_count - 1 for r in out}  # true count 1 in each
    assert len(noises) == 2

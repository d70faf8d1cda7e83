"""asof_join: latest right row at-or-before each left row, per key."""

import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.asof import asof_join


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.col("s").cast("timestamp")).drop("s")


@pytest.fixture(scope="module")
def quotes(spark):
    return _ts(
        spark,
        [
            ("A", "2026-01-01 00:00:00", 1.0),
            ("A", "2026-01-01 00:05:00", 2.0),
            ("A", "2026-01-01 00:10:00", 3.0),
            ("B", "2026-01-01 00:07:00", 9.0),
        ],
        "k string, s string, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return _ts(
        spark,
        [
            ("A", "2026-01-01 00:04:59", 10),  # before 2nd quote -> px 1.0
            ("A", "2026-01-01 00:05:00", 20),  # tie -> at-or-before -> px 2.0
            ("A", "2026-01-01 00:20:00", 30),  # after all -> px 3.0
            ("B", "2026-01-01 00:01:00", 40),  # before any B quote -> no match
            ("C", "2026-01-01 00:01:00", 50),  # key with no right rows
        ],
        "k string, s string, qty int",
    )


def test_asof_inner_semantics(spark, quotes, trades):
    out = asof_join(trades, quotes, on="k").collect()
    got = {(r["k"], r["qty"]): (str(r["ts_asof"]), r["px_asof"]) for r in out}
    assert got == {
        ("A", 10): ("2026-01-01 00:00:00", 1.0),
        ("A", 20): ("2026-01-01 00:05:00", 2.0),  # tie matches
        ("A", 30): ("2026-01-01 00:10:00", 3.0),
    }


def test_asof_left_keeps_unmatched(spark, quotes, trades):
    out = asof_join(trades, quotes, on="k", how="left").collect()
    assert len(out) == 5
    unmatched = {r["qty"] for r in out if r["ts_asof"] is None}
    assert unmatched == {40, 50}


def test_asof_matches_duckdb_native(spark, quotes, trades):
    """The composition must agree with DuckDB's native ASOF JOIN on
    the same data — the basis for q33's oracle."""
    import duckdb

    con = duckdb.connect()
    con.register("t", trades.toPandas())
    con.register("q", quotes.toPandas())
    want = {
        (r[0], r[1], str(r[2]), r[3])
        for r in con.execute(
            "SELECT t.k, t.qty, q.ts, q.px FROM t ASOF JOIN q"
            " ON t.k = q.k AND t.ts >= q.ts"
        ).fetchall()
    }
    got = {
        (r["k"], r["qty"], str(r["ts_asof"]), r["px_asof"])
        for r in asof_join(trades, quotes, on="k").collect()
    }
    assert got == want


def test_asof_single_shuffle(spark, quotes, trades):
    """One exchange on the key — the union-window composition must not
    shuffle both sides separately like a range join would."""
    plan = (
        asof_join(trades, quotes, on="k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_right_tiebreak_deterministic(spark):
    """Two right rows at the same (key, ts): the carried tiebreak
    column decides (largest wins), making the result run-stable."""
    right = _ts(
        spark,
        [
            ("A", "2026-01-01 00:00:00", 1.0),
            ("A", "2026-01-01 00:00:00", 2.0),
        ],
        "k string, s string, px double",
    )
    left = _ts(spark, [("A", "2026-01-01 00:01:00", 1)], "k string, s string, qty int")
    out = asof_join(
        left, right, on="k", right_tiebreak="px"
    ).collect()
    assert len(out) == 1 and out[0]["px_asof"] == 2.0
    with pytest.raises(ValueError, match="carried"):
        asof_join(left, right, on="k", right_cols=[], right_tiebreak="px")


def test_asof_null_field_does_not_splice_older_row(spark):
    """Regression: a NULL in a carried column of the matched right row
    must stay NULL — not get back-filled from an older right row
    (per-column fills would fabricate a row that never existed)."""
    right = _ts(
        spark,
        [
            ("u", "2026-01-01 00:00:05", "B", "x"),
            ("u", "2026-01-01 00:00:10", "A", None),
        ],
        "k string, s string, vid string, referrer string",
    )
    left = _ts(spark, [("u", "2026-01-01 00:00:12", 1)], "k string, s string, qty int")
    out = asof_join(left, right, on="k").collect()
    assert len(out) == 1
    r = out[0]
    assert r["vid_asof"] == "A" and r["referrer_asof"] is None


def test_asof_ignores_null_right_timestamps(spark):
    right = _ts(
        spark,
        [("u", None, 9.0), ("u", "2026-01-01 00:00:05", 1.0)],
        "k string, s string, px double",
    )
    left = _ts(spark, [("u", "2026-01-01 00:00:01", 1)], "k string, s string, qty int")
    out = asof_join(left, right, on="k", how="left").collect()
    # the only timestamped right row is AFTER the left row -> no match;
    # the null-ts row must not donate its fields
    assert len(out) == 1 and out[0]["px_asof"] is None


def test_asof_rejects_internal_name_collisions(spark):
    left = _ts(
        spark,
        [("u", "2026-01-01 00:00:01", 0)],
        "k string, s string, _ats int",
    )
    right = _ts(
        spark, [("u", "2026-01-01 00:00:00", 1.0)], "k string, s string, px double"
    )
    with pytest.raises(ValueError, match="internals"):
        asof_join(left, right, on="k")


def test_asof_rejects_output_suffix_collisions(spark):
    left = _ts(
        spark,
        [("u", "2026-01-01 00:00:01", 0)],
        "k string, s string, px_asof int",
    )
    right = _ts(
        spark, [("u", "2026-01-01 00:00:00", 1.0)], "k string, s string, px double"
    )
    with pytest.raises(ValueError, match="suffix"):
        asof_join(left, right, on="k")


def test_asof_rejects_negative_tolerance(spark):
    # pandas merge_asof parity: a negative tolerance raises instead of
    # silently nulling every match
    left = _ts(spark, [("u", "2026-01-01 00:00:01", 0)], "k string, s string, x int")
    right = _ts(
        spark, [("u", "2026-01-01 00:00:00", 1.0)], "k string, s string, px double"
    )
    with pytest.raises(ValueError, match="tolerance"):
        asof_join(left, right, on="k", tolerance=-1.0)


# -- range_join ----------------------------------------------------------------


def test_range_join_matches_naive(spark):
    """Binned plan == naive join+filter, including boundary inclusivity
    on both ends and bin-crossing windows."""
    from auto_data_tokenize_spark.operators.asof import range_join

    left = _ts(
        spark,
        [("u", "2026-01-01 01:00:00", 1), ("u", "2026-01-01 02:30:00", 2),
         ("v", "2026-01-01 01:00:00", 3)],
        "k string, s string, lid int",
    )
    right = _ts(
        spark,
        [("u", "2026-01-01 00:00:00", 10),   # exactly lower bound of lid=1
         ("u", "2026-01-01 00:59:59", 11),
         ("u", "2026-01-01 01:00:00", 12),   # exactly upper bound of lid=1
         ("u", "2026-01-01 01:35:00", 13),   # inside lid=2's window
         ("u", "2026-01-01 02:31:00", 14),   # after everything
         ("v", "2026-01-01 00:30:00", 15),
         ("w", "2026-01-01 01:00:00", 16)],  # key with no left rows
        "k string, s string, rid int",
    )
    got = {
        (r["lid"], r["rid_r"])
        for r in range_join(left, right, on="k", lower_s=-3600, upper_s=0).collect()
    }
    naive = (
        left.join(right.withColumnRenamed("ts", "rts").withColumnRenamed("rid", "rid_r"), "k")
        .filter("rts >= ts - INTERVAL 1 HOUR AND rts <= ts")
    )
    want = {(r["lid"], r["rid_r"]) for r in naive.collect()}
    assert got == want
    assert (1, 10) in got and (1, 12) in got and (2, 13) in got
    assert all(rid != 14 and rid != 16 for _, rid in got)


def test_range_join_plan_bins_candidates(spark):
    """The join keys must include the bin column — the structural
    bound that keeps hot-key candidates at temporal-locality size."""
    from auto_data_tokenize_spark.operators.asof import range_join

    left = _ts(spark, [("u", "2026-01-01 01:00:00", 1)], "k string, s string, lid int")
    right = _ts(spark, [("u", "2026-01-01 00:30:00", 2)], "k string, s string, rid int")
    plan = (
        range_join(left, right, on="k", lower_s=-3600, upper_s=0)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "_bin" in plan


def test_range_join_rejects_empty_window(spark):
    import pytest as _pytest

    from auto_data_tokenize_spark.operators.asof import range_join

    left = _ts(spark, [("u", "2026-01-01 01:00:00", 1)], "k string, s string, lid int")
    with _pytest.raises(ValueError, match="upper_s"):
        range_join(left, left, on="k", lower_s=0, upper_s=0)


def test_range_join_rejects_collisions(spark):
    from auto_data_tokenize_spark.operators.asof import range_join

    left = _ts(spark, [("u", "2026-01-01 01:00:00", 1)], "k string, s string, _bin int")
    right = _ts(spark, [("u", "2026-01-01 00:30:00", 2)], "k string, s string, rid int")
    with pytest.raises(ValueError, match="_bin"):
        range_join(left, right, on="k", lower_s=-3600, upper_s=0)

    left2 = _ts(spark, [("u", "2026-01-01 01:00:00", 1)], "k string, s string, rid_r int")
    with pytest.raises(ValueError, match="suffix"):
        range_join(left2, right, on="k", lower_s=-3600, upper_s=0)


def test_asof_forward_and_tolerance_match_pandas(spark):
    """Cross-check direction/tolerance against pandas merge_asof (an
    independent reference implementation) on numeric timestamps."""
    import pandas as pd

    from auto_data_tokenize_spark.operators.asof import asof_join

    left_pd = pd.DataFrame(
        {"k": [1, 1, 1, 2, 2], "ts": [10.0, 20.0, 35.0, 5.0, 50.0]}
    ).sort_values("ts")
    right_pd = pd.DataFrame(
        {"k": [1, 1, 1, 2], "ts": [12.0, 30.0, 100.0, 4.0], "val": [1, 2, 3, 4]}
    ).sort_values("ts")

    for direction, tol in [("forward", None), ("forward", 15.0),
                           ("backward", None), ("backward", 8.0),
                           ("nearest", None), ("nearest", 6.0)]:
        want = pd.merge_asof(
            left_pd, right_pd, on="ts", by="k", direction=direction,
            tolerance=tol,
        )
        left = spark.createDataFrame(left_pd)
        right = spark.createDataFrame(right_pd)
        got = asof_join(
            left, right, on="k", right_cols=["val"], how="left",
            direction=direction, tolerance=tol, right_tiebreak="val",
        ).toPandas()
        w = {(r.k, r.ts): r.val for r in want.itertuples()}
        g = {(r["k"], r["ts"]): r["val_asof"] for _, r in got.iterrows()}
        norm = lambda d: {k: (None if pd.isna(v) else int(v)) for k, v in d.items()}  # noqa: E731
        assert norm(g) == norm(w), (direction, tol)


def test_asof_nearest_tie_prefers_backward(spark):
    """Equidistant left/right neighbors: pandas picks the backward one
    — pinned here so the tie rule never drifts."""
    from auto_data_tokenize_spark.operators.asof import asof_join

    l = spark.createDataFrame([(1, 10.0)], "k int, ts double")
    r = spark.createDataFrame(
        [(1, 5.0, "back"), (1, 15.0, "fwd")], "k int, ts double, v string"
    )
    got = asof_join(
        l, r, on="k", right_cols=["v"], how="left", direction="nearest"
    ).collect()
    assert got[0]["v_asof"] == "back"


def test_asof_direction_guard(spark):
    import pytest as _pytest

    from auto_data_tokenize_spark.operators.asof import asof_join

    df = spark.createDataFrame([(1, 1.0)], "k int, ts double")
    with _pytest.raises(ValueError, match="backward|forward|nearest"):
        asof_join(df, df, on="k", direction="sideways")


def test_asof_null_left_ts_never_matches(spark):
    """A left row with NULL ts must miss in EVERY direction (forward's
    DESC scan would otherwise hand it the whole right side)."""
    from auto_data_tokenize_spark.operators.asof import asof_join

    l = spark.createDataFrame([(1, None), (1, 10.0)], "k int, ts double")
    r = spark.createDataFrame([(1, 5.0, "x")], "k int, ts double, v string")
    for direction in ("backward", "forward", "nearest"):
        got = {
            r_["ts"]: r_["v_asof"]
            for r_ in asof_join(
                l, r, on="k", right_cols=["v"], how="left", direction=direction
            ).collect()
        }
        assert got[None] is None, direction
    # and inner mode drops the null-ts row
    inner = asof_join(l, r, on="k", right_cols=["v"], direction="forward")
    assert inner.count() == 0  # 10.0 has no right at-or-after either


def test_asof_ntz_tolerance_is_dst_proof(spark):
    """TIMESTAMP_NTZ gaps are wall-clock: across the US spring-forward
    gap in a non-UTC session tz, a 2 h wall gap must still read as
    7200 s (the old session-tz cast read 3600 and wrongly matched)."""
    import datetime

    from auto_data_tokenize_spark.operators.asof import asof_join

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        l = spark.createDataFrame(
            [(1, datetime.datetime(2026, 3, 8, 3, 30))], "k int, ts timestamp_ntz"
        )
        r = spark.createDataFrame(
            [(1, datetime.datetime(2026, 3, 8, 1, 30), "x")],
            "k int, ts timestamp_ntz, v string",
        )
        got = asof_join(
            l, r, on="k", right_cols=["v"], how="left", tolerance=5400.0
        ).collect()
        assert got[0]["v_asof"] is None  # 7200 s wall gap > 5400 s
        got2 = asof_join(
            l, r, on="k", right_cols=["v"], how="left", tolerance=7200.0
        ).collect()
        assert got2[0]["v_asof"] == "x"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)

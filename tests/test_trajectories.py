"""Agent-trajectory analytics: per-tool call stats, tool-chain
bigrams, and structural-quality flags.

Hand-built conversations pin each rule individually (answered vs
unanswered calls, latency arithmetic, retry-loop islands, clean
filter), and a DuckDB cross-check runs every SQL twin on the same
rows so the oracle gate and the unit fixtures can't drift apart.
"""

import datetime as dt

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from auto_data_tokenize_spark.operators.trajectories import (
    duckdb_tool_call_stats_sql,
    duckdb_tool_sequence_bigrams_sql,
    duckdb_trajectory_flags_sql,
    duckdb_tool_latency_monitor_sql,
    duckdb_trajectory_gate_sql,
    filter_trajectories,
    tool_call_stats,
    tool_latency_monitor,
    tool_sequence_bigrams,
    trajectory_flags,
    trajectory_gate_stream,
)

_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _t(s):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def handmade_pdf():
    rows = [
        # c1: two answered calls to different tools, one chain edge
        ("c1", 1, "customer", "hi", None, _t(0)),
        ("c1", 2, "agent", "checking", "crm", _t(10)),
        ("c1", 3, "tool", "found", "crm", _t(12)),
        ("c1", 4, "agent", "billing next", "billing", _t(20)),
        ("c1", 5, "tool", "paid", "billing", _t(25)),
        # c2: retry loop — crm called 3x consecutively, first two
        # answered by the SAME later result (first-following), third
        # answered too; also one unanswered billing call at the end
        ("c2", 1, "agent", "try", "crm", _t(0)),
        ("c2", 2, "agent", "retry", "crm", _t(5)),
        ("c2", 3, "agent", "retry again", "crm", _t(9)),
        ("c2", 4, "tool", "ok", "crm", _t(30)),
        ("c2", 5, "agent", "bill it", "billing", _t(40)),
        # c3: no tool usage at all — trivially clean
        ("c3", 1, "customer", "hello", None, _t(0)),
        ("c3", 2, "agent", "hello!", None, _t(1)),
        # c4: sub-second latency (fractional microseconds exactness)
        ("c4", 1, "agent", "go", "search", _t(0)),
        ("c4", 2, "tool", "hit", "search", _t(0) + dt.timedelta(microseconds=1500)),
    ]
    pdf = pd.DataFrame(rows, columns=_COLS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


@pytest.fixture(scope="module")
def handmade(spark, handmade_pdf):
    return spark.createDataFrame(handmade_pdf)


def test_tool_call_stats_rules(handmade):
    got = {r["tool"]: r.asDict() for r in tool_call_stats(handmade).collect()}
    assert set(got) == {"crm", "billing", "search"}
    crm = got["crm"]
    # c1: 1 call 1 result; c2: 3 calls 1 result — all 4 calls answered
    assert (crm["n_calls"], crm["n_results"], crm["n_convs"]) == (4, 2, 2)
    assert crm["n_answered"] == 4 and crm["p_answered"] == 1.0
    # latencies: c1 2s; c2 30-0, 30-5, 30-9 → mean (2+30+25+21)/4
    assert crm["mean_latency_s"] == 19.5 and crm["max_latency_s"] == 30.0
    billing = got["billing"]
    assert (billing["n_calls"], billing["n_answered"]) == (2, 1)
    assert billing["p_answered"] == 0.5 and billing["mean_latency_s"] == 5.0
    # sub-second: 1500 us exactly
    assert got["search"]["mean_latency_s"] == 0.0015


def test_tool_bigrams_rules(handmade):
    got = {
        (r["tool_a"], r["tool_b"]): (r["n_pairs"], r["n_convs"])
        for r in tool_sequence_bigrams(handmade).collect()
    }
    assert got == {
        ("crm", "billing"): (2, 2),  # c1 and c2
        ("crm", "crm"): (2, 1),  # c2 retry loop
    }


def test_trajectory_flags_rules(handmade):
    got = {r["conv_id"]: r.asDict() for r in trajectory_flags(handmade).collect()}
    assert set(got) == {"c1", "c2", "c3", "c4"}
    assert got["c1"]["max_same_tool_run"] == 1
    assert got["c1"]["n_unanswered"] == 0 and got["c1"]["clean"] is True
    assert got["c2"]["max_same_tool_run"] == 3  # retry loop
    assert got["c2"]["n_unanswered"] == 1  # trailing billing call
    assert got["c2"]["clean"] is False
    # call-free conversation still gets a (clean, zero-count) row
    assert got["c3"] == {
        "conv_id": "c3",
        "n_calls": 0,
        "max_same_tool_run": 0,
        "n_unanswered": 0,
        "clean": True,
    }
    assert got["c4"]["clean"] is True


def test_filter_trajectories_semi_join(handmade):
    kept = filter_trajectories(handmade, loop_threshold=3)
    assert sorted(
        r["conv_id"] for r in kept.select("conv_id").distinct().collect()
    ) == ["c1", "c3", "c4"]
    # schema passes through untouched
    assert kept.columns == handmade.columns
    # a looser threshold admits the 3-run conversation but the
    # unanswered call still rejects it
    kept4 = filter_trajectories(handmade, loop_threshold=4)
    assert sorted(
        r["conv_id"] for r in kept4.select("conv_id").distinct().collect()
    ) == ["c1", "c3", "c4"]


def test_loop_threshold_guard(handmade):
    with pytest.raises(ValueError, match="loop_threshold"):
        trajectory_flags(handmade, loop_threshold=0)


def _duck_rows(pdf, sql):
    con = duckdb.connect()
    con.register("turns", pdf)
    return con.execute(sql).fetchdf()


def _spark_rows(df):
    return df.toPandas()


def _cmp(spark_pdf, duck_pdf, keys):
    a = spark_pdf.sort_values(keys).reset_index(drop=True)
    b = duck_pdf[spark_pdf.columns].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_duckdb_twins_on_handmade(handmade, handmade_pdf):
    _cmp(
        _spark_rows(tool_call_stats(handmade)),
        _duck_rows(handmade_pdf, duckdb_tool_call_stats_sql("SELECT * FROM turns")),
        ["tool"],
    )
    _cmp(
        _spark_rows(tool_sequence_bigrams(handmade)),
        _duck_rows(
            handmade_pdf, duckdb_tool_sequence_bigrams_sql("SELECT * FROM turns")
        ),
        ["tool_a", "tool_b"],
    )
    _cmp(
        _spark_rows(trajectory_flags(handmade)),
        _duck_rows(handmade_pdf, duckdb_trajectory_flags_sql("SELECT * FROM turns")),
        ["conv_id"],
    )


def test_trajectory_gate_window_slices(spark):
    """Per-window-slice semantics: a call answered only in the NEXT
    window counts as unanswered in its own slice; a retry run split
    across windows does not merge."""
    rows = [
        # window 0 (00:00-00:15): two crm calls (run 2), answered in-window
        ("c1", 1, "agent", "a", "crm", _t(0)),
        ("c1", 2, "agent", "b", "crm", _t(60)),
        ("c1", 3, "tool", "ok", "crm", _t(120)),
        # window 0: billing call answered only in window 1 -> unanswered here
        ("c1", 4, "agent", "c", "billing", _t(800)),
        ("c1", 5, "tool", "ok", "billing", _t(1000)),  # window 1 (>= 900s)
        # window 1: single clean call
        ("c1", 6, "agent", "d", "crm", _t(1100)),
        ("c1", 7, "tool", "ok", "crm", _t(1200)),
    ]
    pdf = pd.DataFrame(rows, columns=_COLS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    df = spark.createDataFrame(pdf)
    got = {
        r["window_start"].minute: r.asDict()
        for r in trajectory_gate_stream(df, loop_threshold=2).collect()
    }
    w0, w1 = got[0], got[15]
    assert (w0["n_calls"], w0["max_same_tool_run"], w0["n_unanswered"]) == (3, 2, 1)
    assert w0["admitted"] is False
    assert (w1["n_calls"], w1["max_same_tool_run"], w1["n_unanswered"]) == (1, 1, 0)
    assert w1["admitted"] is True
    # the SQL twin agrees row-for-row on the same feed
    want = _duck_rows(
        pdf,
        duckdb_trajectory_gate_sql("SELECT * FROM turns", loop_threshold=2),
    )
    _cmp(
        _spark_rows(trajectory_gate_stream(df, loop_threshold=2)),
        want,
        ["window_start", "conv_id"],
    )
    with pytest.raises(ValueError, match="loop_threshold"):
        trajectory_gate_stream(df, loop_threshold=0)


def test_trajectory_gate_callfree_slice_admitted(spark):
    df = spark.createDataFrame(
        [("c9", 1, "customer", "hi", None, _t(5))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    [r] = trajectory_gate_stream(df).collect()
    assert (r["n_calls"], r["max_same_tool_run"], r["n_unanswered"]) == (0, 0, 0)
    assert r["admitted"] is True


def test_tool_latency_monitor_slices(spark, handmade, handmade_pdf):
    """In-window answer semantics: a result in the NEXT window leaves
    the call unanswered in its own slice; latency means match the
    batch stats when everything lands in one window."""
    got = {
        (r["window_start"].minute, r["tool"]): r.asDict()
        for r in tool_latency_monitor(handmade).collect()
    }
    # handmade fixture is all within one 15-min window
    crm = got[(0, "crm")]
    assert (crm["n_calls"], crm["n_answered"]) == (4, 4)
    assert crm["mean_latency_s"] == 19.5 and crm["max_latency_s"] == 30.0
    # cross-window: billing answered only in window 1
    rows = [
        ("x1", 1, "agent", "a", "billing", _t(800)),
        ("x1", 2, "tool", "ok", "billing", _t(1000)),  # next window
    ]
    pdf = pd.DataFrame(rows, columns=_COLS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    out = {
        r["window_start"].minute: r.asDict()
        for r in tool_latency_monitor(spark.createDataFrame(pdf)).collect()
    }
    assert out[0]["n_calls"] == 1 and out[0]["n_answered"] == 0
    assert out[0]["mean_latency_s"] is None
    assert out[15]["n_calls"] == 0 and out[15]["n_answered"] == 0
    # DuckDB twin agrees on the handmade rows
    _cmp(
        _spark_rows(tool_latency_monitor(handmade)),
        _duck_rows(
            handmade_pdf, duckdb_tool_latency_monitor_sql("SELECT * FROM turns")
        ),
        ["window_start", "tool"],
    )


def test_duplicate_turn_idx_ties_match_twins(spark):
    """Duplicate turn_idx rows (two results at the same index; a call
    tying with another tool's rows) resolve identically on both sides:
    value-based RANGE frame + (turn_idx, ts) pick on Spark, per-call
    ROW_NUMBER pick in the twins — never a fan-out join."""
    rows = [
        ("d1", 1, "agent", "go", "crm", _t(0)),
        ("d1", 2, "tool", "ok-a", "crm", _t(5)),
        ("d1", 2, "tool", "ok-b", "crm", _t(9)),  # duplicate result idx
        ("d1", 2, "agent", "also", "billing", _t(6)),
        ("d1", 3, "tool", "ok", "billing", _t(7)),
        # a result AT the call's own turn_idx is not "following"
        ("d2", 4, "agent", "x", "search", _t(20)),
        ("d2", 4, "tool", "same-idx", "search", _t(21)),
    ]
    pdf = pd.DataFrame(rows, columns=_COLS)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    df = spark.createDataFrame(pdf)
    got = {r["tool"]: r.asDict() for r in tool_call_stats(df).collect()}
    # crm: single call answered by the EARLIEST (turn_idx, ts) result
    assert got["crm"]["n_answered"] == 1 and got["crm"]["mean_latency_s"] == 5.0
    assert got["crm"]["p_answered"] == 1.0
    # search: same-turn_idx result does not answer the call
    assert got["search"]["n_answered"] == 0
    for spark_df, sql, keys in (
        (
            tool_call_stats(df),
            duckdb_tool_call_stats_sql("SELECT * FROM turns"),
            ["tool"],
        ),
        (
            tool_latency_monitor(df),
            duckdb_tool_latency_monitor_sql("SELECT * FROM turns"),
            ["window_start", "tool"],
        ),
        (
            trajectory_flags(df),
            duckdb_trajectory_flags_sql("SELECT * FROM turns"),
            ["conv_id"],
        ),
        (
            trajectory_gate_stream(df),
            duckdb_trajectory_gate_sql("SELECT * FROM turns"),
            ["window_start", "conv_id"],
        ),
    ):
        _cmp(_spark_rows(spark_df), _duck_rows(pdf, sql), keys)


def test_trajectory_flags_without_ts_column(spark):
    """The flags/filter path is purely ordinal — a frame with no ts
    column works (the latency ops are the ones that need ts)."""
    df = spark.createDataFrame(
        [("c1", 1, "agent", "t", "crm"), ("c1", 2, "tool", "ok", "crm")],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    [r] = trajectory_flags(df).collect()
    assert r["n_unanswered"] == 0 and r["clean"] is True
    assert filter_trajectories(df).count() == 2


def test_flags_plan_is_two_shuffles(transcripts_small):
    """trajectory_flags' documented plan shape: the explicit conv_id
    repartition feeds every window and both chained aggregations via
    Catalyst's subset-satisfaction rule — at most two hash shuffles
    total (call path + distinct-conversations side); everything else
    may only be a broadcast."""
    plan = (
        trajectory_flags(transcripts_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_plans_are_python_free(handmade):
    for df in (
        tool_call_stats(handmade),
        tool_sequence_bigrams(handmade),
        trajectory_flags(handmade),
        filter_trajectories(handmade),
        trajectory_gate_stream(handmade),
        tool_latency_monitor(handmade),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

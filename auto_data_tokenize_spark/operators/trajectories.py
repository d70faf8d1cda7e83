"""Agent-trajectory analytics over the ``tool`` column — the
tool-call layer of the transcripts-to-training-data pipeline.

The reference's demo corpus is agent/customer chat transcripts
(``sample-data-chats.csv``; pipeline goldens in
test/pipeline/CsvTokenizationAndOrderingPipelineTest.java:117-219) and
the north-rule input schema carries a ``tool`` column: agent turns may
invoke a tool, and ``role='tool'`` turns carry that tool's result.
Training an agent on those trajectories needs the same curation layer
documents get from C4-style heuristics, but over CALL STRUCTURE
rather than text:

* :func:`tool_call_stats` — per-tool call/result/latency aggregates
  (which tools are used, how often they answer, how fast);
* :func:`tool_sequence_bigrams` — which tool chains occur (the
  call-graph motifs a router model would learn);
* :func:`trajectory_flags` — per-conversation structural quality:
  retry loops (the same tool called back-to-back >= k times) and
  unanswered calls (an invocation with no following result), the
  two classic signatures of a flailing agent;
* :func:`filter_trajectories` — keep only clean conversations.

Every operator is a window + aggregate over ``(conv_id, turn_idx)``
and therefore exactly SQL-expressible — each carries a DuckDB twin
(``duckdb_*_sql``) for the oracle gate.

"First following result" is resolved with ONE window per
``(conv_id, tool)`` ordered by ``turn_idx``:
``min(struct(turn_idx, ts))`` over the strictly-following frame picks
the earliest later result without a self-join. Latency is accumulated
in WHOLE MICROSECONDS (``unix_micros`` deltas summed as BIGINT) and
divided once at the end, so the mean is order-independent and the
oracle's HUGEINT/double widening cannot drift from Spark's
long-sum-then-divide (the r3 q46 bug class).

100 TB notes: the tool-bearing subset is a narrow codegen filter
(~20 % of turns, 5 columns) BEFORE any shuffle; the window partitions
on ``(conv_id, tool)`` — finer than ``conv_id``, so hot conversations
(the north rule's skew case) split across their tool set; the final
per-tool aggregates are map-side partial over a key space the size of
the tool catalogue. Nothing holds more than one conversation-tool run
in memory; no Python rows anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "tool_call_stats",
    "tool_sequence_bigrams",
    "trajectory_flags",
    "filter_trajectories",
    "trajectory_gate_stream",
    "tool_latency_monitor",
    "duckdb_tool_call_stats_sql",
    "duckdb_tool_latency_monitor_sql",
    "duckdb_tool_sequence_bigrams_sql",
    "duckdb_trajectory_flags_sql",
    "duckdb_trajectory_gate_sql",
]


def _epoch_us(col):
    """Whole-microsecond epoch for TIMESTAMP and TIMESTAMP_NTZ alike,
    tz-free (the asof.py decomposition: day count + time of day —
    a session-tz cast would corrupt NTZ differences across DST gaps).
    ``date_part('SECOND')`` carries the microsecond fraction exactly,
    so ``* 1e6`` is integral."""
    return (
        F.unix_date(col.cast("date")).cast("long") * F.lit(86_400_000_000)
        + F.hour(col).cast("long") * F.lit(3_600_000_000)
        + F.minute(col).cast("long") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), col) * F.lit(1_000_000)).cast("long")
    )


def _tool_rows(
    turns: DataFrame,
    conv_col: str,
    role_col: str,
    tool_col: str,
    with_ts: bool = True,
) -> DataFrame:
    """Narrow pre-shuffle projection: tool-bearing call/result turns.
    ``with_ts`` lowers timestamps to whole-microsecond epoch longs;
    the purely ordinal consumers (flags/filter) skip the ``ts``
    column — and the requirement to have one — entirely."""
    cols = [conv_col, "turn_idx", role_col, tool_col]
    if with_ts:
        cols.append(_epoch_us(F.col("ts")).alias("_ts_us"))
    return turns.filter(
        F.col(tool_col).isNotNull() & F.col(role_col).isin("agent", "tool")
    ).select(*cols)


def _next_result_window(conv_col: str, tool_col: str) -> Window:
    """Strictly-later-``turn_idx`` frame per ``(conv_id, tool)``.
    A RANGE frame (not ROWS): the frame is defined by turn_idx VALUES,
    so rows tying on turn_idx resolve deterministically — a result at
    the same turn_idx as a call is never "following", regardless of
    physical row order."""
    return (
        Window.partitionBy(conv_col, tool_col)
        .orderBy("turn_idx")
        .rangeBetween(1, Window.unboundedFollowing)
    )


def _with_next_result(
    rel: DataFrame, conv_col: str, role_col: str, tool_col: str
) -> DataFrame:
    """Attach ``_nxt = struct(turn_idx, ts)`` of the earliest strictly-
    later ``role='tool'`` turn for the same ``(conv_id, tool)`` —
    NULL when the call is never answered. One window, no join; the
    struct min is value-based (min turn_idx, then min ts), so
    duplicate result turn_idx ties break deterministically."""
    nxt = F.min(
        F.when(
            F.col(role_col) == "tool", F.struct(F.col("turn_idx"), F.col("_ts_us"))
        )
    ).over(_next_result_window(conv_col, tool_col))
    return rel.withColumn("_nxt", nxt)


def _with_answered_flag(
    rel: DataFrame, conv_col: str, role_col: str, tool_col: str
) -> DataFrame:
    """Ordinal-only variant for the flags path: ``_answered`` is true
    when ANY strictly-later same-``(conv_id, tool)`` result exists —
    no timestamp required or computed."""
    ans = F.max(
        F.when(F.col(role_col) == "tool", F.lit(True))
    ).over(_next_result_window(conv_col, tool_col))
    return rel.withColumn("_answered", F.coalesce(ans, F.lit(False)))


def tool_call_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-tool usage aggregates over the transcript table.

    A *call* is an ``role='agent'`` turn with ``tool`` set; a *result*
    is a ``role='tool'`` turn. A call is *answered* by the first later
    result for the same ``(conv_id, tool)``; latency is that result's
    ``ts`` minus the call's (may be negative under late-stamped events
    — reported as-is, both sides compute the same thing).

    Output (one row per tool):
    ``(tool, n_calls, n_results, n_convs, n_answered, p_answered,
    mean_latency_s, max_latency_s)`` — latencies rounded to 6 dp,
    NULL when no call was answered.
    """
    rel = _with_next_result(
        _tool_rows(turns, conv_col, role_col, tool_col), conv_col, role_col, tool_col
    )
    is_call = F.col(role_col) == "agent"
    answered = is_call & F.col("_nxt").isNotNull()
    lat_us = F.col("_nxt._ts_us") - F.col("_ts_us")
    agg = rel.groupBy(tool_col).agg(
        F.count(F.when(is_call, 1)).alias("n_calls"),
        F.count(F.when(F.col(role_col) == "tool", 1)).alias("n_results"),
        F.countDistinct(conv_col).alias("n_convs"),
        F.count(F.when(answered, 1)).alias("n_answered"),
        F.sum(F.when(answered, lat_us)).alias("_sum_lat_us"),
        F.max(F.when(answered, lat_us)).alias("_max_lat_us"),
    )
    return agg.select(
        tool_col,
        "n_calls",
        "n_results",
        "n_convs",
        "n_answered",
        F.when(
            F.col("n_calls") > 0,
            F.round(F.col("n_answered") / F.col("n_calls"), 6),
        ).alias("p_answered"),
        F.when(
            F.col("n_answered") > 0,
            F.round(
                (F.col("_sum_lat_us") / F.lit(1e6)) / F.col("n_answered"), 6
            ),
        ).alias("mean_latency_s"),
        F.round(F.col("_max_lat_us") / F.lit(1e6), 6).alias("max_latency_s"),
    )


def _latency_twin_sql(
    turns_sql: str,
    conv_col: str,
    window_us: int | None,
    with_totals: bool,
) -> str:
    """Shared generator for the latency twins (batch stats and
    windowed monitor are the SAME construction, keyed by ``tool`` vs
    ``(window_start, tool)`` — one source of truth so a semantics fix
    cannot drift between them).

    Duplicate-exact vs Spark's value-based ``min(struct(turn_idx,
    ts))`` over the strictly-later RANGE frame: each call ROW (not
    each distinct turn_idx) resolves to the single earliest later
    result ordered by ``(turn_idx, ts)`` — a per-call ``ROW_NUMBER``
    pick, never a fan-out join — and latency is summed as integer
    microseconds then divided once, mirroring Spark's
    long-sum-then-divide exactly."""
    c = conv_col
    if window_us is None:
        wsel, wkey, wand = "", "", ""
    else:
        wsel = (
            f"make_timestamp((epoch_us(ts) // {window_us}) * {window_us})"
            " AS window_start, "
        )
        wkey = "window_start, "
        wand = "r.window_start = cl.window_start AND "
    totals = (
        f""",
                 COUNT(*) FILTER (WHERE role = 'tool') AS n_results,
                 COUNT(DISTINCT {c}) AS n_convs"""
        if with_totals
        else ""
    )
    totals_out = "b.n_results, b.n_convs," if with_totals else ""
    return f"""
        WITH rel AS (
          SELECT {wsel}{c}, turn_idx, role, tool, ts FROM ({turns_sql})
          WHERE tool IS NOT NULL AND role IN ('agent', 'tool')
        ),
        calls AS (
          SELECT *, ROW_NUMBER() OVER () AS rid FROM rel WHERE role = 'agent'
        ),
        res AS (SELECT * FROM rel WHERE role = 'tool'),
        cand AS (
          SELECT cl.rid, {('cl.window_start, ' if window_us else '')}cl.tool,
                 cl.ts AS c_ts, r.ts AS r_ts,
                 ROW_NUMBER() OVER (
                   PARTITION BY cl.rid ORDER BY r.turn_idx, r.ts
                 ) AS rn
          FROM calls cl JOIN res r
            ON {wand}r.{c} = cl.{c} AND r.tool = cl.tool
           AND r.turn_idx > cl.turn_idx
        ),
        lat AS (
          SELECT {wkey}tool, epoch_us(r_ts) - epoch_us(c_ts) AS lat_us
          FROM cand WHERE rn = 1
        ),
        base AS (
          SELECT {wkey}tool,
                 COUNT(*) FILTER (WHERE role = 'agent') AS n_calls{totals}
          FROM rel GROUP BY {wkey}tool
        ),
        lagg AS (
          SELECT {wkey}tool, COUNT(*) AS n_answered,
                 CAST(SUM(lat_us) AS BIGINT) AS s_us,
                 CAST(MAX(lat_us) AS BIGINT) AS m_us
          FROM lat GROUP BY {wkey}tool
        )
        SELECT {('b.window_start, ' if window_us else '')}b.tool, b.n_calls,
               {totals_out}
               CAST(COALESCE(l.n_answered, 0) AS BIGINT) AS n_answered,
               CASE WHEN b.n_calls > 0 THEN
                 ROUND(COALESCE(l.n_answered, 0) * 1.0 / b.n_calls, 6)
               END AS p_answered,
               CASE WHEN l.n_answered > 0 THEN
                 ROUND((l.s_us / 1e6) / l.n_answered, 6)
               END AS mean_latency_s,
               ROUND(l.m_us / 1e6, 6) AS max_latency_s
        FROM base b LEFT JOIN lagg l USING ({wkey}tool)
    """


def duckdb_tool_call_stats_sql(
    turns_sql: str,
    conv_col: str = "conv_id",
) -> str:
    """DuckDB twin of :func:`tool_call_stats` (see
    :func:`_latency_twin_sql` for the duplicate-exact construction)."""
    return _latency_twin_sql(turns_sql, conv_col, None, with_totals=True)


def tool_sequence_bigrams(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Tool-chain motifs: consecutive pairs of tool CALLS within a
    conversation (call order = ``turn_idx``; intervening non-call
    turns are transparent). Output ``(tool_a, tool_b, n_pairs,
    n_convs)`` — the corpus-wide call-graph edge list a tool-routing
    policy would be trained on.

    One window over ``conv_id`` on the calls-only subset + one
    map-side-partial aggregate on the (tiny) tool-pair key space.
    """
    calls = turns.filter(
        (F.col(role_col) == "agent") & F.col(tool_col).isNotNull()
    ).select(conv_col, "turn_idx", tool_col)
    w = Window.partitionBy(conv_col).orderBy("turn_idx", tool_col)
    pairs = calls.select(
        F.col(conv_col),
        F.col(tool_col).alias("tool_a"),
        F.lead(tool_col).over(w).alias("tool_b"),
    ).filter(F.col("tool_b").isNotNull())
    return pairs.groupBy("tool_a", "tool_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct(conv_col).alias("n_convs"),
    )


def duckdb_tool_sequence_bigrams_sql(
    turns_sql: str, conv_col: str = "conv_id"
) -> str:
    """DuckDB twin of :func:`tool_sequence_bigrams` (same lead window)."""
    c = conv_col
    return f"""
        WITH calls AS (
          SELECT {c}, turn_idx, tool FROM ({turns_sql})
          WHERE role = 'agent' AND tool IS NOT NULL
        ),
        pairs AS (
          SELECT {c}, tool AS tool_a,
                 LEAD(tool) OVER (PARTITION BY {c} ORDER BY turn_idx, tool)
                   AS tool_b
          FROM calls
        )
        SELECT tool_a, tool_b, COUNT(*) AS n_pairs,
               COUNT(DISTINCT {c}) AS n_convs
        FROM pairs WHERE tool_b IS NOT NULL
        GROUP BY 1, 2
    """


def trajectory_flags(
    turns: DataFrame,
    loop_threshold: int = 3,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation structural-quality flags for trajectory
    curation:

    * ``max_same_tool_run`` — longest run of CONSECUTIVE calls (in
      call order) to the same tool; ``>= loop_threshold`` is the
      retry-loop signature (agent flailing on one tool);
    * ``n_unanswered`` — calls with no later same-tool result in the
      conversation (the trajectory teaches "call and ignore");
    * ``clean`` — no retry loop and no unanswered call.

    Every conversation in ``turns`` gets a row (call-free ones are
    trivially clean with zero counts).

    Runs are gaps-and-islands: ``row_number`` over the conversation's
    calls minus ``row_number`` over its per-tool calls is constant
    exactly within a same-tool run.

    Plan shape (asserted in tests): ONE explicit hash repartition on
    ``conv_id`` feeds the whole call path — every window partition
    key and aggregation key is a superset of ``conv_id``, so
    Catalyst's subset-satisfaction rule reuses the partitioning for
    the answered-flag window, both island row_numbers, and BOTH
    chained aggregations (per-island run counts, then the per-
    conversation rollup) with zero further Exchanges; the only other
    shuffle is the distinct-conversations side of the final left join
    (which then sort-merge-joins without re-shuffling either side).
    At 100 TB that is two conv-hash shuffles of a narrow projection,
    total.
    """
    if loop_threshold < 1:
        raise ValueError(f"loop_threshold must be >= 1, got {loop_threshold}")
    rel = _with_answered_flag(
        _tool_rows(turns, conv_col, role_col, tool_col, with_ts=False).repartition(
            F.col(conv_col)
        ),
        conv_col,
        role_col,
        tool_col,
    )
    calls = rel.filter(F.col(role_col) == "agent")
    # tool as tie-break: duplicate turn_idx across tools still yields
    # one deterministic call order (mirrored in the SQL twin)
    w_conv = Window.partitionBy(conv_col).orderBy("turn_idx", tool_col)
    w_ct = Window.partitionBy(conv_col, tool_col).orderBy("turn_idx")
    islands = calls.select(
        F.col(conv_col),
        F.col(tool_col),
        F.col("_answered"),
        (F.row_number().over(w_conv) - F.row_number().over(w_ct)).alias("_isl"),
    )
    # one chained aggregation pair instead of two branches over the
    # same lineage (branches re-execute the scan+windows in Spark):
    # per-island run length + unanswered count, then the conv rollup
    # (n_calls = sum of run lengths; both stay on the conv_id hash)
    per_conv = (
        islands.groupBy(conv_col, tool_col, "_isl")
        .agg(
            F.count(F.lit(1)).alias("_run"),
            F.count(F.when(~F.col("_answered"), 1)).alias("_un"),
        )
        .groupBy(conv_col)
        .agg(
            F.sum("_run").alias("n_calls"),
            F.max("_run").alias("max_same_tool_run"),
            F.sum("_un").alias("n_unanswered"),
        )
    )
    convs = turns.select(conv_col).distinct()
    out = convs.join(per_conv, conv_col, "left").select(
        conv_col,
        F.coalesce("n_calls", F.lit(0)).cast("long").alias("n_calls"),
        F.coalesce("max_same_tool_run", F.lit(0))
        .cast("long")
        .alias("max_same_tool_run"),
        F.coalesce("n_unanswered", F.lit(0)).cast("long").alias("n_unanswered"),
    )
    return out.withColumn(
        "clean",
        (F.col("max_same_tool_run") < F.lit(int(loop_threshold)))
        & (F.col("n_unanswered") == 0),
    )


def filter_trajectories(
    turns: DataFrame,
    loop_threshold: int = 3,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Keep only turns of conversations :func:`trajectory_flags` marks
    ``clean`` — a left-semi join on ``conv_id``, so the corpus stays
    partitioned as-is and the flag side reduces to one row per
    conversation before the join."""
    flags = trajectory_flags(turns, loop_threshold, conv_col, role_col, tool_col)
    keep = flags.filter(F.col("clean")).select(conv_col)
    return turns.join(keep, conv_col, "left_semi")


def trajectory_gate_stream(
    turns_stream: DataFrame,
    loop_threshold: int = 3,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
    window: str = "15 minutes",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Ingest-time trajectory-quality admission gate — the streaming
    twin of :func:`trajectory_flags`: per arriving conversation slice
    (event-time tumbling window over ``ts``), flag retry loops
    (>= ``loop_threshold`` consecutive same-tool calls) and unanswered
    calls (no later same-tool ``role='tool'`` result IN THE SLICE),
    and admit only clean slices. Per-window-slice semantics (not
    whole-conversation) are deliberate, matching the session-dedup
    gate: admission must not hold back until a session ends, and a
    flailing agent is flagged while it is still flailing.

    Shape: one watermarked windowed aggregate — ``collect_list`` of
    ``(turn_idx, role, tool)`` per ``(window, conv)`` — then a pure
    higher-order-function projection (``sort_array`` + ``aggregate``
    run scan + nested ``filter``/``exists`` for unanswered), so the
    whole gate is one streaming state operator plus codegen: no second
    shuffle, no Python, and arrival order within equal ``ts`` cannot
    change the output (the scan orders by ``turn_idx``).

    Output: ``(window_start, conv_col, n_calls, max_same_tool_run,
    n_unanswered, admitted)`` — every conversation with ANY turn in
    the window gets a row (call-free slices are trivially admitted).

    100 TB posture: state per open (window, conv) is one bounded event
    array (a conversation's turns in one window); the aggregate
    partitions on the (window, conv) composite so hot conversations
    split across their window slices rather than pinning one key.
    """
    if loop_threshold < 1:
        raise ValueError(f"loop_threshold must be >= 1, got {loop_threshold}")
    agg = (
        turns_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), conv_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("turn_idx"),
                        F.col(role_col).alias("role"),
                        F.col(tool_col).alias("tool"),
                    )
                )
            ).alias("_evs")
        )
    )
    calls = F.filter(
        F.col("_evs"),
        lambda e: (e["role"] == F.lit("agent")) & e["tool"].isNotNull(),
    )
    results = F.filter(
        F.col("_evs"),
        lambda e: (e["role"] == F.lit("tool")) & e["tool"].isNotNull(),
    )
    # longest same-tool run over the turn_idx-ordered call sequence:
    # one left-to-right scan with a (prev, run, mx) accumulator
    max_run = F.aggregate(
        calls,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("mx"),
        ),
        lambda acc, e: F.struct(
            e["tool"].alias("prev"),
            F.when(acc["prev"] == e["tool"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["mx"],
                F.when(acc["prev"] == e["tool"], acc["run"] + 1).otherwise(
                    F.lit(1)
                ),
            ).alias("mx"),
        ),
        lambda acc: acc["mx"],
    )
    n_unanswered = F.size(
        F.filter(
            calls,
            lambda c: ~F.exists(
                results,
                lambda r: (r["turn_idx"] > c["turn_idx"])
                & (r["tool"] == c["tool"]),
            ),
        )
    ).cast("long")
    out = agg.select(
        F.col("w.start").alias("window_start"),
        conv_col,
        F.size(calls).cast("long").alias("n_calls"),
        max_run.alias("max_same_tool_run"),
        n_unanswered.alias("n_unanswered"),
    )
    return out.withColumn(
        "admitted",
        (F.col("max_same_tool_run") < F.lit(int(loop_threshold)))
        & (F.col("n_unanswered") == 0),
    )


def tool_latency_monitor(
    turns_stream: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
    window: str = "15 minutes",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming per-tool latency/answer-rate SLA monitor — the
    operational twin of :func:`tool_call_stats`: per event-time
    tumbling window and tool, how many calls arrived, how many were
    answered IN THE WINDOW (first strictly-later same-conversation
    result), and the mean/max call→result latency. A tool whose
    answer rate drops or whose latency spikes shows up within one
    window of the regression.

    Two chained streaming aggregations (Spark >= 3.4 multi-window via
    ``window_time``, the established q70 pattern):

    1. per ``(window, conv, tool)``: ``collect_list`` of the slice's
       call/result events, then a pure higher-order-function
       projection resolves each call's first-following result and its
       microsecond latency — state per key is one conversation-tool
       slice, so hot conversations split across their tool set (finer
       than the gate's per-conv key);
    2. per ``(window, tool)``: partial-agg sums/max over the tiny
       tool-catalogue key space.

    Latency is summed in WHOLE MICROSECONDS (BIGINT) and divided once
    at the end — order-independent, oracle-exact (the r3 q46 lesson).

    Output: ``(window_start, tool, n_calls, n_answered, p_answered,
    mean_latency_s, max_latency_s)``; latencies NULL when nothing was
    answered in the window.
    """
    # filter BEFORE the watermark node — deliberately, and explicitly
    # (Catalyst pushes the predicate below EventTimeWatermark anyway):
    # the monitor's event stream IS the tool-bearing subset, so its
    # watermark advances with tool-bearing turns, not chat small talk.
    # Horizon predicates in callers/oracles must therefore use
    # max(ts) over the FILTERED feed.
    evs = (
        turns_stream.filter(
            F.col(tool_col).isNotNull() & F.col(role_col).isin("agent", "tool")
        )
        .withWatermark(ts_col, watermark)
        .select(
            ts_col,
            conv_col,
            tool_col,
            F.col("turn_idx"),
            F.col(role_col).alias("_role"),
            _epoch_us(F.col(ts_col)).alias("_ts_us"),
        )
    )
    slice_agg = evs.groupBy(
        F.window(F.col(ts_col), window).alias("w"), conv_col, tool_col
    ).agg(
        F.sort_array(
            F.collect_list(F.struct("turn_idx", "_role", "_ts_us"))
        ).alias("_evs")
    )
    calls = F.filter(F.col("_evs"), lambda e: e["_role"] == F.lit("agent"))
    results = F.filter(F.col("_evs"), lambda e: e["_role"] == F.lit("tool"))
    # per call: earliest strictly-later result's ts (struct min orders
    # by turn_idx first), NULL when unanswered in the slice
    lats = F.filter(
        F.transform(
            calls,
            lambda c: F.array_min(
                F.transform(
                    F.filter(results, lambda r: r["turn_idx"] > c["turn_idx"]),
                    lambda r: F.struct(
                        r["turn_idx"].alias("turn_idx"),
                        r["_ts_us"].alias("_ts_us"),
                    ),
                )
            )["_ts_us"]
            - c["_ts_us"],
        ),
        lambda x: x.isNotNull(),
    )
    sliced = slice_agg.select(
        F.col("w"),
        tool_col,
        F.size(calls).cast("long").alias("_n_calls"),
        F.size(lats).cast("long").alias("_n_answered"),
        F.aggregate(
            lats, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("_sum_lat_us"),
        F.array_max(lats).alias("_max_lat_us"),
    )
    rolled = sliced.groupBy(
        F.window(F.window_time("w"), window).alias("cw"), tool_col
    ).agg(
        F.sum("_n_calls").alias("n_calls"),
        F.sum("_n_answered").alias("n_answered"),
        F.sum("_sum_lat_us").alias("_s_us"),
        F.max("_max_lat_us").alias("_m_us"),
    )
    return rolled.select(
        F.col("cw.start").alias("window_start"),
        tool_col,
        "n_calls",
        "n_answered",
        F.when(
            F.col("n_calls") > 0,
            F.round(F.col("n_answered") / F.col("n_calls"), 6),
        ).alias("p_answered"),
        F.when(
            F.col("n_answered") > 0,
            F.round((F.col("_s_us") / F.lit(1e6)) / F.col("n_answered"), 6),
        ).alias("mean_latency_s"),
        F.round(F.col("_m_us") / F.lit(1e6), 6).alias("max_latency_s"),
    )


def duckdb_tool_latency_monitor_sql(
    feed_sql: str,
    conv_col: str = "conv_id",
    window_us: int = 15 * 60 * 1_000_000,
) -> str:
    """DuckDB twin of :func:`tool_latency_monitor` over the same feed
    (caller appends the closed-window predicate) — the windowed
    instance of :func:`_latency_twin_sql`, duplicate-exact."""
    return _latency_twin_sql(feed_sql, conv_col, window_us, with_totals=False)


def _flags_twin_sql(
    turns_sql: str,
    loop_threshold: int,
    conv_col: str,
    window_us: int | None,
    verdict_col: str,
) -> str:
    """Shared generator for the flags twins: the whole-conversation
    batch flags and the per-window-slice streaming gate are the SAME
    gaps-and-islands run scan + anti-join unanswered count, keyed by
    ``conv`` vs ``(window_start, conv)`` — one source of truth so the
    constructions cannot drift. Call order ties on ``turn_idx`` break
    by ``tool`` (mirroring Spark's value-ordered scans); every
    conversation (slice) in the feed gets a row."""
    c = conv_col
    if window_us is None:
        wsel, wkey = "", ""
    else:
        wsel = (
            f"make_timestamp((epoch_us(ts) // {window_us}) * {window_us})"
            " AS window_start, "
        )
        wkey = "window_start, "
    return f"""
        WITH t AS (
          SELECT {wsel}{c}, turn_idx, role, tool FROM ({turns_sql})
        ),
        calls AS (
          SELECT {wkey}{c}, tool, turn_idx FROM t
          WHERE role = 'agent' AND tool IS NOT NULL
        ),
        res AS (
          SELECT {wkey}{c}, tool, turn_idx FROM t
          WHERE role = 'tool' AND tool IS NOT NULL
        ),
        isl AS (
          SELECT {wkey}{c}, tool, turn_idx,
                 ROW_NUMBER() OVER (PARTITION BY {wkey}{c}
                                    ORDER BY turn_idx, tool)
               - ROW_NUMBER() OVER (PARTITION BY {wkey}{c}, tool
                                    ORDER BY turn_idx) AS g
          FROM calls
        ),
        runs AS (
          SELECT {wkey}{c}, MAX(n) AS max_run FROM (
            SELECT {wkey}{c}, tool, g, COUNT(*) AS n
            FROM isl GROUP BY ALL
          ) GROUP BY ALL
        ),
        unans AS (
          SELECT {('cl.window_start, ' if window_us else '')}cl.{c},
                 COUNT(*) AS n_un
          FROM calls cl
          WHERE NOT EXISTS (
            SELECT 1 FROM res r
            WHERE {('r.window_start = cl.window_start AND ' if window_us else '')}
                  r.{c} = cl.{c} AND r.tool = cl.tool
              AND r.turn_idx > cl.turn_idx
          )
          GROUP BY ALL
        ),
        ncall AS (
          SELECT {wkey}{c}, COUNT(*) AS n_calls FROM calls GROUP BY ALL
        ),
        convs AS (SELECT DISTINCT {wkey}{c} FROM t)
        SELECT {('v.window_start, ' if window_us else '')}v.{c},
               CAST(COALESCE(n.n_calls, 0) AS BIGINT) AS n_calls,
               CAST(COALESCE(r.max_run, 0) AS BIGINT) AS max_same_tool_run,
               CAST(COALESCE(u.n_un, 0) AS BIGINT) AS n_unanswered,
               (COALESCE(r.max_run, 0) < {int(loop_threshold)}
                AND COALESCE(u.n_un, 0) = 0) AS {verdict_col}
        FROM convs v
        LEFT JOIN ncall n USING ({wkey}{c})
        LEFT JOIN runs r USING ({wkey}{c})
        LEFT JOIN unans u USING ({wkey}{c})
    """


def duckdb_trajectory_gate_sql(
    feed_sql: str,
    loop_threshold: int = 3,
    conv_col: str = "conv_id",
    window_us: int = 15 * 60 * 1_000_000,
) -> str:
    """DuckDB twin of :func:`trajectory_gate_stream` over the SAME
    feed (the caller appends the closed-window predicate) — the
    windowed instance of :func:`_flags_twin_sql`."""
    return _flags_twin_sql(
        feed_sql, loop_threshold, conv_col, window_us, verdict_col="admitted"
    )


def duckdb_trajectory_flags_sql(
    turns_sql: str,
    loop_threshold: int = 3,
    conv_col: str = "conv_id",
) -> str:
    """DuckDB twin of :func:`trajectory_flags` — the unwindowed
    instance of :func:`_flags_twin_sql`."""
    return _flags_twin_sql(
        turns_sql, loop_threshold, conv_col, None, verdict_col="clean"
    )

"""As-of join — for each left row, the single most recent right row
with ``right.ts <= left.ts`` per key. Spark has no native ASOF JOIN
(DuckDB does, which is exactly what makes the q33 oracle literal), so
this is the classic composition:

    union(tagged left ∪ right) → one window pass per key ordered by
    (ts, right-first) → last_value(right cols, ignoreNulls) → keep
    left rows.

Cost shape: ONE shuffle on the key (the window exchange) and one
per-partition sort — strictly better than the naive range-join +
row_number (which shuffles both sides AND materializes every candidate
pair in the range). Ties at equal ts resolve to the right row
(at-or-before semantics), matching DuckDB's ``ON l.ts >= r.ts``.

Skew note: the window is per key; a pathologically hot key serializes
in one task. For hot keys, pre-bucket by time range (the same salting
playbook as operators/skew.py) — not needed for token-cardinality
keys, which are ~unique by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_s: int,
    upper_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: all (left, right) pairs per ``on`` key with
    ``left.ts + lower_s <= right.ts <= left.ts + upper_s`` — the
    batch twin of the streaming time-range join (streaming/join.py).

    Plan shape — the part Spark does NOT do for you: a naive
    ``join(key) .filter(range)`` materializes EVERY same-key pair
    before filtering (a hot key with n rows each side = n² candidate
    rows through the join). This implementation bins both sides into
    buckets of width W = upper_s - lower_s and joins on (key, bin):
    a left row's W-second window overlaps at most two bins, so each
    left row meets only right rows within ±W — candidates are bounded
    by actual temporal locality, not key cardinality. One shuffle on
    the composite (key, bin) key, which also spreads hot keys across
    bins. Exact range filter after the join keeps semantics identical
    to the naive form (asserted by test).

    Right columns (except the key) land with ``suffix``."""
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError(
            "column '_bin' collides with range_join internals; rename it first"
        )
    out_clash = {
        f"{c}{suffix}" for c in right.columns if c != on
    }.intersection(left.columns)
    if out_clash:
        raise ValueError(
            f"output column(s) {sorted(out_clash)} already exist on the left "
            f"side; pass a different suffix than {suffix!r}"
        )
    w = upper_s - lower_s

    # epoch seconds for TIMESTAMP and TIMESTAMP_NTZ alike (NTZ casts to
    # double only via timestamp; session tz is pinned to UTC so the
    # interpretation is stable)
    def _secs(col: str) -> str:
        return f"cast(cast({col} as timestamp) as double)"

    lsec = _secs(left_ts)

    r = right.select(
        F.col(on),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    ).withColumn("_bin", F.expr(f"floor({_secs(f'{right_ts}{suffix}')} / {w})"))

    l2 = left.withColumn(
        "_bin",
        F.explode(
            F.expr(
                f"sequence(floor(({lsec} + {lower_s}) / {w}),"
                f" floor(({lsec} + {upper_s}) / {w}))"
            )
        ),
    )
    rts = _secs(f"{right_ts}{suffix}")
    return (
        l2.join(r, [on, "_bin"])
        .filter(F.expr(f"{rts} >= {lsec} + {lower_s} AND {rts} <= {lsec} + {upper_s}"))
        .drop("_bin")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    how: str = "inner",
    right_tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Left rows + the closest right row at-or-before
    (``direction='backward'``, the default), at-or-after
    (``'forward'``), or by smallest absolute gap (``'nearest'``, ties
    prefer backward — pandas semantics) for each left row's timestamp,
    per ``on`` key.

    ``right_cols``: right columns to carry (default: all but key+ts);
    each lands as ``<name><suffix>``; the matched right timestamp lands
    as ``<right_ts><suffix>``. ``how='left'`` keeps unmatched left rows
    with nulls; ``'inner'`` drops them. ``right_tiebreak``: when two
    right rows share (key, ts), pick the one with the LARGEST value of
    this right column (deterministic; without it the pick is
    partition-order-dependent, same as DuckDB's ASOF on duplicate ts).
    ``tolerance``: maximum |left ts − matched ts| in seconds (numeric
    ts columns: in their own units) — farther matches become misses,
    the pandas ``merge_asof`` contract. Both additions keep the plan
    shape: one shuffle on the key, the tolerance applied as a codegen
    post-filter on the filled struct.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance is not None and float(tolerance) < 0:
        # pandas merge_asof raises here too; silently nulling every
        # match (every gap comparison false) is the worse failure
        raise ValueError(f"tolerance must be >= 0, got {tolerance!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    carry = [right_ts] + list(right_cols)

    # collision guards: the union carries internal bookkeeping columns
    # and emits <col><suffix> outputs — clashes with existing left
    # columns would silently produce ambiguous/duplicated names
    internal = {"_is_right", "_ats", "_r", "_f"}
    clash = internal.intersection(left.columns).union(
        internal.intersection(right.columns)
    )
    if clash:
        raise ValueError(
            f"column(s) {sorted(clash)} collide with asof_join internals; "
            "rename them first"
        )
    out_clash = {f"{c}{suffix}" for c in carry}.intersection(left.columns)
    if out_clash:
        raise ValueError(
            f"output column(s) {sorted(out_clash)} already exist on the left "
            f"side; pass a different suffix than {suffix!r}"
        )
    if right_tiebreak is not None and right_tiebreak not in carry:
        raise ValueError(f"right_tiebreak {right_tiebreak!r} must be a carried column")

    # carry the matched right row as ONE struct so every output field
    # comes from the SAME right row — per-column last(ignorenulls)
    # fills would splice a NULL field in from an OLDER right row.
    # Right rows without an event time can never match; drop them.
    right_struct_type = (
        "struct<" + ", ".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in carry
        ) + ">"
    )
    l_tag = left.select(
        "*",
        F.lit(0).alias("_is_right"),
        F.col(left_ts).alias("_ats"),
        F.lit(None).cast(right_struct_type).alias("_r"),
    )
    r_tag = (
        right.filter(F.col(right_ts).isNotNull())
        .select(
            F.col(on),
            F.lit(1).alias("_is_right"),
            F.col(right_ts).alias("_ats"),
            F.struct(*[F.col(c).alias(c) for c in carry]).alias("_r"),
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                for c in left.columns
                if c != on
            ],
        )
        .select(l_tag.columns)  # align column order
    )

    u = l_tag.unionByName(r_tag)

    from pyspark.sql import types as T

    def _seconds(col, dtype):
        # TIMESTAMP_NTZ is wall-clock with no zone: routing it through
        # a session-tz cast would corrupt differences across DST gaps
        # (verified: a 2 h wall gap over spring-forward reads as 1 h),
        # so decompose it tz-free — epoch day count + time of day,
        # date_part('SECOND') carrying the microsecond fraction.
        if isinstance(dtype, T.TimestampNTZType):
            return (
                F.unix_date(col.cast("date")).cast("double") * 86400.0
                + F.hour(col).cast("double") * 3600.0
                + F.minute(col).cast("double") * 60.0
                + F.date_part(F.lit("SECOND"), col).cast("double")
            )
        return col.cast("double")

    def _fill(d: str):
        # backward: ascending ts scan — last right in the prefix is
        # the latest at-or-before. forward: DESCENDING ts scan — last
        # right in the prefix is the earliest at-or-after. Right rows
        # sort BEFORE left rows at the same ts either way (_is_right
        # desc) so equal timestamps match; the tiebreak orders
        # equal-ts right rows so last() is deterministic (left rows
        # carry a null struct there: nulls_first keeps them unaffected
        # in their own group)
        ats = F.col("_ats").asc() if d == "backward" else F.col("_ats").desc()
        order = [ats, F.col("_is_right").desc()]
        if right_tiebreak is not None:
            order.append(F.col("_r").getField(right_tiebreak).asc_nulls_first())
        w = (
            Window.partitionBy(on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(F.col("_r"), ignorenulls=True).over(w)

    anchor = _seconds(F.col("_ats"), left.schema[left_ts].dataType)
    r_dtype = right.schema[right_ts].dataType

    def _match_ts(struct_col):
        return _seconds(struct_col.getField(right_ts), r_dtype)

    if direction == "nearest":
        # both scans share the key partitioning — ONE Exchange, two
        # window sorts, zero joins. Ties prefer backward (the pandas
        # merge_asof contract, pinned by test).
        fb, ff = _fill("backward"), _fill("forward")
        gb = anchor - _match_ts(fb)
        gf = _match_ts(ff) - anchor
        chosen = (
            F.when(ff.isNull(), fb)
            .when(fb.isNull(), ff)
            .when(gb <= gf, fb)
            .otherwise(ff)
        )
        filled = u.select("*", chosen.alias("_f")).filter(
            F.col("_is_right") == 0
        )
    else:
        filled = u.select("*", _fill(direction).alias("_f")).filter(
            F.col("_is_right") == 0
        )
    # a left row with a NULL timestamp can never match. backward gets
    # this for free (ASC = NULLS FIRST puts it before every right
    # row), but forward's DESC scan ends with nulls LAST — every right
    # row in its prefix — which would hand it a spurious match.
    filled = filled.withColumn(
        "_f", F.when(F.col("_ats").isNotNull(), F.col("_f"))
    )
    if tolerance is not None:
        matched = _match_ts(F.col("_f"))
        gap = {
            "backward": anchor - matched,
            "forward": matched - anchor,
            "nearest": F.abs(anchor - matched),
        }[direction]
        # a too-far match becomes a miss (null struct); a null match
        # stays null (when() propagates it)
        filled = filled.withColumn(
            "_f", F.when(gap <= F.lit(float(tolerance)), F.col("_f"))
        )

    out = filled.select(
        *[c for c in left.columns],
        *[F.col("_f").getField(c).alias(f"{c}{suffix}") for c in carry],
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_ts}{suffix}").isNotNull())
    return out

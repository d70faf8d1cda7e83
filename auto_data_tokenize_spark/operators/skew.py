"""Hot-key / skew handling (ShardAssigner analogue,
dlp/BatchAndDlpDeIdRecords.java:71,216-234 — random shard keys to
spread GroupIntoBatches).

At 10^12 turns a single hot conv_id (support bots, load tests) defeats
any conv_id-partitioned stage. AQE splits skewed *joins* in batch, but
streaming stateful ops and plain repartitions need explicit salting:

- ``salted_repartition``: spread one key's rows over ``n_salts``
  partitions (for narrow work after the shuffle).
- ``salted_agg``: two-phase aggregate — partial agg on (key, salt),
  final agg on key. The partial output is ≤ n_salts rows per key, so
  the final shuffle is skew-proof. This mirrors exactly how the
  reference spreads DLP batching over 10 random shards and re-merges.

Session assembly caveat (SURVEY.md §7): session windows must group by
the *unsalted* conv_id — use salted_agg for frequency aggregates, and
rely on state-store partitioning for sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_SALTS = 10  # reference DEFAULT_SHARDS_COUNT (BatchAndDlpDeIdRecords.java:71)


def salt_column(key: Column, n_salts: int = DEFAULT_SALTS, seed: int = 42) -> Column:
    """Deterministic per-row salt derived from the row content hash.

    Uses xxhash64 of (key, spark_partition_id) so rows of one hot key
    spread across salts without a nondeterministic rand()."""
    return F.pmod(
        F.xxhash64(key, F.spark_partition_id(), F.lit(seed)), F.lit(n_salts)
    ).cast("int")


def salted_repartition(
    df: DataFrame, key: str, num_partitions: int, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    salted = df.withColumn("_salt", salt_column(F.col(key), n_salts))
    return salted.repartition(num_partitions, F.col(key), F.col("_salt")).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-proof aggregate for algebraic functions.

    ``aggs`` maps output column -> 'count' | 'sum:<col>'.
    """
    salted = df.withColumn("_salt", salt_column(F.col(keys[0]), n_salts))
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
        elif spec.startswith("sum:"):
            partial_exprs.append(F.sum(spec.split(":", 1)[1]).alias(f"_p_{out}"))
        else:
            raise ValueError(f"unsupported agg spec {spec!r}")
        final_exprs.append(F.sum(f"_p_{out}").alias(out))
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def skew_stats(
    df: DataFrame, key: str, top_n: int = 20, partitions: int = DEFAULT_SALTS
) -> DataFrame:
    """Key-skew diagnostics: the measurement that DECIDES the salting
    the rest of this module applies. For the ``top_n`` heaviest keys,
    emit row count, share of the table, and the salt factor that would
    spread the key back to a uniform per-partition load under a
    ``partitions``-way shuffle (``ceil(share * partitions)``; 1 when
    the key already fits a single uniform partition's quota).

    At 10^12 turns this is how a pipeline operator finds the support-
    bot conv_ids before they stall a stage: one partial-agg groupBy
    shrinks the table to |keys| rows, the global total is a second
    tiny aggregate broadcast back, and the top-n is TakeOrdered
    (per-partition heads, never a full sort shuffle). Deterministic
    tie-break on (count desc, key asc)."""
    if top_n < 1 or partitions < 1:
        raise ValueError(
            f"top_n and partitions must be >= 1, got {top_n}, {partitions}"
        )
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(F.sum("n_rows").cast("long").alias("_tot"))
    uniform = F.col("_tot") / F.lit(partitions)
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            key,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_tot"), 6).alias("share"),
            F.when(
                F.col("n_rows") > uniform,
                F.ceil(F.col("n_rows") * F.lit(partitions) / F.col("_tot")),
            )
            .otherwise(F.lit(1))
            .cast("int")
            .alias("rec_salts"),
        )
        .orderBy(F.col("n_rows").desc(), F.col(key).asc_nulls_last())
        .limit(top_n)
    )


def duckdb_skew_sql(
    table: str, key: str, top_n: int = 20, partitions: int = DEFAULT_SALTS
) -> str:
    """DuckDB twin of ``skew_stats`` (same share rounding, same salt
    rule, same tie-break)."""
    return f"""
        WITH c AS (
          SELECT {key}, CAST(COUNT(*) AS BIGINT) AS n_rows
          FROM {table} GROUP BY {key}
        ), t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS tot FROM c)
        SELECT {key}, n_rows,
               ROUND(n_rows * 1.0 / tot, 6) AS share,
               CAST(CASE WHEN n_rows * 1.0 > tot * 1.0 / {partitions}
                    THEN CEIL(n_rows * {partitions} * 1.0 / tot)
                    ELSE 1 END AS INT) AS rec_salts
        FROM c, t
        ORDER BY n_rows DESC, {key} NULLS LAST
        LIMIT {top_n}
    """


def hot_keys_monitor(
    df: DataFrame,
    key: str,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
    min_count: int = 20,
) -> DataFrame:
    """Windowed hot-key alarm — ``skew_stats``'s live counterpart: per
    tumbling window, emit every key whose row count reaches
    ``min_count`` (the flood threshold an operator pages on). The
    support-bot conv_id that will stall tomorrow's batch shows up here
    in the window it starts flooding. Works on batch and streaming
    inputs alike; streaming shape is ONE windowed groupBy — state is
    one counter per open (window, key), freed as the watermark closes
    each window — with the threshold applied to the closed aggregate,
    emitted once per window in append mode.

    Scale: one shuffle with map-side partial aggregation; the
    threshold filter is codegen on the aggregate output."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    d = df.withWatermark(ts_col, watermark) if watermark is not None else df
    return (
        d.groupBy(F.window(F.col(ts_col), window).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= min_count)
        .select(
            F.col("w.start").alias("window_start"),
            key,
            "n_rows",
        )
    )


def duckdb_hot_keys_sql(
    table: str,
    key: str,
    window_us: int = 3_600_000_000,
    ts_expr: str = "ts",
    min_count: int = 20,
) -> str:
    """DuckDB twin of ``hot_keys_monitor`` (same bucketing and
    threshold; the streaming final-watermark predicate is the caller's
    outer filter)."""
    return f"""
        SELECT make_timestamp((epoch_us({ts_expr}) // {window_us})
                 * {window_us}) AS window_start,
               {key}, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM {table}
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_count}
    """

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

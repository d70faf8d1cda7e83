"""Per-column deterministic sampler (RandomColumnarSampler analogue,
pipeline/RandomColumnarSampler.java:49-63; Sample.fixedSizePerKey).

The reference reservoir-samples ≤ n values per column to bound DLP
cost. A true reservoir is run-order-dependent; for golden equality we
need the *same* sample on every run and partitioning, so we rank by a
salted hash of the value (md5) — uniform for our purposes, and a pure
function of the data.

Scale design: ``Window.partitionBy(column_name)`` alone would funnel
each column's entire data through one task (few distinct columns =
maximal skew). We do a two-phase top-n: phase 1 ranks within
(column_name, salt) buckets — parallelism = n_columns × n_salts — and
keeps ≤ n per bucket; phase 2 ranks the ≤ n×n_salts survivors per
column. Survivor set is tiny, so phase 2's skew is irrelevant. Same
trick the reference hand-rolls with ShardAssigner
(dlp/BatchAndDlpDeIdRecords.java:216-234).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from auto_data_tokenize_spark.operators.identify import unpivot_columns


def sample_per_column(
    df: DataFrame,
    columns: list[str],
    n: int = 1000,
    seed: int = 42,
    n_salts: int = 32,
) -> DataFrame:
    """≤ n deterministic pseudo-random values per column.

    Returns (column_name, value). ``sample_size=0`` keeps everything
    (DlpInspectionOptions.java:25-28 semantics).
    """
    unpivoted = unpivot_columns(df, columns)
    if n == 0:
        return unpivoted

    rank_key = F.md5(F.concat_ws("\x1f", F.lit(str(seed)), F.col("column_name"), F.col("value")))
    salted = unpivoted.withColumn("_rk", rank_key).withColumn(
        "_salt", F.pmod(F.crc32(F.col("_rk")), F.lit(n_salts)).cast("int")
    )

    w1 = Window.partitionBy("column_name", "_salt").orderBy("_rk", "value")
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= n)
        .drop("_rn", "_salt")
    )

    w2 = Window.partitionBy("column_name").orderBy("_rk", "value")
    return (
        phase1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= n)
        .select("column_name", "value")
    )

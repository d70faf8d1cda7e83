"""Stable ordering operators (SortCsvRow analogue,
common/SortCsvRow.java:85-95 — group by primary column, external
secondary sort).

Spark's UnsafeExternalSorter gives the spill-to-disk behavior the
reference needed a NATIVE BufferedExternalSorter for; we only choose
*where* to sort:

- ``cluster_sorted``: range-repartition on the primary key then sort
  within partitions — total order across output files WITHOUT a
  single-reducer bottleneck; the scalable write path.
- ``globally_sorted``: plain ``orderBy`` for small golden comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cluster_sorted(
    df: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
) -> DataFrame:
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *keys)
    else:
        ranged = df.repartitionByRange(*keys)
    return ranged.sortWithinPartitions(*keys)


def globally_sorted(df: DataFrame, keys: tuple[str, ...] = ("conv_id", "turn_idx")) -> DataFrame:
    return df.orderBy(*keys)

"""SparkSession factory tuned for the tokenize engine.

Scale rationale (100 TB / 1000-executor target):
- AQE on: runtime coalescing + skew-join splitting for the batch paths.
- ``spark.sql.session.timeZone=UTC``: bit-stable timestamps across the
  engine, goldens, and the DuckDB oracle.
- Arrow batch size = 10_000 rows: the Arrow batch is our unit of
  vectorized detection/tokenization work — the analogue of the
  reference's 480 KB/50k-cell DLP request batches
  (dlp/BatchColumnsForDlp.java:41-43); large enough to amortize the
  Python bridge, small enough to keep executor memory bounded when
  `text` cells are fat.
- shuffle.partitions defaults to the local core count; on a real
  cluster this is overridden (or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch rows per UDF invocation — the vectorized-batch boundary
# (semantics of the reference's DLP batching, BatchColumnsForDlp.java:50-54).
ARROW_BATCH_ROWS = 10_000


def get_spark(
    app_name: str = "auto-data-tokenize-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` → ``local[*]`` locally; on a real cluster the master
    comes from spark-submit and this builder only applies SQL confs.
    """
    # Python workers inherit the JVM's env, not the driver's sys.path:
    # make this package importable on executors regardless of launch cwd
    # (the local-mode analogue of `spark-submit --py-files`).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if repo_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{repo_root}{os.pathsep}{pypath}" if pypath else repo_root
        )

    env_cores = os.environ.get("SPARK_GRAFT_CPUS")
    if cores is None and env_cores:
        cores = int(env_cores)
    # Under spark-submit the driver python process is launched by
    # PythonRunner with a live gateway (PYSPARK_GATEWAY_PORT set) and
    # the master comes from --master; calling .master(local[...]) there
    # would OVERRIDE it and silently run the whole job single-node on
    # the driver. Only pin a local master when this process owns the
    # session (builder confs win over spark-submit system properties).
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    builder = SparkSession.builder.appName(app_name)
    if not submitted:
        builder = builder.master(f"local[{cores}]" if cores else "local[*]")
    if shuffle_partitions is None and not submitted:
        # the local default; under spark-submit leave the cluster's
        # --conf (or AQE coalescing) in charge unless explicitly passed
        shuffle_partitions = cores or (os.cpu_count() or 8)
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions)
        )

    builder = (
        builder
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_BATCH_ROWS),
        )
        .config("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "true")
        # ObjectHashAggregate (string-buffer aggs: the minhash 64-min
        # signature, collect_set reports) falls back to SORT-based
        # aggregation at only 128 keys per partition by default; the
        # bench corpora sit just above that. 4096 keys × 64×32B buffers
        # ≈ 8 MB per partition stays comfortably hash-based (measured
        # neutral at sf0.1 in isolation, avoids the sort path under
        # long-session memory pressure); beyond the threshold the sort
        # fallback remains the correct spill-aware scale path.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
        .config("spark.driver.memory", os.environ.get("ADT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()

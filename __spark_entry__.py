"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship tokenize query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL for the correctness gate.

The engine's primary input (transcripts) is not part of the driver's
TPC-H-ish tables, so it is synthesized deterministically (seed-fixed;
auto_data_tokenize_spark/datagen.py) under ``/root/repo/data/<sf>/``,
and oracle SQL reads those parquet files via absolute-path
``read_parquet``. Queries over ``events``/``documents``/``embeddings``
use the driver's pre-registered views directly.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

REPO = os.path.dirname(os.path.abspath(__file__))


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark import datagen
    from auto_data_tokenize_spark.sources.readers import read_transcripts

    d = datagen.ensure_sf(_sf_name(sf_dir))
    return read_transcripts(spark, os.path.join(d, "transcripts.parquet"))


def _detections(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark.operators.identify import detections

    return detections(_transcripts(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: free-form detect+tokenize of the transcript table
    under stable (conv_id, turn_idx) ordering (the reference's
    CsvTokenizationAndOrderingPipeline query)."""
    from auto_data_tokenize_spark.operators.ordering import globally_sorted
    from auto_data_tokenize_spark.operators.tokenize import tokenize_turns

    df = _transcripts(spark, "/root/testdata/sf0.001")
    return globally_sorted(
        tokenize_turns(df).select("conv_id", "turn_idx", "role", "text_tok", "ts")
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q01_tokenize_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark.operators.tokenize import tokenize_turns

    return tokenize_turns(_transcripts(spark, sf_dir)).select(
        "conv_id", "turn_idx", "text_tok"
    )


def q02_detections(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _detections(spark, sf_dir).select(
        "conv_id", "turn_idx", "info_type", "start", "end", "token"
    )


def q03_column_infotype_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark.operators.identify import column_infotype_counts

    return column_infotype_counts(_transcripts(spark, sf_dir), ["text"]).select(
        "column_name", "info_type", F.col("count").alias("n")
    )


def q04_infotype_freq_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark.operators.windows import infotype_frequencies

    return infotype_frequencies(_detections(spark, sf_dir), "5 minutes")


def q05_session_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark.operators.windows import session_reports

    return session_reports(_detections(spark, sf_dir), "30 minutes").select(
        "conv_id", "session_start", "session_end", "n_detections", "n_info_types"
    )


def q06_sample_per_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark.operators.sampler import sample_per_column

    return sample_per_column(
        _transcripts(spark, sf_dir), ["text", "role", "tool"], n=50, seed=42
    )


def q07_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def q08_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from auto_data_tokenize_spark.operators.windows import sessionize_generic

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return sessionize_generic(
        ev, "user_id", gap="30 minutes", value_col="value"
    )


def q09_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_tokenize_turns": q01_tokenize_turns,
        "q02_detections": q02_detections,
        "q03_column_infotype_counts": q03_column_infotype_counts,
        "q04_infotype_freq_tumbling": q04_infotype_freq_tumbling,
        "q05_session_reports": q05_session_reports,
        "q06_sample_per_column": q06_sample_per_column,
        "q07_events_tumbling": q07_events_tumbling,
        "q08_events_sessionize": q08_events_sessionize,
        "q09_exact_dedup": q09_exact_dedup,
    }


# --------------------------------------------------------------------------
# oracles (DuckDB SQL)
# --------------------------------------------------------------------------


def oracle_sql(sf_name: str = "sf0.01") -> dict[str, str]:
    d = f"{REPO}/data/{sf_name}"
    tr = f"read_parquet('{d}/transcripts.parquet')"
    det = f"read_parquet('{d}/detections.parquet')"
    tok = f"read_parquet('{d}/tokenized_turns.parquet')"

    return {
        "q01_tokenize_turns": f"""
            SELECT conv_id, turn_idx, text_tok FROM {tok}
        """,
        "q02_detections": f"""
            SELECT conv_id, turn_idx, info_type, start, "end", token FROM {det}
        """,
        "q03_column_infotype_counts": f"""
            SELECT '$.text' AS column_name, info_type, COUNT(*) AS n
            FROM {det} GROUP BY 1, 2
        """,
        "q04_infotype_freq_tumbling": f"""
            SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000) AS window_start,
                   make_timestamp((epoch_us(ts) // 300000000) * 300000000 + 300000000) AS window_end,
                   info_type, COUNT(*) AS n
            FROM {det}
            GROUP BY 1, 2, 3
        """,
        "q05_session_reports": f"""
            WITH o AS (
              SELECT conv_id, ts, info_type,
                     CASE WHEN lag(ts) OVER (PARTITION BY conv_id ORDER BY ts) IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY ts) > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
              FROM {det}
            ), s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts) AS sess
              FROM o
            )
            SELECT conv_id,
                   MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   COUNT(*) AS n_detections,
                   COUNT(DISTINCT info_type) AS n_info_types
            FROM s GROUP BY conv_id, sess
        """,
        "q06_sample_per_column": f"""
            WITH up AS (
              SELECT '$.text' AS column_name, CAST(text AS VARCHAR) AS value FROM {tr}
              UNION ALL
              SELECT '$.role', CAST(role AS VARCHAR) FROM {tr}
              UNION ALL
              SELECT '$.tool', CAST(tool AS VARCHAR) FROM {tr}
            ), f AS (
              SELECT * FROM up WHERE value IS NOT NULL AND trim(value) <> ''
            ), r AS (
              SELECT column_name, value,
                     ROW_NUMBER() OVER (
                       PARTITION BY column_name
                       ORDER BY md5(concat_ws(chr(31), '42', column_name, value)), value
                     ) AS rn
              FROM f
            )
            SELECT column_name, value FROM r WHERE rn <= 50
        """,
        "q07_events_tumbling": """
            SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
                   make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 + 3600000000) AS window_end,
                   event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2, 3
        """,
        "q08_events_sessionize": """
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
              FROM events
            ), s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
              FROM o
            )
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM s GROUP BY user_id, sess
        """,
        "q09_exact_dedup": """
            SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY 1
        """,
    }

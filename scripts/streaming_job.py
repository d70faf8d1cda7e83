"""Standalone streaming job for ``spark-submit --py-files``.

Usage (cluster):
  spark-submit --master <url> --py-files adt.zip scripts/streaming_job.py \
      --input <transcripts-stream-dir> --output <table-dir> \
      --checkpoint <ckpt-dir> [--mode tokenize|freq|sessions] \
      [--watermark "10 minutes"]

Local two-cluster-size scaling evidence (north_rule):
  scripts/submit.sh runs this job at N and 4N cores on the same input
  and reports throughput at both.

The job builds no SparkSession config of its own beyond SQL tuning —
master/executors come from spark-submit, exactly as on a real cluster.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--mode", default="tokenize",
                   choices=["tokenize", "freq", "sessions"])
    p.add_argument("--watermark", default="10 minutes")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"adt-stream-{args.mode}")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    cores = spark.sparkContext.defaultParallelism

    from auto_data_tokenize_spark.streaming import pipeline, source
    from auto_data_tokenize_spark.streaming.listener import JsonlMetricsListener
    from auto_data_tokenize_spark.streaming.sink import ExactlyOnceSink

    listener = JsonlMetricsListener(f"{args.output}/_metrics")
    spark.streams.addListener(listener)

    st = source.transcripts_stream(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger
    )
    if args.mode == "tokenize":
        stream_df = pipeline.tokenize_stream(st)
    elif args.mode == "freq":
        stream_df = pipeline.infotype_freq_stream(st, watermark=args.watermark)
    else:
        stream_df = pipeline.session_report_stream(st, watermark=args.watermark)

    sink = ExactlyOnceSink(args.output)
    t0 = time.perf_counter()
    pipeline.run_to_sink(stream_df, sink, args.checkpoint)
    elapsed = time.perf_counter() - t0

    rows = sink.total_rows()
    print(
        json.dumps(
            {
                "mode": args.mode,
                "cores": cores,
                "elapsed_sec": round(elapsed, 3),
                "rows_committed": rows,
                "rows_per_sec": round(rows / elapsed, 1),
                "batches": len(sink.committed_batches()),
            }
        ),
        file=sys.stdout,
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

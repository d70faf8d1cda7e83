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
    p.add_argument("--sink", default="table", choices=["table", "noop"],
                   help="'table' = exactly-once commit-log sink (includes "
                        "local-disk write, which saturates in this sandbox); "
                        "'noop' = engine path only, isolates compute scaling")
    p.add_argument("--warmup-input", default=None,
                   help="small input dir run (untimed) first, so JVM JIT "
                        "and Python worker spawn don't pollute the "
                        "throughput measurement")
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

    if args.warmup_input:
        wsink = ExactlyOnceSink(f"{args.output}_warmup")
        pipeline.run_to_sink(
            pipeline.tokenize_stream(
                source.transcripts_stream(spark, args.warmup_input)
            ),
            wsink,
            f"{args.checkpoint}_warmup",
        )

    # listener attaches after warmup so _metrics carries only the timed run
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

    if args.sink == "noop":
        t0 = time.perf_counter()
        q = (
            stream_df.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", args.checkpoint)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        elapsed = time.perf_counter() - t0
        sink = None
        rows = sum(
            json.loads(ln).get("num_input_rows", 0)
            for ln in open(listener.path)
            if '"progress"' in ln
        )
    else:
        sink = ExactlyOnceSink(args.output)
        t0 = time.perf_counter()
        pipeline.run_to_sink(stream_df, sink, args.checkpoint)
        elapsed = time.perf_counter() - t0
        rows = sink.total_rows()

    # steady-state throughput: drop the first timed batch (python worker
    # spawn + JIT land there); at 10^12-turn scale the stream runs for
    # days and steady state IS the throughput.
    steady = None
    try:
        progress = [
            json.loads(ln)
            for ln in open(listener.path)
            if '"progress"' in ln
        ]
        if sink is not None:
            lineage = {c["batch_id"]: c["row_count"] for c in sink.lineage()}
        else:
            lineage = {
                p["batch_id"]: p["num_input_rows"]
                for p in progress
                if p.get("num_input_rows", 0) > 0
            }
        batches = [
            (p["batch_id"], p["duration_ms"].get("triggerExecution", 0))
            for p in progress
            if p.get("num_input_rows", 0) > 0 and p["batch_id"] in lineage
        ]
        if len(batches) >= 2:
            tail = batches[1:]
            t_rows = sum(lineage[b] for b, _ in tail)
            t_ms = sum(ms for _, ms in tail)
            if t_ms > 0:
                steady = round(t_rows / (t_ms / 1000.0), 1)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "mode": args.mode,
                "cores": cores,
                "elapsed_sec": round(elapsed, 3),
                "rows_committed": rows,
                "rows_per_sec": round(rows / elapsed, 1),
                "steady_rows_per_sec": steady,
                "sink": args.sink,
                "batches": len(sink.committed_batches()) if sink else None,
            }
        ),
        file=sys.stdout,
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

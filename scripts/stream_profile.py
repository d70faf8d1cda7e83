"""Per-micro-batch duration breakdown for the streaming queries
(round-6 measurement tooling; guide §1.1 empirical loop).

Monkeypatches ``pipeline.run_to_sink`` and the gate ``run`` methods to
capture ``StreamingQuery.recentProgress`` after the drain, then runs
the named queries once and prints each micro-batch's ``durationMs``
(addBatch / getBatch / queryPlanning / walCommit / commitOffsets /
stateOperators commit times).

Usage: python scripts/stream_profile.py q129_stream_dup_rate ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

CAPTURED: list[dict] = []


def _capture(q) -> None:
    for p in q.recentProgress:
        CAPTURED.append(
            {
                "batchId": p["batchId"],
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": [
                    {
                        k: s.get(k)
                        for k in (
                            "operatorName",
                            "commitTimeMs",
                            "numRowsTotal",
                            "numPartitions" if "numPartitions" in s else "numRowsUpdated",
                        )
                    }
                    for s in p.get("stateOperators", [])
                ],
            }
        )


def main() -> None:
    names = sys.argv[1:]
    import __spark_entry__ as em
    from auto_data_tokenize_spark.session import get_spark
    from auto_data_tokenize_spark.streaming import pipeline

    # patch run_to_sink
    orig = pipeline.run_to_sink

    def patched(stream_df, sink, checkpoint_dir, output_mode="append",
                query_name="adt", shuffle_partitions=None):
        spark = stream_df.sparkSession
        old = None
        if shuffle_partitions is not None:
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        try:
            q = (
                stream_df.writeStream.outputMode(output_mode)
                .queryName(query_name)
                .option("checkpointLocation", checkpoint_dir)
                .foreachBatch(sink.foreach_batch)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                _capture(q)
                q.stop()
        finally:
            if old is not None:
                spark.conf.set("spark.sql.shuffle.partitions", old)
        if q.exception() is not None:
            raise RuntimeError(str(q.exception()))

    pipeline.run_to_sink = patched

    # patch the gate run() methods (they start their own queries)
    from auto_data_tokenize_spark.streaming import ingest

    def make_gate_run(cls):
        def run(self, stream_df, checkpoint_dir, query_name="adt-gate"):
            q = (
                stream_df.writeStream.outputMode("append")
                .queryName(query_name)
                .option("checkpointLocation", checkpoint_dir)
                .foreachBatch(self.foreach_batch)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                _capture(q)
                q.stop()
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))
        return run

    for cls_name in (
        "FluencyGate",
        "IngestAdmissionPipeline",
        "DsirGate",
        "BoilerplateGate",
        "SemanticDedupGate",
        "NbQualityGate",
        "AsofEnrichGate",
    ):
        cls = getattr(ingest, cls_name)
        cls.run = make_gate_run(cls)

    qs = em.queries()
    spark = get_spark("adt-stream-profile", cores=CPUS, shuffle_partitions=CPUS)
    try:
        spark.sparkContext.setJobDescription("warmup")
        em.q01_tokenize_turns(spark, "/root/testdata/sf0.001").write.mode(
            "overwrite"
        ).format("noop").save()
        for name in names:
            CAPTURED.clear()
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.mode("overwrite").format("noop").save()
            wall = round(time.perf_counter() - t0, 3)
            print(f"=== {name}: wall={wall}s, {len(CAPTURED)} batches")
            for rec in CAPTURED:
                print(json.dumps(rec))
            tot = {}
            for rec in CAPTURED:
                for k, v in (rec["durationMs"] or {}).items():
                    tot[k] = tot.get(k, 0) + v
            print(f"--- totals(ms): {json.dumps(tot)}", flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()

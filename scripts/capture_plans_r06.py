"""Capture .explain('formatted') evidence for the round-6 touched
queries into plans/r06/ (the judge checks plan claims against these).

For stream-backed queries the returned DataFrame is just the committed-
files reader, so the meaningful plan is the INTERNAL streaming/batch
DataFrame; this script reconstructs those with the touched knob off
(_before) and on (_after). Batch queries are captured whole.

Usage: python scripts/capture_plans_r06.py [names...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r06")


def _w(name: str, df) -> None:
    import contextlib
    import io

    os.makedirs(OUT, exist_ok=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(f"wrote plans/r06/{name}.txt")


def main() -> None:
    only = set(sys.argv[1:]) or None
    import __spark_entry__ as em
    from auto_data_tokenize_spark.session import get_spark

    spark = get_spark("plan-capture-r06", cores=32, shuffle_partitions=32)

    def want(name: str) -> bool:
        return only is None or any(name.startswith(o) for o in only)

    # --- q28: per-key vs bucketed CEP state -------------------------------
    if want("q28"):
        import tempfile

        import pandas as pd

        from auto_data_tokenize_spark.streaming.cep import (
            escalation_alerts_stream,
        )

        d = tempfile.mkdtemp(prefix="plancap_")
        pd.DataFrame(
            {
                "conv_id": ["c"],
                "info_type": ["EMAIL_ADDRESS"],
                "ts": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]"),
            }
        ).to_parquet(f"{d}/x.parquet", index=False)
        st = spark.readStream.schema(
            "conv_id string, info_type string, ts timestamp"
        ).parquet(d)
        _w("q28_cep_before", escalation_alerts_stream(st, min_distinct=3))
        _w(
            "q28_cep_after",
            escalation_alerts_stream(st, min_distinct=3, state_buckets=8),
        )

    # --- q142: unhinted vs broadcast stream-static index join -------------
    if want("q142"):
        from auto_data_tokenize_spark.operators.conversations import (
            corpus_fingerprint_index,
            turn_containment_stream,
        )

        import tempfile

        import pandas as pd

        tr = em._transcripts(spark, SF_DIR)
        idx = corpus_fingerprint_index(tr)
        d2 = tempfile.mkdtemp(prefix="plancap_")
        pd.DataFrame(
            {
                "conv_id": ["c"],
                "text": ["t"],
                "ts": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]"),
            }
        ).to_parquet(f"{d2}/x.parquet", index=False)
        feed = spark.readStream.schema(
            "conv_id string, text string, ts timestamp"
        ).parquet(d2)
        _w(
            "q142_containment_before",
            turn_containment_stream(feed, threshold=0.8, index=idx),
        )
        _w(
            "q142_containment_after",
            turn_containment_stream(
                feed, threshold=0.8, index=idx, broadcast_index=True
            ),
        )

    # --- q129: state-partition sizing (Exchange partitioning arity) -------
    if want("q129"):
        import tempfile

        import pandas as pd

        from auto_data_tokenize_spark.operators.dedup import dup_rate_monitor

        d3 = tempfile.mkdtemp(prefix="plancap_")
        pd.DataFrame(
            {
                "doc_id": [1],
                "text": ["t"],
                "ts": pd.to_datetime(["2026-01-01"]).astype("datetime64[us]"),
            }
        ).to_parquet(f"{d3}/x.parquet", index=False)
        st = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).parquet(d3)
        mon = dup_rate_monitor(st, window="1 minute", watermark="30 seconds")
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        _w("q129_monitor_before_8parts", mon)
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        _w("q129_monitor_after_2parts", mon)
        spark.conf.set("spark.sql.shuffle.partitions", old)

    # --- q50: persisted static verify side --------------------------------
    if want("q50"):
        import tempfile

        import pandas as pd

        from auto_data_tokenize_spark.operators.sketches import (
            bloom_maybe_expr,
            bloom_words_array,
        )

        docs = em._documents(spark, SF_DIR)
        corpus = docs.filter("doc_id % 2 = 0").select("doc_id", "text")
        words = bloom_words_array(corpus, m_bits=2048)
        d4 = tempfile.mkdtemp(prefix="plancap_")
        pd.DataFrame({"doc_id": [1], "text": ["t"]}).to_parquet(
            f"{d4}/x.parquet", index=False
        )
        st = spark.readStream.schema("doc_id long, text string").parquet(d4)
        survivors = st.filter(bloom_maybe_expr("text", words, m_bits=2048))
        from pyspark.sql import functions as F

        plain = corpus.select(F.col("text").alias("_cv")).distinct()
        _w(
            "q50_verify_before_unpersisted",
            survivors.join(
                F.broadcast(plain), survivors["text"] == F.col("_cv"), "left"
            ).select("doc_id", F.col("_cv").isNotNull().alias("is_dup")),
        )
        pers = plain.persist()
        pers.count()
        _w(
            "q50_verify_after_persisted",
            survivors.join(
                F.broadcast(pers), survivors["text"] == F.col("_cv"), "left"
            ).select("doc_id", F.col("_cv").isNotNull().alias("is_dup")),
        )
        pers.unpersist()

    # --- whole-query batch plans ------------------------------------------
    batch = [
        "q38_dup_clusters",
        "q39_corpus_prep",
        "q138_entity_clusters",
        "q140_conversation_near_dups",
        "q141_conversation_dedup",
        "q37_avro_tokenize_roundtrip",
    ]
    qs = em.queries()
    for name in batch:
        if want(name.split("_")[0]):
            _w(name, qs[name](spark, SF_DIR))

    spark.stop()


if __name__ == "__main__":
    main()

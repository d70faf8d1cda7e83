"""CsvTokenizationAndOrderingPipeline parity: CSV in → free-form
tokenize → stable (conv_id, turn_idx) order → sharded CSV out, matching
the parquet-path golden byte-for-byte (reference golden test shape:
test/pipeline/CsvTokenizationAndOrderingPipelineTest.java:117-219)."""

import glob

import pandas as pd
import pytest
from pyspark.sql import functions as F

from auto_data_tokenize_spark.plans import pipelines
from auto_data_tokenize_spark.sources.readers import read_source


@pytest.fixture(scope="module")
def csv_input(sf_dir_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("csv_in")
    df = pd.read_parquet(f"{sf_dir_small}/transcripts.parquet")
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
    df.to_csv(d / "chats.csv", index=False)
    return str(d / "chats.csv")


def test_csv_tokenize_and_order_matches_golden(spark, csv_input, sf_dir_small, tmp_path):
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    df = read_source(spark, "CSV_FILE", csv_input, schema=schema)
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))

    cfg = pipelines.EncryptConfig(free_form_columns=["text"], scope_col="conv_id")
    out = pipelines.tokenize_and_order(df, cfg, num_partitions=5)

    out_dir = str(tmp_path / "csv_out")
    # sharded CSV sink (csvFileShardCount semantics,
    # CsvTokenizationAndOrderingPipeline.java:52-55,118-122)
    (
        out.select("conv_id", "turn_idx", "text")
        .write.option("header", True)
        .option("escape", '"')
        .csv(out_dir)
    )
    shards = glob.glob(f"{out_dir}/part-*.csv")
    assert len(shards) == 5

    got = (
        pd.concat([pd.read_csv(s, dtype={"conv_id": str}) for s in shards])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = pd.read_parquet(f"{sf_dir_small}/tokenized_turns.parquet")[
        ["conv_id", "turn_idx", "text_tok"]
    ].rename(columns={"text_tok": "text"}).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], want, check_dtype=False
    )


def test_range_partitioned_output_is_clustered(spark, csv_input):
    """cluster_sorted gives a total order across shards without a
    single-reducer sort (SortCsvRow's scalable restatement)."""
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    df = read_source(spark, "CSV_FILE", csv_input, schema=schema)
    cfg = pipelines.EncryptConfig(free_form_columns=["text"], scope_col="conv_id")
    out = pipelines.tokenize_and_order(df, cfg, num_partitions=4)
    parts = out.select(
        F.spark_partition_id().alias("pid"), "conv_id"
    ).groupBy("pid").agg(F.min("conv_id").alias("lo"), F.max("conv_id").alias("hi"))
    rows = sorted(parts.collect(), key=lambda r: r["lo"])
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]  # ranges don't interleave


def test_headerless_csv_synthesizes_col_names(spark, tmp_path):
    p = tmp_path / "nohdr.csv"
    p.write_text("a,1\nb,2\n")
    df = read_source(spark, "CSV_FILE", str(p), header=False)
    assert df.columns == ["col_0", "col_1"]


def test_avro_gated_cleanly(spark, tmp_path):
    with pytest.raises(Exception) as ei:
        read_source(spark, "AVRO", str(tmp_path)).count()
    assert "avro" in str(ei.value).lower()


def test_csv_avro_schema_matches_reference_golden():
    """The synthetic CSV record schema equals the reference's own
    five_column_csv_schema.json for headerless col_N columns."""
    import json

    from auto_data_tokenize_spark.sources.readers import csv_avro_schema

    with open(
        "/root/reference/src/test/resources/five_column_csv_schema.json"
    ) as f:
        want = json.load(f)
    got = csv_avro_schema([f"col_{i}" for i in range(5)])
    assert got == want

"""Source/sink edges: the JDBC query builder (pure string logic — no
database in this sandbox, mirroring TransformingReader.java:301-309),
the Avro gate (reference's primary format; round-trips automatically
if the spark-avro jar is ever present, else asserts the failure is
clean and actionable), and the ExactlyOnceSink guards (POSIX path
validation + the gated Iceberg branch)."""

import pytest

from auto_data_tokenize_spark.sources.readers import build_jdbc_query, read_source
from auto_data_tokenize_spark.streaming.sink import ExactlyOnceSink


# -- JDBC query builder ------------------------------------------------------


def test_jdbc_table_only():
    assert build_jdbc_query("users", None) == "SELECT * FROM users"


def test_jdbc_table_with_filter():
    assert (
        build_jdbc_query("users", None, "id > 100 AND region = 'eu'")
        == "SELECT * FROM users WHERE id > 100 AND region = 'eu'"
    )


def test_jdbc_explicit_query_passthrough():
    q = "SELECT a, b FROM t JOIN u USING (k) WHERE u.x = 1"
    assert build_jdbc_query(None, q) == q


def test_jdbc_rejects_both_and_neither():
    with pytest.raises(ValueError, match="exactly one"):
        build_jdbc_query("users", "SELECT 1")
    with pytest.raises(ValueError, match="exactly one"):
        build_jdbc_query(None, None)


def test_jdbc_rejects_filter_on_query():
    with pytest.raises(ValueError, match="filter_clause"):
        build_jdbc_query(None, "SELECT 1", "x = 1")


# -- Credential provider seam (TransformingReader.java:256-310) --------------


@pytest.fixture
def clean_credential_registry():
    from auto_data_tokenize_spark.sources import credentials

    credentials.register_credential_provider(None)
    yield
    credentials.register_credential_provider(None)


def test_credential_static_provider(clean_credential_registry):
    from auto_data_tokenize_spark.sources.credentials import (
        StaticCredentialProvider,
        register_credential_provider,
        resolve_credential,
    )

    register_credential_provider(
        StaticCredentialProvider({"db/prod/password": "s3cr3t"})
    )
    assert resolve_credential("db/prod/password") == "s3cr3t"
    with pytest.raises(KeyError, match="no secret registered"):
        resolve_credential("db/stage/password")


def test_credential_env_fallback(clean_credential_registry, monkeypatch):
    from auto_data_tokenize_spark.sources.credentials import resolve_credential

    monkeypatch.setenv("ADT_SECRET_DB_PROD_PASSWORD", "from-env")
    assert resolve_credential("db/prod.password") == "from-env"
    with pytest.raises(KeyError, match="ADT_SECRET_OTHER"):
        resolve_credential("other")


def test_credential_registered_provider_wins_over_env(
    clean_credential_registry, monkeypatch
):
    from auto_data_tokenize_spark.sources.credentials import (
        StaticCredentialProvider,
        register_credential_provider,
        resolve_credential,
    )

    monkeypatch.setenv("ADT_SECRET_REF", "env-value")
    register_credential_provider(StaticCredentialProvider({"ref": "provider-value"}))
    assert resolve_credential("ref") == "provider-value"


def test_credential_registry_type_guard(clean_credential_registry):
    from auto_data_tokenize_spark.sources.credentials import (
        register_credential_provider,
    )

    with pytest.raises(TypeError):
        register_credential_provider(object())


def test_read_jdbc_rejects_password_and_secret():
    # the exclusivity guard fires before any Spark/DB interaction
    from auto_data_tokenize_spark.sources.readers import read_jdbc

    with pytest.raises(ValueError, match="not both"):
        read_jdbc(
            None,
            "jdbc:mysql://h/db",
            table="t",
            password="plain",
            password_secret="db/password",
        )


def test_read_jdbc_resolves_secret_before_load(clean_credential_registry):
    """read_jdbc must consult the provider; an unknown reference fails
    fast driver-side (no dangling connection attempt)."""
    from auto_data_tokenize_spark.sources.credentials import (
        StaticCredentialProvider,
        register_credential_provider,
    )
    from auto_data_tokenize_spark.sources.readers import read_jdbc

    register_credential_provider(StaticCredentialProvider({}))
    with pytest.raises(KeyError, match="no secret registered"):
        read_jdbc(None, "jdbc:mysql://h/db", table="t", password_secret="nope")


# -- Avro gate ---------------------------------------------------------------


def test_avro_roundtrip_or_clean_gate(spark, transcripts_small, tmp_path):
    """If the spark-avro jar is on the classpath: full write→read→
    compare round-trip (the reference's main tutorial flow,
    TransformingReader.java:221-223 / EncryptionPipeline.java:125-132).
    Otherwise: the failure must be immediate and name the missing
    format — not a deep executor stack trace."""
    path = str(tmp_path / "avro_out")
    sample = transcripts_small.select("conv_id", "turn_idx", "role", "text").limit(50)
    try:
        sample.write.format("avro").save(path)
    except Exception as e:  # noqa: BLE001 — asserting gate quality
        msg = str(e).lower()
        assert "avro" in msg, f"gate failure does not name avro: {e}"
        pytest.skip("spark-avro jar not on classpath; clean gate verified")
    back = read_source(spark, "AVRO", path)
    a = sorted(map(tuple, sample.collect()))
    b = sorted(map(tuple, back.select("conv_id", "turn_idx", "role", "text").collect()))
    assert a == b


# -- ExactlyOnceSink guards --------------------------------------------------


def test_sink_rejects_url_scheme_paths(tmp_path):
    with pytest.raises(ValueError, match="POSIX"):
        ExactlyOnceSink("hdfs://nn/warehouse/t")
    with pytest.raises(ValueError, match="POSIX"):
        ExactlyOnceSink("s3a://bucket/t")


def test_sink_iceberg_requires_table_name(tmp_path):
    with pytest.raises(ValueError, match="iceberg_table"):
        ExactlyOnceSink(str(tmp_path / "t"), use_iceberg=True)


def test_sink_iceberg_gate_is_clean(spark, tmp_path):
    """Without the Iceberg runtime jar the first write must raise an
    actionable RuntimeError (not an opaque Py4J ClassNotFound)."""
    from auto_data_tokenize_spark.streaming.source import iceberg_available

    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; gate not exercisable")
    sink = ExactlyOnceSink(
        str(tmp_path / "t"), use_iceberg=True, iceberg_table="cat.db.t"
    )
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        sink.foreach_batch(df, 0)


# -- bucketed co-located joins -------------------------------------------------


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key with the same bucket count
    join with NO Exchange on either side — the shuffle-free shape the
    dedup verify joins take at scale."""
    from pyspark.sql import functions as F

    from auto_data_tokenize_spark.sources.bucketing import write_bucketed

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("text")
    )
    stats = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("score")
    )
    t1 = write_bucketed(docs, "adt_b_docs", str(tmp_path / "t1"), "doc_id", buckets=8)
    t2 = write_bucketed(stats, "adt_b_stats", str(tmp_path / "t2"), "doc_id", buckets=8)

    joined = t1.hint("merge").join(t2, "doc_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:800]
    assert joined.count() == 1000

    # control: the same join on plain (unbucketed) parquet DOES shuffle
    docs.write.mode("overwrite").parquet(str(tmp_path / "p1"))
    stats.write.mode("overwrite").parquet(str(tmp_path / "p2"))
    plain = (
        spark.read.parquet(str(tmp_path / "p1"))
        .hint("merge")
        .join(spark.read.parquet(str(tmp_path / "p2")), "doc_id")
    )
    assert "Exchange" in plain._jdf.queryExecution().executedPlan().toString()
    spark.sql("DROP TABLE IF EXISTS adt_b_docs")
    spark.sql("DROP TABLE IF EXISTS adt_b_stats")


def test_streaming_csv_ingestion(spark, transcripts_small, tmp_path):
    """CSV drops stream natively (readStream.csv with the RFC4180
    quoting read_source uses) — transcripts land as micro-batches and
    tokenize downstream, equal to the batch path."""
    import os

    from auto_data_tokenize_spark.operators.tokenize import tokenize_turns
    from auto_data_tokenize_spark.streaming import pipeline
    from auto_data_tokenize_spark.streaming.sink import ExactlyOnceSink

    sample = transcripts_small.select("conv_id", "turn_idx", "role", "text", "ts").limit(100)
    drop_dir = str(tmp_path / "csv_drops")
    os.makedirs(drop_dir)
    sample.toPandas().to_csv(f"{drop_dir}/part0.csv", index=False)

    st = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, ts timestamp"
        )
        .option("header", True)
        .option("escape", '"')
        .csv(drop_dir)
    )
    sink = ExactlyOnceSink(str(tmp_path / "csv_out"))
    pipeline.run_to_sink(
        tokenize_turns(st).select("conv_id", "turn_idx", "text_tok"),
        sink,
        str(tmp_path / "csv_ckpt"),
    )
    got = sink.read_committed(spark)
    want = tokenize_turns(sample).select("conv_id", "turn_idx", "text_tok")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


# -- JDBC against a REAL database (embedded Derby on the Spark classpath) ----


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


def test_read_jdbc_roundtrip_real_database(spark, tmp_path):
    """End-to-end JDBC against a real embedded Derby database (the jar
    Spark ships for the Hive metastore): write a table through the
    JDBC sink, read it back through read_jdbc in table, filtered, and
    query modes — the integration the reference covers with
    Testcontainers MySQL (TestDbContainerFactory.java,
    DlpInspectionPipelineTest.java:214-219)."""
    import pytest as _pytest

    from auto_data_tokenize_spark.sources.readers import read_jdbc

    if not _derby_available(spark):
        _pytest.skip("derby jar not on the Spark classpath")
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.createDataFrame(
        [(i, f"name{i}", i % 5) for i in range(100)],
        "id bigint, name string, region int",
    )
    src.write.format("jdbc").options(url=url, dbtable="contacts", **drv).save()

    back = read_jdbc(spark, url, table="contacts", **drv)
    assert back.count() == 100
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    # Derby folds unquoted identifiers to uppercase while Spark's JDBC
    # writer creates quoted lowercase columns — user SQL must quote,
    # exactly as it would against the reference's MySQL with
    # lower_case_table_names=0
    filtered = read_jdbc(
        spark, url, table="contacts", filter_clause='"region" = 3', **drv
    )
    assert filtered.count() == 20
    assert {r["region"] for r in filtered.collect()} == {3}

    q = read_jdbc(
        spark,
        url,
        query='SELECT "region", count(*) AS "n" FROM contacts GROUP BY "region"',
        **drv,
    )
    assert {(r["region"], r["n"]) for r in q.collect()} == {
        (i, 20) for i in range(5)
    }


def test_read_jdbc_partitioned_read_real_database(spark, tmp_path):
    """Partitioned JDBC scan (partitionColumn/numPartitions) against
    embedded Derby — multiple concurrent connections in one JVM."""
    import pytest as _pytest

    from auto_data_tokenize_spark.sources.readers import read_jdbc

    if not _derby_available(spark):
        _pytest.skip("derby jar not on the Spark classpath")
    url = f"jdbc:derby:{tmp_path}/pdb;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.range(0, 1000).selectExpr("id", "id % 7 AS v")
    src.write.format("jdbc").options(url=url, dbtable="t", **drv).save()
    got = read_jdbc(
        spark,
        url,
        table="t",
        partition_column='"id"',  # quoted: Derby folds bare ids to upper
        num_partitions=4,
        lowerBound="0",
        upperBound="1000",
        **drv,
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 1000
    assert got.agg({"v": "sum"}).collect()[0][0] == sum(i % 7 for i in range(1000))


def test_read_jdbc_secret_resolution_real_database(spark, tmp_path):
    """password_secret resolves through the registered provider and the
    resulting option reaches a real JDBC source build (Derby embedded
    accepts any credentials when auth is off — the point is the seam
    feeds the reader, mirroring SecretsClient resolution)."""
    import pytest as _pytest

    from auto_data_tokenize_spark.sources.credentials import (
        StaticCredentialProvider,
        register_credential_provider,
    )
    from auto_data_tokenize_spark.sources.readers import read_jdbc

    if not _derby_available(spark):
        _pytest.skip("derby jar not on the Spark classpath")
    url = f"jdbc:derby:{tmp_path}/sdb;create=true"
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    spark.createDataFrame([(1, "a")], "id bigint, v string").write.format(
        "jdbc"
    ).options(url=url, dbtable="s", **drv).save()
    register_credential_provider(
        StaticCredentialProvider({"warehouse/password": "sekrit"})
    )
    try:
        got = read_jdbc(
            spark,
            url,
            table="s",
            user="app",
            password_secret="warehouse/password",
            **drv,
        )
        assert got.count() == 1
    finally:
        register_credential_provider(None)


# -- ORC dispatch --------------------------------------------------------------


def test_read_source_orc_roundtrip(spark, transcripts_small, tmp_path):
    """ORC is native to Spark — the dispatch must round-trip it like
    parquet (columnar alternative some warehouses export)."""
    sample = transcripts_small.select("conv_id", "turn_idx", "role", "text").limit(50)
    path = str(tmp_path / "orc_src")
    sample.write.orc(path)
    back = read_source(spark, "ORC", path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, sample.collect()))

"""Batch source dispatch (TransformingReader analogue,
common/TransformingReader.java:183-253).

The reference reads 7 source types and converts everything to
FlatRecords; Spark's DataSource V2 already gives us typed, prunable,
pushdown-capable scans, so "dispatch" is just choosing the reader.
JDBC/BigQuery-style sources are represented by ``read_jdbc``,
integration-tested against a REAL embedded Derby database (round-trip,
pushdown, query mode, secret-resolved credentials, partitioned range
reads — tests/test_sources_and_sinks.py); CSV mirrors the reference's
header/delimiter handling (common/CsvIO.java:94-124,453-499).

``ensure_parallelism``: UDF-heavy stages need ≥ one partition per core.
At production scale (100 TB, many files) parquet scans naturally yield
thousands of splits and this is a no-op; at bench scale a single small
file would otherwise serialize the whole detect+tokenize stage onto one
core, so we pay one cheap shuffle of the raw text. The check costs one
plan analysis, no job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def read_transcripts(
    spark: SparkSession, path: str, min_partitions: int | None = None
) -> DataFrame:
    return ensure_parallelism(spark.read.parquet(path), min_partitions)


def read_source(
    spark: SparkSession,
    source_type: str,
    path: str | None = None,
    **options,
) -> DataFrame:
    """Source-type dispatch table (TransformingReader.java:221-236)."""
    st = source_type.upper()
    if st in ("PARQUET", "PARQUET_FILE"):
        return spark.read.parquet(path)
    if st in ("AVRO", "AVRO_FILE"):
        # native spark-avro source when the jar is present, else the
        # pure-Python container codec fallback (sources/avro_io.py)
        from auto_data_tokenize_spark.sources.avro_io import read_avro

        return read_avro(spark, path)
    if st in ("CSV", "CSV_FILE"):
        header = options.pop("header", True)
        sep = options.pop("delimiter", ",")
        schema = options.pop("schema", None)
        # RFC 4180 doubled-quote escaping (the Commons-CSV default the
        # reference uses, common/CsvIO.java:94-124) — Spark defaults to
        # backslash escape, which mangles quoted free text
        options.setdefault("escape", '"')
        reader = spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.csv(path, header=header, sep=sep)
        if not header and schema is None:
            # headerless CSV: synthesize col_N names, parity with
            # common/CsvIO.java:481-492
            for i, c in enumerate(df.columns):
                df = df.withColumnRenamed(c, f"col_{i}")
        return df
    if st in ("JSON", "JSON_FILE", "JSONL"):
        return spark.read.options(**options).json(path)
    if st in ("ORC", "ORC_FILE"):
        return spark.read.options(**options).orc(path)
    if st in ("JDBC_TABLE", "JDBC_QUERY"):
        return read_jdbc(spark, **options)
    raise ValueError(f"unsupported source type: {source_type}")


def csv_avro_schema(headers: list[str]) -> dict:
    """The synthetic all-string Avro record the reference fabricates
    for CSV sources (CsvRowFlatRecordConvertors.makeCsvAvroSchema,
    :113-125): record ``CsvRecord`` with doc
    ``"CsvRecord created by auto-data-tokenize"`` and one string field
    per header, in order. Golden-pinned against the reference's own
    ``five_column_csv_schema.json``."""
    return {
        "type": "record",
        "name": "CsvRecord",
        "doc": "CsvRecord created by auto-data-tokenize",
        "fields": [{"name": h, "type": "string"} for h in headers],
    }


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    filter_clause: str | None = None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    password_secret: str | None = None,
    **options,
) -> DataFrame:
    """JDBC scan with manual filter pushdown into the source SQL —
    semantics of TransformingReader.java:256-310 (query builder 301-309).
    Spark pushes filters on ``dbtable`` reads anyway; ``filter_clause``
    keeps parity with the reference's explicit ``WHERE``.

    ``password_secret`` is an opaque secret *reference* resolved
    driver-side through the registered CredentialProvider
    (sources/credentials.py) — the reference's Secret Manager
    indirection (TransformingReader.java:256-310, SecretsClient.java).
    Mutually exclusive with a plain ``password`` option: the caller
    picks one custody model, never both."""
    if password_secret is not None:
        if "password" in options:
            raise ValueError(
                "pass either password or password_secret, not both"
            )
        from auto_data_tokenize_spark.sources.credentials import (
            resolve_credential,
        )

        options["password"] = resolve_credential(password_secret)
    query = build_jdbc_query(table, query, filter_clause)
    reader = spark.read.format("jdbc").option("url", url).options(**options)
    if partition_column and num_partitions:
        # Spark rejects partitionColumn together with the `query`
        # option — the parallel path must go through `dbtable`, so wrap
        # the built query as a derived table (requires lowerBound /
        # upperBound in options, per the JDBC source contract). This is
        # the 100 TB ingest shape: numPartitions concurrent range scans.
        reader = (
            reader.option("dbtable", f"({query}) adt_subq")
            .option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
        )
    else:
        reader = reader.option("query", query)
    return reader.load()


def build_jdbc_query(
    table: str | None,
    query: str | None,
    filter_clause: str | None = None,
) -> str:
    """Pure source-SQL builder (TransformingReader.java:301-309
    semantics): exactly one of table/query; ``filter_clause`` becomes a
    WHERE on table reads and is rejected alongside an explicit query
    (the reference's query mode likewise owns its own WHERE)."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query must be given")
    if query is not None:
        if filter_clause:
            raise ValueError(
                "filter_clause only applies to table reads; fold the "
                "predicate into the explicit query"
            )
        return query
    out = f"SELECT * FROM {table}"
    if filter_clause:
        out += f" WHERE {filter_clause}"
    return out


def jdbc_not_null_columns(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **props: str,
) -> set[str]:
    """NOT-NULL column names straight from JDBC ``DatabaseMetaData`` —
    Spark's JDBC reader deliberately marks every column nullable
    (pushdown under outer joins may inject NULLs), so the schema
    nullability the reference's JdbcIO reads from the database
    (its ``$.id`` vs ``$.salary.double`` flat-key split) must come
    from the metadata, not the DataFrame. One driver-side metadata
    call; no data moves."""
    meta = jdbc_column_meta(spark, url, table, driver=driver, **props)
    return {c for c, m in meta.items() if m["not_null"]}


def jdbc_column_meta(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    **props: str,
) -> dict[str, dict]:
    """Per-column JDBC ``DatabaseMetaData``: ``{"not_null": bool,
    "varchar_length": int | None}`` — the character-width and
    nullability facts Spark's JDBC schema drops but the reference's
    Avro fabrication keeps (its ``Contacts5kSql_avro_schema.json``
    renders text columns as ``{"type": "string", "logicalType":
    "varchar", "maxLength": N}``). One driver-side metadata call."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    p = jvm.java.util.Properties()
    for k, v in props.items():
        p.setProperty(k, str(v))
    conn = jvm.java.sql.DriverManager.getConnection(url, p)
    try:
        rs = conn.getMetaData().getColumns(
            None, None, table.strip('"'), None
        )
        out: dict[str, dict] = {}
        char_types = {"VARCHAR", "CHAR", "LONGVARCHAR", "TEXT", "CLOB"}
        while rs.next():
            tname = (rs.getString("TYPE_NAME") or "").upper()
            out[rs.getString("COLUMN_NAME")] = {
                "not_null": rs.getString("IS_NULLABLE") == "NO",
                "varchar_length": (
                    int(rs.getInt("COLUMN_SIZE"))
                    if any(t in tname for t in char_types)
                    else None
                ),
            }
        rs.close()
        return out
    finally:
        conn.close()

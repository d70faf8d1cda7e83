"""CLI parity: the reference's three runnable pipelines driven through
``auto_data_tokenize_spark.cli`` with the reference's own flag names
(DlpInspectionOptions.java / EncryptionPipelineOptions.java /
CsvTokenizationAndOrderingPipeline.java:50-66). main() is invoked
in-process so the tests reuse the shared SparkSession (get_spark
returns the active one); the argv strings are exactly what a shell
user would pass."""

import glob
import json

import pandas as pd
import pytest

from auto_data_tokenize_spark.cli import main


@pytest.fixture(scope="module")
def csv_input(sf_dir_small, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_csv_in")
    df = pd.read_parquet(f"{sf_dir_small}/transcripts.parquet")
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%d %H:%M:%S")
    df.to_csv(d / "chats.csv", index=False)
    return str(d / "chats.csv")


def test_cli_inspect_writes_reports(spark, sf_dir_small, tmp_path, capsys):
    report = str(tmp_path / "report")
    rc = main([
        "inspect",
        f"--inputPattern={sf_dir_small}/transcripts.parquet",
        "--sourceType=PARQUET",
        "--sampleSize=200",
        f"--reportLocation={report}",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["schema"] == "schema.json"
    cols = glob.glob(f"{report}/col-*.json")
    assert cols, "no col-*.json written"
    with open([p for p in cols if "text" in p][0]) as f:
        rep = json.load(f)
    types = {it["infoType"] for it in rep["infoTypes"]}
    assert "EMAIL_ADDRESS" in types


def test_cli_inspect_observable_infotypes_filter(
    spark, sf_dir_small, tmp_path
):
    report = str(tmp_path / "report_flt")
    main([
        "inspect",
        f"--inputPattern={sf_dir_small}/transcripts.parquet",
        "--sampleSize=200",
        f"--reportLocation={report}",
        "--observableInfoTypes=EMAIL_ADDRESS",
        "--inspectColumns=text",
    ])
    with open(glob.glob(f"{report}/col-*text*.json")[0]) as f:
        rep = json.load(f)
    assert {it["infoType"] for it in rep["infoTypes"]} == {"EMAIL_ADDRESS"}


def test_cli_encrypt_tokenize_columns_roundtrip(
    spark, sf_dir_small, tmp_path, capsys
):
    from auto_data_tokenize_spark.operators.tokenize import detokenize_columns
    from auto_data_tokenize_spark.sources.avro_io import read_avro

    out_dir = str(tmp_path / "enc_out")
    rc = main([
        "encrypt",
        f"--inputPattern={sf_dir_small}/transcripts.parquet",
        "--sourceType=PARQUET",
        "--tokenizeColumns=$.Record.role",
        "--scopeColumn=conv_id",
        f"--outputDirectory={out_dir}",
        "--outputFormat=avro",
    ])
    assert rc == 0
    back = read_avro(spark, out_dir)
    assert "encrypted_role" in back.columns and "role" not in back.columns
    want = spark.read.parquet(f"{sf_dir_small}/transcripts.parquet")
    assert back.count() == want.count()
    # decrypt restores the original values (reference: tokens reversible
    # under the same key hierarchy)
    dec = detokenize_columns(back, ["role"], scope_col="conv_id")
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"]) for r in dec.collect()
    )
    exp = sorted(
        (r["conv_id"], r["turn_idx"], r["role"]) for r in want.collect()
    )
    assert got == exp


def test_cli_csv_tokenize_matches_golden(
    spark, csv_input, sf_dir_small, tmp_path, capsys
):
    out_dir = str(tmp_path / "csv_out")
    cfg = json.dumps({
        "transforms": [
            {"columnId": "$.CsvRecord.text", "freeFormColumn": "true"}
        ]
    })
    rc = main([
        "csv-tokenize",
        f"--inputPattern={csv_input}",
        "--csvFirstRowHeader",
        f"--dlpEncryptConfigJson={cfg}",
        "--scopeColumn=conv_id",
        "--orderingColumnNames=conv_id,turn_idx",
        f"--outputDirectory={out_dir}",
        "--csvFileShardCount=3",
    ])
    assert rc == 0
    shards = glob.glob(f"{out_dir}/part-*.csv")
    assert len(shards) == 3
    got = (
        pd.concat(
            [pd.read_csv(s, dtype={"conv_id": str, "turn_idx": int}) for s in shards]
        )
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = pd.read_parquet(f"{sf_dir_small}/tokenized_turns.parquet")[
        ["conv_id", "turn_idx", "text_tok"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]].rename(columns={"text": "text_tok"}),
        want,
        check_dtype=False,
    )


def test_cli_bad_flags_fail_fast():
    with pytest.raises(SystemExit):
        main(["encrypt", "--inputPattern=x", "--outputDirectory=y"])
    with pytest.raises(SystemExit):
        main([
            "inspect", "--inputPattern=x", "--sourceType=JDBC_TABLE",
            "--reportLocation=y",
        ])


REF_CONTACTS = "/root/reference/contacts5k.avro"


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_CONTACTS),
    reason="reference artifact not present",
)
def test_cli_inspect_reference_contacts5k(spark, tmp_path, capsys):
    """The reference's own golden Avro input through the CLI inspect
    path end-to-end: nested contact records flatten to JSONPath keys,
    the nums array explodes to its schema-key leaves, and the number
    leaf reports PHONE_NUMBER findings — the exact sample-and-identify
    run the reference's README demonstrates."""
    report = str(tmp_path / "ref_report")
    rc = main([
        "inspect",
        f"--inputPattern={REF_CONTACTS}",
        "--sourceType=AVRO",
        "--sampleSize=500",
        f"--reportLocation={report}",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    num_reports = [
        p for p in out["column_reports"] if "number" in p.lower()
    ]
    assert num_reports, f"no number column report in {out['column_reports']}"
    with open(f"{report}/{num_reports[0]}") as f:
        rep = json.load(f)
    # index-free schema key, per the reference's report granularity
    assert rep["columnName"] == "$.contact.nums.number"
    assert any(
        it["infoType"] == "PHONE_NUMBER" and int(it["count"]) > 0
        for it in rep["infoTypes"]
    )


REF_USERDATA = "/root/reference/userdata.avro"


@pytest.mark.skipif(
    not __import__("os").path.exists(REF_USERDATA),
    reason="reference artifact not present",
)
def test_cli_inspect_reference_userdata_snappy(spark, tmp_path, capsys):
    """The reference's snappy-coded Avro export through the CLI: the
    pure-Python raw-block snappy read path feeds inspect, and the email
    column reports EMAIL_ADDRESS."""
    report = str(tmp_path / "ud_report")
    rc = main([
        "inspect",
        f"--inputPattern={REF_USERDATA}",
        "--sourceType=AVRO",
        "--sampleSize=1000",
        f"--reportLocation={report}",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    email_reports = [p for p in out["column_reports"] if "email" in p.lower()]
    assert email_reports, f"no email report in {out['column_reports']}"
    with open(f"{report}/{email_reports[0]}") as f:
        rep = json.load(f)
    assert any(
        it["infoType"] == "EMAIL_ADDRESS" and int(it["count"]) > 0
        for it in rep["infoTypes"]
    )


def test_cli_encrypt_tink_keyset_reference_wire(
    spark, sf_dir_small, tmp_path, capsys
):
    """--tinkEncryptionKeySetJson (the reference's own flag,
    EncryptionPipelineOptions.java:47) with the reference's own keyset
    fixture: emitted tokens must be exactly what the reference's
    DaeadEncryptingValueTokenizer produces for the same values."""
    import os

    ks_path = "/root/reference/src/test/resources/test_encryption_key.json"
    if not os.path.exists(ks_path):
        pytest.skip("reference fixtures not present")
    from auto_data_tokenize_spark.functions.tink_compat import (
        TinkDaeadTokenizer,
    )
    from auto_data_tokenize_spark.sources.avro_io import read_avro

    out_dir = str(tmp_path / "tink_out")
    rc = main([
        "encrypt",
        f"--inputPattern={sf_dir_small}/transcripts.parquet",
        "--sourceType=PARQUET",
        "--tokenizeColumns=$.Record.role",
        f"--tinkEncryptionKeySetJson={ks_path}",
        f"--outputDirectory={out_dir}",
        "--outputFormat=avro",
    ])
    assert rc == 0
    back = read_avro(spark, out_dir)
    want = spark.read.parquet(f"{sf_dir_small}/transcripts.parquet")
    tok = TinkDaeadTokenizer(open(ks_path).read())
    exp = {
        (r["conv_id"], r["turn_idx"]): tok.encrypt(r["role"])
        for r in want.collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"]): r["encrypted_role"]
        for r in back.collect()
    }
    assert got == exp  # byte-identical to the reference's wire format


def test_cli_encrypt_writes_updated_schema(spark, sf_dir_small, tmp_path):
    """--updatedSchemaLocation emits the DeIdentifiedRecordSchemaConverter
    output schema for an AVRO source (EncryptionPipeline's updated-schema
    seam; golden semantics pinned in tests/test_schema_encrypt.py)."""
    from auto_data_tokenize_spark.sources.avro_io import read_header

    avro_in = str(tmp_path / "avro_in")
    rc = main([
        "encrypt",
        f"--inputPattern={sf_dir_small}/transcripts.parquet",
        "--sourceType=PARQUET",
        "--tokenizeColumns=$.Record.role",
        f"--outputDirectory={avro_in}",
        "--outputFormat=avro",
    ])
    assert rc == 0
    first = sorted(glob.glob(f"{avro_in}/*.avro"))[0]
    with open(first, "rb") as f:
        avsc, _codec, _sync = read_header(f)
    record_name = avsc["name"]

    schema_out = str(tmp_path / "schemas" / "updated_schema.json")
    out2 = str(tmp_path / "enc2_out")
    rc = main([
        "encrypt",
        f"--inputPattern={avro_in}/*.avro",
        "--sourceType=AVRO",
        f"--tokenizeColumns=$.{record_name}.text",
        f"--outputDirectory={out2}",
        "--outputFormat=parquet",
        f"--updatedSchemaLocation={schema_out}",
        "--updatedSchemaAt=2020-10-21T01:00:15Z",
    ])
    assert rc == 0
    with open(schema_out) as f:
        updated = json.load(f)
    names = [fl["name"] for fl in updated["fields"]]
    assert "encrypted_text" in names and "text" not in names
    enc = next(fl for fl in updated["fields"] if fl["name"] == "encrypted_text")
    assert "ORIGINAL_TYPE" in enc
    assert updated["doc"].endswith(
        "Updated for encryption at 2020-10-21T01:00:15Z"
    )
    # and the tokenized data itself matches the schema's claim
    got = spark.read.parquet(out2)
    assert "encrypted_text" in got.columns and "text" not in got.columns


def test_cli_updated_schema_contacts5k_matches_reference_golden(tmp_path):
    """End-to-end on the reference's own contacts5k.avro: the written
    updated schema equals its published golden
    (bq_contacts_schema_encrypted.json) field-for-field."""
    from argparse import Namespace

    from auto_data_tokenize_spark.cli import _write_updated_schema

    schema_out = str(tmp_path / "contacts_updated.json")
    args = Namespace(
        sourceType="AVRO",
        inputPattern=REF_CONTACTS,
        tokenizeColumns=[
            "$.Root.contact.root.Contact.nums.root.contact.Nums.number"
        ],
        dlpEncryptConfigJson=None,
        updatedSchemaLocation=schema_out,
        updatedSchemaAt="2020-10-21T01:00:15Z",
    )
    _write_updated_schema(args)
    with open(schema_out) as f:
        got = json.load(f)
    with open(
        "/root/reference/src/test/resources/avro_records/"
        "contact_records_with_namespace/bq_contacts_schema_encrypted.json"
    ) as f:
        want = json.load(f)
    # contacts5k.avro's container schema has one extra leading field
    # ("index") vs the golden's source schema; everything else must
    # match, including the literal-"null" doc quirk.
    got_fields = {fl["name"] for fl in got["fields"]}
    assert got_fields == {"index", "contact"}
    assert got["doc"] == want["doc"]

    def find_number_field(schema):
        contact = next(
            fl for fl in schema["fields"] if fl["name"] == "contact"
        )
        rec = contact["type"][1]
        nums = next(fl for fl in rec["fields"] if fl["name"] == "nums")
        return nums["type"]["items"]["fields"]

    got_nums = find_number_field(got)
    want_nums = find_number_field(want)
    assert [fl["name"] for fl in got_nums] == [
        fl["name"] for fl in want_nums
    ] == ["type", "encrypted_number"]
    enc = got_nums[1]
    assert enc["type"] == ["null", "string"]
    assert enc["ORIGINAL_TYPE"] == '["null","string"]'

"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.001, compare row count + column names + order-insensitive values.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df):
    """Sort columns by name, normalize cells to comparable scalars."""
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    rows = sorted(
        tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return list(df.columns), rows


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    sql = entry_mod.oracle_sql(sf_name="sf0.001").get(name)
    if sql is None:
        pytest.skip("rows-only query (no oracle)")
    got_df = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    want_df = duck.execute(sql).fetchdf()

    got_cols, got_rows = _normalize(got_df)
    want_cols, want_rows = _normalize(want_df)

    assert got_cols == want_cols, f"{name}: column mismatch {got_cols} vs {want_cols}"
    assert len(got_rows) == len(want_rows), (
        f"{name}: row count {len(got_rows)} vs {len(want_rows)}"
    )
    mism = [i for i, (a, b) in enumerate(zip(got_rows, want_rows)) if a != b]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: "
        f"{got_rows[mism[0]]} vs {want_rows[mism[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert df.columns == ["conv_id", "turn_idx", "role", "text_tok", "ts"]

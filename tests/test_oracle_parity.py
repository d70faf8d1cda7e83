"""Local mirror of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.001, compare row count + column names + order-insensitive values.
"""

import math
import numbers
import os

import duckdb
import numpy as np
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


def norm(v):
    """Normalize one cell to a type-TAGGED tuple so the comparison is
    dtype-faithful, mirroring the driver's value hash: an integral
    float64 (e.g. DuckDB HUGEINT -> fetchdf float) does NOT equal the
    int64 the Spark side emits, even though Python says 0 == 0.0 —
    that hole is exactly how the r3 q46/q48 hash failures shipped.
    Tags also make rows totally orderable (None vs float no longer
    raises in sorted())."""
    if v is None:
        return ("n",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, numbers.Integral):
        return ("i", int(v))
    if isinstance(v, numbers.Real):  # float / np.floating
        f = float(v)
        return ("n",) if math.isnan(f) else ("f", round(f, 6))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, norm(x)) for k, x in v.items())))
    return ("s", str(v))


def _normalize(df):
    """Sort columns by name, normalize cells to comparable tagged tuples."""
    df = df[sorted(df.columns)]
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


def test_pack_oracle_dtypes_are_integer(duck):
    """Regression (r3 verdict #1): DuckDB's windowed sum(BIGINT) returns
    HUGEINT, which fetchdf() materializes as float64 unless the twin
    casts — the driver hash then sees 0.0 != 0. Pin the casted twin's
    dtypes so the class of bug cannot ship again."""
    sql = entry_mod.oracle_sql(sf_name="sf0.001")["q46_pack_sequences"]
    pdf = duck.execute(sql).fetchdf()
    for col in ("offset", "pack_id", "n_tokens"):
        assert pdf[col].dtype.kind in "iu", (
            f"{col} must be integer in the oracle frame, got {pdf[col].dtype}"
        )


def test_norm_is_dtype_faithful():
    assert norm(0) != norm(0.0)
    assert norm(np.int64(7)) == norm(7)
    assert norm(np.float64(7.0)) != norm(7)
    assert norm(float("nan")) == norm(None)
    assert sorted([norm(None), norm(1.5), norm(2), norm("x")])


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert df.columns == ["conv_id", "turn_idx", "role", "text_tok", "ts"]

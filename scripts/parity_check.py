"""Driver-gate mirror: run EVERY ``queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at an arbitrary scale factor, emitting
the same per-query record shape as the driver's CORRECTNESS_r{N}.json
(rows_match / schema_match / hash_match, dtype-faithful).

Usage:
    python scripts/parity_check.py [sf_dir] [out.json] [only,names]

Defaults: sf_dir=/root/testdata/sf0.01, out=LOCAL_PARITY_<sfname>.json.
With a comma-separated name filter, only those queries run and their
records MERGE into an existing out.json (incremental re-check).
Exists because the driver's correctness file has historically enumerated
at most 50 queries per round — this records the hard signal for every
registered query at the driver's own gate scale (see tests/
test_oracle_parity.py for the sf0.001 pytest variant of the same
comparison).
"""

import json
import math
import numbers
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    """Type-TAGGED cell normalization (mirror of tests/test_oracle_parity)."""
    if v is None:
        return ("n",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, numbers.Integral):
        return ("i", int(v))
    if isinstance(v, numbers.Real):
        f = float(v)
        return ("n",) if math.isnan(f) else ("f", round(f, 6))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(norm(x) for x in v))
    if isinstance(v, dict):
        return ("d", tuple(sorted((k, norm(x)) for k, x in v.items())))
    return ("s", str(v))


def normalize(df):
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return list(df.columns), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    out_path = (
        sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, f"LOCAL_PARITY_{sf_name}.json")
    )

    import __spark_entry__ as entry_mod
    from auto_data_tokenize_spark import get_spark

    spark = get_spark("parity-check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql(sf_name=sf_name)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    results = {}
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    n_bad = 0
    for name in sorted(queries):
        if only is not None and name not in only:
            continue
        rec = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            got = queries[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = int(len(got))
            sql = oracles.get(name)
            if sql is None:
                rec["err"] = "rows-only (no oracle registered)"
                rec["rows_match"] = rec["spark_rows"] >= 0
            else:
                want = con.execute(sql).fetchdf()
                rec["oracle_rows"] = int(len(want))
                gc, gr = normalize(got)
                wc, wr = normalize(want)
                rec["rows_match"] = len(gr) == len(wr)
                rec["schema_match"] = gc == wc
                rec["hash_match"] = gr == wr
        except Exception as exc:  # record, keep going
            rec["err"] = f"{type(exc).__name__}: {exc}"[:400]
        if not (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]) and rec["err"] is None:
            n_bad += 1
        if rec["err"] is not None and "rows-only" not in rec["err"]:
            n_bad += 1
        print(f"{name}: rows={rec['spark_rows']} match="
              f"{rec['rows_match'] and rec['schema_match'] and rec['hash_match']}"
              f"{' err=' + rec['err'] if rec['err'] else ''}", flush=True)
        results[name] = rec
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    # recompute over the MERGED dict: in filtered runs, previously
    # recorded entries (including stale failures) count too
    n_green = sum(
        1
        for rec in results.values()
        if (rec["rows_match"] and rec["schema_match"] and rec["hash_match"])
        or (rec["err"] is not None and "rows-only" in rec["err"])
    )
    print(f"wrote {out_path}: {n_green}/{len(results)} green", flush=True)
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

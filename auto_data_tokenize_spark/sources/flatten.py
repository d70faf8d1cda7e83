"""Nested-record flatten / unflatten with JSONPath-style keys — the
reference's signature record IR (GenericRecordFlattener.java:57-221;
RecordUnflattener.java:54-108; proto:130-170).

Flat key   = concrete path with array indices  ($.contacts[1].contact.number)
Schema key = path without indices              ($.contacts.contact.number)

Spark-first restatement: instead of a map<string,string> FlatRecord, we
flatten to real COLUMNS (schema keys as column names) — typed, prunable,
codegen-friendly — and only fall back to the exploded (flat_key, value)
pair form for truly ragged arrays. Un-flatten rebuilds the nested struct
with ``F.struct``; type restoration is plan-time (cast), mirroring
RecordUnflattener.java:87-108's type recovery.

MAP columns are rejected, exactly like the reference
(GenericRecordFlattener.java:165-166).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def _leaf_paths(schema: StructType, prefix: str = "") -> list[tuple[str, str]]:
    """[(dotted_col_ref, schema_key)] for every scalar leaf; arrays keep
    their position (exploded by flatten_records when requested)."""
    out = []
    for f in schema.fields:
        ref = f"{prefix}.`{f.name}`" if prefix else f"`{f.name}`"
        key = f"{prefix}.{f.name}" if prefix else f.name
        if isinstance(f.dataType, MapType):
            raise ValueError(
                f"MAP column {key!r} unsupported (parity with "
                "GenericRecordFlattener.java:165-166)"
            )
        if isinstance(f.dataType, StructType):
            out.extend(_leaf_paths(f.dataType, key))
        else:
            out.append((ref, key))
    return out


def flatten_records(df: DataFrame, schema_prefix: str = "$") -> DataFrame:
    """Struct leaves → flat columns named ``$.a.b`` (schema keys).

    Arrays of structs are not exploded here (no fan-out surprise);
    use :func:`flatten_array_records` for the reference's array-index
    flat-key behavior.
    """
    cols = []
    for ref, key in _leaf_paths(df.schema):
        # column refs with backticks inside: rebuild via col() chain
        cols.append(F.col(key.replace("`", "")).alias(f"{schema_prefix}.{key}"))
    return df.select(cols)


def flatten_array_records(
    df: DataFrame, array_col: str, schema_prefix: str = "$"
) -> DataFrame:
    """One array<struct> column → rows of (flat_key, schema_key, value):
    the reference's exact FlatRecord pair shape with ``[i]`` indices
    (GenericRecordFlattener.java:88-94,183-190)."""
    elem = df.schema[array_col].dataType
    if not isinstance(elem, ArrayType) or not isinstance(elem.elementType, StructType):
        raise ValueError(f"{array_col} must be array<struct>")
    leaf = _leaf_paths(elem.elementType)
    exploded = df.select(
        "*", F.posexplode_outer(array_col).alias("_i", "_e")
    )
    rows = []
    for ref, key in leaf:
        rows.append(
            F.struct(
                F.concat(
                    F.lit(f"{schema_prefix}.{array_col}["),
                    F.col("_i").cast("string"),
                    F.lit(f"].{key}"),
                ).alias("flat_key"),
                F.lit(f"{schema_prefix}.{array_col}.{key}").alias("schema_key"),
                F.col(f"_e.{key.replace('`', '')}").cast("string").alias("value"),
            )
        )
    return exploded.select(
        *[c for c in df.columns if c != array_col],
        F.explode_outer(F.array(*rows)).alias("_kv"),
    ).select(
        *[c for c in df.columns if c != array_col],
        F.col("_kv.flat_key").alias("flat_key"),
        F.col("_kv.schema_key").alias("schema_key"),
        F.col("_kv.value").alias("value"),
    )


def unflatten_records(df: DataFrame, schema_prefix: str = "$") -> DataFrame:
    """Inverse of :func:`flatten_records`: columns named ``$.a.b`` →
    nested structs (RecordNester.java:45-64 semantics)."""
    tree: dict = {}
    for c in df.columns:
        if not c.startswith(f"{schema_prefix}."):
            continue
        parts = c[len(schema_prefix) + 1 :].split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = c

    def build(node: dict):
        fields = []
        for name, v in node.items():
            if isinstance(v, dict):
                fields.append(build(v).alias(name))
            else:
                fields.append(F.col(f"`{v}`").alias(name))
        return F.struct(*fields)

    cols = []
    for name, v in tree.items():
        if isinstance(v, dict):
            cols.append(build(v).alias(name))
        else:
            cols.append(F.col(f"`{v}`").alias(name))
    passthrough = [c for c in df.columns if not c.startswith(f"{schema_prefix}.")]
    return df.select(*passthrough, *cols)

"""Reference-grammar FlatRecord flattening of Avro-JSON records.

The reference's in-flight representation is the ``FlatRecord`` proto:
a map of *flat keys* (concrete JSONPath with array indices and union
branch names) to DLP ``Value``s, plus a flat-key → *schema key* map
(``GenericRecordFlattener.java:47-222``).  The Spark engine
deliberately replaced FlatRecord with DataFrame columns
(``sources/flatten.py`` flattens StructType rows), but the reference's
exact key grammar matters at the interop boundary — its config files,
report columns and goldens all speak it.  This module implements that
grammar verbatim over Avro **JSON-encoded** records (the Avro spec's
interchange encoding, which the reference's own record fixtures use),
proven against the reference's published ``flat_records/*.textpb``
goldens in tests/test_flat_record.py.

Grammar (from GenericRecordFlattener's TypeFlattener):

- record field under a union branch: ``parent.["recordName"]``
  (bracket-quoted, :110-113);
- array element: ``parent[i]`` (:183-190);
- union branch: the non-null branch's *full name* becomes a path
  segment (``$.salary.double``, ``$.cc.array[0].string``; :192-215);
  a null union value emits the bare key with an EMPTY Value (:194-199);
- bytes/fixed: flat key suffixed ``/bytes``, value is base64
  (:84-86, :150-161; ByteValueConverter.java:39-41);
- schema keys never carry indices or branch names: record traversal
  appends ``recordFullName.fieldName`` (:170-181);
- float32 values widen through Java ``float`` → proto double exactly
  like ``np.float32`` (golden pins 3.14 → 3.140000104904175);
- MAP is unsupported (:165-166), mirroring the reference.

Only nullable two-branch unions are supported — the same
``checkArgument`` as the reference (:204-206).
"""

from __future__ import annotations

import base64
import json
from typing import Any

import numpy as np

from auto_data_tokenize_spark.sources.schema_encrypt import PRIMITIVES

ROOT = "$"


def _kind(t: Any, names: dict) -> str:
    if isinstance(t, list):
        return "union"
    if isinstance(t, str):
        if t in PRIMITIVES:
            return t
        if t in names:
            return _kind(names[t], names)
        raise ValueError(f"unresolved named type reference: {t!r}")
    inner = t["type"]
    if isinstance(inner, (dict, list)):
        return _kind(inner, names)
    return inner


def _resolve(t: Any, names: dict) -> Any:
    """Named-type reference → its definition."""
    if isinstance(t, str) and t not in PRIMITIVES:
        return _resolve(names[t], names)
    return t


def _full_name(t: Any, names: dict) -> str:
    """Avro getFullName(): named types use namespace.name; unnamed
    complex types use their type name; primitives their name."""
    t = _resolve(t, names)
    if isinstance(t, str):
        return t
    if isinstance(t, list):
        return "union"
    if "name" in t:
        name = t["name"]
        ns = t.get("namespace")
        return name if "." in name or not ns else f"{ns}.{name}"
    return _kind(t, names)


def _inherit_namespaces(t: Any, ns: str | None) -> Any:
    """Avro-spec namespace inheritance (schema resolution §Names): a
    named type without its own ``namespace`` lives in the ENCLOSING
    definition's namespace — Java ``Schema.getFullName()`` (the name
    the reference puts in union-branch path segments and schema keys,
    GenericRecordFlattener.java:173,213) reflects that. Rewrite the
    schema once so every named type carries its namespace explicitly;
    a dotted ``name`` is already a fullname and wins over any
    ``namespace`` attribute."""
    if isinstance(t, list):
        return [_inherit_namespaces(b, ns) for b in t]
    if not isinstance(t, dict):
        return t
    t = dict(t)
    here = ns
    if t.get("name") and t.get("type") in ("record", "enum", "fixed"):
        if "." in t["name"]:
            here = t["name"].rsplit(".", 1)[0]
            t.pop("namespace", None)
        elif t.get("namespace"):
            here = t["namespace"]
        elif ns:
            t["namespace"] = ns
            here = ns
        else:
            here = None
    if t.get("type") == "record":
        t["fields"] = [
            dict(f, type=_inherit_namespaces(f["type"], here))
            for f in t.get("fields", [])
        ]
    elif t.get("type") == "array":
        t["items"] = _inherit_namespaces(t["items"], here)
    elif t.get("type") == "map":
        t["values"] = _inherit_namespaces(t["values"], here)
    elif isinstance(t.get("type"), (dict, list)):
        t["type"] = _inherit_namespaces(t["type"], here)
    return t


def _collect_names(t: Any, names: dict) -> None:
    if isinstance(t, list):
        for b in t:
            _collect_names(b, names)
        return
    if not isinstance(t, dict):
        return
    if t.get("name") and t.get("type") in ("record", "enum", "fixed"):
        names[t["name"]] = t
        ns = t.get("namespace")
        if ns:
            names[f"{ns}.{t['name']}"] = t
    if t.get("type") == "record":
        for f in t.get("fields", []):
            _collect_names(f["type"], names)
    elif t.get("type") == "array":
        _collect_names(t["items"], names)
    elif t.get("type") == "map":
        _collect_names(t["values"], names)


class FlatRecord(dict):
    """``{"values": {flat_key: dlp_value_dict}, "flat_key_schema":
    {flat_key: schema_key}}`` — dict subclass so tests compare
    structurally while call sites read attributes."""

    @property
    def values_map(self) -> dict:
        return self["values"]

    @property
    def flat_key_schema(self) -> dict:
        return self["flat_key_schema"]


def flatten_avro_json(record: dict, schema: dict | str) -> FlatRecord:
    """Flatten one Avro-JSON-encoded ``record`` of ``schema`` into the
    reference's FlatRecord maps."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    schema = _inherit_namespaces(schema, None)
    names: dict = {}
    _collect_names(schema, names)
    out = FlatRecord(values={}, flat_key_schema={})

    def put(field_key: str, schema_key: str, value: dict) -> None:
        out["values"][field_key] = value
        out["flat_key_schema"][field_key] = schema_key

    def process(value, fs, parent_key, field_name, schema_key) -> None:
        fs = _resolve(fs, names)
        field_key = (
            f"{parent_key}.{field_name}" if field_name else parent_key
        )
        kind = _kind(fs, names)
        if kind == "record":
            rec_key = (
                parent_key
                if not field_name
                else f'{parent_key}.["{field_name}"]'
            )
            convert_record(value, fs, rec_key, schema_key)
        elif kind == "array":
            for i, elem in enumerate(value):
                process(elem, fs["items"], f"{field_key}[{i}]", None,
                        schema_key)
        elif kind == "union":
            process_union(value, fs, parent_key, field_name, schema_key)
        elif kind in ("enum", "string"):
            put(field_key, schema_key, {"string_value": str(value)})
        elif kind == "boolean":
            put(field_key, schema_key, {"boolean_value": bool(value)})
        elif kind == "float":
            # Java float widens to proto double through float32
            put(field_key, schema_key,
                {"float_value": float(np.float32(value))})
        elif kind == "double":
            put(field_key, schema_key, {"float_value": float(value)})
        elif kind in ("int", "long"):
            put(field_key, schema_key, {"integer_value": int(value)})
        elif kind in ("bytes", "fixed"):
            # Avro JSON encodes bytes as a latin-1 codepoint string
            raw = value.encode("latin-1") if isinstance(value, str) else bytes(value)
            put(f"{field_key}/bytes", schema_key,
                {"string_value": base64.b64encode(raw).decode("ascii")})
        elif kind == "null":
            pass
        elif kind == "map":
            raise ValueError(f"Unsupported Type MAP at {field_key}")
        else:  # pragma: no cover - _kind() exhausts Avro's type system
            raise ValueError(f"unknown Avro kind {kind!r} at {field_key}")

    def process_union(value, fs, parent_key, field_name, schema_key):
        bare_key = (
            f"{parent_key}.{field_name}" if field_name else parent_key
        )
        # a null branch appears bare (Avro JSON spec) or wrapped as
        # {"null": null} (the reference's record fixtures use both)
        if value is None or (
            isinstance(value, dict) and set(value) == {"null"}
        ):
            put(bare_key, schema_key, {})
            return
        branches = list(fs)
        if len(branches) != 2 or _kind(branches[0], names) != "null":
            raise ValueError(
                "Only nullable union with one type is supported. found "
                f"{branches}"
            )
        non_null = branches[1]
        branch_name = _full_name(non_null, names)
        # Avro JSON wraps non-null union values as {"branchName": v};
        # accept both wrapped and bare (already-unwrapped) forms. A
        # record branch is only unwrapped when the inner value is a
        # JSON object — otherwise a BARE record whose single field
        # happens to share the branch's name (a contacts/contact
        # shape) would be misread as the wrapper and crash downstream
        branch_is_record = _kind(non_null, names) == "record"
        if isinstance(value, dict) and set(value) == {branch_name}:
            inner = value[branch_name]
            if not branch_is_record or isinstance(inner, dict):
                value = inner
        elif (
            isinstance(value, dict)
            and len(value) == 1
            and next(iter(value)) == branch_name.rsplit(".", 1)[-1]
        ):
            inner = next(iter(value.values()))
            if not branch_is_record or isinstance(inner, dict):
                value = inner
        process(value, non_null, bare_key, branch_name, schema_key)

    def convert_record(rec, rs, parent_key, parent_schema_key):
        record_name = _full_name(rs, names)
        for f in rs["fields"]:
            fname = f["name"]
            fsk = f"{parent_schema_key}.{record_name}.{fname}"
            process(rec.get(fname), f["type"], parent_key, fname, fsk)

    convert_record(record, schema, ROOT, ROOT)
    return out


# --------------------------------------------------------------------------
# JDBC / DataFrame → Avro-JSON (the reference's JdbcIO conversion shape)
# --------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    "byte": "int",
    "short": "int",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-millis"},
}


def spark_schema_to_avro(
    schema,
    name: str = "topLevelRecord",
    overrides: dict | None = None,
    not_null: set[str] | frozenset[str] = frozenset(),
    varchar_sizes: dict | None = None,
) -> dict:
    """A Spark ``StructType`` as the Avro record the reference's JDBC
    path fabricates (``Contacts5kSql_avro_schema.json``: record name
    ``topLevelRecord``, per-column ``"doc": ""``, nullable columns as
    ``["null", T]`` unions, NOT-NULL columns bare — which is exactly
    why its goldens show ``$.id`` without a branch suffix but
    ``$.salary.double`` with one). Temporal columns carry Avro logical
    types (date / timestamp-millis); ``overrides`` swaps a column's
    non-null branch for JDBC types Spark widens away (e.g. SQL TIME
    arrives as timestamp — pass ``{"t": {"type": "int", "logicalType":
    "time-millis"}}`` to restore the reference's ``.int`` branch).

    ``not_null`` marks columns bare (non-union) — needed for JDBC
    DataFrames because Spark's reader deliberately reports every JDBC
    column nullable; feed it
    :func:`~auto_data_tokenize_spark.sources.readers.jdbc_not_null_columns`,
    the database's own metadata (the source the reference's JdbcIO
    reads).

    ``varchar_sizes`` maps character columns to their declared width
    (``jdbc_column_meta``'s ``varchar_length``); such columns render
    as ``{"type": "string", "logicalType": "varchar", "maxLength":
    N}`` — the shape ``Contacts5kSql_avro_schema.json`` pins."""
    overrides = overrides or {}
    varchar_sizes = varchar_sizes or {}
    fields = []
    for f in schema.fields:
        key = f.dataType.typeName()
        if key in overrides or f.name in overrides:
            t = overrides.get(f.name, overrides.get(key))
        elif key == "string" and varchar_sizes.get(f.name) is not None:
            t = {
                "type": "string",
                "logicalType": "varchar",
                "maxLength": int(varchar_sizes[f.name]),
            }
        elif key in _SPARK_TO_AVRO:
            t = _SPARK_TO_AVRO[key]
            if isinstance(t, dict):
                t = dict(t)  # never alias the module table into results
        else:
            raise ValueError(
                f"unsupported Spark type {key!r} for column {f.name!r}"
            )
        nullable = f.nullable and f.name not in not_null
        fields.append(
            {"name": f.name, "type": ["null", t] if nullable else t,
             "doc": ""}
        )
    return {"type": "record", "name": name, "fields": fields}


def _avro_json_value(value, t) -> Any:
    """One JVM-side value → its Avro-JSON form under branch type
    ``t`` (millis conventions match the reference's JdbcIO goldens:
    DATE → epoch days, TIMESTAMP → epoch millis of the wall-clock
    value read as UTC, TIME → millis of day)."""
    import calendar
    import datetime as _dt

    logical = t.get("logicalType") if isinstance(t, dict) else None
    base = t["type"] if isinstance(t, dict) else t
    if logical == "date":
        return (value - _dt.date(1970, 1, 1)).days
    if logical == "time-millis":
        tod = value.time() if isinstance(value, _dt.datetime) else value
        return (
            (tod.hour * 3600 + tod.minute * 60 + tod.second) * 1000
            + tod.microsecond // 1000
        )
    if logical == "timestamp-millis":
        return (
            calendar.timegm(value.timetuple()) * 1000
            + value.microsecond // 1000
        )
    if base in ("int", "long"):
        return int(value)
    if base in ("float", "double"):
        return float(value)
    if base == "boolean":
        return bool(value)
    if base == "string":
        return str(value)
    if base == "bytes":
        return bytes(value).decode("latin-1")
    raise ValueError(f"unsupported Avro branch {t!r}")


def row_to_avro_json(row: dict, avro_schema: dict) -> dict:
    """One row (``Row.asDict()``) as the Avro-JSON record encoding the
    flattener consumes: nullable-union values wrapped as
    ``{branchName: v}`` (spec interchange form), NULLs bare, NOT-NULL
    columns unwrapped. Feed the result to :func:`flatten_avro_json`
    with :func:`spark_schema_to_avro`'s schema to reproduce the
    reference's JDBC FlatRecords byte-for-byte
    (``jdbc_flatrecords/*.textpb``)."""
    out = {}
    for f in avro_schema["fields"]:
        v = row.get(f["name"])
        t = f["type"]
        if isinstance(t, list):  # ["null", T]
            if v is None:
                out[f["name"]] = None
                continue
            branch = t[1]
            bname = (
                branch["type"] if isinstance(branch, dict) else branch
            )
            out[f["name"]] = {bname: _avro_json_value(v, branch)}
        else:
            out[f["name"]] = _avro_json_value(v, t)
    return out

"""Avro-schema encryption transform: the de-identified OUTPUT schema.

Re-creates the reference's ``DeIdentifiedRecordSchemaConverter``
(``main/common/DeIdentifiedRecordSchemaConverter.java:50-277``): given
an input Avro schema and the set of encrypt-column schema keys
(``$.<record>.<field>...`` JSONPath-ish keys, the same key syntax the
flattener emits), produce the schema of the tokenized output —
``encrypted_<name>`` field renames, encrypted leaf types replaced by
``string`` (the Base64 token), and the original type recorded in an
``ORIGINAL_TYPE`` field property so detokenization can restore it.

This is pure driver-side metadata work (schemas are KBs, never data),
so plain Python dicts are the right tool; the row-level counterpart —
actually tokenizing the column values at scale — is the Spark-side
``operators/tokenize.py``. Semantics proven field-for-field against
the reference's own ten golden pairs in
``src/test/resources/avro_records/*_encrypted_schema.json``
(``test/common/DeIdentifiedRecordSchemaConverterTest.java:140-245``),
including the reference's own quirks, which we replicate exactly:

- a missing root doc renders as the literal string ``"null"`` in the
  appended doc line (Java ``String.format("%s%n...", null)``) — see
  ``bq_contacts_schema_encrypted.json:4``;
- the rebuilt field's doc comes from ``field.schema().getDoc()`` (the
  TYPE's doc), not the field's own doc (``:221``);
- array-schema-level properties are dropped by the rebuild (the Java
  ``SchemaBuilder.array()`` path never copies them, ``:226-231``);
- a non-complex union branch under encryption becomes ``string`` but
  KEEPS the branch type's properties (``makeUnionType``, ``:290-294``),
  while a non-union encrypted leaf becomes a bare ``string`` with no
  properties (``makeType``, ``:262-270``).

Unsupported, exactly like the reference: MAP anywhere in the schema,
unions with >2 branches or whose first branch is not ``"null"``
(``:238-241``, ``:271-276``).
"""

from __future__ import annotations

import json
from typing import Any, Collection

PRIMITIVES = frozenset(
    {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}
)
#: union branches that are NOT stringified wholesale under encryption
#: (reference COMPLEX_TYPES, DeIdentifiedRecordSchemaConverter.java:55).
_COMPLEX = frozenset({"array", "record", "union", "enum", "fixed"})

#: attribute keys that are schema structure, not user properties.
_SCHEMA_ATTRS = frozenset(
    {"type", "name", "namespace", "doc", "fields", "symbols", "items",
     "values", "size", "aliases", "default", "logicalType"}
)
_FIELD_ATTRS = frozenset({"name", "type", "doc", "default", "order", "aliases"})

ORIGINAL_TYPE = "ORIGINAL_TYPE"
ENCRYPTED_PREFIX = "encrypted_"


def _kind(t: Any) -> str:
    """Avro type kind of a schema JSON node ('record', 'string', ...)."""
    if isinstance(t, list):
        return "union"
    if isinstance(t, str):
        return t if t in PRIMITIVES else "ref"
    if isinstance(t, dict):
        inner = t.get("type")
        if isinstance(inner, (dict, list)):  # {"type": {...}} wrapper
            return _kind(inner)
        return inner if inner != "ref" else "ref"
    raise ValueError(f"not an Avro schema node: {t!r}")


def _props(node: dict, reserved: frozenset) -> dict:
    """User-defined properties = every key that isn't a schema attr."""
    return {k: v for k, v in node.items() if k not in reserved}


def _fullname(node: dict, enclosing: str | None) -> str:
    name = node["name"]
    if "." in name:
        return name
    ns = node.get("namespace", enclosing)
    return f"{ns}.{name}" if ns else name


def _type_doc(t: Any) -> str | None:
    """doc of the field's TYPE (the reference copies this onto the
    rebuilt field, Java quirk at DeIdentifiedRecordSchemaConverter:221)."""
    return t.get("doc") if isinstance(t, dict) else None


def schema_to_avro_str(t: Any) -> str:
    """Avro ``Schema.toString()``-compatible compact JSON.

    Used verbatim as the ``ORIGINAL_TYPE`` property value, so it must
    byte-match what Avro Java prints for the same schema (goldens:
    ``"[\\"null\\",\\"string\\"]"``,
    ``"{\\"type\\":\\"enum\\",\\"name\\":...,\\"symbols\\":[...]}"``).
    Attribute order follows Avro's writers: type, name, namespace, doc,
    payload (fields/symbols/items/size), then user props, then aliases.
    """
    return json.dumps(_to_json(t), separators=(",", ":"))


def _to_json(t: Any) -> Any:
    if isinstance(t, str):
        return t
    if isinstance(t, list):
        return [_to_json(b) for b in t]
    kind = _kind(t)
    out: dict[str, Any] = {"type": t["type"]} if not isinstance(
        t.get("type"), (dict, list)
    ) else {"type": _to_json(t["type"])}
    for key in ("name", "namespace", "doc"):
        if key in t:
            out[key] = t[key]
    if kind == "record":
        out["fields"] = [_field_to_json(f) for f in t.get("fields", [])]
    elif kind == "enum":
        out["symbols"] = t["symbols"]
        if "default" in t:
            out["default"] = t["default"]
    elif kind == "array":
        out["items"] = _to_json(t["items"])
    elif kind == "map":
        out["values"] = _to_json(t["values"])
    elif kind == "fixed":
        out["size"] = t["size"]
    if "logicalType" in t:
        out["logicalType"] = t["logicalType"]
    out.update(_props(t, _SCHEMA_ATTRS))
    if "aliases" in t:
        out["aliases"] = t["aliases"]
    return out


def _field_to_json(f: dict) -> dict:
    out: dict[str, Any] = {"name": f["name"], "type": _to_json(f["type"])}
    for key in ("doc", "default", "order", "aliases"):
        if key in f:
            out[key] = f[key]
    out.update(_props(f, _FIELD_ATTRS))
    return out


def encrypt_avro_schema(
    schema: dict | str,
    encrypt_columns: Collection[str],
    updated_at: str,
) -> dict:
    """Return the de-identified output schema for ``schema``.

    ``encrypt_columns`` are flat-record schema keys
    (``$.recordFullName.field[.nestedRecordFullName.field...]``), the
    exact key strings the reference's config files carry
    (``contacts5k_dlp_encrypt_config.json``).  ``updated_at`` is the
    ISO-8601 instant appended to the root doc (the reference stamps
    ``Clock.instant()``; passing it explicitly keeps this deterministic
    and testable, matching ``withClock`` in the reference test).
    """
    if isinstance(schema, str):
        schema = json.loads(schema)
    if _kind(schema) != "record":
        raise ValueError("top-level schema must be a record")
    if not encrypt_columns:
        raise ValueError("schema and encrypt columns can't be null or empty")
    keys = frozenset(encrypt_columns)

    out = _make_record(schema, "$", keys, schema.get("namespace"))
    # root doc: "<old doc>\nUpdated for encryption at <ts>"; a missing
    # doc renders as the literal "null" (Java format of a null arg —
    # pinned by bq_contacts_schema_encrypted.json).
    old_doc = schema.get("doc")
    out["doc"] = (
        f"{'null' if old_doc is None else old_doc}"
        f"\nUpdated for encryption at {updated_at}"
    )
    return out


def _make_record(
    rs: dict, parent_key: str, keys: frozenset, enclosing_ns: str | None
) -> dict:
    record_key = f"{parent_key}.{_fullname(rs, enclosing_ns)}"
    ns = rs.get("namespace", enclosing_ns)
    out: dict[str, Any] = {"type": "record", "name": rs["name"]}
    if "namespace" in rs:
        out["namespace"] = rs["namespace"]
    if "doc" in rs:
        out["doc"] = rs["doc"]
    if "aliases" in rs:
        out["aliases"] = rs["aliases"]
    out["fields"] = [
        _make_field(f, record_key, keys, ns) for f in rs.get("fields", [])
    ]
    out.update(_props(rs, _SCHEMA_ATTRS))
    return out


def _make_field(
    f: dict, record_key: str, keys: frozenset, ns: str | None
) -> dict:
    field_key = f"{record_key}.{f['name']}"
    enc = field_key in keys
    out: dict[str, Any] = {
        "name": (ENCRYPTED_PREFIX if enc else "") + f["name"],
        "type": _make_type(f["type"], field_key, enc, keys, ns),
    }
    type_doc = _type_doc(f["type"])  # reference quirk: the TYPE's doc
    if type_doc is not None:
        out["doc"] = type_doc
    if "aliases" in f:
        out["aliases"] = f["aliases"]
    if "default" in f:
        out["default"] = f["default"]
    out.update(_props(f, _FIELD_ATTRS))
    if enc:
        out[ORIGINAL_TYPE] = schema_to_avro_str(f["type"])
    return out


def _make_type(
    t: Any, key: str, enc: bool, keys: frozenset, ns: str | None
) -> Any:
    kind = _kind(t)
    if kind == "union":
        branches = list(t)
        if len(branches) > 2 or _kind(branches[0]) != "null":
            raise ValueError(
                "Union can contain max of two types. with first being null"
            )
        return [_make_union_branch(b, key, enc, keys, ns) for b in branches]
    if kind == "array":
        # array-level props intentionally dropped (reference :226-231)
        return {"type": "array", "items": _make_type(t["items"], key, enc, keys, ns)}
    if kind == "record":
        return _make_record(t, key, keys, ns)
    if kind in ("map", "null"):
        raise ValueError(f"Type not supported in Schema - {kind.upper()}")
    if kind == "ref":
        # named-type reference: the reference resolves these to the
        # defined Schema; an encrypted enum/fixed reference would
        # stringify, but no config does this — keep the reference
        # intact and refuse the ambiguous encrypted case loudly.
        if enc:
            raise ValueError(
                f"cannot encrypt a named-type reference ({t!r}) at {key}"
            )
        return t
    # enum / fixed / primitives: a non-union encrypted leaf becomes a
    # BARE string (no props copied — reference makeType :262-270)
    if enc:
        return "string"
    return t


def _make_union_branch(
    b: Any, key: str, enc: bool, keys: frozenset, ns: str | None
) -> Any:
    kind = _kind(b)
    if kind == "null":
        return "null"
    if enc and kind not in _COMPLEX and kind != "ref":
        # primitive branch under encryption -> string, KEEPING the
        # branch type's own props (reference makeUnionType :290-294)
        if isinstance(b, dict):
            props = _props(b, _SCHEMA_ATTRS)
            if props:
                return {"type": "string", **props}
        return "string"
    if kind == "record":
        return _make_record(b, key, keys, ns)
    if kind == "enum":
        if enc:
            props = _props(b, _SCHEMA_ATTRS)
            return {"type": "string", **props} if props else "string"
        return b
    if kind == "fixed":
        if enc:
            props = _props(b, _SCHEMA_ATTRS)
            return {"type": "string", **props} if props else "string"
        return b
    if kind == "array":
        return {"type": "array", "items": _make_type(b["items"], key, enc, keys, ns)}
    if kind in ("union", "map"):
        raise ValueError("Union of Union/Map is invalid schema")
    return b  # primitive (possibly with props) or named reference

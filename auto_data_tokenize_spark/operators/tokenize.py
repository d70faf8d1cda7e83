"""Tokenization operators (EncryptionPipeline analogues).

Two modes, mirroring the reference's branch at
pipeline/EncryptionPipeline.java:271:

- free-form text tokenization (``tokenize_turns``): detect spans inside
  a text column and replace each with its deterministic token — the
  transcript hot path (csv_dlp_tokenize_config.json free_form_column).
- whole-column tokenization (``tokenize_columns``): encrypt entire cell
  values of named columns and rename them ``encrypted_<name>`` with
  string type — the Tink path (ValueEncryptionTransform.java:46-54 +
  DeIdentifiedRecordSchemaConverter.java:216-277).

Both are narrow (no shuffle): a single projection with an Arrow UDF,
fully pipelined with the scan — the whole 100 TB tokenize pass is
scan→project→write with zero exchanges.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from auto_data_tokenize_spark.functions.tokenizer import resolve_root_key
from auto_data_tokenize_spark.functions.udfs import _get_tokenizer, tokenize_text_udf


def tokenize_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    out_col: str = "text_tok",
    keep_original: bool = False,
    root_key: bytes | None = None,
    info_types: tuple[str, ...] | None = None,
) -> DataFrame:
    """Transcript free-form tokenization: ``text`` → ``text_tok``.
    ``info_types`` selects the detector set (None = default four)."""
    out = df.withColumn(
        out_col,
        tokenize_text_udf(root_key, info_types)(F.col(conv_col), F.col(text_col)),
    )
    if not keep_original and out_col != text_col:
        out = out.drop(text_col)
    return out


def _value_token_udf(root_key: bytes | None, label: str):
    """(scope, value) -> base64 token of the whole cell value."""
    root_key = resolve_root_key(root_key)

    @pandas_udf(StringType())
    def _tok(scope: pd.Series, value: pd.Series) -> pd.Series:
        tok = _get_tokenizer(root_key)
        return pd.Series(
            [
                None if v is None or v != v else tok.token(s if s == s and s is not None else "", label, str(v))
                for s, v in zip(scope, value)
            ],
            index=value.index,
            dtype=object,
        )

    return _tok


def tokenize_columns(
    df: DataFrame,
    columns: list[str],
    scope_col: str | None = None,
    root_key: bytes | None = None,
) -> DataFrame:
    """Whole-column tokenization with ``encrypted_<name>`` renaming.

    Output schema derivation mirrors
    DeIdentifiedRecordSchemaConverter.java:54,216-277: tokenized columns
    become strings named ``encrypted_<original>``; other columns pass
    through unchanged. ``scope_col`` (e.g. conv_id) selects the key
    scope; None → a single global key scope, like the reference's one
    keyset for the whole run.
    """
    scope = F.col(scope_col).cast("string") if scope_col else F.lit("")
    out = df
    for c in columns:
        udf = _value_token_udf(root_key, _column_label(c))
        original_type = df.schema[c].dataType.simpleString()
        out = (
            out.withColumn(f"encrypted_{c}", udf(scope, F.col(c).cast("string")))
            .drop(c)
            # ORIGINAL_TYPE as column metadata, the reference's schema
            # property (DeIdentifiedRecordSchemaConverter.java:53,209);
            # Spark persists StructField metadata through parquet, so a
            # later detokenize run recovers the type with no side channel
            .withMetadata(f"encrypted_{c}", {"original_type": original_type})
        )
    return out


def _column_label(c: str) -> str:
    """Key-scope label for whole-column tokens; must stay within
    TOKEN_RE's [A-Z_0-9] alphabet so tokens parse for detokenize."""
    return "COL_" + "".join(ch if ch.isalnum() else "_" for ch in c).upper()


def _array_token_udf(root_key: bytes | None, label: str):
    """(scope, array<string>) -> array<string>: per-element tokens for
    array leaves (one Arrow batch carries whole arrays)."""
    root_key = resolve_root_key(root_key)

    @pandas_udf(ArrayType(StringType()))
    def _tok(scope: pd.Series, values: pd.Series) -> pd.Series:
        tok = _get_tokenizer(root_key)

        def row(s, vs):
            if vs is None:
                return None
            s = s if s is not None and s == s else ""
            return [None if v is None else tok.token(s, label, str(v)) for v in vs]

        return pd.Series(
            [row(s, v) for s, v in zip(scope, values)],
            index=values.index,
            dtype=object,
        )

    return _tok


def _parse_schema_key(key: str) -> list[str]:
    parts = (key[2:] if key.startswith("$.") else key).split(".")
    if any(("[" in p) or (not p) for p in parts):
        raise ValueError(
            f"schema key {key!r}: use index-free schema keys ($.arr.f, "
            "not $.arr[3].f) — every array element is tokenized"
        )
    return parts


def _locate_array(schema, parts: list[str]):
    """Walk the path; return (array_segment_index | None, leaf_type).
    At most one array segment is supported (the reference's flat-key
    space is likewise one index deep per leaf in practice)."""
    from pyspark.sql.types import ArrayType as _Arr, StructType as _Struct

    arr_idx = None
    cur = schema[parts[0]].dataType
    for i, p in enumerate(parts):
        if i > 0:
            if not isinstance(cur, _Struct):
                raise ValueError(f"{'.'.join(parts)}: {parts[i-1]} is not a struct")
            cur = cur[p].dataType
        if isinstance(cur, _Arr):
            if arr_idx is not None:
                raise ValueError(
                    f"{'.'.join(parts)}: at most one array segment supported"
                )
            arr_idx = i
            cur = cur.elementType
    return arr_idx, cur


def _rebuild_with_leaf(top_expr, top_type, parts, arr_idx, leaf_col, new_leaf_name):
    """Copy the nested column, replacing the leaf at ``parts`` with
    ``leaf_col`` renamed ``new_leaf_name``. ``leaf_col`` is scalar when
    the path has no array (or the leaf IS the array field, replaced
    whole); otherwise it's an array aligned element-wise with the array
    segment and spliced back via ``zip_with`` — all JVM-side."""
    from pyspark.sql.types import ArrayType as _Arr

    def _null_preserving(src, rebuilt):
        # a NULL struct must stay NULL, not become a struct of nulls
        # (round-trip fidelity); Spark coerces the null literal to the
        # rebuilt struct type
        return F.when(src.isNull(), F.lit(None)).otherwise(rebuilt)

    def build_elem(e, stype, rel, t):
        fields = []
        for f in stype.fields:
            fe = e.getField(f.name)
            if f.name != rel[0]:
                fields.append(fe.alias(f.name))
            elif len(rel) == 1:
                fields.append(t.alias(new_leaf_name))
            else:
                fields.append(build_elem(fe, f.dataType, rel[1:], t).alias(f.name))
        return _null_preserving(e, F.struct(*fields))

    def build(expr, stype, rel, depth):
        fields = []
        for f in stype.fields:
            fe = expr.getField(f.name)
            if f.name != rel[0]:
                fields.append(fe.alias(f.name))
            elif len(rel) == 1:
                fields.append(leaf_col.alias(new_leaf_name))
            elif isinstance(f.dataType, _Arr):
                elem_t = f.dataType.elementType
                fields.append(
                    F.zip_with(
                        fe, leaf_col,
                        lambda e, t, et=elem_t, r=rel[1:]: build_elem(e, et, r, t),
                    ).alias(f.name)
                )
            else:
                fields.append(build(fe, f.dataType, rel[1:], depth + 1).alias(f.name))
        return _null_preserving(expr, F.struct(*fields))

    if arr_idx == 0 and len(parts) > 1:
        elem_t = top_type.elementType
        return F.zip_with(
            top_expr, leaf_col,
            lambda e, t: build_elem(e, elem_t, parts[1:], t),
        )
    return build(top_expr, top_type, parts[1:], 1)


def tokenize_nested(
    df: DataFrame,
    schema_keys: list[str],
    scope_col: str | None = None,
    root_key: bytes | None = None,
) -> DataFrame:
    """Tokenize nested struct / array<struct> leaves named by
    index-free schema keys ('$.a.b.c', '$.contacts.contact.number');
    one path segment may be an array — every element is tokenized.

    The leaf field is renamed ``encrypted_<name>`` in place inside its
    struct and the leaf's ORIGINAL_TYPE is recorded in the top-level
    column's metadata, keyed by schema key — the reference's
    TokenizeColumnNameUpdater.java:98-123 rename rules +
    DeIdentifiedRecordSchemaConverter.java:53,209 type property,
    restated as ONE narrow projection per key: field extraction maps
    through the array (``col('contacts.number')`` → array<string>),
    one Arrow UDF tokenizes it, ``zip_with`` splices tokens back
    element-aligned. No explode, no shuffle, no row ids."""
    root_key = resolve_root_key(root_key)
    scope = F.col(scope_col).cast("string") if scope_col else F.lit("")
    out = df
    for key in schema_keys:
        parts = _parse_schema_key(key)
        top = parts[0]
        if len(parts) == 1:
            # only array leaves belong here at the top level (per-element
            # tokens); scalars are tokenize_columns' job
            dtype = out.schema[top].dataType
            if not isinstance(dtype, ArrayType):
                raise ValueError(f"{key}: top-level scalar — use tokenize_columns")
            label = _column_label(top)
            tok = _array_token_udf(root_key, label)(
                scope, F.col(top).cast("array<string>")
            )
            out = (
                out.withColumn(f"encrypted_{top}", tok)
                .drop(top)
                .withMetadata(
                    f"encrypted_{top}",
                    {f"original_type.{key}": dtype.elementType.simpleString()},
                )
            )
            continue
        arr_idx, leaf_type = _locate_array(out.schema, parts)
        label = _column_label("_".join(parts))
        dotted = ".".join(parts)
        if arr_idx is None or arr_idx == len(parts) - 1:
            # scalar leaf, or the leaf field IS the array: token(s) drop
            # in as one replacement value
            if arr_idx == len(parts) - 1 and arr_idx is not None:
                leaf_col = _array_token_udf(root_key, label)(
                    scope, F.col(dotted).cast("array<string>")
                )
            else:
                leaf_col = _value_token_udf(root_key, label)(
                    scope, F.col(dotted).cast("string")
                )
        else:
            leaf_col = _array_token_udf(root_key, label)(
                scope, F.col(dotted).cast("array<string>")
            )
        rebuilt = _rebuild_with_leaf(
            F.col(top), out.schema[top].dataType, parts, arr_idx,
            leaf_col, f"encrypted_{parts[-1]}",
        )
        meta = dict(out.schema[top].metadata)
        meta[f"original_type.{key}"] = leaf_type.simpleString()
        out = out.withColumn(top, rebuilt).withMetadata(top, meta)
    return out


def detokenize_nested(
    df: DataFrame,
    schema_keys: list[str],
    scope_col: str | None = None,
    root_key: bytes | None = None,
) -> DataFrame:
    """Inverse of :func:`tokenize_nested`: pass the SAME schema keys
    (original leaf names); finds ``encrypted_<leaf>`` at each path,
    decrypts, renames back, and restores the leaf type from the
    top-level column's metadata."""
    root_key = resolve_root_key(root_key)
    scope = F.col(scope_col).cast("string") if scope_col else F.lit("")
    out = df
    for key in schema_keys:
        parts = _parse_schema_key(key)
        top = parts[0]
        leaf = parts[-1]
        if len(parts) == 1:
            enc_name = f"encrypted_{top}"
            label = _column_label(top)
            restore = out.schema[enc_name].metadata.get(f"original_type.{key}")
            detok = _array_detok_udf(root_key, label)(scope, F.col(enc_name))
            if restore:
                detok = detok.cast(f"array<{restore}>")
            out = out.withColumn(top, detok).drop(enc_name)
            continue
        enc_parts = parts[:-1] + [f"encrypted_{leaf}"]
        arr_idx, _ = _locate_array(out.schema, enc_parts)
        label = _column_label("_".join(parts))
        dotted = ".".join(enc_parts)
        restore = out.schema[top].metadata.get(f"original_type.{key}")
        if arr_idx is None:
            leaf_col = _value_detok_udf(root_key, label)(scope, F.col(dotted))
            if restore:
                leaf_col = leaf_col.cast(restore)
        else:
            # the leaf values travel as an aligned array<string> in every
            # array-bearing path (the array field IS the leaf, or the leaf
            # sits inside array elements); the stored ORIGINAL_TYPE is the
            # ELEMENT type, so the restore cast is always array<element>
            leaf_col = _array_detok_udf(root_key, label)(scope, F.col(dotted))
            if restore:
                leaf_col = leaf_col.cast(f"array<{restore}>")
        rebuilt = _rebuild_with_leaf(
            F.col(top), out.schema[top].dataType, enc_parts, arr_idx,
            leaf_col, leaf,
        )
        meta = {
            k: v
            for k, v in out.schema[top].metadata.items()
            if k != f"original_type.{key}"
        }
        out = out.withColumn(top, rebuilt).withMetadata(top, meta)
    return out


def _array_detok_udf(root_key: bytes | None, label: str):
    """(scope, array<string tokens>) -> array<string plaintexts>."""
    from auto_data_tokenize_spark.functions.tokenizer import TOKEN_RE

    root_key = resolve_root_key(root_key)

    @pandas_udf(ArrayType(StringType()))
    def _detok(scope: pd.Series, values: pd.Series) -> pd.Series:
        tok = _get_tokenizer(root_key)

        def one(s, v):
            if v is None:
                return None
            m = TOKEN_RE.fullmatch(v)
            if not m or m.group(1) != label:
                raise ValueError(f"not a {label} token: {v[:40]!r}")
            return tok.detoken(s, label, m.group(2))

        def row(s, vs):
            if vs is None:
                return None
            s = s if s is not None and s == s else ""
            return [one(s, v) for v in vs]

        return pd.Series(
            [row(s, v) for s, v in zip(scope, values)],
            index=values.index,
            dtype=object,
        )

    return _detok


def _value_detok_udf(root_key: bytes | None, label: str):
    """(scope, token) -> plaintext string; shared by flat and nested
    detokenize paths."""
    from auto_data_tokenize_spark.functions.tokenizer import TOKEN_RE

    root_key = resolve_root_key(root_key)

    @pandas_udf(StringType())
    def _detok(s: pd.Series, v: pd.Series) -> pd.Series:
        tok = _get_tokenizer(root_key)

        def one(scope_v, tok_v):
            if tok_v is None or tok_v != tok_v:
                return None
            m = TOKEN_RE.fullmatch(tok_v)
            if not m or m.group(1) != label:
                raise ValueError(f"not a {label} token: {tok_v[:40]!r}")
            return tok.detoken(
                scope_v if scope_v is not None and scope_v == scope_v else "",
                label,
                m.group(2),
            )

        return pd.Series(
            [one(a, b) for a, b in zip(s, v)], index=v.index, dtype=object
        )

    return _detok


def detokenize_columns(
    df: DataFrame,
    columns: list[str],
    original_types: dict[str, str] | None = None,
    scope_col: str | None = None,
    root_key: bytes | None = None,
) -> DataFrame:
    """Inverse of :func:`tokenize_columns`: ``encrypted_<c>`` → ``<c>``,
    restoring the original type via plan-time cast — semantics of the
    reference's ValueTokenizer.decrypt + ORIGINAL_TYPE schema property
    (encryptors/ValueTokenizer.java; DeIdentifiedRecordSchemaConverter.java:53,209).

    The type comes from the ``original_type`` column metadata that
    :func:`tokenize_columns` stamped (persisted through parquet), so no
    side channel is needed; ``original_types`` remains as an explicit
    per-column override.
    """
    root_key = resolve_root_key(root_key)
    scope = F.col(scope_col).cast("string") if scope_col else F.lit("")

    out = df
    for c in columns:
        col = _value_detok_udf(root_key, _column_label(c))(
            scope, F.col(f"encrypted_{c}")
        )
        restore_type = (original_types or {}).get(c) or df.schema[
            f"encrypted_{c}"
        ].metadata.get("original_type")
        if restore_type:
            col = col.cast(restore_type)
        out = out.withColumn(c, col).drop(f"encrypted_{c}")
    return out


def rekey_columns(
    df: DataFrame,
    columns: list[str],
    old_root_key: bytes,
    new_root_key: bytes,
    scope_col: str | None = None,
) -> DataFrame:
    """Root-key rotation over an already-tokenized table: decrypt each
    ``encrypted_<c>`` under ``old_root_key`` and re-encrypt under
    ``new_root_key`` in ONE projection pass — the operational job a
    reference deployment runs when a KMS root key is rotated (the
    reference delegates this to re-running EncryptionPipeline from
    clear data, main/pipeline/EncryptionPipeline.java; here the
    tokenized table itself is the input, so clear text never needs to
    be re-materialized outside the executors).

    Semantics: detokenize ∘ tokenize with the key swapped, per-column,
    preserving the ``encrypted_*`` names, ``original_type`` metadata
    and pass-through columns. Deterministic AES-SIV in, deterministic
    AES-SIV out — re-running the job (or replaying a partition after a
    task retry) produces byte-identical tokens, so the rotation is
    idempotent and resumable at any granularity.

    100 TB shape: a pure zero-shuffle Arrow projection (the same
    per-value crypto batch work as tokenize/detokenize); parallelism =
    scan partitions, so run it behind ``ensure_parallelism`` at small
    file counts like the crypto round-trip queries do."""
    missing = [c for c in columns if f"encrypted_{c}" not in df.columns]
    if missing:
        raise ValueError(
            f"rekey_columns: missing tokenized column(s) "
            f"{[f'encrypted_{c}' for c in missing]}; expected the "
            "encrypted_<name> layout of tokenize_columns"
        )
    # original_types=None: detokenize derives types from the columns'
    # own original_type metadata (single source of truth)
    clear = detokenize_columns(df, columns, None, scope_col, old_root_key)
    return tokenize_columns(clear, columns, scope_col, new_root_key)


def tokenize_columns_tink(
    df: DataFrame,
    columns: list[str],
    keyset_json: str,
) -> DataFrame:
    """Whole-column tokenization that is WIRE-COMPATIBLE with the
    reference: consumes a cleartext Tink AES256-SIV keyset JSON and
    emits exactly the tokens the reference's
    DaeadEncryptingValueTokenizer produces — base64(TINK prefix ‖
    AES-SIV(Value-proto, "AutoDLP")) — proven byte-for-byte against
    the reference's own golden encrypted records
    (test/resources/avro_records/contacts_schema/*_encrypted_*.json;
    tests/test_tink_compat.py). A user can bring their existing keyset
    AND keep their existing tokenized tables.

    Columns rename to ``encrypted_<name>`` (string) with the same
    ``original_type`` metadata contract as :func:`tokenize_columns`.
    Zero-shuffle Arrow projection; the keyset ships in the task
    closure (it is the key material — at production use a
    CredentialProvider reference, sources/credentials.py)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from auto_data_tokenize_spark.functions.tink_compat import (
        TinkDaeadTokenizer,
    )

    def _kind(dt: str) -> str:
        if dt in ("tinyint", "smallint", "int", "bigint"):
            return "int"
        if dt in ("float", "double"):
            return "float"
        if dt == "boolean":
            return "bool"
        if dt == "string":
            return "str"
        # date/timestamp/decimal/binary have no locally-implemented DLP
        # Value member — encoding them as string_value would silently
        # break the byte-compatibility contract (and binary crashes
        # opaquely in the Arrow worker); fail fast with the column type
        raise ValueError(
            f"tokenize_columns_tink: unsupported column type {dt!r} — "
            "supported: integral, float/double, boolean, string"
        )

    def _enc_udf(kind: str):
        # values arrive STRING-cast (Spark's Double.toString shortest
        # round-trip repr) and are re-typed exactly in Python — this
        # sidesteps pandas' int64+null → float64 coercion, which would
        # silently round integers beyond 2^53 before encryption
        parse = {
            "int": int,
            "float": float,
            "bool": lambda s: s == "true",
            "str": lambda s: s,
        }[kind]

        @pandas_udf("string")
        def _enc(vals: pd.Series) -> pd.Series:
            from auto_data_tokenize_spark.functions.tink_compat import (
                get_tokenizer,
            )

            tok = get_tokenizer(keyset_json)
            return pd.Series(
                [
                    None if v is None else tok.encrypt(parse(v))
                    for v in vals.astype(object)
                ],
                dtype="object",
            )

        return _enc

    out = df
    for c in columns:
        dt = out.schema[c].dataType.simpleString()
        meta = {"original_type": dt}
        src = F.col(c)
        if dt == "float":
            # IEEE float→double widening FIRST (what Java does when an
            # Avro float lands in Value.float_value), THEN the shortest
            # round-trip string — float("0.1"-as-float32) parsed as a
            # double would be a DIFFERENT double and a different token
            src = src.cast("double")
        out = out.withColumn(
            f"encrypted_{c}",
            _enc_udf(_kind(dt))(src.cast("string")).alias(
                c, metadata=meta
            ),
        ).drop(c)
    return out


def detokenize_columns_tink(
    df: DataFrame,
    columns: list[str],
    keyset_json: str,
    original_types: dict[str, str] | None = None,
) -> DataFrame:
    """Inverse of :func:`tokenize_columns_tink`; also decrypts tokens
    produced by the REFERENCE itself (same keyset, same wire format)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _dec_udf():
        @pandas_udf("string")
        def _dec(vals: pd.Series) -> pd.Series:
            from auto_data_tokenize_spark.functions.tink_compat import (
                get_tokenizer,
            )

            tok = get_tokenizer(keyset_json)
            out = []
            for v in vals:
                if v is None:
                    out.append(None)
                else:
                    d = tok.decrypt(v)
                    out.append(None if d is None else str(d))
            return pd.Series(out, dtype="object")

        return _dec

    out = df
    for c in columns:
        enc = f"encrypted_{c}"
        typ = (original_types or {}).get(c)
        if typ is None and enc in df.columns and df.schema[enc].metadata:
            typ = df.schema[enc].metadata.get("original_type")
        typ = typ or "string"
        out = out.withColumn(c, _dec_udf()(F.col(enc)).cast(typ)).drop(enc)
    return out


def rekey_columns_tink(
    df: DataFrame,
    columns: list[str],
    old_keyset_json: str,
    new_keyset_json: str,
) -> DataFrame:
    """Keyset rotation over a table tokenized in the REFERENCE's wire
    format (or by :func:`tokenize_columns_tink`): decrypt each
    ``encrypted_<c>`` under the old Tink keyset, re-encrypt under the
    new one, one zero-shuffle pass — the migration job for a user
    moving off the reference with an existing keyset, or rotating it.
    Same fail-fast layout check and idempotence argument as
    :func:`rekey_columns` (deterministic SIV)."""
    missing = [c for c in columns if f"encrypted_{c}" not in df.columns]
    if missing:
        raise ValueError(
            f"rekey_columns_tink: missing tokenized column(s) "
            f"{[f'encrypted_{c}' for c in missing]}"
        )
    # types come from the columns' own original_type metadata
    clear = detokenize_columns_tink(df, columns, old_keyset_json, None)
    return tokenize_columns_tink(clear, columns, new_keyset_json)


def residual_leak_audit(
    tokenized: DataFrame,
    detections: DataFrame,
    text_col: str = "text_tok",
    raw_text_col: str = "text",
    keys: list[str] | None = None,
) -> DataFrame:
    """Post-de-identification leak audit: for every detected span,
    recover its RAW text from the original turn via the detection's
    (start, end) offsets — the ``token`` column holds the tokenized
    REPLACEMENT, which trivially appears in the output — and check
    whether that raw text still appears verbatim in the de-identified
    output of the same turn, reporting per-infoType totals. This is
    the compliance gate a tokenization deployment runs before shipping
    a corpus (the reference trusts its pipeline; an auditor re-checks
    the output, cf. DlpInspectionPipeline re-scanning data it did not
    write).

    ``tokenized`` must carry both ``raw_text_col`` and ``text_col``
    per turn (``tokenize_turns(..., keep_original=True)`` shape, or a
    join of input and output tables). ``n_leaked`` counts detections
    whose raw span substring survives in ``text_col``; a healthy
    pipeline reports 0 for every infoType. Substring containment (not
    equality) also catches partial re-assembly, e.g. a tokenizer that
    replaced only half an overlap.

    Scale: one equi-join on the turn key — both sides derive from the
    same table so the join keys are co-partitioned after one shuffle —
    then a partial-agg groupBy on infoType (dozens of rows). Span
    extraction and the containment test are codegen ``substring`` +
    ``instr``, never Python."""
    keys = keys or ["conv_id", "turn_idx"]
    j = detections.select(*keys, "info_type", "start", "end").join(
        tokenized.select(*keys, raw_text_col, text_col), on=keys, how="inner"
    )
    contains = F.expr(
        f"instr({text_col}, substring({raw_text_col}, start + 1, end - start))"
    )
    # end > start guards degenerate spans: a zero-width detection would
    # search for '' (instr/strpos = 1 -> false leak) and an inverted
    # span extracts different text per engine
    leaked = (
        F.when((F.col("end") > F.col("start")) & (contains > 0), F.lit(1))
        .otherwise(F.lit(0))
    )
    return j.groupBy("info_type").agg(
        F.count(F.lit(1)).alias("n_detections"),
        F.sum(leaked).cast("long").alias("n_leaked"),
    )


def token_scope_audit(
    detections: DataFrame,
    transcripts: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Audit the two load-bearing properties of conv-scoped
    deterministic tokenization (the key hierarchy of
    functions/tokenizer.py; the reference scopes its DAEAD tokens to
    the keyset, EncryptionPipeline.java:117):

    - **conversation consistency**: within one conv_id, every
      occurrence of the same clear value maps to ONE token (joins stay
      possible inside the conversation);
    - **scope isolation**: across conv_ids, the same clear value maps
      to DIFFERENT tokens (no cross-conversation linkability), so a
      value seen in N conversations shows exactly N distinct tokens.

    Returns one row per info_type:
      ``n_values`` distinct clear values detected,
      ``value_conv_pairs`` distinct (value, conv) pairs,
      ``isolated_values`` values none of whose tokens appear in more
      than one conversation — distinct (conv, token) pairs equal
      distinct tokens, so no token links conversations (a value may
      simultaneously breach consistency; that never masks a linking
      token here),
      ``conv_consistent_values`` values with exactly one token per
      conversation (distinct (conv, token) pairs equal the
      conversation count).

    100 TB shape: one equi-join on the transcript key (no text is ever
    collected), then two partial-agg groupBys — value-level first,
    info_type rollup second. The clear value is re-derived from
    (start, end) spans with codegen ``substring``; no Python runs."""
    keys = keys or ["conv_id", "turn_idx"]
    v = detections.select(
        *keys, "info_type", "start", "end", "token"
    ).join(transcripts.select(*keys, "text"), on=keys, how="inner")
    v = v.select(
        "info_type",
        F.col("text")
        .substr(F.col("start") + F.lit(1), F.col("end") - F.col("start"))
        .alias("value"),
        F.col(keys[0]).alias("scope"),
        "token",
    )
    per_value = v.groupBy("info_type", "value").agg(
        F.countDistinct("scope").alias("n_convs"),
        F.countDistinct("token").alias("n_tokens"),
        F.countDistinct("scope", "token").alias("n_scope_tokens"),
    )
    return per_value.groupBy("info_type").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.sum("n_convs").cast("long").alias("value_conv_pairs"),
        F.sum(
            (F.col("n_scope_tokens") == F.col("n_tokens")).cast("long")
        ).alias("isolated_values"),
        F.sum(
            (F.col("n_scope_tokens") == F.col("n_convs")).cast("long")
        ).alias("conv_consistent_values"),
    )


def duckdb_token_scope_audit_sql(det: str, tr: str) -> str:
    """DuckDB twin of :func:`token_scope_audit` over the independently
    materialized detections golden (datagen.golden_detections — the
    pure-Python tokenizer, not the Spark UDF), so Spark-vs-oracle
    equality cross-checks the token structure between the two
    implementations. BIGINT casts keep dtypes parquet-faithful (the
    r3 HUGEINT lesson)."""
    return f"""
        WITH v AS (
          SELECT d.info_type,
                 substr(t.text, d.start + 1, d."end" - d.start) AS value,
                 d.conv_id AS scope, d.token
          FROM {det} d JOIN {tr} t USING (conv_id, turn_idx)
        ), g AS (
          SELECT info_type, value,
                 COUNT(DISTINCT scope) AS n_convs,
                 COUNT(DISTINCT token) AS n_tokens,
                 COUNT(DISTINCT scope || chr(31) || token) AS n_scope_tokens
          FROM v GROUP BY 1, 2
        )
        SELECT info_type,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               CAST(SUM(n_convs) AS BIGINT) AS value_conv_pairs,
               CAST(SUM(CASE WHEN n_scope_tokens = n_tokens THEN 1 ELSE 0 END) AS BIGINT)
                 AS isolated_values,
               CAST(SUM(CASE WHEN n_scope_tokens = n_convs THEN 1 ELSE 0 END) AS BIGINT)
                 AS conv_consistent_values
        FROM g GROUP BY 1
    """


def token_scope_monitor(
    df: DataFrame,
    window: str = "1 minute",
    ts_col: str = "ts",
    watermark: str | None = None,
    info_col: str = "info_type",
    value_col: str = "value_hash",
    scope_col: str = "scope",
    token_col: str = "token",
) -> DataFrame:
    """LIVE counterpart of :func:`token_scope_audit`: per
    watermark-closed window, does the detection/tokenization feed still
    honor both DAEAD scope contracts (the reference keys its tokens to
    one keyset, EncryptionPipeline.java:117; this engine scopes them
    per conversation) — the alarm that catches a scope-loss deploy
    (tokens suddenly link across conversations) or a rekey-on-retry bug
    (one value growing multiple tokens inside a conversation) in the
    window it ships, not at the next offline audit.

    Each event is judged under both contracts via a STATELESS fan-out
    (``contract`` becomes a grouping key, so one operator chain checks
    both):

    - ``consistency``: group (value, scope), observe tokens — a group
      with >1 distinct token means one value tokenized two ways inside
      one conversation;
    - ``isolation``: group (value, token), observe scopes — a group
      with >1 distinct scope means one token linking conversations.

    Output per (window_start, info_type, contract): ``n_groups``
    distinct key pairs, ``n_breached`` groups with >1 distinct
    observation, ``n_combos`` distinct (group, observation) triples.

    Streaming shape: three CHAINED stateful window aggregations via
    ``window_time`` (distinct counts are unsupported in streaming
    aggs, but each level's groupBy leaves rows UNIQUE per key, so the
    next level's plain ``count`` IS the distinct count). Dup scope is
    WITHIN-window by design — state stays bounded by (open windows x
    distinct fan-out keys) and frees as the watermark closes each
    window; the corpus-wide check is the batch audit. Batch/stream
    agnostic: the identical plan runs on a static frame."""
    d = df.withWatermark(ts_col, watermark) if watermark is not None else df
    ev = d.select(
        F.col(ts_col).alias("_ts"),
        F.col(info_col).alias("_it"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("consistency").alias("contract"),
                    F.col(value_col).alias("k1"),
                    F.col(scope_col).alias("k2"),
                    F.col(token_col).alias("obs"),
                ),
                F.struct(
                    F.lit("isolation").alias("contract"),
                    F.col(value_col).alias("k1"),
                    F.col(token_col).alias("k2"),
                    F.col(scope_col).alias("obs"),
                ),
            )
        ).alias("e"),
    )
    uniq = ev.groupBy(
        F.window("_ts", window).alias("w"),
        "_it",
        F.col("e.contract").alias("contract"),
        F.col("e.k1").alias("k1"),
        F.col("e.k2").alias("k2"),
        F.col("e.obs").alias("obs"),
    ).agg(F.count(F.lit(1)).alias("_n"))
    groups = uniq.groupBy(
        F.window(F.window_time("w"), window).alias("w2"),
        "_it",
        "contract",
        "k1",
        "k2",
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    return (
        groups.groupBy(
            F.window(F.window_time("w2"), window).alias("cw"),
            F.col("_it").alias("info_type"),
            "contract",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum((F.col("n_obs") > 1).cast("long")).alias("n_breached"),
            F.sum("n_obs").cast("long").alias("n_combos"),
        )
        .select(
            F.col("cw.start").alias("window_start"),
            "info_type",
            "contract",
            "n_groups",
            "n_breached",
            "n_combos",
        )
    )


def duckdb_token_scope_monitor_sql(
    table: str,
    window_us: int = 60_000_000,
    value_col: str = "value_hash",
    scope_col: str = "scope",
    token_col: str = "token",
) -> str:
    """DuckDB twin of :func:`token_scope_monitor` (same contract
    fan-out, window bucketing, and distinct-count rollup; the
    streaming final-watermark predicate is the caller's outer
    filter). BIGINT casts keep dtypes parquet-faithful."""
    return f"""
        WITH ev AS (
          SELECT ts, info_type, 'consistency' AS contract,
                 {value_col} AS k1, {scope_col} AS k2, {token_col} AS obs
          FROM {table}
          UNION ALL
          SELECT ts, info_type, 'isolation',
                 {value_col}, {token_col}, {scope_col}
          FROM {table}
        ), g AS (
          SELECT make_timestamp((epoch_us(ts) // {window_us})
                   * {window_us}) AS window_start,
                 info_type, contract, k1, k2,
                 COUNT(DISTINCT obs) AS n_obs
          FROM ev GROUP BY 1, 2, 3, 4, 5
        )
        SELECT window_start, info_type, contract,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN n_obs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_breached,
               CAST(SUM(n_obs) AS BIGINT) AS n_combos
        FROM g GROUP BY 1, 2, 3
    """

"""Config-driven tokenization: parse the reference's DlpEncryptConfig
JSON shape and apply it as one declarative plan.

The reference drives its encrypt pipeline from a JSON config file
(``--dlpEncryptConfigJson``, main/pipeline/EncryptionPipeline.java;
shapes: csv_dlp_tokenize_config.json, email_cc_dlp_encrypt_config.json;
proto ``DlpEncryptConfig``/``ColumnTransform``, proto:183-205)::

    {"transforms": [{
        "columnId": "$.Record.col[.nested...]",
        "freeFormColumn": "true",          # optional: span tokenization
        "infoTypes": ["PERSON_NAME", ...], # optional: detector subset
        "transform": {"cryptoDeterministicConfig": {"cryptoKey": {...}}}
    }]}

Mapping to this engine:

- ``freeFormColumn`` true → :func:`operators.tokenize.tokenize_turns`
  in place (detect spans, replace each with its AES-SIV token; the
  column keeps its name — the reference's free-form transform rewrites
  the cell text, TokenizeColumnNameUpdater only renames whole-value
  columns).
- otherwise → whole-value :func:`operators.tokenize.tokenize_columns`
  (``encrypted_<name>`` rename + ORIGINAL_TYPE metadata); column ids
  with nested path segments route to
  :func:`operators.tokenize.tokenize_nested`.
- ``infoTypes`` → the detector-set selection (``info_types=``)
  threaded through the UDF layer; absent → the engine default set.
- ``transform`` carrying any OTHER member of the public
  ``PrimitiveTransformation`` oneof (characterMaskConfig, redactConfig,
  replaceConfig, replaceWithInfoTypeConfig, cryptoHashConfig,
  dateShiftConfig, fixedSizeBucketingConfig, bucketingConfig,
  timePartConfig — proto:203-205 embeds the full oneof) → routed to
  :mod:`operators.deidentify`: whole-value specs become narrow JVM
  column expressions in place; free-form specs rewrite each detected
  finding via the same span machinery the tokenizer uses.
- ``cryptoKey`` → recorded as ``key_ref`` for audit, but key MATERIAL
  resolves through this engine's root-key seam
  (``functions.tokenizer.resolve_root_key`` / the KeyProvider
  extension point): ``kmsWrapped`` unwrapping is a GCP KMS call,
  excluded by the public-knowledge rule. All transforms share one
  root key; per-column separation comes from the HKDF label hierarchy
  (scope, column/infoType), mirroring the reference's single keyset
  per run.

Column ids are the reference's JSONPath-style schema keys: the FIRST
segment after ``$.`` is the record name (``$.CsvRecord.transcript`` →
column ``transcript``); deeper keys keep their remaining path
(``$.contacts.contact.number`` → nested key ``$.contact.number``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class TransformSpec:
    """One parsed ``transforms[]`` entry."""

    column_id: str  # raw "$.Record.col..." schema key from the config
    parts: tuple[str, ...]  # path segments after the record name
    free_form: bool
    info_types: tuple[str, ...] | None  # None → engine default set
    key_ref: str | None  # cryptoKeyName, audit-only
    # non-crypto-deterministic PrimitiveTransformation oneof (raw dict:
    # characterMaskConfig / redactConfig / replaceConfig / ... — see
    # operators.deidentify); None → crypto-deterministic tokenization,
    # the reference pipeline's own choice and this engine's default.
    primitive: dict | None = None


def _parse_column_id(column_id: str) -> tuple[str, ...]:
    if not column_id.startswith("$."):
        raise ValueError(f"columnId must start with '$.': {column_id!r}")
    parts = tuple(p for p in column_id[2:].split(".") if p)
    if len(parts) < 2:
        raise ValueError(
            f"columnId needs record + column segments ($.Record.col): {column_id!r}"
        )
    return parts[1:]  # drop the record-name segment


def parse_encrypt_config(source) -> list[TransformSpec]:
    """Parse a DlpEncryptConfig from a dict, a JSON string, or a file
    path. Unknown infoTypes fail here (fail-fast, before any Spark
    job), using the detector registry as the authority."""
    from auto_data_tokenize_spark.functions import detectors

    if isinstance(source, dict):
        cfg = source
    elif isinstance(source, (str, os.PathLike)) and os.path.exists(str(source)):
        with open(source) as f:
            cfg = json.load(f)
    elif isinstance(source, str):
        cfg = json.loads(source)
    else:
        raise TypeError(f"unsupported config source: {type(source).__name__}")

    transforms = cfg.get("transforms")
    if not isinstance(transforms, list) or not transforms:
        raise ValueError("config has no transforms[] list")

    specs: list[TransformSpec] = []
    for t in transforms:
        column_id = t.get("columnId")
        if not column_id:
            raise ValueError("transform entry missing columnId")
        info_types = t.get("infoTypes")
        if info_types is not None:
            info_types = tuple(info_types)
            if not info_types:
                # an empty list would compile an empty alternation and
                # silently disable ALL detection for the column — the
                # opposite of what a truncated config intends
                raise ValueError(
                    f"transform for {column_id!r} has an empty infoTypes "
                    "list; omit the key to use the default detector set"
                )
            detectors.combined_re(info_types)  # raises on unknown names
        # the reference serializes booleans as JSON strings ("true")
        free_form = str(t.get("freeFormColumn", "false")).lower() == "true"
        transform = t.get("transform", {}) or {}
        key_ref = (
            transform.get("cryptoDeterministicConfig", {})
            .get("cryptoKey", {})
            .get("kmsWrapped", {})
            .get("cryptoKeyName")
        )
        # the PrimitiveTransformation oneof: anything other than
        # crypto-deterministic routes through operators.deidentify
        primitive = None
        non_crypto = {
            k: v for k, v in transform.items() if k != "cryptoDeterministicConfig"
        }
        if non_crypto:
            if "cryptoDeterministicConfig" in transform or len(non_crypto) > 1:
                raise ValueError(
                    f"transform for {column_id!r} must set exactly one "
                    f"primitive transformation, got {sorted(transform)}"
                )
            primitive = non_crypto
        specs.append(
            TransformSpec(
                column_id=column_id,
                parts=_parse_column_id(column_id),
                free_form=free_form,
                info_types=info_types,
                key_ref=key_ref,
                primitive=primitive,
            )
        )
    return specs


def apply_encrypt_config(
    df: DataFrame,
    specs: list[TransformSpec],
    scope_col: str | None = None,
    root_key: bytes | None = None,
) -> DataFrame:
    """Apply parsed transforms as one declarative plan: free-form specs
    rewrite their column in place; whole-value specs rename to
    ``encrypted_<name>``; nested ids route to ``tokenize_nested``.
    All stages are narrow (Arrow UDF projections) — no shuffle is
    introduced at any scale.

    Ordering of ``transforms[]`` entries is SEMANTICS-FREE (DLP's
    apply-to-original-record posture): each column may be targeted by
    at most one transform (duplicates fail fast), and every
    cross-column read — date-shift contexts and the scope column — is
    taken from a snapshot of the ORIGINAL values, so a sibling
    transform rewriting a context column can never change another
    column's result."""
    from pyspark.sql import functions as F

    from auto_data_tokenize_spark.operators.tokenize import (
        tokenize_columns,
        tokenize_nested,
        tokenize_turns,
    )

    from auto_data_tokenize_spark.operators.deidentify import (
        apply_whole_value_transform,
        free_form_repl,
    )

    ids = [s.column_id for s in specs]
    if len(set(ids)) != len(ids):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate columnId in transforms: {dupes}")

    # snapshot every cross-column input under its original values
    ctx_cols: set[str] = set()
    for spec in specs:
        for k in ("dateShiftConfig", "cryptoReplaceFfxFpeConfig"):
            if spec.primitive and k in spec.primitive:
                ctx = spec.primitive[k].get("context") or {}
                if ctx.get("name"):
                    ctx_cols.add(ctx["name"])
    if scope_col:
        ctx_cols.add(scope_col)
    snap = {
        c: f"__adt_orig_{c}" for c in sorted(ctx_cols) if c in df.columns
    }
    out = (
        df.select("*", *[F.col(c).alias(a) for c, a in snap.items()])
        if snap
        else df
    )
    scope_read = snap.get(scope_col, scope_col) if scope_col else None
    flat_whole: list[str] = []
    for spec in specs:
        if spec.free_form:
            if len(spec.parts) != 1:
                raise ValueError(
                    f"freeFormColumn only supports flat columns: {spec.column_id!r}"
                )
            col = spec.parts[0]
            if spec.primitive is not None:
                # finding transform (mask/redact/replace/replace-with-
                # infoType/FPE) over detected spans in place; a
                # configured FPE context column binds per row through
                # the two-column UDF (read from the ORIGINAL-value
                # snapshot, like the whole-value transforms)
                from auto_data_tokenize_spark.functions.udfs import (
                    transform_text_udf,
                )

                ff_ctx = None
                if "cryptoReplaceFfxFpeConfig" in spec.primitive:
                    c = spec.primitive["cryptoReplaceFfxFpeConfig"]
                    name = (c.get("context") or {}).get("name")
                    if name:
                        ff_ctx = snap.get(name, name)
                repl = free_form_repl(
                    spec.primitive, column=col, root_key=root_key
                )
                if ff_ctx is not None:
                    expr = transform_text_udf(
                        repl, spec.info_types, takes_context=True
                    )(out[col], F.col(ff_ctx).cast("string"))
                else:
                    expr = transform_text_udf(repl, spec.info_types)(
                        out[col]
                    )
                out = out.withColumn(col, expr)
            elif scope_col:
                out = tokenize_turns(
                    out,
                    conv_col=scope_read,
                    text_col=col,
                    out_col=col,
                    root_key=root_key,
                    info_types=spec.info_types,
                )
            else:  # no scope column → single global key scope
                out = _tokenize_free_form_global(out, col, root_key, spec.info_types)
        elif spec.primitive is not None:
            if len(spec.parts) != 1:
                raise ValueError(
                    f"primitive transformations support flat columns only: "
                    f"{spec.column_id!r}"
                )
            ctx_name = None
            for k in ("dateShiftConfig", "cryptoReplaceFfxFpeConfig"):
                if k in spec.primitive:
                    ctx = spec.primitive[k].get("context") or {}
                    if ctx.get("name"):
                        ctx_name = snap.get(ctx["name"], ctx["name"])
            out = apply_whole_value_transform(
                out,
                spec.parts[0],
                spec.primitive,
                root_key=root_key,
                context_col=ctx_name,
            )
        elif len(spec.parts) == 1:
            flat_whole.append(spec.parts[0])
        else:
            out = tokenize_nested(
                out,
                ["$." + ".".join(spec.parts)],
                scope_col=scope_read,
                root_key=root_key,
            )
    if flat_whole:
        out = tokenize_columns(
            out, flat_whole, scope_col=scope_read, root_key=root_key
        )
    return out.drop(*snap.values()) if snap else out


def _tokenize_free_form_global(df, col, root_key, info_types):
    """Free-form tokenization under the single global key scope (the
    reference's one-keyset-per-run posture when no scope column is
    configured)."""
    from pyspark.sql import functions as F

    from auto_data_tokenize_spark.functions.udfs import tokenize_text_udf

    return df.withColumn(
        col, tokenize_text_udf(root_key, info_types)(F.lit(""), F.col(col))
    )

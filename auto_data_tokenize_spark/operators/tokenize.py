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
from pyspark.sql.types import StringType

from auto_data_tokenize_spark.functions.tokenizer import DEFAULT_ROOT_KEY
from auto_data_tokenize_spark.functions.udfs import _get_tokenizer, tokenize_text_udf


def tokenize_turns(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    out_col: str = "text_tok",
    keep_original: bool = False,
    root_key: bytes = DEFAULT_ROOT_KEY,
) -> DataFrame:
    """Transcript free-form tokenization: ``text`` → ``text_tok``."""
    out = df.withColumn(
        out_col, tokenize_text_udf(root_key)(F.col(conv_col), F.col(text_col))
    )
    if not keep_original and out_col != text_col:
        out = out.drop(text_col)
    return out


def _value_token_udf(root_key: bytes, label: str):
    """(scope, value) -> base64 token of the whole cell value."""

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
    root_key: bytes = DEFAULT_ROOT_KEY,
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


def detokenize_columns(
    df: DataFrame,
    columns: list[str],
    original_types: dict[str, str] | None = None,
    scope_col: str | None = None,
    root_key: bytes = DEFAULT_ROOT_KEY,
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
    from auto_data_tokenize_spark.functions.tokenizer import TOKEN_RE

    scope = F.col(scope_col).cast("string") if scope_col else F.lit("")

    def _make_detok(label: str):
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

    out = df
    for c in columns:
        col = _make_detok(_column_label(c))(scope, F.col(f"encrypted_{c}"))
        restore_type = (original_types or {}).get(c) or df.schema[
            f"encrypted_{c}"
        ].metadata.get("original_type")
        if restore_type:
            col = col.cast(restore_type)
        out = out.withColumn(c, col).drop(f"encrypted_{c}")
    return out

"""Arrow-vectorized UDF layer over the detection/tokenization cores.

These are the engine's ONLY Python-side hot-path functions; everything
else stays JVM-side (built-in ``pyspark.sql.functions``). Design rules:

- ``pandas_udf`` (Series→Series, Arrow batches) — never row-at-a-time
  Python UDFs. The Arrow batch is the analogue of the reference's DLP
  request batch (dlp/BatchColumnsForDlp.java:50-54): work arrives in
  ~10k-row columnar chunks (session.ARROW_BATCH_ROWS).
- Per-executor tokenizer singletons, mirroring the reference's DLP
  client held per DoFn instance (dlp/DlpIdentify.java:153-156): cipher
  objects and derived keys are created lazily inside the worker and
  cached across batches; key material crosses the driver→executor
  boundary once, inside the (tiny) closure — never through a shuffle.
- Inside a batch, rows are grouped by ``conv_id`` so the per-span
  replacement runs as one vectorized ``Series.str.replace`` per
  conversation group with a cached per-conversation cipher.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from auto_data_tokenize_spark.functions import detectors
from auto_data_tokenize_spark.functions.tokenizer import DEFAULT_ROOT_KEY, Tokenizer

# executor-local singletons keyed by root key (DoFn-@Setup analogue)
_TOKENIZERS: dict[bytes, Tokenizer] = {}


def _get_tokenizer(root_key: bytes) -> Tokenizer:
    t = _TOKENIZERS.get(root_key)
    if t is None:
        t = Tokenizer(root_key)
        _TOKENIZERS[root_key] = t
    return t


def _per_conversation(conv: pd.Series, text: pd.Series, fn) -> pd.Series:
    """Apply ``fn(conv_id, text_series) -> series`` per conv group within
    one Arrow batch, preserving row order."""
    if len(text) == 0:
        return text
    parts = [fn(cid, s) for cid, s in text.groupby(conv.values, sort=False)]
    return pd.concat(parts).reindex(text.index)


def tokenize_text_udf(root_key: bytes = DEFAULT_ROOT_KEY):
    """(conv_id, text) -> tokenized text. Free-form span tokenization
    (semantics of EncryptingFlatRecordTokenizer.java:75-118 +
    free_form_column=true, csv_dlp_tokenize_config.json:1-21)."""

    @pandas_udf(StringType())
    def _tokenize(conv: pd.Series, text: pd.Series) -> pd.Series:
        tok = _get_tokenizer(root_key)

        def _one_conv(cid, s: pd.Series) -> pd.Series:
            sub = detectors.make_substitution(
                lambda info_type, matched: tok.token(cid, info_type, matched)
            )
            return s.str.replace(detectors.COMBINED_RE, sub, regex=True)

        return _per_conversation(conv, text, _one_conv)

    return _tokenize


def detokenize_text_udf(root_key: bytes = DEFAULT_ROOT_KEY):
    """(conv_id, tokenized_text) -> original text (ValueTokenizer.decrypt
    analogue, encryptors/ValueTokenizer.java)."""
    from auto_data_tokenize_spark.functions.tokenizer import TOKEN_RE

    @pandas_udf(StringType())
    def _detokenize(conv: pd.Series, text: pd.Series) -> pd.Series:
        tok = _get_tokenizer(root_key)

        def _one_conv(cid, s: pd.Series) -> pd.Series:
            return s.str.replace(
                TOKEN_RE,
                lambda m: tok.detoken(cid, m.group(1), m.group(2)),
                regex=True,
            )

        return _per_conversation(conv, text, _one_conv)

    return _detokenize


SPAN_SCHEMA = ArrayType(
    StructType(
        [
            StructField("info_type", StringType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("token", StringType()),
        ]
    )
)


def detect_spans_udf(root_key: bytes = DEFAULT_ROOT_KEY):
    """(conv_id, text) -> array<struct<info_type,start,end,token>>.

    The local analogue of dlp.inspectContent findings
    (dlp/DlpBatchInspect.java:114-136), plus the deterministic token each
    span would map to (so detections can join the token dictionary)."""

    @pandas_udf(SPAN_SCHEMA)
    def _detect(conv: pd.Series, text: pd.Series) -> pd.Series:
        tok = _get_tokenizer(root_key)

        def _one_conv(cid, s: pd.Series) -> pd.Series:
            return s.map(
                lambda t: [
                    {
                        "info_type": sp.info_type,
                        "start": sp.start,
                        "end": sp.end,
                        "token": tok.token(cid, sp.info_type, sp.text),
                    }
                    for sp in detectors.find_spans(t)
                ]
                if t is not None and t == t
                else []
            )

        return _per_conversation(conv, text, _one_conv)

    return _detect


def info_types_udf():
    """text -> array<string> of detected infoTypes (no tokens; cheapest
    detection shape for identify/sampling paths)."""

    @pandas_udf(ArrayType(StringType()))
    def _info_types(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: [sp.info_type for sp in detectors.find_spans(t)]
            if t is not None and t == t
            else []
        )

    return _info_types


def with_tokenized_text(
    df,
    conv_col: str = "conv_id",
    text_col: str = "text",
    out_col: str = "text_tok",
    root_key: bytes = DEFAULT_ROOT_KEY,
):
    """Plan helper: add the tokenized-text column (narrow, no shuffle)."""
    return df.withColumn(out_col, tokenize_text_udf(root_key)(F.col(conv_col), F.col(text_col)))

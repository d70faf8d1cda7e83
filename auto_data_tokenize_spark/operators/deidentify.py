"""DLP-style primitive de-identification transforms.

The reference's ``ColumnTransform`` embeds the full public
``google.privacy.dlp.v2.PrimitiveTransformation`` oneof
(src/main/proto/google/cloud/autodlp/auto_tokenize_messages.proto:188-205
— "Transform to be used for tokenizing entire column value"), but its
pipeline only exercises ``cryptoDeterministicConfig``. A user of the
reference can put ANY primitive transformation in that config slot, so
this engine implements the public, locally-computable members of the
oneof; each is expressed as a declarative Spark column expression (pure
JVM codegen — no Python in the plan) except ``cryptoHashConfig``, whose
keyed HMAC is inherent per-value crypto and runs as an Arrow-vectorized
``pandas_udf`` like the AES-SIV path.

Implemented (config key → semantics, per the public DLP docs):

- ``characterMaskConfig`` — replace ``numberToMask`` characters with
  ``maskingCharacter`` starting from the front (``reverseOrder`` masks
  from the end); unset/0 ``numberToMask`` masks the whole value.
- ``redactConfig`` — remove the value entirely (whole-value → NULL;
  free-form → the finding is deleted from the text).
- ``replaceConfig`` — replace with ``newValue`` (typed ``Value``:
  stringValue / integerValue / floatValue / booleanValue).
- ``replaceWithInfoTypeConfig`` — free-form only: each finding becomes
  ``[INFO_TYPE_NAME]``.
- ``cryptoHashConfig`` — HMAC-SHA256 of the UTF-8 value under a key
  derived from the engine root-key seam (HKDF label
  ``cryptoHash:<column>``), base64url output. One-way (no detokenize).
- ``dateShiftConfig`` — deterministic shift of a date by
  ``shift ∈ [lowerBoundDays, upperBoundDays]`` chosen by a keyed hash
  of the ``context`` column (or the date itself when no context),
  so equal contexts shift equally — the DLP date-shift consistency
  contract. The hash is the engine's portable md5-prefix family, so
  DuckDB oracles can reproduce it exactly.
- ``fixedSizeBucketingConfig`` — numeric → ``"<lo>-<hi>"`` bucket
  label; below ``lowerBound`` → ``"<<lowerBound>"``, at/above
  ``upperBound`` → ``">=<upperBound>"`` (bounds formatted as the
  config wrote them).
- ``bucketingConfig`` — explicit ``buckets[]`` with ``min`` (inclusive)
  / ``max`` (exclusive) / ``replacementValue``; non-matching values
  pass through as their string form.
- ``timePartConfig`` — extract ``partToExtract`` (YEAR / MONTH /
  DAY_OF_MONTH / DAY_OF_WEEK / WEEK_OF_YEAR / HOUR_OF_DAY) as an int.
- ``cryptoReplaceFfxFpeConfig`` — FF1 format-preserving encryption
  (NIST SP 800-38G; ``functions/fpe.py``) over a common/custom
  alphabet or bare radix, with the DLP per-row ``context`` tweak
  (equal value+context → equal token) and optional
  ``surrogateInfoType`` annotation for reversible free-text embedding.
  Reversible: whole-value via ``fpe_transform_udf(decrypt=True)``,
  free-form via ``fpe_reidentify_udf``.

Scale posture: every transform is a narrow projection — zero shuffles
introduced at any input size; the only Python stage (cryptoHash) is an
Arrow batch pipe identical in shape to the tokenize hot path.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "char_mask",
    "date_shift",
    "fixed_size_buckets",
    "value_buckets",
    "time_part",
    "crypto_hash_udf",
    "fpe_cipher_for",
    "fpe_transform_udf",
    "fpe_reidentify_udf",
    "apply_whole_value_transform",
    "free_form_repl",
]

# the portable cross-engine hash lives in ONE place: functions/xengine
from auto_data_tokenize_spark.functions.xengine import (
    spark_md5_prefix_col as _md5_prefix_long,
)


def char_mask(
    col: Column,
    masking_character: str = "*",
    number_to_mask: int = 0,
    reverse_order: bool = False,
) -> Column:
    """``characterMaskConfig`` as a pure JVM expression.

    ``number_to_mask <= 0`` masks every character. Forward order masks
    the first N characters (the DLP sample posture: SSN ``372819127``
    with N=5 → ``*****9127``); ``reverse_order`` masks the last N.
    Values shorter than N are fully masked; length is preserved.
    """
    if len(masking_character) != 1:
        raise ValueError(
            f"maskingCharacter must be one character: {masking_character!r}"
        )
    s = col.cast("string")
    ln = F.length(s)
    if number_to_mask <= 0:
        return F.repeat(F.lit(masking_character), ln)
    n = F.least(F.lit(int(number_to_mask)), ln)
    masked = F.repeat(F.lit(masking_character), n)
    if reverse_order:
        keep = s.substr(F.lit(1), ln - n)
        return F.concat(keep, masked)
    keep = s.substr(n + F.lit(1), ln)
    return F.concat(masked, keep)


def date_shift(
    col: Column,
    lower_bound_days: int,
    upper_bound_days: int,
    context: Column | None = None,
    salt: str = "",
) -> Column:
    """``dateShiftConfig``: deterministic per-context day shift in
    ``[lower, upper]`` (inclusive). Equal context values receive equal
    shifts (DLP consistency contract); ``salt`` folds the crypto key
    into the hash driver-side so the expression stays JVM-only.

    A NULL context value hashes as ``""`` — the same posture as the
    FPE UDF's null-context tweak — so such rows still shift
    deterministically instead of having their dates silently nulled
    by null-propagating concat/date_add."""
    lo, hi = int(lower_bound_days), int(upper_bound_days)
    if lo > hi:
        raise ValueError(f"lowerBoundDays {lo} > upperBoundDays {hi}")
    basis = F.coalesce(
        (context if context is not None else col).cast("string"), F.lit("")
    )
    h = _md5_prefix_long(F.concat(F.lit(salt), F.lit(":"), basis))
    shift = F.pmod(h, F.lit(hi - lo + 1)) + F.lit(lo)
    return F.date_add(col.cast("date"), shift.cast("int"))


def _num_str(x: float) -> str:
    """Format a config number the way the config wrote it: integral
    floats print without the trailing ``.0`` (JSON ``50000`` and
    ``50000.0`` label identically)."""
    f = float(x)
    return str(int(f)) if f.is_integer() else repr(f)


def fixed_size_buckets(
    col: Column, lower_bound: float, upper_bound: float, bucket_size: float
) -> Column:
    """``fixedSizeBucketingConfig``: numeric value → bucket label
    ``"<lo>-<hi>"``; ``"<L"`` below the lower bound, ``">=U"`` at or
    above the upper bound. Bucket edges are generated driver-side (the
    bucket count is config-bounded), so the expression is a flat CASE
    chain Catalyst folds into codegen."""
    lo, hi, size = float(lower_bound), float(upper_bound), float(bucket_size)
    if size <= 0:
        raise ValueError(f"bucketSize must be positive: {bucket_size}")
    if lo >= hi:
        raise ValueError(f"lowerBound {lo} >= upperBound {hi}")
    n_buckets = math.ceil((hi - lo) / size)
    if n_buckets > 10_000:
        raise ValueError(
            f"fixedSizeBucketingConfig would generate {n_buckets} buckets; "
            "cap is 10000 (widen bucketSize)"
        )
    v = col.cast("double")
    b = F.floor((v - F.lit(lo)) / F.lit(size)).cast("long")
    # Labels are rendered DRIVER-side with _num_str so every edge —
    # including non-integral ones above 1e7 — formats identically to
    # the "<L"/">=U" boundary labels and to any SQL twin (Spark's
    # double→string cast switches to scientific notation at 1e7).
    # The lookup is ONE array literal + element_at, not a CASE chain:
    # a per-bucket when() tree — nested OR flat — makes Catalyst/Janino
    # scale with the bucket count (a nested tree stack-overflows
    # analysis, and even a flat 10k-branch CaseWhen OOMs whole-stage
    # codegen building its local-variable maps); a single Literal
    # array is O(1) plan nodes at any permitted bucket count. The
    # index is clamped: v in [lo, hi) puts b in [0, n_buckets-1]
    # mathematically, and the clamp keeps one-ulp float division
    # artifacts at the edges inside the array (ANSI element_at errors
    # out of range).
    labels = [
        f"{_num_str(lo + i * size)}-{_num_str(min(lo + i * size + size, hi))}"
        for i in range(n_buckets)
    ]
    idx = F.greatest(
        F.lit(0).cast("long"), F.least(F.lit(n_buckets - 1).cast("long"), b)
    )
    label: Column = F.element_at(F.lit(labels), (idx + F.lit(1)).cast("int"))
    return (
        F.when(v.isNull(), F.lit(None).cast("string"))
        .when(v < F.lit(lo), F.lit("<" + _num_str(lo)))
        .when(v >= F.lit(hi), F.lit(">=" + _num_str(hi)))
        .otherwise(label)
    )


def value_buckets(col: Column, buckets: list[dict]) -> Column:
    """``bucketingConfig``: explicit buckets with ``min`` inclusive /
    ``max`` exclusive and a ``replacementValue``. Values matching no
    bucket pass through as strings (the DLP pass-through posture)."""
    if not buckets:
        raise ValueError("bucketingConfig.buckets must be non-empty")
    v = col.cast("double")
    expr: Column | None = None
    for b in buckets:
        if "replacementValue" not in b:
            # str(None) would silently write the literal "None" into
            # every matching row — corrupt output with no signal
            raise ValueError(
                f"bucketingConfig bucket {b!r} missing replacementValue"
            )
        repl = F.lit(str(_value_of(b["replacementValue"])))
        cond = F.lit(True)
        if "min" in b:
            cond = cond & (v >= F.lit(float(_value_of(b["min"]))))
        if "max" in b:
            cond = cond & (v < F.lit(float(_value_of(b["max"]))))
        expr = F.when(cond, repl) if expr is None else expr.when(cond, repl)
    return expr.otherwise(col.cast("string"))


_TIME_PARTS = {
    "YEAR": F.year,
    "MONTH": F.month,
    "DAY_OF_MONTH": F.dayofmonth,
    "DAY_OF_WEEK": F.dayofweek,
    "WEEK_OF_YEAR": F.weekofyear,
    "HOUR_OF_DAY": F.hour,
}


def time_part(col: Column, part: str) -> Column:
    """``timePartConfig.partToExtract`` → int component."""
    try:
        fn = _TIME_PARTS[part]
    except KeyError:
        raise ValueError(
            f"unsupported partToExtract {part!r}; "
            f"supported: {sorted(_TIME_PARTS)}"
        ) from None
    return fn(col.cast("timestamp"))


def crypto_hash_udf(key: bytes):
    """``cryptoHashConfig``: HMAC-SHA256(key, utf8(value)) → base64url.
    Arrow-vectorized; the hot loop is the per-value HMAC itself."""
    import base64 as _b64
    import hashlib as _hl
    import hmac as _hmac

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    @pandas_udf(StringType())
    def _hash(vals: pd.Series) -> pd.Series:
        def one(v):
            if v is None or v != v:
                return None
            mac = _hmac.new(key, str(v).encode("utf-8"), _hl.sha256).digest()
            return _b64.urlsafe_b64encode(mac).decode("ascii")

        return pd.Series([one(v) for v in vals], index=vals.index, dtype=object)

    return _hash


def fpe_cipher_for(column: str, config: dict, root_key: bytes | None = None):
    """Build the :class:`functions.fpe.FpeCipher` for a
    ``cryptoReplaceFfxFpeConfig`` dict. The AES key comes from the
    engine root-key seam (HKDF label ``fpe:<column>``), mirroring the
    cryptoHash derivation — DLP's ``cryptoKey`` message wraps a KMS
    handle this sandbox cannot call."""
    from auto_data_tokenize_spark.functions.fpe import FpeCipher
    from auto_data_tokenize_spark.functions.tokenizer import (
        hkdf_sha256,
        resolve_root_key,
    )

    rk = resolve_root_key(root_key)
    key = hkdf_sha256(rk, b"adt-fpe", f"fpe:{column}".encode(), 32)
    return FpeCipher(
        key,
        alphabet=(config.get("customAlphabet") or None),
        common_alphabet=config.get("commonAlphabet"),
        radix=config.get("radix"),
    )


def fpe_transform_udf(cipher, *, surrogate: str | None = None, decrypt=False):
    """``cryptoReplaceFfxFpeConfig`` whole-value (de)tokenization:
    FF1 over (value, per-row context tweak). Arrow-vectorized; nulls
    pass through; a value outside the alphabet or shorter than the FF1
    minimum raises (DLP fails such values too — silent pass-through on
    a whole-value column would leak plaintext labeled as tokens)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from auto_data_tokenize_spark.functions.fpe import wrap_surrogate

    @pandas_udf(StringType())
    def _fpe(vals: pd.Series, ctxs: pd.Series) -> pd.Series:
        def one(v, ctx):
            if v is None or v != v:
                return None
            v, ctx = str(v), "" if ctx is None or ctx != ctx else str(ctx)
            if decrypt:
                if surrogate is not None:
                    head, sep, body = v.partition("):")
                    if not sep or not head.startswith(f"{surrogate}("):
                        raise ValueError(
                            f"not a {surrogate}-annotated token: {v!r}"
                        )
                    return cipher.decrypt(body, ctx)
                return cipher.decrypt(v, ctx)
            tok = cipher.encrypt(v, ctx)
            return wrap_surrogate(surrogate, tok) if surrogate else tok

        return pd.Series(
            [one(v, c) for v, c in zip(vals, ctxs)],
            index=vals.index,
            dtype=object,
        )

    return _fpe


def fpe_reidentify_udf(cipher, surrogate: str, *, takes_context: bool = False):
    """Reverse of the free-form FPE path: scan text for
    ``surrogate(<len>):<ct>`` annotations and replace each with its
    decrypted value (:func:`functions.fpe.reidentify_text`).
    ``takes_context=True`` builds a two-column ``(text, ctx)`` UDF for
    tokens produced under a per-row context tweak (NULL ctx reads as
    ``""``, matching the encrypt side)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from auto_data_tokenize_spark.functions.fpe import reidentify_text

    if takes_context:

        @pandas_udf(StringType())
        def _reid_ctx(text: pd.Series, ctxs: pd.Series) -> pd.Series:
            out = []
            for t, c in zip(text, ctxs):
                cv = "" if c is None or c != c else str(c)
                out.append(
                    reidentify_text(
                        t if isinstance(t, str) else None,
                        cipher,
                        surrogate,
                        cv,
                    )
                )
            return pd.Series(out, index=text.index, dtype=object)

        return _reid_ctx

    @pandas_udf(StringType())
    def _reid(text: pd.Series) -> pd.Series:
        return pd.Series(
            [
                reidentify_text(t if isinstance(t, str) else None, cipher, surrogate)
                for t in text
            ],
            index=text.index,
            dtype=object,
        )

    return _reid


def _value_of(value):
    """Unwrap a DLP typed ``Value`` message dict; bare scalars pass
    through (convenience for hand-written configs)."""
    if isinstance(value, dict):
        for k in ("stringValue", "integerValue", "floatValue", "booleanValue"):
            if k in value:
                v = value[k]
                return int(v) if k == "integerValue" else v
        raise ValueError(f"unsupported Value message: {value!r}")
    return value


def apply_whole_value_transform(
    df: DataFrame,
    column: str,
    transform: dict,
    *,
    root_key: bytes | None = None,
    out_col: str | None = None,
    context_col: str | None = None,
) -> DataFrame:
    """Apply one non-crypto-deterministic primitive transformation to a
    whole column. ``transform`` is the raw oneof dict from the config
    (exactly one recognized key). Crypto-deterministic transforms route
    through ``operators.tokenize`` (reversible tokens need the rename +
    ORIGINAL_TYPE machinery), not here. ``context_col`` overrides where
    ``dateShiftConfig.context`` is read from (apply_encrypt_config
    passes a snapshot of the ORIGINAL column so a sibling transform
    rewriting the context column cannot change the shift)."""
    out_col = out_col or column
    col = F.col(column)
    if "characterMaskConfig" in transform:
        c = transform["characterMaskConfig"]
        expr = char_mask(
            col,
            masking_character=c.get("maskingCharacter", "*"),
            number_to_mask=int(c.get("numberToMask", 0)),
            reverse_order=bool(c.get("reverseOrder", False)),
        )
    elif "redactConfig" in transform:
        expr = F.lit(None).cast(df.schema[column].dataType)
    elif "replaceConfig" in transform:
        if "newValue" not in transform["replaceConfig"]:
            # F.lit(None) makes an untyped NullType column that only
            # fails much later, at write time, far from the config bug
            raise ValueError("replaceConfig missing newValue")
        expr = F.lit(_value_of(transform["replaceConfig"]["newValue"]))
    elif "cryptoHashConfig" in transform:
        from auto_data_tokenize_spark.functions.tokenizer import (
            hkdf_sha256,
            resolve_root_key,
        )

        rk = resolve_root_key(root_key)
        key = hkdf_sha256(
            rk, b"adt-crypto-hash", f"cryptoHash:{column}".encode(), 32
        )
        expr = crypto_hash_udf(key)(col.cast("string"))
    elif "dateShiftConfig" in transform:
        c = transform["dateShiftConfig"]
        ctx = c.get("context", {}).get("name") if c.get("context") else None
        if ctx is not None and context_col is not None:
            ctx = context_col
        from auto_data_tokenize_spark.functions.tokenizer import (
            hkdf_sha256,
            resolve_root_key,
        )

        rk = resolve_root_key(root_key)
        salt = hkdf_sha256(
            rk, b"adt-date-shift", f"dateShift:{column}".encode(), 16
        ).hex()
        expr = date_shift(
            col,
            int(c["lowerBoundDays"]),
            int(c["upperBoundDays"]),
            context=F.col(ctx) if ctx else None,
            salt=salt,
        )
    elif "cryptoReplaceFfxFpeConfig" in transform:
        c = transform["cryptoReplaceFfxFpeConfig"]
        ctx = c.get("context", {}).get("name") if c.get("context") else None
        if ctx is not None and context_col is not None:
            ctx = context_col
        cipher = fpe_cipher_for(column, c, root_key)
        surrogate = (c.get("surrogateInfoType") or {}).get("name")
        expr = fpe_transform_udf(cipher, surrogate=surrogate)(
            col.cast("string"),
            F.col(ctx).cast("string") if ctx else F.lit(None).cast("string"),
        )
    elif "fixedSizeBucketingConfig" in transform:
        c = transform["fixedSizeBucketingConfig"]
        expr = fixed_size_buckets(
            col,
            float(_value_of(c["lowerBound"])),
            float(_value_of(c["upperBound"])),
            float(c["bucketSize"]),
        )
    elif "bucketingConfig" in transform:
        expr = value_buckets(col, transform["bucketingConfig"]["buckets"])
    elif "timePartConfig" in transform:
        expr = time_part(col, transform["timePartConfig"]["partToExtract"])
    elif "replaceWithInfoTypeConfig" in transform:
        raise ValueError(
            "replaceWithInfoTypeConfig requires freeFormColumn=true "
            "(whole-value columns carry no finding to label)"
        )
    else:
        raise ValueError(
            f"unsupported primitive transformation for column "
            f"{column!r}: {sorted(transform)}"
        )
    return df.withColumn(out_col, expr)


def free_form_repl(
    transform: dict, *, column: str | None = None, root_key: bytes | None = None
):
    """Build the span-replacement callback ``repl(info_type, matched)``
    for a free-form (within-text findings) primitive transformation.
    Used with :func:`functions.detectors.replace_spans` and the Arrow
    UDF wrapper in ``functions.udfs``. ``column``/``root_key`` are only
    consulted by the key-deriving transform (FPE).

    The FPE callback additionally accepts an optional third argument —
    the per-row context tweak (``repl(info_type, matched, ctx)``) —
    which ``functions.udfs.transform_text_udf(takes_context=True)``
    binds from a context column, delivering the DLP cross-scope
    unlinkability contract (equal values in different contexts yield
    different tokens) on free-form columns too."""
    if "cryptoReplaceFfxFpeConfig" in transform:
        from auto_data_tokenize_spark.functions.fpe import wrap_surrogate

        c = transform["cryptoReplaceFfxFpeConfig"]
        name = (c.get("surrogateInfoType") or {}).get("name")
        if not name:
            raise ValueError(
                "free-form cryptoReplaceFfxFpe requires surrogateInfoType "
                "(without the annotation the token cannot be found again "
                "for re-identification)"
            )
        cipher = fpe_cipher_for(column or "", c, root_key)

        def _fpe_span(info_type: str, s: str, ctx: str = "") -> str:
            # spans too short for FF1 at this radix, or containing
            # out-of-alphabet characters, are kept verbatim: erroring
            # mid-text would poison the whole document for one finding
            if not cipher.can_encrypt(s):
                return s
            return wrap_surrogate(name, cipher.encrypt(s, ctx))

        return _fpe_span
    if "characterMaskConfig" in transform:
        c = transform["characterMaskConfig"]
        ch = c.get("maskingCharacter", "*")
        if len(ch) != 1:
            raise ValueError(f"maskingCharacter must be one character: {ch!r}")
        n = int(c.get("numberToMask", 0))
        rev = bool(c.get("reverseOrder", False))

        def _mask(info_type: str, s: str) -> str:
            if n <= 0 or n >= len(s):
                return ch * len(s)
            return s[: len(s) - n] + ch * n if rev else ch * n + s[n:]

        return _mask
    if "redactConfig" in transform:
        return lambda info_type, s: ""
    if "replaceConfig" in transform:
        if "newValue" not in transform["replaceConfig"]:
            # str(None) would write the literal word "None" over every
            # finding in every document — the same silent-corruption
            # mode the whole-value path and value_buckets guard against
            raise ValueError("replaceConfig missing newValue")
        new = str(_value_of(transform["replaceConfig"]["newValue"]))
        return lambda info_type, s: new
    if "replaceWithInfoTypeConfig" in transform:
        return lambda info_type, s: f"[{info_type}]"
    raise ValueError(
        f"unsupported free-form primitive transformation: {sorted(transform)}"
    )

"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. Training-data pipeline first-class citizens (no reference
counterpart — the reference dedupes nothing).

Portability design: MinHash uses md5-hex string minima — lowercase hex
of fixed width orders identically to the underlying integer, and md5
exists verbatim in Spark and DuckDB, so signatures are cross-engine
reproducible (the correctness gate can literally recompute them).
SimHash needs bit arithmetic, so it runs as a vectorized Arrow UDF and
is golden-tested in pytest instead.

Scale notes:
- signatures/shingling are narrow projections (whole-stage codegen).
- LSH banding shuffles once on (band_idx, band_key) — high-cardinality
  keys, uniform by construction (hashes). A pathological bucket (e.g.
  the empty-text shingle set) is capped by ``max_bucket`` before the
  pair self-join, bounding the quadratic blowup the same way the
  reference caps DLP batches.
- candidate verification joins texts back by id — two broadcast-or-
  shuffle equi-joins on doc ids, then exact Jaccard on the pair only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def word_shingles(
    df: DataFrame, text_col: str = "text", k: int = 5, out_col: str = "shingles"
) -> DataFrame:
    """k-word shingles (contiguous): narrow, codegen'd."""
    words = f"split(trim(lower({text_col})), '\\\\s+')"
    return df.withColumn(
        out_col,
        F.expr(
            f"transform(sequence(0, greatest(size({words}) - {k}, 0)),"
            f" i -> concat_ws(' ', slice({words}, i + 1, {k})))"
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
    hash_mode: str = "md5",
) -> DataFrame:
    """(id, sig) — sig[j] = min over shingles of h(j, shingle).

    ``hash_mode='md5'`` (default): 32-hex-string minima — portable to
    the DuckDB oracle verbatim (lowercase fixed-width hex orders like
    the integer), used by the correctness gate.
    ``hash_mode='xxhash64'``: native 64-bit longs via Spark's
    xxhash64 — ~3× faster (no hex materialization), the production
    mode when cross-engine reproducibility isn't required.
    Same LSH banding works on either (band key md5s the slice).

    The repartition between shingling and hashing is a deliberate
    materialization barrier: without it Catalyst's CollapseProject
    inlines the shingles expression into the 64-way signature lambda
    and recomputes the split/slice work per hash (64× blowup). It also
    spreads the md5-heavy stage across all cores when the input scan
    has few splits."""
    with_sh = word_shingles(df, text_col, k).select(id_col, "shingles")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    # hash (not round-robin) partitioning: deterministic exchanges are
    # eligible for ReusedExchange when the signature subtree fans out
    # (LSH banding consumes it three times)
    with_sh = with_sh.repartition(parallelism, F.col(id_col))
    if hash_mode == "md5":
        h = "md5(concat(cast(j as string), '|', s))"
    elif hash_mode == "xxhash64":
        h = "xxhash64(j, s)"
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return with_sh.select(
        F.col(id_col),
        F.expr(
            f"transform(sequence(0, {n_hashes - 1}),"
            f" j -> array_min(transform(shingles, s -> {h})))"
        ).alias("sig"),
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate (a, b) pairs
    with a < b. One shuffle on the banded key.

    The repartition below is a materialization barrier (see
    minhash_signatures): banding references ``sig`` once per band, and
    a collapsed projection would recompute the full signature 16×."""
    parallelism = sig_df.sparkSession.sparkContext.defaultParallelism
    sig_df = sig_df.repartition(parallelism, F.col(id_col))
    # explode_outer, deliberately: plain explode triggers Catalyst's
    # InferFiltersFromGenerate, which re-evaluates the banding (and,
    # collapsed, the whole signature) in a synthesized filter below the
    # exchange. The band array is always `bands` long — never empty —
    # so _outer is semantically identical and skips the filter.
    banded = sig_df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b as band_idx,"
                f" md5(concat_ws(',', transform(slice(sig, b * {rows_per_band} + 1,"
                f" {rows_per_band}), x -> cast(x as string)))) as band_key))"
            )
        ).alias("bk"),
    ).select("id", "bk.band_idx", "bk.band_key")

    # cap pathological buckets before the quadratic self-join
    bucket_sizes = banded.groupBy("band_idx", "band_key").agg(
        F.count(F.lit(1)).alias("_n")
    )
    capped = banded.join(
        bucket_sizes.filter(F.col("_n") <= max_bucket),
        ["band_idx", "band_key"],
    )

    a = capped.select("band_idx", "band_key", F.col("id").alias("a"))
    b = capped.select("band_idx", "band_key", F.col("id").alias("b"))
    return (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
) -> DataFrame:
    """Exact distinct-word-set Jaccard on candidate pairs only.
    Output: (a, b, jaccard) for pairs ≥ threshold."""
    words = df.select(
        F.col(id_col).alias("_id"),
        F.expr(f"array_distinct(split(trim(lower({text_col})), '\\\\s+'))").alias(
            "_w"
        ),
    )
    j = (
        pairs.join(words.withColumnRenamed("_id", "a").withColumnRenamed("_w", "wa"), "a")
        .join(words.withColumnRenamed("_id", "b").withColumnRenamed("_w", "wb"), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("wa", "wb"))
                / F.size(F.array_union("wa", "wb")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return j


def minhash_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    hash_mode: str = "md5",
) -> DataFrame:
    """Full near-dup pipeline: signatures → LSH candidates → exact
    verify → survivors. A doc is a duplicate if a *smaller-id* similar
    doc exists (greedy, deterministic; full connected components would
    need iteration — out of scope for one pass).
    Output: (doc_id, dup_of nullable)."""
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes, hash_mode)
    pairs = lsh_candidate_pairs(sig, id_col, bands, n_hashes // bands)
    # verify with shingle-set Jaccard — the quantity MinHash estimates
    # (word-set Jaccard degenerates on small-vocabulary corpora)
    dup_pairs = ngram_jaccard_pairs(df, pairs, id_col, text_col, n=k).filter(
        F.col("jaccard") >= threshold
    )
    dup_of = dup_pairs.groupBy(F.col("b").alias(id_col)).agg(
        F.min("a").alias("dup_of")
    )
    return df.select(id_col).join(dup_of, id_col, "left")


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Exact n-gram (word) Jaccard for given id pairs — the quality
    metric variant (distinct n-gram sets)."""
    grams = word_shingles(df, text_col, n, out_col="_g").select(
        F.col(id_col).alias("_id"), F.array_distinct("_g").alias("_g")
    )
    return (
        pairs.join(grams.withColumnRenamed("_id", "a").withColumnRenamed("_g", "ga"), "a")
        .join(grams.withColumnRenamed("_id", "b").withColumnRenamed("_g", "gb"), "b")
        .select(
            "a",
            "b",
            F.round(
                F.size(F.array_intersect("ga", "gb"))
                / F.size(F.array_union("ga", "gb")),
                6,
            ).alias("jaccard"),
        )
    )


def simhash_udf(n_bits: int = 64):
    """64-bit SimHash over word md5s — vectorized numpy inside an Arrow
    batch (bit twiddling is not portably expressible in SQL)."""

    @pandas_udf(LongType())
    def _simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            if t is None or t != t:
                continue
            words = t.lower().split()
            if not words:
                continue
            acc = np.zeros(n_bits, dtype=np.int64)
            shifts = np.arange(n_bits, dtype=np.uint64)
            for w in set(words):
                h = np.uint64(
                    int.from_bytes(
                        hashlib.md5(w.encode()).digest()[:8], "big", signed=False
                    )
                )
                bits = (h >> shifts) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            sig = np.uint64(0)
            for b in range(n_bits):
                if acc[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out, index=text.index)

    return _simhash


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(id_col, simhash_udf()(F.col(text_col)).alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """Hamming-ball near-dups via the block trick (public: Manku et al.,
    WWW'07 'Detecting Near-Duplicates for Web Crawling'): split the
    64-bit simhash into ``n_blocks`` 16-bit blocks; any pair within
    hamming ≤ n_blocks-1 shares ≥ 1 exact block → equi-join per block,
    verify popcount. One shuffle per block on uniform 16-bit keys."""
    s = simhash(df, id_col, text_col)
    parts = []
    for b in range(n_blocks):
        shift = b * (64 // n_blocks)
        mask = (1 << (64 // n_blocks)) - 1
        block = s.select(
            F.col(id_col).alias("id"),
            F.col("simhash"),
            (F.shiftrightunsigned("simhash", shift).bitwiseAND(F.lit(mask))).alias(
                "block_key"
            ),
            F.lit(b).alias("block_idx"),
        )
        parts.append(block)
    blocked = parts[0]
    for p in parts[1:]:
        blocked = blocked.unionByName(p)
    a = blocked.select("block_idx", "block_key", F.col("id").alias("a"), F.col("simhash").alias("sh_a"))
    b2 = blocked.select("block_idx", "block_key", F.col("id").alias("b"), F.col("simhash").alias("sh_b"))
    pairs = (
        a.join(b2, ["block_idx", "block_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.expr("sh_a ^ sh_b"))
    ).filter(F.col("hamming") <= max_hamming).select("a", "b", "hamming")

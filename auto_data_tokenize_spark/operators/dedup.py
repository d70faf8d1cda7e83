"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. Training-data pipeline first-class citizens (no reference
counterpart — the reference dedupes nothing).

Portability design: both signature families are cross-engine
reproducible, so the correctness gate literally recomputes them in
DuckDB. MinHash (default ``affine32`` mode) hashes each shingle ONCE
(first 8 hex chars of md5 as an integer, reduced mod the Mersenne
prime 2^31-1) and derives the 64 per-permutation values with universal
affine hashes ``(a_j*h + b_j) mod p`` — textbook one-hash minhash
(Broder '97 / Carter-Wegman universal hashing): all products stay
below 2^63 so every op is portable signed-64 integer arithmetic DuckDB
recomputes verbatim (``duckdb_minhash_hs_sql``). SimHash carries its
64-bit value as two 32-bit halves from md5 hex so every bit op stays
inside portable signed-64 arithmetic (``duckdb_simhash_sql`` is the
verbatim SQL twin).

Shape (the round-2 lesson, measured): signatures are built as
explode → per-hash/per-bit columns → ONE aggregation per doc, not as
higher-order-function array lambdas, because (a) HOF lambdas are
interpreted, never whole-stage-codegen'd, and (b) Catalyst's
InferFiltersFromConstraints pushes inferred isnotnull(join key) — with
the full inlined signature expression — below projections AND
repartitions onto the unparallelized scan; a real aggregate node is
the structural pushdown barrier a repartition is not.

Scale notes:
- LSH banding shuffles once on (band_idx, band_key) — high-cardinality
  keys, uniform by construction (hashes). A pathological bucket (e.g.
  the empty-text shingle set) is capped by ``max_bucket`` before the
  pair self-join, bounding the quadratic blowup the same way the
  reference caps DLP batches.
- SimHash near-dups join on hex-substring blocks with integer keys,
  emit each pair only from its lowest matching block (no post-join
  distinct), and fan the quadratic candidate stream across cores with
  an explicit repartition (AQE would coalesce the tiny input to one
  task and expand 46 M rows serially).
- candidate verification joins texts back by id — two broadcast-or-
  shuffle equi-joins on doc ids, then exact Jaccard on the pair only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StructField, StructType


# Mersenne prime 2^31 - 1: with h, a_j, b_j all < p, the affine product
# a_j*h + b_j < 2^62 + 2^31 — no signed-64 overflow on either engine.
MINHASH_P = 2_147_483_647


def _affine_coeffs(n_hashes: int = 64) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) pairs for the universal-hash minhash
    permutations, a_j ∈ [1, p), b_j ∈ [0, p). Fixed seed: signatures
    must be stable across sessions/engines (the DuckDB oracle embeds
    the same constants as literals)."""
    import random

    rng = random.Random(0x5EED_AD7)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(n_hashes)
    ]


# Spark / DuckDB twin expressions for the per-shingle base hash: the
# shared md5-hex-prefix fragment (functions/xengine.py), reduced mod p
# so affine products never overflow.
def _spark_base_hash(col: str) -> str:
    from auto_data_tokenize_spark.functions.xengine import spark_md5_prefix

    return f"{spark_md5_prefix(col)} % {MINHASH_P}"


def duckdb_minhash_hs_sql(col: str) -> str:
    """DuckDB twin of ``_spark_base_hash`` (hex-prefix md5 → bigint
    mod p) — both engines render md5 as lowercase hex and '0x' casts
    parse it, so the values agree bit-for-bit."""
    from auto_data_tokenize_spark.functions.xengine import duckdb_md5_prefix

    return f"({duckdb_md5_prefix(col)} % {MINHASH_P})"


def duckdb_affine_coeff_lists(n_hashes: int = 64) -> tuple[str, str]:
    """The (a, b) coefficient arrays as DuckDB list literals — the
    oracle embeds the exact constants the Spark plan uses."""
    coeffs = _affine_coeffs(n_hashes)
    a_list = "[" + ", ".join(str(a) for a, _ in coeffs) + "]"
    b_list = "[" + ", ".join(str(b) for _, b in coeffs) + "]"
    return a_list, b_list


def duckdb_affine_sig_expr(hs_col: str = "hs", n_hashes: int = 64) -> str:
    """DuckDB twin of the affine32 signature: given a column holding
    the per-shingle base hashes (``duckdb_minhash_hs_sql`` over the
    shingle list), produce the 64-element signature list."""
    a_list, b_list = duckdb_affine_coeff_lists(n_hashes)
    return (
        f"list_transform(range(0, {n_hashes}), j ->"
        f" list_min(list_transform({hs_col}, h ->"
        f" ({a_list}[j + 1] * h + {b_list}[j + 1]) % {MINHASH_P})))"
    )


def word_shingles(
    df: DataFrame, text_col: str = "text", k: int = 5, out_col: str = "shingles"
) -> DataFrame:
    """k-word shingles (contiguous): narrow, codegen'd.

    NULL text yields an EMPTY array — the same contract as the DuckDB
    twins' list_transform over a NULL split (concat_ws over the NULL
    slice would otherwise fabricate one ``""`` shingle on the Spark
    side only, a cross-engine divergence every shingle consumer would
    inherit). Empty text still yields the single ``""`` shingle on
    BOTH engines."""
    words = f"split(trim(lower({text_col})), '\\\\s+')"
    return df.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN {text_col} IS NULL "
            "THEN CAST(array() AS array<string>) "
            f"ELSE transform(sequence(0, greatest(size({words}) - {k}, 0)),"
            f" i -> concat_ws(' ', slice({words}, i + 1, {k}))) END"
        ),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
    hash_mode: str = "affine32",
) -> DataFrame:
    """(id, sig) — sig[j] = min over shingles of the j-th permutation
    hash of the shingle.

    ``hash_mode='affine32'`` (default): ONE md5 per shingle → integer
    h mod 2^31-1, then ``n_hashes`` universal affine permutations
    ``(a_j*h + b_j) mod p`` — pure codegen'd int64 arithmetic, ~64×
    less hash work than hashing per (j, shingle), and the DuckDB
    oracle recomputes it verbatim (the round-2 q14 regression fix).
    ``hash_mode='md5'``: legacy 32-hex-string minima, one full md5 per
    (j, shingle) — kept for comparison/compat.
    ``hash_mode='xxhash64'``: native per-(j, shingle) xxhash64 longs.
    Same LSH banding works on any mode (band key md5s the stringified
    slice).

    Shape: explode shingles → base-hash projection → ``n_hashes``
    min-aggregates per doc → reassemble the sig array. Chosen over a
    higher-order-function (transform/array_min lambda) formulation for
    the same two measured reasons as ``simhash_cols``: HOF lambdas are
    interpreted (never codegen'd), and Catalyst's
    InferFiltersFromConstraints derives isnotnull(<join key>) and
    pushes the FULL inlined signature expression below repartitions
    onto the unparallelized scan (a repartition is not a pushdown
    barrier; a HashAggregate is). min() is duplicate-insensitive, so
    exploding the shingle multiset preserves the exact minima the
    DuckDB oracle recomputes. The base hash ``_h`` is referenced by
    all 64 aggregates, so CollapseProject keeps its projection
    separate (it never duplicates a non-cheap expression referenced
    more than once) — md5 runs exactly once per shingle."""
    # NULL-text contract: explode_outer keeps a NULL-shingle row for
    # NULL-text docs (empty array per word_shingles); dropping it here
    # means such docs emit NO signature row — exactly the DuckDB
    # twins' unnest-of-empty behavior. The filter sits ABOVE the
    # Generate (it cannot push below it), so the
    # InferFiltersFromGenerate house rule is not violated.
    sh = word_shingles(df, text_col, k).select(
        F.col(id_col), F.explode_outer("shingles").alias("_s")
    ).where(F.col("_s").isNotNull())
    if hash_mode == "affine32":
        hashed = sh.select(id_col, F.expr(_spark_base_hash("_s")).alias("_h"))
        aggs = [
            F.min(F.expr(f"({a} * _h + {b}) % {MINHASH_P}")).alias(f"_m{j}")
            for j, (a, b) in enumerate(_affine_coeffs(n_hashes))
        ]
        g = hashed.groupBy(id_col).agg(*aggs)
    elif hash_mode == "md5":
        g = sh.groupBy(id_col).agg(
            *[
                F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("_s")))).alias(f"_m{j}")
                for j in range(n_hashes)
            ]
        )
    elif hash_mode == "xxhash64":
        g = sh.groupBy(id_col).agg(
            *[
                F.min(F.xxhash64(F.lit(j), F.col("_s"))).alias(f"_m{j}")
                for j in range(n_hashes)
            ]
        )
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return g.select(
        F.col(id_col),
        F.array(*[F.col(f"_m{j}") for j in range(n_hashes)]).alias("sig"),
    )


def minhash_signatures_rowwise(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Row-local signature variant for STREAMING sides: identical
    minima to :func:`minhash_signatures` (pinned by test), computed as
    per-row expressions instead of explode+aggregate.

    Why it exists: a streaming source can't run the aggregate shape
    without watermark-keyed state, and an ingest gate scores each
    incoming document independently anyway. The HOF lambdas are
    interpreted (never codegen'd), so the per-row work must be CHEAP:
    the base md5 runs once per shingle into ``_hs`` (its own
    projection, kept by CollapseProject because 64 downstream
    expressions reference it), and each signature element is one
    interpreted array_min over affine int ops — ~64× less hash work
    than the round-2 per-(j, shingle)-md5 formulation that made q36's
    single-task stage take 133.9 s at sf0.1. The isnotnull-pushdown
    trap does not bite here: band keys come out of an explode, and
    filters on generator output can't push below the Generate."""
    words = f"split(trim(lower({text_col})), '\\\\s+')"
    shingles = (
        f"transform(sequence(0, greatest(size({words}) - {k}, 0)),"
        f" i -> concat_ws(' ', slice({words}, i + 1, {k})))"
    )
    hs = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.col(text_col).isNull().alias("_tnull"),
        F.expr(
            f"transform({shingles}, s -> {_spark_base_hash('s')})"
        ).alias("_hs"),
    )
    mins = [
        F.expr(f"array_min(transform(_hs, h -> ({a} * h + {b}) % {MINHASH_P}))")
        for a, b in _affine_coeffs(n_hashes)
    ]
    # NULL-text contract (matches the batch path, where such docs emit
    # no signature row): a projection cannot drop rows, so the sig is
    # NULL wholesale — banded_keys filters NULL sigs out, and the doc
    # participates in nothing. Without this, greatest(NULL, 0) = 0
    # fabricates one '' shingle and the doc gets a REAL signature on
    # the streaming path only.
    return hs.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.when(~F.col("_tnull"), F.array(*mins)).alias("sig"),
    )


class NearDupGate:
    """Streaming ingest gate with an explicit resource lifecycle: flag
    incoming documents that LSH-collide with the EXISTING corpus — the
    continuous "is this crawl page already in the training set?"
    filter. Use as a context manager (or call :meth:`close`) so the
    pinned corpus band set is unpersisted when the gate retires; a
    long-lived session running several gates otherwise accumulates
    pinned storage.

        with NearDupGate(corpus_banded) as gate:
            hits = gate.apply(incoming_stream)
            ... run the stream ...

    ``corpus_banded`` is the static banded-key table
    (:func:`banded_keys` over the corpus signatures — at real scale a
    precomputed, bucketed table, in which case pass
    ``persist_corpus=False`` and let the table format serve it).
    The corpus signatures MUST use the default ``affine32`` hash mode:
    the stream side computes affine32 only, and band keys from a
    different family never collide — the failure is silent zero recall,
    not an error (band keys don't carry their family).

    Plan shape (``apply``): repartition the micro-batch across all
    cores (stateless streaming DataFrames support repartition; the
    exchange moves raw text ONCE, cheap relative to per-shingle
    hashing — without it a single-file staged batch runs the whole
    signature build on one task: 133.9 s vs ~7 s at sf0.1, the round-2
    q36 finding), per-row signature, explode to band keys, LEFT SEMI
    stream-static join against the corpus bands. Output: (id,
    band_idx, band_key) band hits for matched docs."""

    def __init__(
        self,
        corpus_banded: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 5,
        n_hashes: int = 64,
        bands: int = 16,
        rows_per_band: int = 4,
        persist_corpus: bool = True,
        broadcast_corpus: bool = False,
    ):
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.n_hashes = n_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        corpus_keys = corpus_banded.select("band_idx", "band_key").distinct()
        self._persisted = bool(persist_corpus and not corpus_banded.isStreaming)
        if self._persisted:
            corpus_keys = corpus_keys.persist()
        # a continuous (non-foreachBatch) streaming plan has no AQE, so
        # the semi join otherwise sort-merges BOTH sides every micro-
        # batch; the hint ships the distinct band keys once per batch.
        # Opt-in: a 100 TB corpus' band universe outgrows a broadcast —
        # there the bucketed-index co-location path applies instead.
        self.corpus_keys = (
            F.broadcast(corpus_keys) if broadcast_corpus else corpus_keys
        )

    def apply(self, incoming: DataFrame) -> DataFrame:
        parallelism = incoming.sparkSession.sparkContext.defaultParallelism
        incoming = incoming.repartition(parallelism)
        sig = minhash_signatures_rowwise(
            incoming, self.id_col, self.text_col, self.k, self.n_hashes
        )
        stream_banded = banded_keys(sig, self.id_col, self.bands, self.rows_per_band)
        return stream_banded.join(
            self.corpus_keys, ["band_idx", "band_key"], "left_semi"
        )

    def close(self) -> None:
        if self._persisted:
            self.corpus_keys.unpersist()
            self._persisted = False

    def __enter__(self) -> "NearDupGate":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def near_dup_gate(
    incoming: DataFrame,
    corpus_banded: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    persist_corpus: bool = True,
) -> DataFrame:
    """One-shot functional form of :class:`NearDupGate`. NOTE: with
    ``persist_corpus=True`` the pinned corpus band set lives until the
    session ends — prefer the class (context manager) when the gate
    has a bounded lifetime."""
    return NearDupGate(
        corpus_banded, id_col, text_col, k, n_hashes, bands, rows_per_band,
        persist_corpus,
    ).apply(incoming)


def banded_keys(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band_idx, band_key) — one row per LSH band; band_key =
    md5 over the band's signature slice. Shared by the batch candidate
    join and the streaming ingest gate (the key construction must be
    identical on both sides of any band join).

    The repartition is a materialization barrier (see
    minhash_signatures): banding references ``sig`` once per band, and
    a collapsed projection would recompute the full signature 16×.
    explode_outer, deliberately: plain explode triggers Catalyst's
    InferFiltersFromGenerate, which re-evaluates the banding in a
    synthesized filter below the exchange; the band array is a
    constant-length construction, never empty.

    NULL signatures (the rowwise path's NULL-text contract) are
    dropped up front: concat_ws over a NULL slice renders '', so a
    NULL sig would otherwise give EVERY null-text doc the identical
    md5('') band key and they would all pairwise LSH-collide."""
    sig_df = sig_df.where(F.col("sig").isNotNull())
    if not sig_df.isStreaming:
        parallelism = sig_df.sparkSession.sparkContext.defaultParallelism
        sig_df = sig_df.repartition(parallelism, F.col(id_col))
    return sig_df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.explode_outer(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b as band_idx,"
                f" md5(concat_ws(',', transform(slice(sig, b * {rows_per_band} + 1,"
                f" {rows_per_band}), x -> cast(x as string)))) as band_key))"
            )
        ).alias("bk"),
    ).select("id", *extra_cols, "bk.band_idx", "bk.band_key")


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate (a, b) pairs
    with a < b. One shuffle on the banded key."""
    banded = banded_keys(sig_df, id_col, bands, rows_per_band)

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
    hash_mode: str = "affine32",
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


def setsim_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT n-gram Jaccard self-join via prefix filtering (AllPairs,
    Bayardo/Ma/Srikant WWW'07) — the deterministic complement to the
    MinHash/LSH stack: zero false negatives, no probabilistic recall.

    Algorithm: order every document's distinct k-word shingles by
    ascending global document frequency (rarest first, ties broken
    lexicographically — one total order both engines agree on). A pair
    with Jaccard >= t must share >= ceil(t*|S|) shingles with each
    member S, so each document only needs to index its first
    |S| - ceil(t*|S|) + 1 shingles: if two qualifying prefix sets were
    disjoint, all common shingles would sit in one document's suffix
    of size ceil(t*|S|) - 1 < ceil(t*|S|) — contradiction. The
    inverted-index join therefore runs on the *rarest* shingles only,
    which is what bounds bucket sizes at scale (a shingle shared by
    many documents has high df and falls out of every prefix).

    Plan shape / 100 TB notes:
    - one shuffle for the df aggregate, one window shuffle on id (both
      ``count`` and ``row_number`` share the single hash-partitioning
      on id), one equi-join shuffle on the prefix shingle.
    - the length filter ``min(|A|,|B|) >= t*max(|A|,|B|)`` (implied by
      J >= t since J <= min/max) prunes candidates before the
      distinct.
    - exact verification runs on candidate pairs only
      (``ngram_jaccard_pairs``), never all pairs.

    Output: (a, b, jaccard) for all pairs with round(J, 6) >= t.
    """
    from pyspark.sql import Window

    # explode_outer, deliberately (house rule): plain explode lets
    # InferFiltersFromGenerate re-evaluate the shingle transform below
    # the exchange. NULL-text docs now yield EMPTY shingle arrays
    # (word_shingles contract) → one NULL _s row here, which the inner
    # join on _s below drops before _sz is counted — do NOT compute
    # _sz before that join or change its type without filtering NULLs.
    grams = word_shingles(df, text_col, k, out_col="_g").select(
        F.col(id_col).alias("_id"),
        F.explode_outer(F.array_distinct("_g")).alias("_s"),
    )
    cand = _prefix_candidates(grams, threshold, keep_sizes=False)
    return ngram_jaccard_pairs(df, cand, id_col, text_col, n=k).filter(
        F.col("jaccard") >= threshold
    )


def _prefix_candidates(
    t: DataFrame, threshold: float, keep_sizes: bool
) -> DataFrame:
    """The shared AllPairs prefix-filter candidate kernel of
    :func:`setsim_join` (text shingles; owns the lemma prose) and
    :func:`set_jaccard_join` (arbitrary sets). Input: distinct
    ``(_id, _s)`` membership rows — a NULL ``_s`` row (setsim_join's
    explode_outer contract) drops in the inner dfreq join below,
    BEFORE ``_sz`` is counted. Output: candidate pairs ``(a, b)``
    with ``a < b``, plus their set sizes when ``keep_sizes``.

    Slack rationale: the emission rule is round(J, 6) >= t, and
    rounding can lift a true J by at most 5e-7 — so the prunes must
    keep every pair with true J >= t - 5e-7, and that is the EXACT
    bound: the 5e-7 * |S| term below admits precisely those pairs
    (a wider 1e-6 slack shipped in round 4 doubled the candidate
    growth for no correctness gain — the r4 verdict's q43 item). The
    trailing -1e-9 absorbs float product error in the bound itself.
    Exactness is pinned by the brute-force-equality and lemma
    hypothesis tests (tests/test_dedup.py, tests/test_properties.py,
    tests/test_conversation_dedup.py)."""
    from pyspark.sql import Window

    dfreq = t.groupBy("_s").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id")
    ranked = (
        t.join(dfreq, "_s")
        .withColumn("_sz", F.count(F.lit(1)).over(w))
        .withColumn("_rn", F.row_number().over(w.orderBy("_df", "_s")))
    )
    prefix = ranked.filter(
        F.col("_rn")
        <= F.col("_sz")
        - F.ceil(
            (F.lit(threshold) - F.lit(5e-7)) * F.col("_sz") - F.lit(1e-9)
        )
        + 1
    ).select("_id", "_s", "_sz")
    n_part = int(t.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # REPARTITION_BY_NUM on the join key: exempt from AQE
    # coalescing, so a small prefix table with a quadratic join
    # output still expands across cores (the simhash lesson).
    cand = (
        prefix.select(F.col("_id").alias("a"), "_s", F.col("_sz").alias("_sza"))
        .repartition(n_part, "_s")
        .join(
            prefix.select(F.col("_id").alias("b"), "_s", F.col("_sz").alias("_szb"))
            .repartition(n_part, "_s"),
            "_s",
        )
        .filter(
            (F.col("a") < F.col("b"))
            & (
                F.least("_sza", "_szb")
                >= (F.lit(threshold) - F.lit(5e-7)) * F.greatest("_sza", "_szb")
                - F.lit(1e-9)
            )
        )
    )
    # set sizes are functionally dependent on the ids, so keeping them
    # through the distinct costs nothing and saves the caller a size
    # aggregate + two re-joins
    cols = ["a", "b", "_sza", "_szb"] if keep_sizes else ["a", "b"]
    return cand.select(*cols).distinct()


def set_jaccard_join(
    tokens: DataFrame,
    id_col: str = "id",
    token_col: str = "token",
    threshold: float = 0.6,
    assume_distinct: bool = False,
) -> DataFrame:
    """EXACT set-Jaccard self-join over an arbitrary ``(id, token)``
    set representation — the representation-agnostic sibling of
    :func:`setsim_join` (which owns the prefix-filter lemma and the
    5e-7 slack derivation; the math here is identical, only the input
    is already a token multiset instead of text to be shingled).

    Input: one row per (id, token) membership; NULL tokens are
    ignored. Pass ``assume_distinct=True`` only when the caller
    guarantees (id, token) rows are unique — it skips a defensive
    ``distinct`` shuffle that would otherwise re-dedupe.

    Verification is count-based and touches candidate pairs only:
    the intersection size is one equi-join on token restricted to
    candidates, ``J = i / (|A| + |B| - i)``, emitted when
    ``round(J, 6) >= threshold`` — the same emission contract as the
    text-shingle variant, so borderline floats behave identically in
    both engines (integer counts, one IEEE division, one round).

    100 TB notes: identical posture to :func:`setsim_join` — high-df
    tokens (shared boilerplate turns, canned phrases) fall out of
    every rarest-first prefix, which is what bounds inverted-index
    bucket sizes; the candidate join runs on explicitly repartitioned
    token keys (AQE-coalesce-exempt); the exact verify is linear in
    candidate-pair set sizes, never corpus-quadratic.
    """
    t = tokens.select(
        F.col(id_col).alias("_id"), F.col(token_col).alias("_s")
    ).filter(F.col("_s").isNotNull())
    if not assume_distinct:
        t = t.distinct()
    # NOTE (round 6): materializing t here (localCheckpoint) was tried
    # and REGRESSED 8.3 s -> 30 s at sf0.1 — the checkpoint erases
    # catalyst size estimates, so the dfreq/verify joins lose their
    # broadcast builds; Spark's ReusedExchange already shares the
    # distinct's shuffle across the four references of t.
    cand = _prefix_candidates(t, threshold, keep_sizes=True)
    inter = (
        cand.join(t.select(F.col("_id").alias("a"), "_s"), "a")
        .join(t.select(F.col("_id").alias("b"), "_s"), ["b", "_s"])
        .groupBy("a", "b", "_sza", "_szb")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    return (
        inter.select(
            "a",
            "b",
            F.round(
                F.col("_i") / (F.col("_sza") + F.col("_szb") - F.col("_i")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _cc_driver(ed: DataFrame) -> DataFrame | None:
    """Driver union-find over an already-size-gated edge sample: the
    standard small-graph fast path (the same estimate-then-pick logic
    as a broadcast-join threshold). Pointer jumping pays ~4 Spark jobs
    per round and O(log n) rounds — pure fixed cost once the edge set
    fits in driver memory (guide §1.2: fix the distributed algorithm
    first; a bounded Arrow collect of an edge LIST is not corpus-sized
    data). Returns None when an endpoint is NULL or an id dtype is not
    a plain long/string (the iterative path's join-equality semantics
    own those cases)."""
    from pyspark.sql.types import IntegerType, StringType

    t = ed.schema[0].dataType
    if not isinstance(t, (LongType, IntegerType, StringType)):
        return None
    pdf = ed.toPandas()
    if pdf.isna().any().any():
        return None
    # .tolist() converts numpy scalars back to plain Python ints/strs,
    # so comparisons and createDataFrame round-trip the exact dtype
    srcs = pdf.iloc[:, 0].tolist()
    dsts = pdf.iloc[:, 1].tolist()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(srcs, dsts):
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by MIN id: a root only ever changes to a smaller
            # one, so each final root is its component's minimum
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    out = [(x, find(x)) for x in parent]
    schema = StructType(
        [StructField("id", t), StructField("cluster_id", t)]
    )
    return ed.sparkSession.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iterations: int = 50,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over undirected edges: every node's label
    converges to the smallest node id in its component. Output:
    (id, cluster_id).

    ``driver_max_edges``: edge sets at or below this size short-circuit
    to a driver-side union-find (``_cc_driver``) — the small-graph fast
    path, same estimate-then-pick logic as a broadcast threshold; the
    iterative kernel below is the at-scale path and the only one used
    above the gate. Verified-near-dup edge sets are candidate-bounded,
    so real corpora often sit under the default 1M (≈ tens of MB on
    the driver) even when the corpus itself is 100 TB.

    Each round combines two monotone steps — neighbor-min propagation
    (label(x) ← min over x ∪ N(x) of labels) and POINTER JUMPING
    (label(x) ← label(label(x)), the path-halving trick behind
    hash-to-min / large-star-small-star, Kiveris et al. '14) — so
    convergence is O(log n) rounds on ANY graph shape, not O(diameter):
    near-dup near-cliques finish in 2-3 rounds, and a pathological
    n-node chain in ~log2(n) instead of n. Both steps preserve the
    invariant that label(x) is the id of a node in x's component and
    never increases, and at a fixed point labels are constant across
    every edge, hence the component minimum. Each round is two joins +
    one aggregate (two shuffles); ``localCheckpoint`` truncates the
    plan between rounds so lineage doesn't grow with iterations (on a
    cluster with dynamic executors, swap for reliable ``checkpoint``).
    Convergence is detected with an ANY-changed-label probe
    (``isEmpty`` = limit(1)) on the already-materialized label table:
    CollectLimit executes partitions incrementally, so a non-converged
    round (the common case) short-circuits on the first changed row it
    finds instead of counting all n — only the single final round pays
    a full scan to prove the fixed point. A LongAccumulator inside the
    label join would fold even that into the main job, but PySpark
    accumulators only increment in Python-side tasks, and this plan is
    deliberately pure JVM codegen — trading the whole pipeline off
    Tungsten to save one bounded probe per O(log n) rounds is a
    pessimization.

    Storage lifecycle: localCheckpoint blocks are NOT in the SQL cache
    manager, so ``DataFrame.unpersist`` cannot release them; Spark's
    ContextCleaner reclaims each round's blocks once its RDD reference
    is garbage-collected. Per-round references go out of scope here
    immediately, and a JVM GC hint on exit makes reclamation prompt —
    measured: repeated clusterings hold a steady ~3-4 live block sets,
    no growth per run (pinned by test)."""
    ed = edges.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).localCheckpoint(eager=True)
    # size-gated driver fast path: the blocks are already materialized,
    # so the count is a cached-block scan; below the gate a union-find
    # replaces O(log n) pointer-jumping rounds (~4 jobs each) with one
    # bounded Arrow collect of the single-direction edge list —
    # measured 5.4 s -> 0.2 s on the sf0.1 near-dup graph. Above the
    # gate (or NULL endpoints / exotic id dtypes) the iterative kernel
    # below remains the scale path.
    if ed.count() <= int(driver_max_edges):
        direct = _cc_driver(ed)
        if direct is not None:
            return direct
    sym = ed.unionAll(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iterations):
            nbr_min = (
                sym.join(labels, sym["dst"] == labels["id"])
                .select(F.col("src").alias("id"), F.col("cluster_id"))
            )
            propagated = (
                labels.select("id", "cluster_id")
                .unionAll(nbr_min)
                .groupBy("id")
                .agg(F.min("cluster_id").alias("cluster_id"))
            )
            # pointer jump: follow the label one hop (label is itself a
            # node id); left join — a label may point at a node with no
            # smaller neighbor, which simply keeps its own label
            lab2 = propagated.select(
                F.col("id").alias("_jid"), F.col("cluster_id").alias("_jlbl")
            )
            new_labels = (
                propagated.join(
                    lab2, propagated["cluster_id"] == lab2["_jid"], "left"
                )
                .select(
                    "id",
                    F.least(
                        F.col("cluster_id"), F.coalesce("_jlbl", "cluster_id")
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=True)
            )
            converged = (
                new_labels.join(
                    labels.select("id", F.col("cluster_id").alias("_old")), "id"
                )
                .filter(F.col("cluster_id") < F.col("_old"))
                .isEmpty()
            )
            # drop the superseded round's reference so ContextCleaner
            # can reclaim its checkpoint blocks (see docstring)
            labels = new_labels
            if converged:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds "
            "(pathological chain graph?) — raise max_iterations or switch to "
            "the large-star/small-star variant"
        )
    finally:
        # prompt reclamation of the per-round checkpoint blocks whose
        # references just went out of scope: Python's cyclic GC first
        # (the take(1)-based probe leaves DataFrame cycles that
        # refcounting alone does not free, and py4j only releases the
        # JVM-side handles once the Python wrappers die), then the JVM
        # GC so ContextCleaner sees the dropped references
        try:
            import gc

            gc.collect()
            edges.sparkSession.sparkContext._jvm.System.gc()
        except Exception:
            pass


def dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full duplicate-cluster assignment: LSH candidates → exact
    n-gram-Jaccard verify → connected components. Unlike
    :func:`minhash_dedup` (greedy pairwise dup_of), this groups
    TRANSITIVE chains — A≈B and B≈C put A, C in one cluster even when
    A and C themselves fall below the threshold — which is what a
    keep-one-per-cluster training-data dedup actually needs.
    Output: (id_col, cluster_id); singletons get their own id."""
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes)
    pairs = lsh_candidate_pairs(sig, id_col, bands, n_hashes // bands)
    verified = ngram_jaccard_pairs(df, pairs, id_col, text_col, n=k).filter(
        F.col("jaccard") >= threshold
    )
    labels = connected_components(verified.select("a", "b"))
    return (
        df.select(id_col)
        .join(labels.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def _distinct_words_expr(text_col: str) -> str:
    """Distinct non-empty whitespace tokens of lowercased text — the
    SimHash feature set (mirrors Python ``set(text.lower().split())``)."""
    return (
        f"filter(array_distinct(split(lower(trim({text_col})), '\\\\s+')),"
        " w -> w <> '')"
    )


def simhash_cols(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash computed *fully JVM-side* (whole-stage codegen,
    zero Python): per distinct word, h = first 16 hex chars of md5 as a
    big-endian uint64, carried as two 32-bit halves (``simhash_hi`` =
    bits 63..32, ``simhash_lo`` = bits 31..0) to stay inside signed
    64-bit arithmetic portably. Signature bit b is set iff more than
    half the words have bit b set. ``simhash_hex`` is the 16-hex
    big-endian rendering used for substring blocking.

    Bit-for-bit identical to ``simhash_udf`` (pinned by
    tests/test_dedup.py) and expressible verbatim in DuckDB — the q19
    oracle recomputes it in SQL, making the whole near-dup pipeline
    cross-engine checkable.

    Shape: explode distinct words → 64 per-bit flag columns → one
    hash aggregation per doc, then the signature as plain arithmetic
    over the bit counts. Chosen over a higher-order-function (array
    lambda) formulation for two measured reasons:
    1. HOF lambdas are interpreted, not codegen'd — the explode/agg
       form is whole-stage-codegen int ops end to end;
    2. Catalyst's InferFiltersFromConstraints derives
       isnotnull(<join key>) from downstream joins and pushes the
       FULL inlined signature expression below every deterministic
       projection/repartition — onto the unparallelized scan, one
       task, 30 s at sf0.1 (the round-1/round-2 trap family). A real
       HashAggregate is a structural pushdown barrier: inferred
       filters stay above it and evaluate on aggregated rows.
    Map-side partial aggregation keeps the shuffle at one row per doc
    (65 longs), independent of document length — the correct 100 TB
    shape."""
    words = df.select(
        F.col(id_col),
        F.explode_outer(F.expr(_distinct_words_expr(text_col))).alias("_w"),
    )
    hashed = words.select(
        id_col,
        F.expr("cast(conv(substring(md5(_w), 1, 8), 16, 10) as bigint)").alias("_hi"),
        F.expr("cast(conv(substring(md5(_w), 9, 8), 16, 10) as bigint)").alias("_lo"),
    )
    aggs = [F.count("_hi").alias("_n")]
    for b in range(32):
        aggs.append(
            F.expr(f"sum(coalesce(shiftrightunsigned(_hi, {b}) & 1, 0))").alias(f"_h{b}")
        )
        aggs.append(
            F.expr(f"sum(coalesce(shiftrightunsigned(_lo, {b}) & 1, 0))").alias(f"_l{b}")
        )
    g = hashed.groupBy(id_col).agg(*aggs)
    sig_hi = " + ".join(
        f"if(2 * _h{b} > _n, cast({1 << b} as bigint), cast(0 as bigint))"
        for b in range(32)
    )
    sig_lo = " + ".join(
        f"if(2 * _l{b} > _n, cast({1 << b} as bigint), cast(0 as bigint))"
        for b in range(32)
    )
    return g.select(
        F.col(id_col),
        F.expr(sig_hi).alias("simhash_hi"),
        F.expr(sig_lo).alias("simhash_lo"),
        F.lower(
            F.concat(
                F.lpad(F.expr(f"hex({sig_hi})"), 8, "0"),
                F.lpad(F.expr(f"hex({sig_lo})"), 8, "0"),
            )
        ).alias("simhash_hex"),
    )


def duckdb_simhash_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin of ``simhash_cols`` (same md5/bit conventions) —
    returns (id, sig_hi, sig_lo). Used by the q19 oracle."""
    return f"""
      WITH w AS (
        SELECT {id_col},
               list_filter(list_distinct(string_split_regex(trim(lower({text_col})), '\\s+')),
                           x -> x <> '') words
        FROM {table}
      ), h AS (
        SELECT {id_col},
               list_transform(words, x -> {{hi: ('0x' || substr(md5(x), 1, 8))::BIGINT,
                                            lo: ('0x' || substr(md5(x), 9, 8))::BIGINT}}) hs
        FROM w
      )
      SELECT {id_col},
             coalesce(list_sum(list_transform(range(0, 32),
               b -> CASE WHEN 2 * len(list_filter(hs, e -> ((e.hi >> b) & 1) = 1)) > len(hs)
                         THEN (1::BIGINT << b) ELSE 0::BIGINT END))::BIGINT, 0) AS sig_hi,
             coalesce(list_sum(list_transform(range(0, 32),
               b -> CASE WHEN 2 * len(list_filter(hs, e -> ((e.lo >> b) & 1) = 1)) > len(hs)
                         THEN (1::BIGINT << b) ELSE 0::BIGINT END))::BIGINT, 0) AS sig_lo
      FROM h
    """


def simhash_udf(n_bits: int = 64):
    """64-bit SimHash over word md5s — the original vectorized-Arrow
    reference implementation, kept as the independent cross-check for
    ``simhash_cols`` (tests assert exact agreement); the JVM expression
    path is the production mode."""

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
    """(id, simhash) with the signature packed into one signed int64 —
    JVM expression path (``simhash_cols``); equals the historical
    ``simhash_udf`` output bit-for-bit."""
    return simhash_cols(df, id_col, text_col).select(
        id_col,
        F.expr("shiftleft(simhash_hi, 32) | simhash_lo").alias("simhash"),
    )


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int | None = None,
) -> DataFrame:
    """ALL pairs with hamming(simhash_a, simhash_b) ≤ ``max_hamming``
    — exact, via the block trick (public: Manku et al., WWW'07
    'Detecting Near-Duplicates for Web Crawling'): split the 16-hex
    signature into ``n_blocks`` substring blocks (default
    ``max_hamming + 1``); by pigeonhole any pair within the Hamming
    budget agrees on ≥ 1 whole block → equi-join per block, verify
    popcount. One shuffle on the (block_idx, block_key) composite.

    Completeness REQUIRES ``n_blocks > max_hamming`` (enforced) — a
    smaller block count silently loses recall for distances ≥
    n_blocks (the round-1 bug this guard pins down).

    Scale note: key entropy per block is 64/n_blocks bits, so large
    Hamming budgets (small blocks) make hot buckets at web scale; the
    standard remedies are a wider fingerprint (128-bit SimHash) or
    combination blocking (match on r-of-n block combos). For the
    defaults (max_hamming ≤ 3, 16-bit blocks) buckets stay uniform."""
    if n_blocks is None:
        n_blocks = max_hamming + 1
    if not (0 <= max_hamming < n_blocks):
        raise ValueError(
            f"n_blocks ({n_blocks}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole completeness guarantee"
        )
    if n_blocks > 16:
        raise ValueError("n_blocks > 16: only 16 hex chars to split")
    base, rem = divmod(16, n_blocks)
    lens = [base + (1 if i < rem else 0) for i in range(n_blocks)]
    starts = [1 + sum(lens[:i]) for i in range(n_blocks)]

    s = simhash_cols(df, id_col, text_col)

    # integer block keys (value of the hex-substring block): no strings
    # ever enter the join stream. conv() to bigint overflows beyond 15
    # hex chars (ANSI mode throws; legacy mode yields NULL keys = a
    # silent recall hole), so wide blocks — only possible at tiny
    # n_blocks, e.g. max_hamming=0 — key on xxhash64 of the substring
    # instead: equality-consistent on both join sides, which is all a
    # block key needs.
    def _key(i: int) -> str:
        sub = f"substring(simhash_hex, {starts[i]}, {lens[i]})"
        if lens[i] <= 15:
            return f"cast(conv({sub}, 16, 10) as bigint)"
        return f"xxhash64({sub})"

    blocks_expr = "array(" + ", ".join(
        f"named_struct('block_idx', {i}, 'block_key', {_key(i)})"
        for i in range(n_blocks)
    ) + ")"
    # explode_outer per house rule (InferFiltersFromGenerate trap); the
    # block array is a constant-length literal construction, never empty
    blocked = s.select(
        F.col(id_col).alias("id"),
        "simhash_hi",
        "simhash_lo",
        F.explode_outer(F.expr(blocks_expr)).alias("bk"),
    ).select("id", "simhash_hi", "simhash_lo", "bk.block_idx", "bk.block_key")
    # explicit hash repartition on the join keys: the join INPUT is tiny
    # (n_docs × n_blocks rows) so AQE would coalesce it to ~1 partition
    # — but the join OUTPUT is the quadratic candidate stream (46 M rows
    # at sf0.1), which must expand across all cores, not in one task.
    # User-specified repartitioning is exempt from AQE coalescing, and
    # both self-join sides inherit the same partitioning → no further
    # exchange.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    blocked = blocked.repartition(parallelism, "block_idx", "block_key")

    a = blocked.select(
        "block_idx",
        "block_key",
        F.col("id").alias("a"),
        F.col("simhash_hi").alias("hi_a"),
        F.col("simhash_lo").alias("lo_a"),
    )
    b2 = blocked.select(
        "block_idx",
        "block_key",
        F.col("id").alias("b"),
        F.col("simhash_hi").alias("hi_b"),
        F.col("simhash_lo").alias("lo_b"),
    )

    # per-block bit masks over the (hi, lo) halves (a block may straddle
    # the boundary when n_blocks does not divide 16)
    mhis, mlos = [], []
    for i in range(n_blocks):
        mhi = mlo = 0
        for p in range(starts[i], starts[i] + lens[i]):  # 1-based hex char pos
            if p <= 8:
                mhi |= 0xF << ((8 - p) * 4)
            else:
                mlo |= 0xF << ((16 - p) * 4)
        mhis.append(mhi)
        mlos.append(mlo)

    # The candidate stream is the scale hot spot (46 M rows at sf0.1 —
    # templated corpora cluster simhash bits, so buckets are fat and
    # the TRUE answer is itself ~2 M pairs). Keep its per-row work
    # integer-only, in conjunct order:
    #   1. hamming from two xors + bit_counts (cheap; kills most rows),
    #   2. first-match-only emission (Manku et al.'s duplicate-
    #      elimination refinement): eqmask = bitmask of blocks where
    #      the pair agrees; emit only from the LOWEST agreeing block
    #      (eqmask & (2^block_idx - 1) = 0). Each surviving pair is
    #      emitted exactly once, so there is NO post-join distinct()
    #      exchange over the inflated candidate stream.
    eqmask = " + ".join(
        f"if(((_xh & cast({mhis[j]} as bigint)) | (_xl & cast({mlos[j]} as bigint)))"
        f" = 0, {1 << j}, 0)"
        for j in range(n_blocks)
    )
    return (
        a.join(b2, ["block_idx", "block_key"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("_xh", F.expr("hi_a ^ hi_b"))
        .withColumn("_xl", F.expr("lo_a ^ lo_b"))
        .withColumn(
            "hamming",
            (F.bit_count(F.col("_xh")) + F.bit_count(F.col("_xl"))).cast("int"),
        )
        .filter(
            (F.col("hamming") <= max_hamming)
            & F.expr(f"((({eqmask}) & (shiftleft(1, block_idx) - 1)) = 0)")
        )
        .select("a", "b", "hamming")
    )


def dup_rate_monitor(
    df: DataFrame,
    text_col: str = "text",
    window: str = "1 minute",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-window exact-duplicate rate of the ingest feed — the live
    redelivery/loop detector: a crawler stuck on one site, a replaying
    queue, or a producer retry storm shows up as a dup-rate spike in
    the window it happens. Dup scope is WITHIN-window by design: state
    stays bounded by (open windows × distinct hashes in them) and is
    freed as the watermark closes each window — the cross-corpus
    variant is the Bloom/LSH ingest gate family, not a monitor.

    Output per window: ``window_start, n_docs, n_distinct, n_dupes
    (= n_docs − n_distinct), dup_rate`` (round 6). NULL-text rows are
    excluded (missing is the completeness monitor's signal, not
    duplication). Streaming shape: two CHAINED stateful aggregations
    via ``window_time`` (the q70 pattern) — per-(window, md5) counts
    with map-side partials, then the per-window rollup."""
    d = df.withWatermark(ts_col, watermark) if watermark is not None else df
    groups = (
        d.filter(F.col(text_col).isNotNull())
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        groups.groupBy(F.window(F.window_time("w"), window).alias("cw"))
        .agg(
            F.sum("_n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .select(
            F.col("cw.start").alias("window_start"),
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct")).alias("n_dupes"),
            F.round(
                (F.col("n_docs") - F.col("n_distinct")) / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
    )


def duckdb_dup_rate_sql(
    table: str,
    text_col: str = "text",
    window_us: int = 60_000_000,
    ts_expr: str = "ts",
) -> str:
    """DuckDB twin of ``dup_rate_monitor`` (same md5 grouping, NULL
    exclusion, and rounding; the streaming final-watermark predicate
    is the caller's outer filter)."""
    return f"""
        WITH g AS (
          SELECT make_timestamp((epoch_us({ts_expr}) // {window_us})
                   * {window_us}) AS window_start,
                 md5({text_col}) AS h, COUNT(*) AS n
          FROM {table}
          WHERE {text_col} IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT window_start,
               CAST(SUM(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dupes,
               ROUND((SUM(n) - COUNT(*)) * 1.0 / SUM(n), 6) AS dup_rate
        FROM g GROUP BY 1
    """

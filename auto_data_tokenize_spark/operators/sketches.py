"""KMV (k-minimum-values) distinct-count sketch.

The classic bottom-k sketch (Bar-Yossef et al. 2002, "Counting
distinct elements in a data stream"): hash every value into (0, 1],
keep the k smallest distinct hashes per group; if fewer than k
distinct hashes exist the count is exact, otherwise the k-th minimum
R estimates the cardinality as (k-1)/R. Mergeable (union the bottom-k
sets, re-take bottom k), bounded state (k doubles per group), and —
unlike Spark's built-in HLL ``approx_count_distinct`` — fully
deterministic given the hash, so the DuckDB oracle recomputes the
IDENTICAL estimate (the correctness gate checks the sketch itself,
not a tolerance band).

Plan shape: distinct (group, hash) → per-group bottom-k via a window
→ one aggregate. The distinct is the only big shuffle, on exactly the
data any distinct-count must see; the window never materializes
per-group arrays (contrast collect_set, which is unbounded per group).
A production continuous variant would wrap the same math in a custom
bounded aggregator; this form is the batch/SQL-portable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 32-bit hash space; +1 shifts into (0, 1] so R is never zero
_H32 = 4_294_967_296


def _hash_expr(col: str) -> str:
    """Deterministic (0,1] hash both engines compute identically:
    the shared md5-hex-prefix fragment, shifted and normalized."""
    from auto_data_tokenize_spark.functions.xengine import spark_md5_prefix

    return f"(cast({spark_md5_prefix(col)} as double) + 1.0) / {_H32}.0"


def duckdb_kmv_hash_sql(col: str) -> str:
    from auto_data_tokenize_spark.functions.xengine import duckdb_md5_prefix

    return f"(({duckdb_md5_prefix(col)}::DOUBLE + 1.0) / {_H32}.0)"


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: (group_col, n_hashes ≤ k, kmv_est) where kmv_est is the
    exact distinct-hash count when the group has fewer than k distinct
    hashes, else round((k-1)/R, 6)."""
    if k < 2:
        raise ValueError("k must be at least 2")
    # NULL values are not elements (countDistinct semantics) — and the
    # engines disagree on NULL ordering in the bottom-k window (Spark
    # sorts NULLS FIRST, DuckDB NULLS LAST), so they must never reach it
    dh = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), F.expr(_hash_expr(value_col)).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("_h")
    topk = dh.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        topk.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            F.max("_h").alias("_r"),
        )
        .select(
            group_col,
            "n_hashes",
            F.expr(
                f"CASE WHEN n_hashes < {k} THEN cast(n_hashes as double)"
                f" ELSE round(({k} - 1) / _r, 6) END"
            ).alias("kmv_est"),
        )
    )


def duckdb_kmv_sql(
    src_sql: str, group_col: str, value_col: str, k: int = 256
) -> str:
    """DuckDB twin of :func:`kmv_distinct` over an arbitrary
    (group, value) source subquery — identical hash, bottom-k, and
    estimator."""
    return f"""
        WITH dh AS (
          SELECT DISTINCT {group_col}, {duckdb_kmv_hash_sql(value_col)} AS h
          FROM ({src_sql}) src
          WHERE {value_col} IS NOT NULL
        ),
        topk AS (
          SELECT * FROM dh
          QUALIFY row_number() OVER (PARTITION BY {group_col} ORDER BY h) <= {k}
        )
        SELECT {group_col}, COUNT(*) AS n_hashes,
               CASE WHEN COUNT(*) < {k} THEN COUNT(*)::DOUBLE
                    ELSE round(({k} - 1) / MAX(h), 6) END AS kmv_est
        FROM topk GROUP BY {group_col}
    """


# -- Bloom-filter ingest pre-gate ------------------------------------------
#
# The 100 TB incremental-dedup pattern: build a bits-only summary of the
# corpus (m bits, k hashes — kilobytes, broadcastable), test every
# incoming document against it, and send ONLY the "maybe" rows to the
# expensive exact join. A Bloom filter never false-negatives, so the
# definitely-new fast path is exact; false positives are re-checked.
# Everything is deterministic md5-family arithmetic (same construction
# as the minhash base hash), and the bit OR is order-independent, so
# the DuckDB oracle recomputes the IDENTICAL filter — the gate checks
# the bits themselves, including which false positives occur.

BLOOM_M = 1 << 20   # default bits; tests/queries may shrink to force FPs
BLOOM_K = 4


def _bloom_pos_expr(value_col: str, j: int, m_bits: int) -> str:
    from auto_data_tokenize_spark.functions.xengine import spark_md5_prefix

    inner = f"concat('{j}:', {value_col})"
    return f"{spark_md5_prefix(inner)} % {m_bits}"


def _duck_bloom_pos(value_col: str, j: int, m_bits: int) -> str:
    from auto_data_tokenize_spark.functions.xengine import duckdb_md5_prefix

    inner = f"'{j}:' || {value_col}"
    return f"({duckdb_md5_prefix(inner)} % {m_bits})"


def bloom_build(
    corpus: DataFrame,
    value_col: str = "text",
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Corpus → (word_idx, word) rows of set 32-bit words (≤ m/32
    rows regardless of corpus size — the broadcastable summary).
    One narrow projection + one small aggregate; the distinct on bit
    positions caps the shuffle at m rows."""
    pos_arr = F.array(
        *[F.expr(_bloom_pos_expr(value_col, j, m_bits)) for j in range(k)]
    )
    # explode_outer (house rule): keeps InferFiltersFromGenerate from
    # re-evaluating the md5 array below the exchange if the array
    # construction ever stops constant-folding; length is fixed k>0
    return (
        corpus.select(F.explode_outer(pos_arr).alias("pos"))
        .distinct()
        .select(
            F.expr("pos div 32").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(w)").alias("word"))
    )


def bloom_gate(
    incoming: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    value_col: str = "text",
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """(id, bloom_maybe, is_dup) per distinct incoming (id, value).

    bloom_maybe: all k probe bits set in the corpus filter (broadcast
    join against ≤ m/32 words — no shuffle of the corpus itself).
    is_dup: exact membership via a join on the value. The verdicts are
    grouped on (id, value) — never id alone — so two incoming rows
    sharing an id keep independent verdicts and the no-false-negative
    containment bloom_maybe ⊇ is_dup holds structurally for every row.
    At scale the exact join runs only on the maybe subset — here both
    are computed for every row so the gate can verify the containment
    and the exact FP set."""
    pos_arr = F.array(
        *[F.expr(_bloom_pos_expr(value_col, j, m_bits)) for j in range(k)]
    )
    words = bloom_build(corpus, value_col, m_bits, k)
    probes = (
        incoming.select(
            F.col(id_col), F.col(value_col), F.explode_outer(pos_arr).alias("pos")
        )
        .withColumn("word_idx", F.expr("pos div 32"))
        .withColumn(
            "mask",
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))"),
        )
        .join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr("(word & mask) = mask"), F.lit(False)
            ),
        )
    )
    maybe = probes.groupBy(id_col, value_col).agg(
        F.expr("bool_and(hit)").alias("bloom_maybe")
    )
    exact = (
        incoming.select(id_col, value_col)
        .distinct()
        .join(
            corpus.select(F.col(value_col).alias("_cv")).distinct(),
            F.col(value_col) == F.col("_cv"),
            "left",
        )
        .select(id_col, value_col, F.col("_cv").isNotNull().alias("is_dup"))
    )
    return maybe.join(exact, [id_col, value_col]).select(
        id_col, "bloom_maybe", "is_dup"
    )


def duckdb_bloom_sql(
    corpus_sql: str,
    incoming_sql: str,
    id_col: str = "doc_id",
    value_col: str = "text",
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin of ``bloom_gate`` — identical bits, identical
    false positives."""
    cpos = " UNION ALL ".join(
        f"SELECT {_duck_bloom_pos(value_col, j, m_bits)} AS pos FROM c"
        for j in range(k)
    )
    ipos = " UNION ALL ".join(
        f"SELECT {id_col}, {value_col},"
        f" {_duck_bloom_pos(value_col, j, m_bits)} AS pos FROM i"
        for j in range(k)
    )
    return f"""
        WITH c AS ({corpus_sql}), i AS ({incoming_sql}),
        bits AS (SELECT DISTINCT pos FROM ({cpos}) t),
        words AS (
          SELECT pos // 32 AS word_idx,
                 bit_or(1::BIGINT << (pos % 32)::INTEGER) AS word
          FROM bits GROUP BY 1
        ),
        probes AS (SELECT * FROM ({ipos}) t),
        maybe AS (
          SELECT {id_col}, {value_col},
                 bool_and(coalesce(
                   ((w.word >> (pos % 32)::INTEGER) & 1) = 1, false
                 )) AS bloom_maybe
          FROM probes LEFT JOIN words w ON w.word_idx = pos // 32
          GROUP BY 1, 2
        ),
        exact AS (
          SELECT DISTINCT i.{id_col}, i.{value_col},
                 (EXISTS (SELECT 1 FROM c WHERE c.{value_col} = i.{value_col}))
                   AS is_dup
          FROM i
        )
        SELECT m.{id_col}, m.bloom_maybe, e.is_dup
        FROM maybe m JOIN exact e USING ({id_col}, {value_col})
    """


def bloom_words_array(
    corpus: DataFrame,
    value_col: str = "text",
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> list[int]:
    """Collect the filter as a dense m/32-long word list — the ONLY
    driver-side data is the filter itself (m/32 longs: kilobytes for
    any corpus size; the same bounded-summary argument as IVF
    centroids). Feed to ``bloom_maybe_expr``."""
    arr = [0] * ((m_bits + 31) // 32)
    for r in bloom_build(corpus, value_col, m_bits, k).collect():
        arr[int(r["word_idx"])] = int(r["word"])
    return arr


def bloom_maybe_expr(
    value_col: str,
    words: list[int],
    m_bits: int | None = None,
    k: int = BLOOM_K,
):
    """The membership test as a PURE whole-stage-codegen expression —
    the word array is ONE shared literal Column referenced by all k
    conjuncts (never string-rendered per conjunct: at the production
    m = 2^20 that would be a megabyte of SQL text), so a streaming
    ingest filter needs no join, no shuffle, and no state:
    scan → filter. True negatives never leave the scan stage.

    NULL values yield False (matching ``bloom_gate`` and the DuckDB
    twin's coalesce). When m_bits is omitted it is inferred as
    32*len(words) — pass it explicitly if the filter was built with an
    m that is not a multiple of 32."""
    m_bits = m_bits if m_bits is not None else 32 * len(words)
    arr_col = F.lit(words)
    maybe = None
    for j in range(k):
        pos = F.expr(_bloom_pos_expr(value_col, j, m_bits))
        word = F.element_at(arr_col, F.floor(pos / 32).cast("int") + 1)
        # F.shiftleft only takes a python-int bit count; call the SQL
        # function directly for a column-valued shift amount
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 32).cast("int")
        )
        cond = word.bitwiseAND(mask) != 0
        maybe = cond if maybe is None else maybe & cond
    return F.coalesce(maybe, F.lit(False))


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    num: int,
    den: int,
    max_capacity: int = 2_000_000,
    broadcast_max_rows: int = 1_000_000,
) -> DataFrame:
    """Exact frequent items above a RATIONAL frequency threshold
    num/den via per-partition Misra-Gries candidate generation plus an
    exact rescore of candidates only — the sketch→verify pattern the
    LSH/Bloom ops use, applied to frequency counting.

    Output: (value_col, cnt, n_total) for every non-null value whose
    exact count satisfies ``cnt * den >= num * n_total`` — integer
    arithmetic on both engines, so the cut is exact, never a float
    band. NULL values are not elements (they are filtered before
    counting and excluded from n_total).

    Guarantee (why the output is EXACT even though Misra-Gries is
    lossy): each partition keeps ``capacity = ceil(den/num)`` counters;
    merging a batch's exact counts into the summary and reducing back
    to ``capacity`` survivors subtracts at most N_p/(capacity+1) from
    any value's true local count over the partition's lifetime
    (mergeable-summaries bound, Agarwal/Cormode et al. 2012). A value
    missing from EVERY partition's survivor set therefore has total
    count <= N/(capacity+1) < N*num/den, i.e. it is not a heavy
    hitter. Candidates are a superset of the answer; the exact
    candidates-only count then applies the precise threshold. The
    candidate SET varies with partitioning and arrival order; the
    final output does not.

    100 TB shape: TWO scans of the input total. Scan 1 is the Arrow-
    batched Misra-Gries mapInPandas pass with a hard ``capacity``-
    bounded dict per partition (never the token universe); it also
    emits one marker row per partition carrying the partition's row
    count, so n_total needs no separate scan. Its output — at most
    capacity+1 rows per partition — is persisted (a bounded summary,
    the bloom-words/IVF-centroids discipline) and reused for both the
    total and the candidate set. Scan 2 is the candidates-only
    rescore; candidates join BROADCAST when ``capacity * n_partitions
    <= broadcast_max_rows``, else as a plain shuffle join (on a
    100k-partition corpus the candidate set can reach millions of
    rows — force-broadcasting it would be the OOM, so the guard picks
    the exchange). The token-universe-wide aggregation a naive
    groupBy(token) would shuffle never happens on either path.
    """
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    if den <= 0 or num <= 0 or num > den:
        raise ValueError(
            f"threshold must be a rational in (0, 1]: got {num}/{den}"
        )
    capacity = -(-den // num)  # ceil(den/num)
    if capacity > max_capacity:
        raise ValueError(
            f"threshold {num}/{den} needs {capacity} counters per "
            f"partition (> max_capacity={max_capacity}); raise the "
            "threshold or max_capacity"
        )

    vals = df.select(value_col).filter(F.col(value_col).isNotNull())
    # the marker rows are NULL-valued, so the output field MUST be
    # declared nullable even when the input field is not (e.g. an
    # exploded split() column is non-nullable; emitting None under a
    # non-nullable declared schema NPEs in JVM codegen)
    mg_schema = StructType(
        [
            StructField(
                value_col, vals.schema[value_col].dataType, True
            ),
            StructField("part_rows", LongType()),
        ]
    )

    def mg_partition(batches):
        counters: dict = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for v, c in pdf[value_col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > capacity:
                # reduce-to-capacity: subtract the (capacity+1)-th
                # largest count from everyone, drop the non-positive
                kth = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    v: c - kth for v, c in counters.items() if c > kth
                }
        # survivors carry part_rows=0; ONE marker row (value NULL)
        # carries the partition row count — summing part_rows over the
        # whole output is n_total, with no second scan of the input
        yield pd.DataFrame(
            {
                value_col: pd.Series(
                    list(counters.keys()) + [None], dtype="object"
                ),
                "part_rows": [0] * len(counters) + [n_rows],
            }
        )

    summary = vals.mapInPandas(mg_partition, schema=mg_schema).persist()
    n_total = int(
        summary.agg(F.sum("part_rows")).collect()[0][0] or 0
    )
    candidates = (
        summary.filter(F.col(value_col).isNotNull())
        .select(value_col)
        .distinct()
    )
    n_parts = vals.rdd.getNumPartitions()
    if capacity * max(n_parts, 1) <= broadcast_max_rows:
        candidates = F.broadcast(candidates)
    return (
        vals.join(candidates, value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(
            F.col("cnt") * F.lit(int(den)) >= F.lit(int(num) * n_total)
        )
        .withColumn("n_total", F.lit(n_total).cast("long"))
    )


def duckdb_heavy_hitters_sql(
    source_sql: str, value_col: str, num: int, den: int
) -> str:
    """DuckDB twin of :func:`heavy_hitters`: the brute-force exact
    count with the identical integer threshold (the sketch exists only
    to avoid the universe-wide shuffle; the answer set is the same)."""
    return f"""
WITH t AS (SELECT {value_col} FROM ({source_sql}) WHERE {value_col} IS NOT NULL),
n AS (SELECT count(*)::BIGINT AS n_total FROM t)
SELECT {value_col}, count(*)::BIGINT AS cnt, n.n_total AS n_total
FROM t, n
GROUP BY {value_col}, n.n_total
HAVING count(*) * {den} >= {num} * n.n_total
""".strip()

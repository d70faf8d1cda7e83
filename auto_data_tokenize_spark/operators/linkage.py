"""Record linkage and data-subject mapping over detected PII.

The reference stops at per-column findings and tokenization
(``DlpInspectionPipeline`` emits per-column infoType reports,
``EncryptionPipeline`` replaces values; there is no cross-record
identity layer).  A privacy engine operating on 10^12 turns needs the
next layer up: WHICH records belong to the same data subject — for
GDPR subject-access requests (DSAR), erasure propagation, and identity
de-duplication.  This module provides it Spark-first:

- :func:`ed1_link_pairs` — fuzzy identity linkage: all pairs of
  distinct normalized identity strings within Levenshtein distance 1,
  via a pigeonhole-COMPLETE prefix/suffix blocking self-join (no
  brute-force cross join) and a JVM ``levenshtein`` verify on the
  candidates only.
- :func:`subject_access_map` — per-identity DSAR summary: every
  conversation that mentions an exact identity (e.g. a normalized
  email address), with mention counts and first/last timestamps.
- :func:`erasure_conv_ids` — the erasure fan-out: identities to be
  forgotten -> the conversation keys that must be tombstoned.  The
  streaming wiring (requests arrive as a stream, tombstones flow
  through the exactly-once upsert sink) lives in the driver queries;
  this function is the per-batch core, a broadcast semi-join.

Blocking completeness (the load-bearing argument)
-------------------------------------------------
For ``levenshtein(a, b) <= 1`` let ``m = min(|a|, |b|)`` and
``k* = floor(m / 2)``.  A single edit sits at some position ``p``:

- ``p >= k*``: the first ``k*`` characters of both strings are
  untouched and align identically -> the pair shares the
  level-``k*`` PREFIX key.
- ``p < k*``: everything after the edit aligns identically.  The
  common suffix has length ``>= m - 1 - p > m - 1 - k*``; since
  ``2k* <= m`` this is ``>= k*`` -> the pair shares the
  level-``k*`` SUFFIX key.  (Insertion/deletion shift the alignment
  by one but leave a common suffix of length ``m - p >= k*``.)

Each row cannot know its partner's length, but ``|a|`` and ``|b|``
differ by at most 1, so ``k*`` is always ``floor(|r|/2)`` or
``floor((|r|-1)/2)`` for BOTH rows.  Emitting prefix and suffix keys
at both of those levels (<= 4 keys per row, deduplicated) therefore
guarantees every qualifying pair co-occurs in at least one block.
``k* = 0`` (1-character identities) degenerates to a single catch-all
block, which is tiny by construction.

100 TB posture: the distinct-identity set is orders of magnitude
smaller than the corpus (one ``distinct`` shuffle reduces to it);
blocks are keyed on short substrings so the candidate join shuffles
only (kind, level, fragment) buckets; the exact ``levenshtein``
verify runs on candidates only and is whole-stage codegen (no Python
anywhere in the plan).  Skewed blocks (very common prefixes) are
bounded by the level-``k*`` fragment length growing with the string,
and the verify is O(len^2) per candidate pair, not per corpus row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_identity",
    "ed1_link_pairs",
    "ed1_match_stream",
    "subject_access_map",
    "erasure_conv_ids",
]


def normalize_identity(col: Column) -> Column:
    """Casefold + collapse runs of whitespace + trim — the shared
    normalization applied before any linkage or DSAR grouping (mirrors
    the dedup-key normalization posture: explicit character classes,
    no locale-dependent folding).  Collapse runs BEFORE the trim:
    ``F.trim`` strips spaces only, so an edge tab/newline must first
    become a space or it survives as a distinct identity and splits a
    subject's footprint (and silently un-matches an erasure request).
    """
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _blocking_keys(name_col: str = "name") -> Column:
    """The <=4 pigeonhole keys for one row, as an array of structs
    ``(kind, lvl, frag)``.  Levels are ``floor(len/2)`` and
    ``floor((len-1)/2)``; ``array_distinct`` drops the duplicate pair
    of keys when the two levels coincide (even lengths)."""
    ln = F.length(F.col(name_col))
    k1 = F.floor(ln / 2).cast("int")
    k2 = F.floor((ln - 1) / 2).cast("int")

    def _keys_at(k: Column) -> list[Column]:
        prefix = F.struct(
            F.lit("P").alias("kind"),
            k.alias("lvl"),
            F.col(name_col).substr(F.lit(1), k).alias("frag"),
        )
        suffix = F.struct(
            F.lit("S").alias("kind"),
            k.alias("lvl"),
            F.col(name_col).substr(ln - k + 1, k).alias("frag"),
        )
        return [prefix, suffix]

    return F.array_distinct(F.array(*_keys_at(k1), *_keys_at(k2)))


def ed1_link_pairs(
    df: DataFrame, name_col: str = "name", max_dist: int = 1
) -> DataFrame:
    """All unordered pairs of distinct normalized identity values
    within Levenshtein distance ``max_dist`` (only ``1`` is supported:
    the blocking completeness proof in the module docstring is
    specific to a single edit).  Returns ``(name_a, name_b, dist)``
    with ``name_a < name_b``.

    Plan: distinct -> explode(<=4 keys) -> self-join on the key ->
    distinct pairs -> codegen ``levenshtein`` verify.  Zero Python.
    """
    if max_dist != 1:
        raise ValueError(
            f"ed1_link_pairs supports max_dist=1 only (the prefix/suffix "
            f"pigeonhole argument covers a single edit); got {max_dist}"
        )
    names = (
        df.select(normalize_identity(F.col(name_col)).alias("name"))
        .filter(F.length("name") > 0)
        .distinct()
    )
    keyed = names.select(
        "name", F.explode(_blocking_keys("name")).alias("key")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.key") == F.col("b.key")) & (F.col("a.name") < F.col("b.name")))
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
        .distinct()
    )
    # materialize dist BEFORE filtering so the O(len^2) levenshtein
    # runs once per candidate, not once in Filter and again in Project
    return cand.withColumn(
        "dist", F.levenshtein("name_a", "name_b")
    ).filter(F.col("dist") <= max_dist)


def ed1_match_stream(
    mentions: DataFrame,
    catalog: DataFrame,
    mention_col: str = "mention",
    name_col: str = "name",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Ingest-time identity resolution: a STREAM of incoming mentions
    matched against the static catalog of known identities within
    Levenshtein distance 1.  Same pigeonhole keys as
    :func:`ed1_link_pairs` — the stream side explodes its <=4 keys,
    the catalog side is pre-exploded (small: the distinct-identity
    set), Spark broadcasts it in the stream-static join, and the exact
    ``levenshtein`` verify runs on candidates only.  A mention hitting
    the catalog through several shared keys would duplicate in a raw
    append, so matches roll up per watermark-closed window to one
    ``(window_start, mention, matched_name, dist)`` row — the same
    closed-window emission contract as the monitor family.

    100 TB posture: the corpus-sized side is the stream; it never
    shuffles before the verify (the join key is the short blocking
    fragment, the catalog side broadcast).  Window state is bounded by
    (open windows x distinct candidate pairs in them).
    """
    cat = (
        catalog.select(normalize_identity(F.col(name_col)).alias("name"))
        .filter(F.length("name") > 0)
        .distinct()
    )
    cat_keyed = cat.select(
        "name", F.explode(_blocking_keys("name")).alias("key")
    )
    m = (
        mentions.withWatermark(ts_col, watermark)
        .select(
            ts_col,
            normalize_identity(F.col(mention_col)).alias("mention"),
        )
        .filter(F.length("mention") > 0)
    )
    m_keyed = m.select(
        ts_col, "mention", F.explode(_blocking_keys("mention")).alias("key")
    )
    dist = F.levenshtein("mention", "name")
    verified = m_keyed.join(F.broadcast(cat_keyed), "key").filter(dist <= 1)
    return (
        verified.groupBy(
            F.window(F.col(ts_col), window).alias("w"), "mention", "name"
        )
        .agg(F.min(dist).alias("dist"))
        .select(
            F.col("w.start").alias("window_start"),
            "mention",
            F.col("name").alias("matched_name"),
            "dist",
        )
    )


def subject_access_map(
    detections: DataFrame,
    transcripts: DataFrame,
    info_type: str = "EMAIL_ADDRESS",
) -> DataFrame:
    """DSAR summary per exact identity: join detection spans back to
    the turn text, slice the detected value, normalize it, and
    aggregate the subject's footprint — the conversations that mention
    the identity, mention count, and first/last timestamps.

    Output: ``(identity, n_convs, n_mentions, convs, first_seen,
    last_seen)`` with ``convs`` a sorted array (deterministic for the
    value-hash gate).

    100 TB posture: one co-partitioned join on (conv_id, turn_idx)
    followed by one partial-aggregated groupBy on the identity; the
    span slice is a codegen ``substring``.  Identity cardinality is
    the subject population — the aggregate state is bounded by
    subjects, not turns.
    """
    spans = detections.filter(F.col("info_type") == info_type).select(
        "conv_id", "turn_idx", "start", "end", "ts"
    )
    joined = spans.join(
        transcripts.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"],
    )
    value = F.expr("substring(text, start + 1, end - start)")
    return (
        joined.select(
            normalize_identity(value).alias("identity"), "conv_id", "ts"
        )
        .groupBy("identity")
        .agg(
            F.countDistinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_mentions"),
            F.sort_array(F.collect_set("conv_id")).alias("convs"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
    )


def erasure_conv_ids(
    detections: DataFrame,
    transcripts: DataFrame,
    requests: DataFrame,
    info_type: str = "EMAIL_ADDRESS",
) -> DataFrame:
    """Right-to-be-forgotten fan-out: for each requested identity
    (``requests.identity``, already normalized), every conversation
    that mentions it.  Returns distinct ``(conv_id,)``.

    The request set is tiny relative to the corpus (human-driven), so
    it is broadcast and the corpus side never shuffles — an arriving
    erasure batch costs one scan of the detection index, not a corpus
    repartition.
    """
    spans = detections.filter(F.col("info_type") == info_type).select(
        "conv_id", "turn_idx", "start", "end"
    )
    joined = spans.join(
        transcripts.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"],
    )
    value = normalize_identity(
        F.expr("substring(text, start + 1, end - start)")
    )
    return (
        joined.select("conv_id", value.alias("identity"))
        .join(F.broadcast(requests.select("identity")), "identity", "left_semi")
        .select("conv_id")
        .distinct()
    )

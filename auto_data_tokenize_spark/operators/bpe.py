"""Distributed byte-pair-encoding (BPE) training and application.

A training-data pipeline that packs sequences (operators/corpus.py)
needs the tokenizer itself; this module learns one from the corpus
with the classic BPE procedure (Sennrich et al. 2016, public) laid
out for Spark's execution model:

1. ONE corpus-level shuffle reduces the corpus to the distinct-word
   frequency table (vocabulary-sized — ~10^5-10^6 rows even for a
   100 TB corpus), exactly like the original algorithm's
   ``get_vocab`` step.
2. Every merge iteration then runs on that compact table only: pair
   counting is a JVM-side split/zip/explode/groupBy, the argmax pair
   (ONE row) comes to the driver, and the merge is applied with a
   literal ``replace`` over a sentinel-wrapped symbol string — no
   Python in the loop, no corpus re-scan, lineage truncated per
   round with ``localCheckpoint``.

Symbol strings wrap every symbol as ``\\x00sym\\x01``, so the pair
``(l, r)`` is the literal substring ``\\x00l\\x01\\x00r\\x01`` —
fully-wrapped symbols make adjacent matches share no characters,
which gives ``replace``'s left-to-right non-overlapping semantics the
exact greedy-left merge behaviour of list-based BPE (``[l,r,l,r]``
merges BOTH pairs in one round). Words containing the sentinel bytes
are dropped up front (they cannot appear in whitespace-split text
from any sane source; the filter makes the contract explicit).

Determinism: ties break on (count DESC, left ASC, right ASC); Spark
compares strings by UTF-8 bytes and Python by code points, which
agree because UTF-8 preserves code-point order — so the pure-Python
golden (``train_bpe_golden``) reproduces the distributed result
token-for-token.

Known limit: initial symbolization splits per UTF-16 code unit on the
JVM (``split(word, '')``), so supplementary-plane characters (emoji
etc.) would split into surrogate halves where the Python golden keeps
one code point. BMP text — including all CJK — is unaffected.

Pre-tokenization whitespace is pinned to the explicit ASCII class
``[ \\t\\n\\x0b\\f\\r]`` on BOTH engines (the same
explicit-character-class house rule as the dedup key normalizer):
Java ``\\s`` is exactly that class but Python ``str.split()`` splits
on UNICODE whitespace (NBSP, U+2028, ideographic space …), so a
golden built with ``str.split()`` would disagree with the Spark-
trained merges on any scraped-HTML corpus containing a non-breaking
space inside a word.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "apply_bpe",
    "encode_text",
    "train_bpe",
    "train_bpe_golden",
]

_S, _E = "\x00", "\x01"
END_OF_WORD = "</w>"

#: The one pre-tokenization contract (see module docstring): Java
#: ``\s`` == this class, Python must match it explicitly.
_WS_RE = r"[ \t\n\x0b\f\r]+"
_WS_SPLIT = re.compile(_WS_RE)


def _ws_words(text: str | None) -> list[str]:
    """Python twin of the Spark-side ``split(text, _WS_RE)`` word
    iteration: ASCII-whitespace split, empties dropped."""
    return [w for w in _WS_SPLIT.split(text or "") if w]


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """The one corpus-level shuffle: distinct-word frequency table."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), _WS_RE)
            ).alias("word")
        )
        .where((F.col("word") != "") & ~F.col("word").contains(_S) & ~F.col("word").contains(_E))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbol_string() -> F.Column:
    """word -> sentinel-wrapped per-character symbols + end-of-word."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit(""))
    wrapped = F.transform(chars, lambda c: F.concat(F.lit(_S), c, F.lit(_E)))
    return F.concat(
        F.concat_ws("", wrapped), F.lit(_S + END_OF_WORD + _E)
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 30,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns a
    DataFrame ``(rank int, left string, right string)`` ordered by
    rank. Stops early when no pair repeats. The merge list lives on
    the driver during the loop — bounded by ``n_merges`` rows, the
    same order of driver state as the IVF centroids or Bloom words
    elsewhere in this engine."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = docs.sparkSession
    # The word table is vocabulary-sized; cap its partition count so
    # each merge round schedules a handful of tasks, not a full
    # shuffle fan-out (at 10^6 words, 8 partitions of ~10^5 rows each
    # is still comfortably executor-sized).
    syms = (
        _word_freqs(docs, text_col)
        .select(_initial_symbol_string().alias("s"), "freq")
        .coalesce(8)
        .localCheckpoint()
    )
    sep = _E + _S  # between wrapped symbols
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        # symbols of "\x00a\x01\x00b\x01..." = split the inner body
        body = F.expr("substring(s, 2, length(s) - 2)")
        toks = F.split(body, sep)
        pairs = (
            syms.select(
                F.explode(
                    F.arrays_zip(
                        F.slice(toks, 1, F.size(toks) - 1).alias("l"),
                        F.slice(toks, 2, F.size(toks) - 1).alias("r"),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .where(F.col("cnt") >= 2)
        )
        best = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).first()
        if best is None:
            break
        left, right = best["l"], best["r"]
        merges.append((rank, left, right))
        pat = _S + left + _E + _S + right + _E
        rep = _S + left + right + _E
        # lazy checkpoint: materializes during the NEXT round's argmax
        # action, so each round costs one Spark job, and still
        # truncates lineage (no 30-deep replace() towers).
        syms = syms.select(
            F.expr(
                "replace(s, {pat}, {rep})".format(
                    pat=_sql_str(pat), rep=_sql_str(rep)
                )
            ).alias("s"),
            "freq",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        pd.DataFrame(merges, columns=["rank", "left", "right"]).astype(
            {"rank": "int32", "left": "string", "right": "string"}
        )
        if merges
        else pd.DataFrame({"rank": pd.array([], dtype="int32"),
                           "left": pd.array([], dtype="string"),
                           "right": pd.array([], dtype="string")}),
        "rank int, left string, right string",
    )


def _sql_str(s: str) -> str:
    """SQL string literal for text containing the sentinel bytes."""
    hexed = s.encode("utf-8").hex()
    return f"decode(unhex('{hexed}'), 'UTF-8')"


def train_bpe_golden(
    texts: list[str], n_merges: int = 30
) -> list[tuple[int, str, str]]:
    """Pure-Python twin of :func:`train_bpe` (the oracle golden):
    identical pre-tokenization, pair counting, tie-break, and
    greedy-left merge application on symbol lists."""
    freqs: dict[tuple[str, ...], int] = {}
    counts: dict[str, int] = {}
    for t in texts:
        for w in _ws_words(t):
            if _S in w or _E in w:
                continue
            counts[w] = counts.get(w, 0) + 1
    for w, n in counts.items():
        freqs[tuple(list(w) + [END_OF_WORD])] = (
            freqs.get(tuple(list(w) + [END_OF_WORD]), 0) + n
        )
    merges: list[tuple[int, str, str]] = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in freqs.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        pair_counts = {p: c for p, c in pair_counts.items() if c >= 2}
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1]))
        new_freqs: dict[tuple[str, ...], int] = {}
        for syms, n in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_freqs[key] = new_freqs.get(key, 0) + n
        freqs = new_freqs
    return merges


def _encode_word(w: str, ranks: dict[tuple[str, str], int],
                 by_rank: dict[int, tuple[str, str]]) -> list[str]:
    """Canonical BPE encode of one word: repeatedly apply the
    lowest-rank applicable merge, greedy-left within each pass."""
    syms = list(w) + [END_OF_WORD]
    while len(syms) > 1:
        cand = [
            ranks[(a, b)] for a, b in zip(syms, syms[1:]) if (a, b) in ranks
        ]
        if not cand:
            break
        l, r = by_rank[min(cand)]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_text(text: str | None, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-Python BPE encode of one text under a learned merge list —
    the single implementation behind both :func:`apply_bpe`'s executor
    path and the oracle goldens, so the driver gate checks the Spark
    plumbing (UDF, Arrow batches, schema) against the identical
    algorithm."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    by_rank = {i: tuple(m) for i, m in enumerate(merges)}
    return [
        tok
        for w in _ws_words(text)
        for tok in _encode_word(w, ranks, by_rank)
    ]


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode ``text_col`` with a learned merge list (canonical
    lowest-rank-first semantics; see :func:`encode_text`).
    Arrow-batched pandas UDF — the merge table is a plain Python
    closure shipped with the task; the per-row work is the inherent
    per-word merge scan."""
    merges = [tuple(m) for m in merges]

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        ranks = {m: i for i, m in enumerate(merges)}
        by_rank = {i: m for i, m in enumerate(merges)}
        return texts.map(
            lambda t: [
                tok
                for w in _ws_words(t)
                for tok in _encode_word(w, ranks, by_rank)
            ]
        )

    return docs.withColumn(out_col, encode(F.col(text_col)))

"""THE cross-engine hash fragment.

Every deterministic operator whose DuckDB oracle must recompute
identical values (minhash base hash, simhash halves, KMV, Bloom
probes, dataset-split buckets, winnowing grams) derives its integers
from one construction: the first 8 hex chars of md5 parsed as an
integer — a uniform 32-bit value both engines render bit-identically
(lowercase hex on both; Spark ``conv(..., 16, 10)`` and DuckDB's
``'0x' || ...`` cast parse it the same). Callers compose their own
seeding (concat prefixes) and reduction (mod p / mod m / normalize).

Keeping the fragment in ONE place is the lock-step guarantee: if an
engine quirk ever needs a workaround, every twin picks it up at once
instead of five hand-rolled copies drifting apart.
"""

from __future__ import annotations


def spark_md5_prefix(inner: str) -> str:
    """Spark SQL: md5-hex-prefix of ``inner`` as a bigint in [0, 2^32)."""
    return f"cast(conv(substring(md5({inner}), 1, 8), 16, 10) as bigint)"


def duckdb_md5_prefix(inner: str) -> str:
    """DuckDB twin of :func:`spark_md5_prefix` — bit-identical values."""
    return f"(('0x' || substr(md5({inner}), 1, 8))::BIGINT)"


def spark_md5_prefix_col(col):
    """Column-level form of :func:`spark_md5_prefix` for callers that
    compose the seed from Columns rather than SQL text (same
    construction, same cross-engine contract). Returns a bigint Column
    in [0, 2^32)."""
    from pyspark.sql import functions as F

    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")

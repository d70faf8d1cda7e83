"""auto_data_tokenize_spark — a PySpark-native sample→identify→tokenize engine.

A from-scratch Structured Streaming / batch engine with the query and
data-processing capabilities of ``GoogleCloudPlatform/auto-data-tokenize``
(reference, read-only, at ``/root/reference``): DLP-style infoType detection
(regex + dictionary + checksum validators), deterministic AES-SIV
tokenization with a conv_id-scoped key hierarchy, column sensitivity
reports, windowed/sessionized streaming aggregates, a stateful
detections × token-dictionary stream-stream join, and an idempotent
exactly-once commit-log sink — all expressed Spark-first (DataFrame API,
Catalyst-optimizable plans, Arrow-vectorized pandas UDFs; no per-row
Python in the hot path).

Nothing in this package is ported from the reference's Java/Beam code;
citations in docstrings (``file:line`` into ``/root/reference``) mark
*semantic* parity points only.
"""

__version__ = "0.1.0"

from auto_data_tokenize_spark.session import get_spark  # noqa: F401

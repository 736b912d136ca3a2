"""Partitioning & skew strategy (north rule: explicit partitioning /
shuffle / skew handling).

Extraction cost is proportional to page bytes, so the skew unit is the
*oversized document*: one 50 MB page in a partition of 10 KB pages makes
that task a straggler.  Strategy (SURVEY.md §4.2):

- normal pages: salted hash repartition on ``xxhash64(url)`` — urls are
  unique so hash partitioning is uniform in row count; the salt term mixes
  byte-size so co-located big rows split apart;
- oversized pages (byte length above a quantile threshold): routed to a
  dedicated sidecar pass with many more, smaller partitions so each
  straggler-sized page gets (close to) its own task.

At 100 TB this is the difference between a 1000-executor stage bounded by
total bytes / cluster and one bounded by the single largest document.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_repartition(
    pages: DataFrame, num_partitions: int, key: str = "url", salt_buckets: int = 8
) -> DataFrame:
    """Uniform repartition by hashed key + a byte-size salt term."""
    salt = (F.xxhash64(key, F.length("html")) % salt_buckets).cast("int")
    return pages.repartition(num_partitions, F.xxhash64(F.col(key)) + salt)


def split_oversized(
    pages: DataFrame,
    threshold_quantile: float = 0.99,
    relative_error: float = 0.01,
    min_threshold: int = 1 << 20,
):
    """Split pages into (normal, oversized, threshold_bytes).

    The threshold is the byte-length quantile, floored at 1 MiB so small
    test corpora don't split at all.  Callers process the oversized side
    with ``repartitionByRange(count, key)`` — range partitioning on the
    unique page key puts EXACTLY one oversized page per task (plain
    round-robin ``repartition(count)`` can still co-locate two) — and
    ``unionByName`` the results; both sides run the same extraction
    stage.  The sidecar's effect is measured in BENCH.md (skew fixture:
    the straggler partition stops bounding the stage wall) and the
    one-page-per-task layout is pinned in tests.
    """
    sized = pages.withColumn("_bytes", F.length("html"))
    (q,) = sized.approxQuantile("_bytes", [threshold_quantile], relative_error)
    threshold = max(int(q or 0), min_threshold)
    normal = sized.filter(F.col("_bytes") <= threshold).drop("_bytes")
    oversized = sized.filter(F.col("_bytes") > threshold).drop("_bytes")
    return normal, oversized, threshold

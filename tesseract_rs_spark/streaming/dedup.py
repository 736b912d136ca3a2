"""Streaming exact dedup — the ingest-time twin of
``functions.dedup.dedup_keep_first`` for a continuously-arriving page
dump (the 100 TB crawl: the same page resurfaces across fetches within
hours, and batch-dedup-later means storing every copy first).

``dropDuplicatesWithinWatermark`` keys state on the content digest and
DROPS a digest's state once the watermark passes its event time plus the
horizon — state is bounded by (dup horizon x ingest rate), not by corpus
size, which is the failure mode of plain ``dropDuplicates`` in a stream.
First arrival wins, the streaming analog of keep-first.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_dedup(
    pages: DataFrame,
    col: str = "text",
    ts_col: str = "warc_ts",
    horizon: str = "1 hour",
) -> DataFrame:
    """Deduplicate a streaming pages DataFrame by content sha256 within
    a bounded event-time horizon.  Returns the input rows (first arrival
    per digest) plus the ``fingerprint`` column."""
    return (
        pages.withColumn(
            "fingerprint", F.sha2(F.col(col).cast("binary"), 256)
        )
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )

"""Watermarked stream-stream time-bounded join — the enrichment story.

A streaming pipeline constantly correlates two live event streams: page
views with the purchases they led to, crawl fetches with their DNS
lookups, OCR page results with their retry outcomes.  The batch form is
an equi-join plus a time-range predicate; streamed, BOTH sides must
buffer rows until the other side can no longer produce a match.  Spark's
stream-stream join derives that bound from the join condition itself:
with watermarks on both event-time columns AND a time-range constraint
between them (``r.ts BETWEEN l.ts AND l.ts + horizon``), each side's
buffered state is dropped as soon as the other side's watermark passes
the last instant it could still join with — state is
O(rate × (lateness + horizon)), independent of stream length.

Without the time-range constraint the state is UNBOUNDED (every left row
must wait forever for a possible right match) — Spark accepts the query
and silently accumulates; the constraint is the scale contract, which is
why this operator requires the horizon instead of exposing a raw join.

Batch twin: the identical join condition on static frames; on fully
delivered data the streamed inner join emits exactly the batch result —
asserted in tests/test_advanced.py.

(Not a reference surface — SURVEY.md §2.7 streaming checklist row; the
batch interval join `functions/events.interval_join` is the driver-
checked relative.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from tesseract_rs_spark.streaming.windowed import EVENTS_SCHEMA


def _sides(
    left: DataFrame, right: DataFrame, lateness: str
) -> tuple[DataFrame, DataFrame]:
    """Disjoint column names + a watermark per side (both are required
    for a stream-stream inner join to finalize and clean state)."""
    lv = left.select(
        F.col("event_id").alias("l_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", lateness)
    rv = right.select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
    ).withWatermark("r_ts", lateness)
    return lv, rv


def time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    horizon: str = "1 hour",
    lateness: str = "2 hours",
) -> DataFrame:
    """Inner-join two event frames on user, keeping right events that
    happen within ``horizon`` AFTER the left event (closed bounds).
    Works on static frames (the batch twin) and on streaming frames,
    where the time-range constraint is what lets Spark bound both
    sides' join state — see the module docstring.

    Returns (l_id, r_id, l_user, l_ts, r_ts, l_type, r_type)."""
    lv, rv = _sides(left, right, lateness)
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return lv.join(rv, cond).select(
        "l_id", "r_id", "l_user", "l_ts", "r_ts", "l_type", "r_type"
    )


def stream_time_bounded_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    horizon: str = "1 hour",
    lateness: str = "2 hours",
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The streaming form over two parquet directories: each side reads
    as a file stream, and :func:`time_bounded_join` supplies the
    watermarks + time-range condition that bound the join state.  Append
    mode emits a pair exactly once, when both watermarks clear it."""

    def read(d: str) -> DataFrame:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        return reader.parquet(d)

    return time_bounded_join(
        read(left_dir), read(right_dir), horizon=horizon, lateness=lateness
    )

"""Watermarked windowed streaming aggregation — the late-data story.

A 100 TB pipeline ingesting WARC drops sees late data constantly: a crawl
shard lands hours after its capture timestamps.  ``withWatermark`` bounds
how long window state waits for stragglers: windows finalize (and emit,
in append mode) once the watermark — max observed event time minus the
allowed lateness — passes their end; later-than-watermark rows are
DROPPED, so state is bounded regardless of input disorder.

Batch twin: ``functions/events.tumbling_counts`` computes the same
(hour, event_type, n) table; on fully-delivered data the streamed result
equals the batch result restricted to finalized windows — asserted in
tests/test_advanced.py with deterministically injected late rows (one
inside the lateness bound, one beyond it).

(Not a reference surface — SURVEY.md §2.7 streaming checklist row.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    lateness: str = "2 hours",
    window: str = "1 hour",
    schema: str = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming (hour, event_type, n) with bounded-lateness state.

    Append-mode semantics: a window row is emitted exactly once, when the
    watermark (max event time - ``lateness``) passes the window end; rows
    arriving with event time older than the watermark are dropped.  State
    per open window is one counter — O(open windows x types), independent
    of input volume."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # a SOURCE option: batches = file arrival order, which is what
        # makes watermark progression deterministic in tests
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    ev = reader.parquet(input_dir)
    return (
        ev.withWatermark("ts", lateness)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )

"""Incremental extraction via Structured Streaming.

The north rule's resume requirement is satisfied batch-wise
(plans/checkpoint.py); this module is the streaming-native alternative for
continuously-arriving page dumps: new parquet files landing in a directory
are picked up exactly once (Spark's offset/commit log is the lineage), run
through the SAME fused extraction stage, and appended to the output table.

``trigger(availableNow=True)`` drains everything pending and stops — i.e.
incremental batch: re-running after new files arrive processes only the
delta.  The reference has no streaming surface (its TessMonitor is
progress reporting, /root/reference/src/monitor.rs:5-50 — SURVEY.md §2.7);
this is engine-native capability beyond parity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from tesseract_rs_spark.config import ExtractConfig
from tesseract_rs_spark.operators.extract import extract_text
from tesseract_rs_spark.sources.pages import PAGES_SCHEMA


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start (and return) the incremental extraction query."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    result = extract_text(pages, cfg or ExtractConfig())
    writer = (
        result.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Bucketed-table co-location — the shuffle-free-join machinery for
repeatedly-joined big tables (north rule: partitioning strategy).

A 100 TB fact table that joins the same key in every run should pay the
shuffle ONCE, at write time: ``bucketBy(n, key)`` + ``sortBy(key)``
persists hash-bucket layout in the catalog, and every later equi-join or
group-by on that key runs exchange-free (SortMergeJoin with zero
Exchange operators when both sides share the bucket spec).

This is plain public Spark bucketing; the helpers pin the engine's
conventions (bucket count, sorted buckets) and the test pins the plan
shape (no Exchange in the bucketed join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted catalog table."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left: str, right: str, key: str
) -> DataFrame:
    """Join two same-bucket-spec tables on their bucket key — planner
    elides both exchanges (verify with .explain: no Exchange below the
    SortMergeJoin)."""
    return spark.table(left).join(spark.table(right), key)

"""Event-stream analytics over the ``events`` table — the windowed /
stateful operator family (SURVEY.md §2.7: absent in the reference, core
Spark capability in this engine).

All pure JVM expressions: tumbling windows (``F.window``), gap-based
sessionization (lag + running sum over a Window — the classic pattern),
and JSON property extraction.  Each has an exact SQL twin for the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

SESSION_GAP_S = 1800  # 30 min


def tumbling_counts(events: DataFrame) -> DataFrame:
    """Per (hour, event_type): event count and summed value (cents-exact).
    (hour string, event_type, n, value_cents)."""
    return (
        events.groupBy(
            F.date_format(
                F.window("ts", "1 hour").start, "yyyy-MM-dd HH"
            ).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_s``.  Returns per user
    (user_id, n_sessions, n_events, max_session_events)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps may arrive as TIMESTAMP_NTZ -> epoch via
    # an explicit timestamp cast (session tz is pinned to UTC)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "_session", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_session = sess.groupBy("user_id", "_session").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """Per (2-hour window sliding by 1 hour, event_type): event counts —
    ``F.window(ts, '2 hours', '1 hour')``; every event lands in exactly
    two windows.  (window_start string, event_type, n)."""
    return (
        events.groupBy(
            F.date_format(
                F.window("ts", "2 hours", "1 hour").start, "yyyy-MM-dd HH"
            ).alias("window_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )


def top_type_per_hour(events: DataFrame) -> DataFrame:
    """The hour's dominant event type: rank types by count within each
    tumbling hour (ties break on type name) and keep the winner.
    (hour string, event_type, n)."""
    hourly = events.groupBy(
        F.date_format(F.window("ts", "1 hour").start, "yyyy-MM-dd HH").alias("hour"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("hour").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        hourly.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("hour", "event_type", "n")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    payload_cols: tuple = ("event_id",),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: each left row picks the most recent right row
    with ``right.ts <= left.ts`` within the same ``key`` (Spark has no
    native ASOF JOIN; DuckDB does — the oracle uses it).

    Implementation is the classic union + ordered-window trick, fully
    JVM-side: tag both sides, sort (key, ts, side) with the right side
    first on ties, and carry the right payload forward with
    ``last(..., ignorenulls=True)``.  ONE shuffle on the key; no
    per-row Python; skew-safe under AQE like any window.

    The right side must be unique per (key, ts) — dedupe first (ties
    would make ANY as-of semantics ambiguous).

    All payload columns ride in ONE non-null struct so a matched right
    row whose payload *value* is NULL is still the row that wins — a
    per-column ``last(ignorenulls=True)`` would skip it and resurrect an
    older non-null value, diverging from ASOF semantics (ADVICE r2)."""
    from pyspark.sql.types import StructField, StructType

    pay_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    l_tag = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(pay_type).alias("_rpay"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tag.schema["_lrow"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_rpay"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "*",
        F.last("_rpay", ignorenulls=True).over(w).alias("_rpay_f"),
    )
    out = carried.filter(F.col("_side") == 1).select(
        F.col("_lrow.*"),
        *[F.col("_rpay_f." + c).alias(c + suffix) for c in payload_cols],
    )
    return out


def attribute_purchases(events: DataFrame) -> DataFrame:
    """Attribution via as-of join: each purchase is attributed to the
    user's most recent prior-or-simultaneous click.
    (purchase_id, user_id, click_id nullable, gap_s nullable)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id").cast("long").alias("user_id"), "ts")
        .agg(F.max("event_id").cast("long").alias("click_id"))
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        F.col("event_id").cast("long").alias("purchase_id"),
    )
    joined = asof_join(
        purchases, clicks, key="user_id", ts_col="ts",
        payload_cols=("click_id", "ts"),
    )
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    return joined.select(
        "purchase_id",
        "user_id",
        "click_id_asof",
        (epoch("ts") - epoch("ts_asof")).alias("gap_s"),
    ).withColumnRenamed("click_id_asof", "click_id")


def extract_props(events: DataFrame) -> DataFrame:
    """JSON property extraction: (event_id, k) — ``get_json_object`` stays
    in the JVM (no Python json.loads per row)."""
    return events.select(
        F.col("event_id").cast("long"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def user_sessions(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Session INTERVALS per user: (user_id, session_id, s_start, s_end)
    in epoch seconds — the interval axis for :func:`interval_join`.
    Same gap rule as :func:`sessionize`."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn("_es", epoch).withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "_session", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("_session").cast("long").alias("session_id"),
    ).agg(F.min("_es").alias("s_start"), F.max("_es").alias("s_end"))


def promo_windows(
    spark,
    n: int = 120,
    base_s: int = 1704067200,  # 2024-01-01T00:00:00Z
    spacing_s: int = 21600,
    length_s: int = 5400,
) -> DataFrame:
    """Deterministic promotion windows: (promo_id, p_start, p_end) epoch
    seconds, ``n`` windows of ``length_s`` every ``spacing_s``."""
    return spark.range(n).select(
        F.col("id").alias("promo_id"),
        (F.lit(base_s) + F.col("id") * spacing_s).alias("p_start"),
        (F.lit(base_s) + F.col("id") * spacing_s + length_s).alias("p_end"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str = "s_start",
    l_end: str = "s_end",
    r_start: str = "p_start",
    r_end: str = "p_end",
    bucket_s: int = 21600,
) -> DataFrame:
    """Overlap (range/interval) join: all (left, right) row pairs whose
    CLOSED intervals intersect (``l_start <= r_end AND r_start <= l_end``).
    Column names must be disjoint across the two sides.

    Spark has no native range join — a raw inequality join plans as a
    BroadcastNestedLoopJoin (quadratic, and impossible when neither side
    fits in memory).  The scale path buckets the interval axis: each
    interval explodes into the fixed-width buckets it covers, candidates
    equi-join on the bucket id (an ordinary shuffled hash join — works at
    any size on BOTH sides), and the exact predicate verifies.  A
    qualifying pair is kept only in the bucket containing
    ``max(l_start, r_start)``, so each pair appears exactly once with NO
    distinct pass.  Fan-out cost is interval_length/bucket_s extra rows
    per interval — pick ``bucket_s`` near the median interval length.
    (DuckDB's native IEJoin range join is the oracle.)"""
    lb = left.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(l_start) / bucket_s), F.floor(F.col(l_end) / bucket_s)
            )
        ),
    )
    rb = right.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(r_start) / bucket_s), F.floor(F.col(r_end) / bucket_s)
            )
        ),
    )
    qualified = lb.join(rb, "_b").filter(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (
            F.col("_b")
            == F.floor(F.greatest(F.col(l_start), F.col(r_start)) / bucket_s)
        )
    )
    return qualified.drop("_b")

"""Batch analytics over the event stream table (streaming versions
live in iceberg_diag_spark.streaming).

Determinism notes for oracle parity: time arithmetic is done on
integer epoch-microseconds (unix_micros), window starts are rendered
as formatted strings, and monetary sums use floor-to-integer-cents —
all bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

SESSION_GAP_MINUTES = 30


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour windows per event type: counts, distinct
    users, value sum (cents). Single shuffle on (hour, type); at
    scale this is the canonical pre-aggregated rollup (map-side
    combine shrinks the shuffle to one row per group per task)."""
    hour = F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00:00")
    return (
        events.groupBy(hour.alias("window_start"), F.col("event_type"))
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("user_id").alias("distinct_users"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when
    the gap to the previous event of the same user exceeds
    `gap_minutes`. Output: one row per session with bounds and count.

    Two stacked windows over the SAME partitioning (user_id, ordered
    by ts) — Spark plans them as one shuffle + one sort, then the
    session rollup reuses the user_id shuffle. Skew: a pathological
    single user's events still fit one task at metadata-ish rates;
    for adversarial skew pre-split by (user_id, day)."""
    gap_us = gap_minutes * 60 * 1_000_000
    ts_us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(ts_us, F.col("event_id"))
    flagged = events.select(
        "user_id",
        "event_id",
        F.col("ts"),
        F.when(
            (ts_us - F.lag(ts_us).over(w)).isNull()
            | ((ts_us - F.lag(ts_us).over(w)) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_session_start"),
    )
    with_ids = flagged.withColumn(
        "session_seq",
        F.sum("is_session_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("event_count"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
    )


def json_props_rollup(events: DataFrame) -> DataFrame:
    """Dot-path JSON access (SURVEY §2 P5/F6): extract props.k and
    roll up. get_json_object stays JVM-side; no JSON parse in
    Python."""
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("event_count"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )

"""Events batch analytics + as-of/range time-series joins.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from iceberg_diag_spark.operators import (
    events,
    joins,
    sketches,
)
from iceberg_diag_spark.plans.common import _t


# Events (batch analytics; streaming versions in streaming/)
# --------------------------------------------------------------------

def _events_hourly(spark, sf_dir):
    return events.hourly_rollup(_t(spark, sf_dir, "events"))


_EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS event_count,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
       CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY window_start, event_type
"""


def _events_sessionize(spark, sf_dir):
    return events.sessionize(_t(spark, sf_dir, "events")).select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "event_count",
        "session_start",
        "session_end",
    )


_EVENTS_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS event_count,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sess
GROUP BY user_id, session_seq
"""


def _events_funnel(spark, sf_dir):
    """Ordered funnel: signup → first click AFTER the signup → first
    purchase AFTER that click, per user; output is one row per funnel
    stage with the user count that reached it. Three conditional-agg
    passes over the same user partitioning — each stage's timestamp
    gates the next, which a single pivot cannot express."""
    # Each stage relation is lazily checkpointed: t2's lineage
    # contains t1's and t3's contains both, and every stage is ALSO
    # counted — without materialization the events scan replays six
    # times (1+2+3 across the chained lineages). The checkpoints are
    # user-cardinality scale (16 B/row).
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    ).localCheckpoint(eager=False)
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=False)
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
        .localCheckpoint(eager=False)
    )
    stages = [
        ("1_signup", t1),
        ("2_click_after_signup", t2),
        ("3_purchase_after_click", t3),
    ]
    out = None
    for name, df in stages:
        row = df.agg(F.count("*").cast("long").alias("users")).select(
            F.lit(name).alias("stage"), "users"
        )
        out = row if out is None else out.unionByName(row)
    return out


_EVENTS_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1.t1
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
  GROUP BY e.user_id
)
SELECT '1_signup' AS stage, CAST(count(*) AS BIGINT) AS users FROM t1
UNION ALL
SELECT '2_click_after_signup', CAST(count(*) AS BIGINT) FROM t2
UNION ALL
SELECT '3_purchase_after_click', CAST(count(*) AS BIGINT) FROM t3
"""


def _events_quantiles(spark, sf_dir):
    return sketches.value_quantiles(_t(spark, sf_dir, "events"))


_EVENTS_QUANTILES_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS event_count,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


def _events_approx(spark, sf_dir):
    return sketches.approx_user_stats(_t(spark, sf_dir, "events"))


def _events_approx_checked(spark, sf_dir):
    return sketches.approx_stats_checked(_t(spark, sf_dir, "events"))


# The HLL estimate value is engine-private, but its error CONTRACT is
# checkable: the oracle asserts the bound holds (TRUE) and Spark's
# side computes whether its own sketch met it. The discrete-quantile
# columns hash directly (percentile_approx at full sketch accuracy ==
# DuckDB quantile_disc — both pick the value at rank ceil(p·n)).
_EVENTS_APPROX_CHECKED_SQL = """
SELECT event_type,
       round(quantile_disc(value, 0.5), 6) AS p50_approx,
       round(quantile_disc(value, 0.9), 6) AS p90_approx,
       TRUE AS hll_within_bound
FROM events
GROUP BY event_type
"""


def _events_sketch_rollup(spark, sf_dir):
    return sketches.hourly_user_sketch_rollup(_t(spark, sf_dir, "events"))


# The Datasketches HLL stays in exact (sparse) mode at the test
# cardinality (≤ ~150 users/day << 2^lgConfigK), so the union-rollup
# estimate equals the exact per-day distinct count and the oracle is
# plain COUNT(DISTINCT) — verified exact at sf0.001/0.01/0.1. At real
# cardinality it degrades gracefully to a bounded-error estimate and
# the rollup keeps its mergeable-state scale property.
_EVENTS_SKETCH_ROLLUP_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT date_part('hour', ts)) AS BIGINT) AS hours_covered,
       CAST(count(DISTINCT user_id) AS BIGINT) AS approx_distinct_users
FROM events
GROUP BY day
"""


def _events_hourly_anomalies(spark, sf_dir):
    """Anomalous hours: hourly event counts above the type's p90 —
    two-level aggregation (hourly rollup → per-type exact percentile)
    joined back as the flagging threshold. Percentile is exact/
    deterministic, so the whole query hash-matches the oracle."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00:00").alias(
            "window_start"
        ),
        "event_type",
    ).agg(F.count("*").alias("event_count"))
    thresholds = hourly.groupBy("event_type").agg(
        F.round(F.expr("percentile(event_count, 0.9)"), 6).alias("p90")
    )
    return (
        hourly.join(F.broadcast(thresholds), "event_type")
        .filter(F.col("event_count") > F.col("p90"))
        .select("event_type", "window_start", "event_count", "p90")
    )


_EVENTS_ANOMALIES_SQL = """
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window_start,
         event_type,
         CAST(count(*) AS BIGINT) AS event_count
  FROM events
  GROUP BY window_start, event_type
),
thresholds AS (
  SELECT event_type, round(quantile_cont(event_count, 0.9), 6) AS p90
  FROM hourly GROUP BY event_type
)
SELECT h.event_type, h.window_start, h.event_count, t.p90
FROM hourly h JOIN thresholds t USING (event_type)
WHERE h.event_count > t.p90
"""


def _events_top_users(spark, sf_dir):
    return sketches.approx_top_users(_t(spark, sf_dir, "events"))


def _events_top_counts(spark, sf_dir):
    """The hash-checkable projection of the heavy-hitters sketch:
    (event_type, rank, est_count). WHICH user occupies a tied rank is
    engine-private, but the count MULTISET of the true top-k is
    invariant under any tie-break when the sketch is exact (test
    cardinality << maxItemsTracked), so re-ranking by est_count makes
    the (rank, count) pairs deterministic and oracle-equal."""
    top = sketches.approx_top_users(_t(spark, sf_dir, "events"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("est_count"), F.asc("user_id")
    )
    return top.select(
        "event_type",
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("est_count"),
    )


_EVENTS_TOP_COUNTS_SQL = """
WITH c AS (
  SELECT event_type, user_id, count(*) AS n FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, user_id) AS rk
  FROM c
)
SELECT event_type, CAST(rk AS BIGINT) AS rank, CAST(n AS BIGINT) AS est_count
FROM r WHERE rk <= 5
"""


def _orders_decimal_totals(spark, sf_dir):
    """Exact decimal aggregation (SURVEY §1.2 'decimals — available
    free'): money as DECIMAL(18,2) — the cast to 2-decimal scale
    recovers the exact cent value from the stored double, and the
    decimal sum has no float drift. Output is emitted as integer
    CENTS (decimal * 100 → BIGINT): Spark decimal(38,2) and DuckDB
    DECIMAL(38,2) hold identical digits but serialize differently in
    the driver's hash canonicalization (round-1 hash_match failure —
    values were digit-for-digit equal), so the contract column type
    is the representation-stable integer."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    return orders.groupBy("o_orderstatus").agg(
        F.sum(cents).alias("total_cents"),
        F.min(cents).alias("min_cents"),
        F.max(cents).alias("max_cents"),
        F.count("*").alias("order_count"),
    )


_ORDERS_DECIMAL_SQL = """
SELECT o_orderstatus,
       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(min(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS max_cents,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders
GROUP BY o_orderstatus
"""


def _events_json(spark, sf_dir):
    return events.json_props_rollup(_t(spark, sf_dir, "events"))


_EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS event_count,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
FROM events
GROUP BY event_type
"""


# --------------------------------------------------------------------
# Time-series joins (as-of / range) over events
# --------------------------------------------------------------------

def _dedup_clicks(ev):
    # one click per (user, ts): max event_id — removes tie ambiguity
    # so the as-of match is deterministic on both engines
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )


def _asof_purchase_attribution(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = _dedup_clicks(ev)
    out = joins.asof_join(
        purchases,
        clicks,
        on="user_id",
        right_cols=("click_event_id",),
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
        "click_event_id_right",
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.expr("(unix_micros(ts) - unix_micros(ts_right)) div 1000000").alias(
            "gap_seconds"
        ),
    ).withColumnRenamed("click_event_id_right", "click_event_id")


_ASOF_SQL = """
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, max(event_id) AS click_event_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id,
       p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       CAST(FLOOR(p.value * 100) AS BIGINT) AS value_cents,
       c.click_event_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS gap_seconds
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def _range_clicks_before_purchase(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    return joins.range_join_before(
        purchases,
        clicks,
        on="user_id",
        before_seconds=1800,
        left_cols=("event_id",),
        right_cols=("event_id",),
    ).select(
        "user_id",
        F.col("l_event_id").alias("purchase_id"),
        F.col("r_event_id").alias("click_id"),
        "gap_seconds",
    )


_RANGE_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT) AS gap_seconds
FROM events p
JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
 AND epoch_us(c.ts) <= epoch_us(p.ts)
"""


# --------------------------------------------------------------------

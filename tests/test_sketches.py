"""Sketch operators: exact-percentile parity is covered by the DuckDB
oracle (test_oracle_parity.py); here we bound the error of the
approximate tier against exact answers and pin the mergeable-sketch
property (hourly sketches unioned == direct daily distinct, within
HLL error).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_diag_spark.operators import sketches
from iceberg_diag_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events")


def test_approx_user_stats_error_bounds(events):
    approx = {r.event_type: r for r in sketches.approx_user_stats(events).collect()}
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.users) <= max(2, 0.1 * e.users), et
        # percentile_approx with accuracy 10000 on ~200 rows is exact-ish
        assert abs(a.p50_approx - e.p50) <= 0.05 * max(abs(e.p50), 1), et
        assert abs(a.p90_approx - e.p90) <= 0.05 * max(abs(e.p90), 1), et


def test_sketch_rollup_matches_exact_daily(events):
    got = {
        r.day: (r.hours_covered, r.approx_distinct_users)
        for r in sketches.hourly_user_sketch_rollup(events).collect()
    }
    exact = {
        r.day: (r.hours, r.users)
        for r in events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct(F.hour("ts")).alias("hours"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for day, (hours, approx_users) in got.items():
        e_hours, e_users = exact[day]
        assert hours == e_hours, day
        # 15 distinct users/day — HLL at default lgK is near-exact here
        assert abs(approx_users - e_users) <= max(1, 0.05 * e_users), day


def test_approx_top_users_matches_exact(events):
    """15 distinct users per type — the sketch is exact here, so the
    top-k sets and counts must match the true heavy hitters."""
    got = {}
    for r in sketches.approx_top_users(events, k=5).collect():
        got.setdefault(r.event_type, {})[r.user_id] = r.est_count
    exact = {}
    for r in (
        events.groupBy("event_type", "user_id").count().collect()
    ):
        exact.setdefault(r.event_type, {})[r.user_id] = r["count"]
    for et, top in got.items():
        true_sorted = sorted(exact[et].items(), key=lambda kv: (-kv[1], kv[0]))
        top5_counts = sorted(c for _, c in true_sorted[:5])
        assert sorted(top.values()) == top5_counts, et
        for uid, c in top.items():
            assert exact[et][uid] == c, (et, uid)

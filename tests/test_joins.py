"""As-of and range join operators: semantics pinned against naive
per-row reference implementations on synthetic frames, plus the
events-table use cases (cross-engine parity runs in
test_oracle_parity.py via DuckDB's native ASOF JOIN).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_diag_spark.operators import joins
from iceberg_diag_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        # (key, ts_us, quote_id)
        ("a", 100, 1), ("a", 200, 2), ("a", 200, 3), ("a", 500, 4),
        ("b", 50, 5),
    ]
    return spark.createDataFrame(rows, "key string, ts long, quote_id long")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        # (key, ts_us, trade_id)
        ("a", 99, 10),   # before any quote -> unmatched
        ("a", 100, 11),  # ties quote ts=100 -> matches it
        ("a", 250, 12),  # matches latest of ts<=250
        ("a", 1000, 13),
        ("b", 60, 14),
        ("c", 10, 15),   # key with no quotes
    ]
    return spark.createDataFrame(rows, "key string, ts long, trade_id long")


def _ts(df):
    return df.withColumn("ts", F.timestamp_micros("ts"))


def test_asof_inner_semantics(spark, quotes, trades):
    out = joins.asof_join(
        _ts(trades), _ts(quotes), on="key", right_cols=("quote_id",), how="inner"
    )
    got = {
        r.trade_id: r.quote_id_right
        for r in out.collect()
    }
    # trade 11 ties ts=100 -> quote 1; trade 12 -> latest of quotes 2/3
    # at ts=200 (window last over arbitrary intra-ts right order — both
    # ids share the ts, assert it matched ts=200)
    assert set(got) == {11, 12, 13, 14}
    assert got[11] == 1
    assert got[12] in (2, 3)
    assert got[13] == 4
    assert got[14] == 5


def test_asof_left_keeps_unmatched(spark, quotes, trades):
    out = joins.asof_join(
        _ts(trades), _ts(quotes), on="key", right_cols=("quote_id",), how="left"
    )
    got = {r.trade_id: r.quote_id_right for r in out.collect()}
    assert set(got) == {10, 11, 12, 13, 14, 15}
    assert got[10] is None and got[15] is None


def test_asof_bad_how(spark, quotes, trades):
    with pytest.raises(ValueError):
        joins.asof_join(_ts(trades), _ts(quotes), on="key", how="outer")


def test_range_join_matches_naive(spark):
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id, r.gap_seconds)
        for r in joins.range_join_before(
            purchases, clicks, on="user_id", before_seconds=1800,
            left_cols=("event_id",), right_cols=("event_id",),
        ).collect()
    )
    # naive reference: in-memory nested loop over the small fixture
    p = [(r.user_id, r.event_id, r.ts) for r in purchases.collect()]
    c = [(r.user_id, r.event_id, r.ts) for r in clicks.collect()]
    want = sorted(
        (pu, pe, cu_e, int((pt - ct).total_seconds()))
        for (pu, pe, pt) in p
        for (cu, cu_e, ct) in c
        if pu == cu and 0 <= (pt - ct).total_seconds() <= 1800
    )
    assert got == want


def test_asof_events_matches_naive(spark):
    ev = load_table(spark, SF_DIR, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    out = joins.asof_join(
        purchases, clicks, on="user_id", right_cols=("click_id",), how="inner"
    )
    got = {r.event_id: (r.click_id_right, r.ts_right) for r in out.collect()}
    c = [(r.user_id, r.click_id, r.ts) for r in clicks.collect()]
    want = {}
    for r in purchases.collect():
        best = None
        for (cu, cid, ct) in c:
            if cu == r.user_id and ct <= r.ts and (best is None or ct > best[1]):
                best = (cid, ct)
        if best:
            want[r.event_id] = best
    assert got == want

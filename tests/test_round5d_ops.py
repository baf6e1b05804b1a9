"""Known-answer tests for the round-5d operators: clustering
advisor (interval-sweep overlap stats), per-dimension embedding
variance, and the event Markov transition matrix."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from iceberg_diag_spark.operators.events import event_transitions
from iceberg_diag_spark.operators.maintenance import clustering_advisor
from iceberg_diag_spark.operators.similarity import dim_variance_audit


def test_clustering_advisor_exact_overlaps(spark):
    # col "a": [1,5], [3,9], [6,8] → pairs (1,2),(2,3) = 2; a point at
    # 6..8 hits files 2 and 3 → max_depth 2.
    # col "b": [1,2], [3,4], [5,6] → disjoint: 0 pairs, depth 1.
    # col "c": [1,10], [2,9], [3,8] → all nested: 3 pairs, depth 3.
    rows = []
    for fid, (lo, hi) in enumerate([(1, 5), (3, 9), (6, 8)], start=1):
        rows.append(("a", fid, lo, hi))
    for fid, (lo, hi) in enumerate([(1, 2), (3, 4), (5, 6)], start=1):
        rows.append(("b", fid, lo, hi))
    for fid, (lo, hi) in enumerate([(1, 10), (2, 9), (3, 8)], start=1):
        rows.append(("c", fid, lo, hi))
    fs = spark.createDataFrame(rows, "col_name string, file_id long, lo long, hi long")
    out = {r["col_name"]: r for r in clustering_advisor(fs).collect()}
    assert out["a"]["overlap_pairs"] == 2 and out["a"]["max_depth"] == 2
    assert out["b"]["overlap_pairs"] == 0 and out["b"]["max_depth"] == 1
    assert out["c"]["overlap_pairs"] == 3 and out["c"]["max_depth"] == 3
    assert all(r["n_files"] == 3 for r in out.values())
    # avg_depth_ppm = floor(1e6 * sum(depth+1) / 9): a → (1+2+2)/9,
    # b → 3/9, c → (1+2+3)/9
    assert out["a"]["avg_depth_ppm"] == 555_555
    assert out["b"]["avg_depth_ppm"] == 333_333
    assert out["c"]["avg_depth_ppm"] == 666_666


def test_clustering_advisor_touching_endpoints_overlap(spark):
    # Closed intervals: [1,5] and [5,9] share point 5 → 1 pair.
    fs = spark.createDataFrame(
        [("a", 1, 1, 5), ("a", 2, 5, 9)],
        "col_name string, file_id long, lo long, hi long",
    )
    row = clustering_advisor(fs).collect()[0]
    assert row["overlap_pairs"] == 1 and row["max_depth"] == 2


def test_dim_variance_dead_and_live_dims(spark):
    # dim 0 constant 0.5 → q=512 everywhere → var_q = 0.
    # dim 1 alternates ±0.5 → q ∈ {512, -512}: with n=4, s=0,
    # ss=4·512² → var_q = floor(4·4·512²/16) = 512² = 262144.
    vecs = [([0.5, 0.5],), ([0.5, -0.5],), ([0.5, 0.5],), ([0.5, -0.5],)]
    emb = spark.createDataFrame(vecs, "embedding array<float>")
    out = {r["pos"]: r for r in dim_variance_audit(emb).collect()}
    assert out[0]["var_q"] == 0
    assert out[0]["mean_q_ppm"] == 512_000_000
    assert out[1]["var_q"] == 262_144
    assert out[1]["mean_q_ppm"] == 0
    assert all(r["n_vecs"] == 4 for r in out.values())


def test_dim_variance_negative_mean_floor(spark):
    # q = floor(-0.3·1024) = -308 each → s = -924, n = 3:
    # mean_q_ppm = floor(-308e6) = -308000000 (floor, not truncate).
    emb = spark.createDataFrame(
        [([-0.3],), ([-0.3],), ([-0.3],)], "embedding array<float>"
    )
    row = dim_variance_audit(emb).collect()[0]
    assert row["mean_q_ppm"] == -308_000_000
    assert row["var_q"] == 0


def test_event_transitions_known_matrix(spark):
    t0 = datetime.datetime(2025, 1, 1)

    def ev(i, uid, typ):
        return (i, t0 + datetime.timedelta(minutes=i), uid, typ)

    # user 1: a→b→a ; user 2: a→b. Transitions: (a,b)×2, (b,a)×1.
    rows = [ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "a"),
            ev(4, 2, "a"), ev(5, 2, "b")]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {(r["src"], r["dst"]): r for r in event_transitions(events).collect()}
    assert out[("a", "b")]["n_trans"] == 2
    assert out[("a", "b")]["n_users"] == 2
    assert out[("a", "b")]["prob_ppm"] == 1_000_000
    assert out[("b", "a")]["n_trans"] == 1
    assert out[("b", "a")]["n_users"] == 1
    assert out[("b", "a")]["prob_ppm"] == 1_000_000
    assert len(out) == 2


def test_event_transitions_prob_sums_to_one(spark):
    t0 = datetime.datetime(2025, 1, 1)
    rows = []
    i = 0
    # user 1 cycles a→b→c→a…; user 2 does a→c repeatedly.
    for uid, pattern in [(1, "abc" * 4), (2, "ac" * 5)]:
        for ch in pattern:
            rows.append((i, t0 + datetime.timedelta(seconds=i), uid, ch))
            i += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = event_transitions(events)
    sums = (
        out.groupBy("src")
        .agg(F.sum("prob_ppm").alias("p"), F.count("*").alias("k"))
        .collect()
    )
    # floor-rounding loses < k ppm per src row.
    for r in sums:
        assert 1_000_000 - r["k"] < r["p"] <= 1_000_000

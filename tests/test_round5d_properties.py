"""Randomized cross-checks of the round-5d primitives against
brute-force Python references (seeded — deterministic corpora, a few
Spark jobs per test rather than per-example)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from iceberg_diag_spark.operators.maintenance import clustering_advisor
from iceberg_diag_spark.operators.shuffling import grouped_prefix_sum
from iceberg_diag_spark.operators.similarity import dim_variance_audit


def test_clustering_advisor_matches_bruteforce_pairs(spark):
    rng = random.Random(42)
    rows = []
    ref = {}
    for c in ("g1", "g2", "g3"):
        intervals = []
        for fid in range(60):
            lo = rng.randrange(0, 500)
            hi = lo + rng.randrange(0, 120)
            intervals.append((fid, lo, hi))
            rows.append((c, fid, lo, hi))
        pairs = sum(
            1
            for i in range(len(intervals))
            for j in range(i + 1, len(intervals))
            if intervals[i][1] <= intervals[j][2]
            and intervals[j][1] <= intervals[i][2]
        )
        # max depth: at each interval start, how many intervals cover it
        depth = max(
            sum(
                1
                for (g, lo2, hi2) in intervals
                if lo2 <= lo and lo <= hi2
            )
            for (_, lo, _) in intervals
        )
        ref[c] = (pairs, depth)
    fs = spark.createDataFrame(
        rows, "col_name string, file_id long, lo long, hi long"
    )
    got = {r["col_name"]: r for r in clustering_advisor(fs).collect()}
    for c, (pairs, depth) in ref.items():
        assert got[c]["overlap_pairs"] == pairs, c
        assert got[c]["max_depth"] == depth, c


def test_grouped_prefix_sum_matches_python_cumsum(spark):
    rng = random.Random(7)
    rows = []
    ref = {}
    for g in ("a", "b", "c", "d"):
        # distinct order keys, non-contiguous, with varied counts
        keys = rng.sample(range(10_000), 500)
        vals = {k: rng.randrange(1, 50) for k in keys}
        rows += [(g, k, v) for k, v in vals.items()]
        acc = 0
        for k in sorted(vals):
            ref[(g, k)] = acc
            acc += vals[k]
    df = spark.createDataFrame(rows, "g string, k long, v long")
    out = grouped_prefix_sum(df, "g", "k", "v", out_col="p", n_shards=16)
    got = {(r["g"], r["k"]): r["p"] for r in out.collect()}
    assert got == ref


def test_grouped_prefix_sum_single_row_groups(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 20)], "g string, k long, v long"
    )
    out = {
        (r["g"], r["k"]): r["p"]
        for r in grouped_prefix_sum(df, "g", "k", "v", out_col="p").collect()
    }
    assert out == {("a", 1): 0, ("b", 2): 0}


def test_dim_variance_matches_integer_reference(spark):
    rng = random.Random(11)
    import math

    vecs = [
        [rng.uniform(-1, 1) for _ in range(8)] for _ in range(300)
    ]
    emb = spark.createDataFrame(
        [(v,) for v in vecs], "embedding array<float>"
    )
    got = {r["pos"]: r for r in dim_variance_audit(emb).collect()}
    import struct

    def as_f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    for pos in range(8):
        qs = [math.floor(as_f32(v[pos]) * 1024.0) for v in vecs]
        n = len(qs)
        s = sum(qs)
        ss = sum(q * q for q in qs)
        assert got[pos]["n_vecs"] == n
        assert got[pos]["mean_q_ppm"] == math.floor(1_000_000.0 * s / n)
        assert got[pos]["var_q"] == math.floor((n * ss - s * s) / (n * n))

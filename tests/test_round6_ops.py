"""Round-6 operators: clone pairs, DSIR scores, vocabulary growth,
file skew, embedding split drift — semantic assertions beyond the
DuckDB parity sweep (test_oracle_parity covers hash equality)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_winnow_clone_pairs_finds_shared_spans(spark):
    from iceberg_diag_spark.operators.dedup import winnow_clone_pairs

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"intro one {shared} outro alpha", "en", "s", 0),
        (2, f"intro two {shared} outro beta", "en", "s", 0),
        (3, "completely different text about spark query planning at scale", "en", "s", 0),
        (4, "another unrelated document mentioning ducks and lakes only", "en", "s", 0),
    ]
    out = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnow_clone_pairs(_docs(spark, rows)).collect()
    }
    # docs 1 and 2 share a 12-token span -> many shared fingerprints
    assert (1, 2) in out and out[(1, 2)] >= 2
    # no pair involving the unrelated docs
    assert all(p == (1, 2) for p in out)


def test_winnow_clone_pairs_boilerplate_cap(spark):
    from iceberg_diag_spark.operators.dedup import winnow_clone_pairs

    # one span shared by EVERY doc: with max_docs_per_fp below the doc
    # count, its fingerprints are dropped and no pairs remain
    span = "common boilerplate sentence shared by every single document here"
    rows = [(i, f"doc {i} says {span}", "en", "s", 0) for i in range(6)]
    out = winnow_clone_pairs(_docs(spark, rows), max_docs_per_fp=3).collect()
    # fingerprints from the shared span sit in 6 docs > cap 3; the
    # per-doc prefixes ("doc 3 says ...") differ, so nothing pairs
    assert out == []


def test_dsir_logratio_ranks_target_like_docs_higher(spark):
    from iceberg_diag_spark.operators.textops import dsir_logratio

    rows = (
        # target domain: medical-ish vocabulary
        [(i, "patient dose trial cohort placebo outcome", "en", "tgt", 0)
         for i in range(5)]
        # proposal domain: web-ish vocabulary
        + [(10 + i, "click subscribe channel video like share", "en", "web", 0)
           for i in range(5)]
        # one web doc that LOOKS like the target
        + [(99, "patient dose trial cohort placebo outcome", "en", "web", 0)]
    )
    out = {
        r["doc_id"]: r["avg_lr_micro"]
        for r in dsir_logratio(
            _docs(spark, rows), target_source="tgt"
        ).collect()
    }
    # target-vocabulary docs score strictly above proposal-vocab docs
    assert out[99] > out[10]
    assert out[0] > out[10]
    # the target-looking web doc scores like the target docs (same toks)
    assert out[99] == out[0]


def test_vocab_growth_curve_monotone_and_conserving(spark):
    from iceberg_diag_spark.operators.textops import vocab_growth_curve

    rows = [
        (i, f"shared tokens plus unique{i} word{i % 7}", "en", "s", 0)
        for i in range(32)
    ]
    out = vocab_growth_curve(_docs(spark, rows), n_shards=4).orderBy(
        "shard_id"
    ).collect()
    assert [r["shard_id"] for r in out] == [0, 1, 2, 3]
    # cum_types is the running sum of new_types and never decreases
    run = 0
    for r in out:
        run += r["new_types"]
        assert r["cum_types"] == run
    # first shard mints the shared vocabulary; later shards only their
    # unique{i} tokens -> strictly fewer new types than shard 0
    assert all(r["new_types"] < out[0]["new_types"] for r in out[1:])
    # total new types == corpus distinct types
    total_types = (
        _docs(spark, rows)
        .select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t"))
        .distinct()
        .count()
    )
    assert run == total_types


def test_file_skew_audit_exact_variance(spark):
    from iceberg_diag_spark.operators.maintenance import file_skew_audit

    files = spark.createDataFrame(
        [
            ("p1", 100, 0), ("p1", 200, 0), ("p1", 300, 0),
            ("p1", 999, 1),  # delete file — excluded
            ("p2", 50, 0), ("p2", 50, 0),
        ],
        "partition_key string, file_size_in_bytes long, content int",
    )
    out = {r["partition_key"]: r for r in file_skew_audit(files).collect()}
    p1 = out["p1"]
    assert (p1["n_files"], p1["total_bytes"]) == (3, 600)
    # population stddev of (100,200,300): floor(sqrt(n*ss - s^2)/n)
    import math

    num = 3 * (100**2 + 200**2 + 300**2) - 600**2
    assert p1["stddev_bytes"] == math.floor(math.sqrt(float(num)) / 3)
    assert p1["max_share_ppm"] == 1_000_000 * 300 // 600
    p2 = out["p2"]
    assert p2["stddev_bytes"] == 0 and p2["max_share_ppm"] == 500_000


def test_file_skew_audit_no_int64_overflow(spark):
    from iceberg_diag_spark.operators.maintenance import file_skew_audit

    # 10 GiB files: sum of squares ~1.15e21 per row pair — wraps int64
    # if the moments aren't 128-bit
    ten_gib = 10 * (1 << 30)
    files = spark.createDataFrame(
        [("p", ten_gib, 0)] * 20,
        "partition_key string, file_size_in_bytes long, content int",
    )
    row = file_skew_audit(files).collect()[0]
    assert row["stddev_bytes"] == 0  # identical sizes -> zero, not garbage
    assert row["max_share_ppm"] == 1_000_000 // 20


def test_embedding_drift_audit_detects_shifted_half(spark):
    from iceberg_diag_spark.operators.similarity import embedding_drift_audit

    dim = 8
    rows = []
    # label 0: both halves identical constant vectors -> zero drift
    for i in range(40):
        rows.append((i, [0.5] * dim, 0))
    # label 1: even ids at 0.0, odd ids at 1.0 -> large drift
    for i in range(40, 80):
        v = 0.0 if i % 2 == 0 else 1.0
        rows.append((i, [v] * dim, 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r["label"]: r for r in embedding_drift_audit(emb).collect()}
    assert out[0]["drift_sq_q"] == 0
    # q gap per dim = 256 (floor(0*256)=0 vs floor(1*256)=256);
    # squared over 8 dims = 8 * 256^2
    assert out[1]["drift_sq_q"] == 8 * 256 * 256
    assert out[1]["n_a"] == 20 and out[1]["n_b"] == 20


def test_embedding_dim_covariance_sign_and_topdim_selection(spark):
    from iceberg_diag_spark.operators.similarity import (
        embedding_dim_covariance,
    )

    # dims 0,1 perfectly correlated; dim 2 anti-correlated with 0;
    # dims 3..7 constant (zero variance -> excluded from a top_dims=3)
    rows = []
    for i in range(64):
        v = (i % 9) / 10.0
        rows.append((i, [v, v, 0.9 - v] + [0.5] * 5))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r["pos_a"], r["pos_b"]): r["cov_q"]
        for r in embedding_dim_covariance(emb, top_dims=3).collect()
    }
    # exactly C(3,2) pairs over the three varying dims
    assert set(out) == {(0, 1), (0, 2), (1, 2)}
    assert out[(0, 1)] > 0
    assert out[(0, 2)] < 0 and out[(1, 2)] < 0
    # corr(0,1)=+1 and corr(0,2)=-1 on the same values: |cov| equal
    # up to grid quantization (float32 + floor add ≤1 q-unit per
    # value → ≲1% of the ~9e4 q² magnitude here)
    assert abs(out[(0, 1)] + out[(0, 2)]) <= abs(out[(0, 1)]) // 50


def test_lsh_topk_exact_recall_and_determinism(spark):
    import random

    from iceberg_diag_spark.operators.similarity import lsh_topk_exact

    rng = random.Random(7)
    # 20 clusters of 4 near-identical vectors: each member's true
    # nearest neighbors are its 3 cluster-mates
    vecs, vid = [], 0
    for c in range(20):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        for _ in range(4):
            vecs.append((vid, [x + rng.uniform(-0.01, 0.01) for x in base]))
            vid += 1
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = lsh_topk_exact(emb, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # high-cosine cluster-mates collide in >= 1 of 8 tables virtually
    # always; count queries whose ENTIRE top-3 is its cluster
    full = 0
    for q, rs in by_q.items():
        mates = {q - q % 4 + i for i in range(4)} - {q}
        got = {r["neighbor_id"] for r in rs}
        assert all(1 <= r["rank"] <= 3 for r in rs)
        if got == mates:
            full += 1
    assert len(by_q) >= 70          # nearly every query has candidates
    assert full >= 0.8 * len(by_q)  # and recalls its whole cluster

    # determinism: a second run returns the identical row set
    again = lsh_topk_exact(emb, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cos_mppm"])
    assert sorted(map(key, rows)) == sorted(map(key, again))


def test_ivf_topk_exact_well_formed_and_probing_bounds_candidates(spark):
    import random

    from iceberg_diag_spark.operators.similarity import (
        ivf_topk_exact,
        md5_centroids,
    )

    # fixed centroids are on the q grid and engine-independent
    cents = md5_centroids()
    assert len(cents) == 16 and len(cents[0]) == 64
    assert all(-256 <= h <= 256 for row in cents for h in row)

    rng = random.Random(11)
    vecs = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(300)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = ivf_topk_exact(emb, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        # ranking is by cos desc with neighbor tie-break
        ordered = sorted(rs, key=lambda r: r["rank"])
        for x, y in zip(ordered, ordered[1:]):
            assert (x["cos_mppm"], -x["neighbor_id"]) >= (
                y["cos_mppm"], -y["neighbor_id"],
            )
    # probing 4/16 cells: every query found SOME candidates (uniform
    # data spreads across cells, and its own cell is always probed)
    assert len(by_q) >= 290

    # determinism across runs
    again = ivf_topk_exact(emb, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["cos_mppm"])
    assert sorted(map(key, rows)) == sorted(map(key, again))

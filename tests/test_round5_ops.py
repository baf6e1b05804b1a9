"""Known-answer tests for the round-5 operators: duplicated-n-gram
span audit, winnowing fingerprints, token-budget water-filling, and
the join-selectivity audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_diag_spark.operators import dedup, sampling
from iceberg_diag_spark.plans.registry import REGISTRY


def test_dup_ngram_spans_known_overlap(spark):
    shared = "one two three four five six seven eight"  # exactly 8 toks
    docs = spark.createDataFrame(
        [
            (1, shared + " tail-a unique-a"),
            (2, shared + " tail-b unique-b"),
            (3, "totally different words with no overlap at all here ok"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.dup_ngram_span_stats(docs).collect()}
    # docs 1/2: 10 tokens → 3 gram positions; only the first (the
    # shared 8-token run) repeats across docs
    assert out[1].n_grams == 3 and out[1].n_dup_grams == 1
    assert out[1].dup_ppm == 333_333
    assert out[2].n_dup_grams == 1
    assert out[3].n_dup_grams == 0 and out[3].dup_ppm == 0


def test_dup_ngram_spans_short_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "only seven tokens live in this doc"),
         (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    ids = {r.doc_id for r in dedup.dup_ngram_span_stats(docs).collect()}
    assert ids == {2}  # 7-token doc has no 8-gram positions


def test_winnow_identical_docs_identical_digest(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, t), (2, t), (3, "different text entirely with many words here")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in dedup.winnow_fingerprints(docs).collect()}
    assert (rows[1].n_fingerprints, rows[1].fp_xor) == (
        rows[2].n_fingerprints, rows[2].fp_xor,
    )
    assert (rows[3].n_fingerprints, rows[3].fp_xor) != (
        rows[1].n_fingerprints, rows[1].fp_xor,
    )
    # winnowing stores ~2/(w+1) of gram hashes — strictly fewer than
    # all 8 gram positions
    assert 1 <= rows[1].n_fingerprints < 8


def test_winnow_short_docs_absent(spark):
    docs = spark.createDataFrame(
        [(1, "five tokens not enough here"), (2, "a b c d e f g h")],
        "doc_id long, text string",
    )
    ids = {r.doc_id for r in dedup.winnow_fingerprints(docs).collect()}
    # doc 1: 5 tokens → 3 gram hashes < window 4 → no full window
    assert ids == {2}


def test_waterfill_caps_large_sources(spark):
    docs = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 100)],
        "source string, n_chars long",
    )
    out = {
        r.source: r
        for r in sampling.token_budget_waterfill(docs, budget=60).collect()
    }
    # theta = 30: a,b taken whole, c capped; allocations sum to budget
    assert out["a"].alloc_tokens == 10 and out["a"].exhausted
    assert out["b"].alloc_tokens == 20 and out["b"].exhausted
    assert out["c"].alloc_tokens == 30 and not out["c"].exhausted
    assert sum(r.alloc_tokens for r in out.values()) == 60


def test_waterfill_budget_exceeds_corpus(spark):
    docs = spark.createDataFrame(
        [("a", 10), ("b", 20)], "source string, n_chars long"
    )
    out = {
        r.source: r
        for r in sampling.token_budget_waterfill(docs, budget=500).collect()
    }
    assert all(r.exhausted for r in out.values())
    assert out["a"].alloc_tokens == 10 and out["b"].alloc_tokens == 20


def test_join_selectivity_matches_real_join(spark):
    from iceberg_diag_spark.functions.skew import join_selectivity

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(1,), (3,), (3,), (4,)], "k long")
    row = join_selectivity(left, right, "k").collect()[0]
    assert row.n_left == 4 and row.n_right == 4
    assert row.n_keys_left == 3 and row.n_keys_right == 3
    assert row.n_keys_both == 2  # keys 1, 3
    # accounting must agree with the real semi joins
    assert row.matched_left == left.join(right, "k", "semi").count() == 3
    assert row.matched_right == right.join(left, "k", "semi").count() == 3
    assert row.match_left_ppm == 750_000


def test_incremental_dedup_statuses(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # exact
            (3, "one two three four five six seven eight nine best"),  # near
            (5, "utterly unrelated vocabulary appears in this document"),
        ],
        "doc_id long, text string",
    )
    from iceberg_diag_spark.operators.dedup import incremental_dedup_status

    out = {
        r.doc_id: r.status
        for r in incremental_dedup_status(batch, corpus).collect()
    }
    assert out == {1: "exact", 3: "near_dup", 5: "novel"}


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    rows = [(i, 100 if i % 2 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = {r.doc_id for r in sampling.weighted_hash_sample(df, "doc_id", "w").collect()}
    b = {r.doc_id for r in sampling.weighted_hash_sample(df, "doc_id", "w").collect()}
    assert a == b  # same membership every run
    heavy = sum(1 for i in a if i % 2)
    light = len(a) - heavy
    assert heavy > 10 * max(light, 1)  # 100× weight ⇒ far likelier


def test_weighted_sample_zero_weight_never_kept(spark):
    df = spark.createDataFrame(
        [(i, 0) for i in range(100)] + [(1000, 50)],
        "doc_id long, w long",
    )
    kept = {r.doc_id for r in sampling.weighted_hash_sample(df, "doc_id", "w").collect()}
    assert all(k == 1000 for k in kept)


def test_near_dup_by_source_counts_star_pairs(spark):
    import pandas as pd
    import tempfile, os
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        {"doc_id": 1, "text": t, "lang": "en", "source": "a", "n_chars": len(t)},
        {"doc_id": 2, "text": t, "lang": "en", "source": "b", "n_chars": len(t)},
        {"doc_id": 3, "text": "unrelated words entirely different here now", "lang": "en", "source": "a", "n_chars": 40},
    ]
    d = tempfile.mkdtemp()
    pd.DataFrame(rows).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    out = {
        (r.source_a, r.source_b): r.n_pairs
        for r in REGISTRY["near_dup_rate_by_source"].build(spark, d).collect()
    }
    assert out == {("a", "b"): 1}  # the exact-dup star pair, labeled across sources


def test_quality_ablation_partition_identity(spark):
    # exclusive-kill counts + multi-gate kills + survivors must
    # partition the corpus exactly
    row = REGISTRY["quality_gate_ablation"].build(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.n_total == 500
    assert (
        row.n_pass_all + row.only_ttr + row.only_alpha + row.only_lang
        + row.fail_multi
    ) == row.n_total
    assert row.only_ttr <= row.fail_ttr
    assert row.only_alpha <= row.fail_alpha
    assert row.only_lang <= row.fail_lang


def test_label_silhouette_separable_clusters(spark):
    from iceberg_diag_spark.operators.similarity import label_silhouette

    rows = []
    for i in range(20):
        rows.append((i, [0.1 * (i % 5), 0.1], 0))       # tight at origin
        rows.append((100 + i, [10.0 + 0.1 * (i % 5), 10.0], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.label: r for r in label_silhouette(df).collect()}
    assert out[0].n_vecs == out[1].n_vecs == 20
    for lbl in (0, 1):
        # own-cluster spread is tiny vs distance to the other centroid
        assert out[lbl].mean_own_d2q < out[lbl].mean_other_d2q / 100
        assert out[lbl].sep_ratio_ppm < 10_000


def _reference_waterfill(masses, budget):
    """Pure-python water-filling for cross-checking: exact θ by
    ascending sweep, allocations floored like the operator."""
    import math
    items = sorted(masses.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    prefix = 0.0
    theta = None
    for k, (_, m) in enumerate(items):
        cand = (budget - prefix) / (n - k)
        if cand <= m:
            theta = cand
            break
        prefix += m
    out = {}
    for s, m in masses.items():
        lvl = m if theta is None else min(m, theta)
        out[s] = math.floor(lvl)
    return out


def test_waterfill_matches_reference_on_random_cases(spark):
    import random

    rng = random.Random(7)
    for case in range(6):
        n = rng.randint(1, 9)
        masses = {f"s{i}": rng.randint(1, 5000) for i in range(n)}
        budget = rng.randint(1, 8000)
        docs = spark.createDataFrame(
            [(s, m) for s, m in masses.items()],
            "source string, n_chars long",
        )
        got = {
            r.source: r
            for r in sampling.token_budget_waterfill(docs, budget=budget).collect()
        }
        want = _reference_waterfill(masses, budget)
        for s, m in masses.items():
            assert got[s].alloc_tokens == want[s], (case, s, masses, budget)
            assert got[s].alloc_tokens <= m
            assert got[s].exhausted == (got[s].alloc_tokens == m) or (
                # floor can make a capped alloc equal mass only when
                # theta >= mass, which the exhausted flag tracks exactly
                got[s].exhausted is False
            )
        total = sum(r.alloc_tokens for r in got.values())
        cap = min(budget, sum(masses.values()))
        assert cap - len(masses) <= total <= cap


def test_dedup_family_tolerates_null_and_empty_text(spark):
    docs = spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, ""),
            (4, "real words appear in this perfectly ordinary document here"),
        ],
        "doc_id long, text string",
    )
    # none of these should raise; null/empty docs simply produce no
    # shingles, and identical empty texts collapse as exact dups
    pairs = dedup.minhash_candidate_pairs(docs).collect()
    assert all(r.doc_a == 2 and r.doc_b == 3 for r in pairs)  # empty pair star
    spans = dedup.dup_ngram_span_stats(docs).collect()
    assert {r.doc_id for r in spans} <= {4}
    winnow = dedup.winnow_fingerprints(docs).collect()
    assert {r.doc_id for r in winnow} <= {4}
    status = {
        r.doc_id: r.status
        for r in dedup.incremental_dedup_status(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
        ).collect()
    }
    assert set(status) == {1, 3}  # runs clean over null/empty members

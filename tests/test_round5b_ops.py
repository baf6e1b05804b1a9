"""Known-answer tests for the round-5b operators: within-doc line
dedup, unigram-LM log-prob quality proxy, and SemDeDup-style
cluster-bucketed semantic dedup."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from iceberg_diag_spark.operators import similarity, textops


def test_line_dedup_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta. gamma. alpha beta. delta"),
            (2, "no repeats here. second sentence"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.line_dedup(docs).collect()}
    assert out[1].kept_sentences == 3
    assert out[1].removed_sentences == 1
    assert out[2].kept_sentences == 2 and out[2].removed_sentences == 0
    # rebuilt text = first occurrences in original order
    import hashlib

    expect = hashlib.md5(
        "alpha beta. gamma. delta".encode()
    ).hexdigest()
    assert out[1].cleaned_md5 == expect


def test_unigram_logprob_uniform_corpus(spark):
    # 4 distinct tokens, each appearing once → p = 1/4 for all,
    # per-token NLL = ln(4) ≈ 1.386294 → 1386294 micro-nats
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textops.unigram_logprob(docs).collect()}
    nll = math.floor(-math.log(1 / 4) * 1_000_000)
    for d in (1, 2):
        assert out[d].n_tokens == 2
        assert out[d].sum_nll_micro == 2 * nll
        assert out[d].avg_nll_micro == nll


def test_unigram_logprob_rare_token_scores_higher(spark):
    docs = spark.createDataFrame(
        [(1, "common common common common"), (2, "rare common common common")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.unigram_logprob(docs).collect()}
    assert out[2].avg_nll_micro > out[1].avg_nll_micro


def test_semantic_dedup_drops_near_identical_in_cluster(spark):
    # two tight clusters along orthogonal axes; vec 11 duplicates
    # vec 10 (cos = 1) and must be dropped; cluster B has no dups
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0], 0),
        (11, [1.0, 0.0, 0.0, 0.0], 0),
        (12, [0.9, 0.1, 0.0, 0.0], 0),
        (20, [0.0, 0.0, 1.0, 0.0], 1),
        (21, [0.0, 0.0, 0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r.cluster: r
        for r in similarity.semantic_dedup(emb, threshold_micro=950_000).collect()
    }
    # cluster 0: 11 dropped (dup of 10); 12 kept (cos(10,12) ≈ 0.994
    # — above 0.95? cos([1,0],[0.9,0.1]) = 0.9/(1*0.90554) ≈ 0.9939 →
    # dropped too)
    assert out[0].n_vecs == 3
    assert out[0].n_dropped == 2
    assert out[0].n_kept == 1
    # cluster 1: orthogonal pair, nothing dropped
    assert out[1].n_vecs == 2 and out[1].n_dropped == 0

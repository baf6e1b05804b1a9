"""Round-9 operators: funnel CC-exact stage 3, KN perplexity scoring,
advisor-tuned LSH banding, iterated BPE training."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_funnel_stage3_equals_cc_collapse(spark):
    """Contract behind the stage-3 swap: the funnel's near_dup
    survivor count must equal the connected-components collapse
    (component-min survivor) over the same candidate pairs restricted
    to stage-2 survivors — i.e. the production near_dup_clusters
    semantics, not the former greedy pairwise rule. The fixture
    includes a chained-edit family (T, T+1 edit, T+2 edits) so the
    pair graph carries a multi-hop component, the exact case where
    greedy and CC can diverge."""
    from iceberg_diag_spark.operators import dedup
    from iceberg_diag_spark.operators.funnel import corpus_build_funnel

    base = (
        "the committee voted to approve the funding for the new "
        "library and the garden that the town wanted to build near "
        "the old school by the river in the spring"
    )
    v1 = base.replace("garden", "museum")
    v2 = v1.replace("river", "harbor")
    solo = (
        "a completely different document about the sea and the sky "
        "and the stars that is long enough to pass the quality "
        "gates easily for this corpus fixture"
    )
    rows = [
        (1, base, "web"),
        (2, v1, "web"),
        (3, v2, "web"),
        (4, solo, "web"),
        (5, base, "web"),  # exact dup of 1 — dies at stage 2
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {
        r["stage"]: r["n_rows"]
        for r in corpus_build_funnel(docs, holdout_ppm=0).collect()
    }

    # independent CC collapse over the identical restricted pair set
    s2 = {1, 2, 3, 4}  # doc 5 collapses into 1 at exact dedup
    pairs = dedup.minhash_candidate_pairs(docs)
    fpairs = pairs.filter(
        F.col("doc_a").isin(*s2) & F.col("doc_b").isin(*s2)
    )
    nodes = spark.createDataFrame(
        [(i,) for i in sorted(s2)], "doc_id long"
    )
    labels = dedup.connected_components(nodes, fpairs)
    survivors = labels.filter(
        F.col("cluster_id") == F.col("doc_id")
    ).count()
    assert got["near_dup"] == survivors
    # the chained family must actually have collapsed to one
    # representative for the fixture to exercise the multi-hop case
    edge_rows = {
        (r["doc_a"], r["doc_b"]) for r in fpairs.collect()
    }
    assert (1, 2) in edge_rows and (2, 3) in edge_rows
    assert survivors == 2  # {1,2,3} -> 1, {4} -> 4
    assert got["near_dup"] == 2

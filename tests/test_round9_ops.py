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


def _kn_corpus(spark, n_fluent=22):
    """Fluent docs cycle a tiny vocabulary (every bigram repeats far
    beyond the pruning floor); doc 999 is word-salad whose bigrams
    occur once each — pruned from the table, scored via the
    continuation backoff."""
    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent, "web") for i in range(1, n_fluent + 1)]
    gibberish = " ".join(f"zx{i}q wv{i}j" for i in range(12))
    rows.append((999, gibberish, "web"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_kn_gibberish_lands_in_worst_band(spark):
    """The CCNet contract: a planted word-salad document must carry
    the corpus-max average NLL and land in the worst (highest)
    perplexity band of its source."""
    from iceberg_diag_spark.operators.textops import (
        doc_kn_nll,
        doc_kn_perplexity,
    )

    docs = _kn_corpus(spark)
    scored = {r["doc_id"]: r for r in doc_kn_nll(docs).collect()}
    worst = max(scored.values(), key=lambda r: r["avg_nll_micro"])
    assert worst["doc_id"] == 999
    # strict separation, not a tie: backoff ppm for once-seen bigrams
    # is orders of magnitude below the fluent bigrams' KN mass
    fluent_max = max(
        r["avg_nll_micro"] for r in scored.values() if r["doc_id"] != 999
    )
    assert worst["avg_nll_micro"] > 2 * fluent_max

    bands = doc_kn_perplexity(docs).collect()
    top_band = max(r["band"] for r in bands)
    top = next(r for r in bands if r["band"] == top_band)
    assert top["hi_avg_nll_micro"] == worst["avg_nll_micro"]


def test_kn_band_assignment_is_exact_ntile(spark):
    """23 docs in one source with 10 bands: NTILE gives the first
    n%k = 3 bands 3 docs and the rest 2 — the arithmetic band formula
    must reproduce that population exactly (the oracle uses plain
    ntile())."""
    from iceberg_diag_spark.operators.textops import doc_kn_perplexity

    docs = _kn_corpus(spark, n_fluent=22)  # 23 docs total
    bands = sorted(
        (r["band"], r["n_docs"])
        for r in doc_kn_perplexity(docs).collect()
    )
    assert bands == [(b, 3 if b <= 3 else 2) for b in range(1, 11)]


def test_lsh_tuned_recall_ordering(spark):
    """The S-curve ordering the advisor predicts, observed on real
    pairs: with 16 hashes, analytic catch at s=0.7 is ~0.9954 for
    8x2 vs ~0.6666 for the 4x4 default, and only {16x1, 8x2} meet
    the 0.95 floor, of which 8x2 expects fewer candidates — so the
    tuned run must pick (8, 2), surface a SUPERSET of the default's
    pairs (8x2 bands are refinements of 4x4 bands over the same
    seeds), and on a moderate-similarity corpus catch strictly more
    near-dup pairs than the default."""
    from iceberg_diag_spark.operators.dedup import (
        lsh_near_dup_tuned,
        lsh_param_advisor,
        minhash_candidate_pairs,
    )

    vocab = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(20):
        a = " ".join(f"p{i}{t}" for t in vocab)
        # replace a 12-word run -> shingle jaccard well below the 4x4
        # knee (~0.707) but above the 8x2 knee (~0.354)
        b_toks = [
            f"p{i}x{j}" if 14 <= j < 26 else f"p{i}{vocab[j]}"
            for j in range(40)
        ]
        rows.append((2 * i, a, "web"))
        rows.append((2 * i + 1, " ".join(b_toks), "web"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )

    adv = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_param_advisor(docs).collect()
    }
    assert adv[(8, 2)]["catch_at_70_ppm"] > adv[(4, 4)]["catch_at_70_ppm"]
    assert adv[(8, 2)]["catch_at_70_ppm"] >= 950_000
    assert adv[(4, 4)]["catch_at_70_ppm"] < 950_000

    tuned_rows = lsh_near_dup_tuned(docs).collect()
    assert all(
        (r["bands"], r["rows_per_band"]) == (8, 2) for r in tuned_rows
    )
    tuned = {(r["doc_a"], r["doc_b"]) for r in tuned_rows}
    default = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(docs).collect()
    }
    assert default <= tuned  # refinement superset, never loses a pair
    planted = {(2 * i, 2 * i + 1) for i in range(20)}
    assert len(planted & tuned) > len(planted & default)


def test_bpe_train_merges_hand_computed(spark):
    """Sennrich toy corpus, merges hand-verified: word counts are
    low:4 lower:2 lowest:1 newer:3 newest:1 new:1 wider:1 wide:2, so
    the merge order is (l,o):7, (lo,w):7, (e,r):6, (e,w):5 — the
    (e,w) count only exists BECAUSE (e,r) merged first (newer =
    n·e·w·er), i.e. the test fails if iterations don't feed forward.
    corpus_symbols must drop by exactly merge_count each step."""
    from iceberg_diag_spark.operators.textops import bpe_train_merges

    docs = spark.createDataFrame(
        [
            (1, "low lower lowest low low newer newest new", "w"),
            (2, "low lower newer newer wider wide wide", "w"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["step"]: r for r in bpe_train_merges(docs, k=4).collect()}
    merges = [
        (rows[i]["left_sym"], rows[i]["right_sym"], rows[i]["merge_count"])
        for i in range(1, 5)
    ]
    assert merges == [
        ("l", "o", 7), ("lo", "w", 7), ("e", "r", 6), ("e", "w", 5),
    ]
    for i in range(1, 5):
        assert (
            rows[i]["corpus_symbols"]
            == rows[i - 1]["corpus_symbols"] - rows[i]["merge_count"]
        )
    # fertility audit rides the same rows: baseline = chars per word
    total_words = 15
    assert rows[0]["fertility_ppm"] == (
        1_000_000 * rows[0]["corpus_symbols"] // total_words
    )
    assert rows[4]["fertility_ppm"] < rows[0]["fertility_ppm"]

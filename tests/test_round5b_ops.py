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


def test_ngram_containment_quote_inclusion(spark):
    from iceberg_diag_spark.operators import dedup

    quote = "alpha beta gamma delta epsilon"  # 5 toks -> 3 trigram positions
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, quote + " and a much longer tail of extra words here"),
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    (r,) = dedup.ngram_containment_pairs(docs, cands).collect()
    # doc 1's grams are fully contained in doc 2
    assert r.n_grams_a == 3
    assert r.inter_size == 3
    assert r.cont_a_ppm == 1_000_000
    assert r.cont_b_ppm < 1_000_000  # asymmetry: doc 2 has extra grams


def test_bigram_logprob_conditional_not_unigram(spark):
    # "a b" occurs 3x, "a c" 1x: p(b|a)=3/4, p(c|a)=1/4 — doc with the
    # rare continuation scores higher NLL despite identical unigrams
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.bigram_logprob(docs).collect()}
    import math

    assert out[1].avg_nll_micro == math.floor(-math.log(3 / 4) * 1_000_000)
    assert out[4].avg_nll_micro == math.floor(-math.log(1 / 4) * 1_000_000)
    assert out[4].avg_nll_micro > out[1].avg_nll_micro


def test_snapshot_diff_statuses(spark):
    from iceberg_diag_spark.operators import dedup

    old = spark.createDataFrame(
        [(1, "kept doc", "s1"), (2, "dropped doc", "s1")],
        "doc_id long, text string, source string",
    )
    new = spark.createDataFrame(
        [(3, "kept doc", "s1"), (4, "brand new doc", "s2")],
        "doc_id long, text string, source string",
    )
    out = {(r.status, r.source): r for r in dedup.snapshot_diff(old, new).collect()}
    assert out[("retained", "s1")].n_hashes == 1
    assert out[("retained", "s1")].docs_old == 1
    assert out[("retained", "s1")].docs_new == 1
    assert out[("removed", "s1")].n_hashes == 1
    assert out[("added", "s2")].n_hashes == 1


def test_quality_classifier_separates_junk(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was a good day for everyone"),
            (2, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@ ####"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.quality_classifier_score(docs).collect()}
    assert out[1].keep is True
    assert out[2].keep is False
    assert out[1].z_micro > out[2].z_micro


def test_tokenizer_fertility_punctuation_raises_fertility(spark):
    docs = spark.createDataFrame(
        [
            (1, "plain words only here", "clean"),
            (2, "hy-phen'd, punct.uated! text?", "messy"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in textops.tokenizer_fertility(docs).collect()}
    assert out["clean"].fertility_ppm == 1_000_000  # 1 subword per word
    assert out["messy"].fertility_ppm > 1_000_000


def test_langid_margin_zero_when_ambiguous(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog in the house"),  # clearly en
            (2, "zzz qqq www xxx"),                   # no stopwords anywhere
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textops.langid_margin(docs).collect()}
    assert out[1].margin > 0 and out[1].lang == "en"
    assert out[2].hits == 0 and out[2].margin == 0


def test_contamination_report_matrix(spark):
    shared = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [
            (1, shared + " tail tail tail", "srcA"),
            (2, "totally clean text with no benchmark overlap at all ok", "srcA"),
            (3, shared + " other words", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    evs = {
        "bench1": spark.createDataFrame(
            [(100, shared)], "doc_id long, text string"
        ),
        "bench2": spark.createDataFrame(
            [(200, "nine ten eleven twelve thirteen fourteen fifteen sixteen")],
            "doc_id long, text string",
        ),
    }
    out = {
        (r.eval_set, r.source): r
        for r in textops.contamination_report(train, evs).collect()
    }
    assert out[("bench1", "srcA")].contaminated_docs == 1
    assert out[("bench1", "srcA")].total_docs == 2
    assert out[("bench1", "srcA")].contaminated_ppm == 500_000
    assert out[("bench1", "srcB")].contaminated_docs == 1
    assert ("bench2", "srcA") not in out  # no shared 8-grams


def test_line_dedup_matches_python_fold(spark):
    """Cross-check the distributed keep-first rebuild against a plain
    Python fold over a deterministic doc set (the pack_sequences
    cross-check pattern)."""
    import hashlib

    rows = [
        (i, ". ".join("sent%d" % ((j * (i + 3)) % 5) for j in range(8)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.kept_sentences, r.removed_sentences, r.cleaned_md5)
        for r in textops.line_dedup(docs).collect()
    }
    for i, text in rows:
        seen, kept = set(), []
        for s in text.split(". "):
            if s not in seen:
                seen.add(s)
                kept.append(s)
        expect_md5 = hashlib.md5(". ".join(kept).encode()).hexdigest()
        n_total = len(text.split(". "))
        assert got[i] == (len(kept), n_total - len(kept), expect_md5), i


def test_snapshot_diff_conserves_doc_counts(spark):
    from iceberg_diag_spark.operators import dedup
    from iceberg_diag_spark.sources.tpch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 != 1)
    out = dedup.snapshot_diff(old, new).collect()
    assert sum(r.docs_old for r in out) == old.count()
    assert sum(r.docs_new for r in out) == new.count()
    statuses = {r.status for r in out}
    assert statuses == {"added", "removed", "retained"}


def test_stream_centroid_confusion_equals_batch(spark):
    from iceberg_diag_spark.operators.similarity import (
        nearest_centroid_confusion,
    )
    from iceberg_diag_spark.streaming import stream_ops

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        (r.label, r.predicted): r.n_vecs
        for r in nearest_centroid_confusion(
            spark.read.parquet(sf_dir + "/embeddings.parquet")
        ).collect()
    }
    streamed = {
        (r.label, r.predicted): r.n_vecs
        for r in stream_ops.run_to_table(
            stream_ops.centroid_confusion_stream(
                stream_ops.read_embeddings_stream(spark, sf_dir),
                spark.read.parquet(sf_dir + "/embeddings.parquet"),
            ),
            "complete",
            "test_stream_centroid_confusion",
        ).collect()
    }
    assert streamed == batch


def test_norm_outliers_flags_poisoned_vector(spark):
    import random

    rng = random.Random(7)
    rows = []
    # 40 well-behaved unit-ish vectors
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(8)]
        n = sum(x * x for x in v) ** 0.5
        rows.append((i, [x / n for x in v], 0))
    # one truncated (near-zero) vector — the poisoned batch member
    rows.append((99, [0.001] * 8, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    (r,) = similarity.norm_outliers(emb).collect()
    assert r.n_vecs == 41
    assert r.outliers == 1
    assert r.min_norm_milli < 100  # the poisoned vector's tiny norm


def test_norm_outliers_uniform_corpus_flags_nothing(spark):
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0], 0) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    (r,) = similarity.norm_outliers(emb).collect()
    assert r.outliers == 0  # zero variance -> strict inequality never fires


def test_curriculum_shards_manifest(spark):
    from iceberg_diag_spark.operators import sampling

    docs = spark.createDataFrame(
        [
            (i, "the cat sat on the mat and it was a good day number %d" % i)
            for i in range(20)
        ]
        + [(100 + i, "@@@ ### $$$ %%% ^^^ &&& *** ((( )))") for i in range(5)],
        "doc_id long, text string",
    )
    out = sampling.curriculum_shards(docs, n_shards=4).collect()
    assert sum(r.n_docs for r in out) == 25
    bands = {r.band for r in out}
    assert "low" in bands  # the junk docs land in a lower band
    # shares within each band sum to ~1e6 (floor loss < n_shards)
    from collections import defaultdict

    share = defaultdict(int)
    for r in out:
        share[r.band] += r.band_share_ppm
        assert 0 <= r.shard < 4
    for band, s in share.items():
        assert 1_000_000 - 4 <= s <= 1_000_000, band

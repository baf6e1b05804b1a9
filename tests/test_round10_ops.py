"""Round-10 operators: the executed corpus release (funnel stage-5 →
export sink + per-shard manifest), the per-doc pack assignment it
rides on, and their invariants against the established funnel/packing
operators.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_diag_spark.operators import funnel, packing
from iceberg_diag_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_pack_assign_matches_aggregate_fold(spark):
    """Grouping pack_assign_from_counts' per-doc rows by seq_id must
    reproduce pack_sequences_from_counts' (doc_count, seq_tokens)
    exactly — same fold, two output shapes."""
    docs = load_table(spark, SF_DIR, "documents")
    base = docs.select(
        "source",
        F.pmod(F.col("doc_id"), F.lit(3)).cast("long").alias("shard"),
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % 97 + 1).cast("long").alias("n_tokens"),
    )
    agg = {
        (r.source, r.shard, r.seq_id): (r.doc_count, r.seq_tokens)
        for r in packing.pack_sequences_from_counts(base, 200).collect()
    }
    regrouped = {
        (r.source, r.shard, r.seq_id): (r.n, r.t)
        for r in packing.pack_assign_from_counts(base, 200)
        .groupBy("source", "shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("n_tokens").cast("long").alias("t"),
        )
        .collect()
    }
    assert regrouped == agg
    assert len(agg) > 1


def test_pack_assign_respects_capacity_and_order(spark):
    """Within a (source, shard) group: seq_ids are contiguous from 0
    in doc_id order, and no multi-doc sequence exceeds the capacity."""
    docs = load_table(spark, SF_DIR, "documents")
    base = docs.select(
        "source",
        F.lit(0).cast("long").alias("shard"),
        F.col("doc_id").cast("long").alias("doc_id"),
        (F.col("doc_id") % 50 + 1).cast("long").alias("n_tokens"),
    )
    rows = sorted(
        packing.pack_assign_from_counts(base, 64).collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r.source, []).append(r)
    for grp in by_group.values():
        seqs: dict[int, int] = {}
        prev_seq = 0
        for r in grp:
            assert r.seq_id >= prev_seq  # monotone in doc_id order
            prev_seq = r.seq_id
            seqs[r.seq_id] = seqs.get(r.seq_id, 0) + r.n_tokens
        assert sorted(seqs) == list(range(len(seqs)))  # contiguous
        for sid, total in seqs.items():
            n_docs = sum(1 for r in grp if r.seq_id == sid)
            if n_docs > 1:
                assert total <= 64


def test_release_membership_equals_stage4_survivors(spark, tmp_path_factory):
    """The written release's doc set IS the funnel's stage-4 (train)
    survivor set — the executed release ships exactly what the funnel
    counted, no more, no less."""
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path_factory.mktemp("release")) + "/corpus"
    funnel.corpus_release(docs, out)
    written_ids = {
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    }
    survivor_ids = {
        r.doc_id
        for r in funnel.stage_flags(docs)
        .filter(F.col("s4"))
        .select("doc_id")
        .collect()
    }
    assert written_ids == survivor_ids
    assert written_ids  # non-trivial fixture


def test_release_manifest_matches_written_files(spark, tmp_path_factory):
    """corpus_release's manifest (recomputed FROM the written parquet)
    equals corpus_release_manifest's plan-side manifest row for row —
    including the salted membership digests, so a shard lost or
    duplicated in transit cannot hash-match."""
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path_factory.mktemp("release_m")) + "/corpus"
    from_files = {
        r.shard: (r.n_docs, r.n_seqs, r.n_tokens, r.members_xor, r.members_xor2)
        for r in funnel.corpus_release(docs, out).collect()
    }
    from_plan = {
        r.shard: (r.n_docs, r.n_seqs, r.n_tokens, r.members_xor, r.members_xor2)
        for r in funnel.corpus_release_manifest(docs).collect()
    }
    assert from_files == from_plan
    assert len(from_plan) == funnel.RELEASE_N_SHARDS


def test_release_manifest_tokens_match_funnel_train_stage(spark):
    """Manifest token mass sums to the funnel's stage-4 n_tokens and
    sequence count to its stage-5 n_rows ONLY if sharding never drops
    mass; the seq count differs (release shards by md5 bucket, the
    funnel's packed stage by doc_id%4) but token totals must agree."""
    docs = load_table(spark, SF_DIR, "documents")
    manifest = funnel.corpus_release_manifest(docs)
    total_tokens = manifest.agg(F.sum("n_tokens")).collect()[0][0]
    stages = {
        r.stage: (r.n_rows, r.n_tokens)
        for r in funnel.corpus_build_funnel(docs).collect()
    }
    assert total_tokens == stages["train"][1]
    assert manifest.agg(F.sum("n_docs")).collect()[0][0] == stages["train"][0]


def test_unigram_lm_train_planted(spark):
    """Hand-computed hard-EM on a planted corpus: words ab(x4), c(x2).
    Seed vocab: chars a,b,c + multi 'ab'. Viterbi segments 'ab' as the
    single piece (one term beats two of equal unit cost), so the final
    counts are ab=4, c=2, a=b=0 (chars kept for coverage) and the
    smoothed scores are -ln((cnt+1)/(total+V)) with total=6, V=4."""
    import math

    from iceberg_diag_spark.operators.textops import unigram_lm_train

    docs = spark.createDataFrame(
        [(1, "ab ab ab c", "s1"), (2, "ab c", "s1")],
        "doc_id long, text string, source string",
    )
    rows = {
        r.piece: (r.piece_len, r.em_count, r.nll_micro)
        for r in unigram_lm_train(docs, k_em=2, n_multi=4).collect()
    }
    def nll(cnt):
        return math.floor(-math.log((cnt + 1) / 10.0) * 1_000_000)
    assert rows == {
        "a": (1, 0, nll(0)),
        "b": (1, 0, nll(0)),
        "ab": (2, 4, nll(4)),
        "c": (1, 2, nll(2)),
    }


def test_unigram_longest_piece_tiebreak(spark):
    """'abc' with equal-count pieces 'ab','bc','abc' and chars: the
    3-char piece wins (fewer terms), and among equal-cost candidates
    the backtrack picks the LONGEST — 'abc' must be chosen whole, not
    as ab+c or a+bc."""
    from iceberg_diag_spark.operators.textops import unigram_lm_train

    docs = spark.createDataFrame(
        [(1, "abc abc", "s1")], "doc_id long, text string, source string"
    )
    rows = {
        r.piece: r.em_count
        for r in unigram_lm_train(docs, k_em=1, n_multi=8).collect()
    }
    assert rows.get("abc") == 2
    assert all(
        cnt == 0 for p, cnt in rows.items() if p != "abc"
    )


def test_unigram_fertility_vs_bpe(spark):
    """Fertility comparison on the shared documents fixture: the
    trained unigram tokenizer's fertility (pieces per word) must beat
    the all-characters baseline and land in the same regime as the
    trained BPE tokenizer's corpus fertility (both learn the same
    small synthetic vocabulary, so neither should be >2x the other)."""
    from iceberg_diag_spark.operators.textops import (
        bpe_vocab_coverage,
        unigram_lm_train,
    )
    from iceberg_diag_spark.sources.tpch import load_table

    docs = load_table(spark, SF_DIR, "documents")
    pieces = unigram_lm_train(docs).collect()
    total_pieces = sum(r.em_count for r in pieces)
    words_chars = (
        docs.selectExpr(
            "explode(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '),"
            " ' ')) AS w"
        )
        .where("w <> ''")
        .selectExpr(
            "count(1) AS words", "sum(length(w)) AS chars"
        )
        .collect()[0]
    )
    uni_fert_ppm = 1_000_000 * total_pieces // words_chars.words
    base_fert_ppm = 1_000_000 * words_chars.chars // words_chars.words
    assert 1_000_000 <= uni_fert_ppm < base_fert_ppm
    bpe = bpe_vocab_coverage(docs).collect()
    bpe_fert_ppm = (
        1_000_000 * sum(r.subwords for r in bpe) // sum(r.words for r in bpe)
    )
    assert uni_fert_ppm < 2 * bpe_fert_ppm
    assert bpe_fert_ppm < 2 * uni_fert_ppm


def test_exact_auc_hand_computed_with_ties(spark):
    """Planted score/label pairs including a tie: scores [1,2,2,3],
    labels [0,0,1,1]. Pos-neg pairs: (2,1)=1, (2,2)=0.5, (3,1)=1,
    (3,2)=1 -> U=3.5, AUC=3.5/4=0.875 -> 875000 ppm."""
    from iceberg_diag_spark.operators.textops import exact_auc

    df = spark.createDataFrame(
        [(1, 0), (2, 0), (2, 1), (3, 1)], "score long, y long"
    )
    row = exact_auc(df).collect()[0]
    assert (row.auc_ppm, row.n_pos_total, row.n_neg_total) == (875_000, 2, 2)


def test_exact_auc_edges(spark):
    """Perfect separation -> 1e6; reversed -> 0; all-tied -> 500000;
    single-class -> NULL."""
    from iceberg_diag_spark.operators.textops import exact_auc

    perfect = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "score long, y long"
    )
    assert exact_auc(perfect).collect()[0].auc_ppm == 1_000_000
    reverse = spark.createDataFrame(
        [(4, 0), (3, 0), (2, 1), (1, 1)], "score long, y long"
    )
    assert exact_auc(reverse).collect()[0].auc_ppm == 0
    tied = spark.createDataFrame(
        [(7, 0), (7, 1), (7, 0), (7, 1)], "score long, y long"
    )
    assert exact_auc(tied).collect()[0].auc_ppm == 500_000
    one_class = spark.createDataFrame([(1, 1), (2, 1)], "score long, y long")
    assert exact_auc(one_class).collect()[0].auc_ppm is None


def test_classifier_auc_calibration_fixture(spark):
    """On the documents fixture: bins partition the corpus (doc counts
    sum to the table), empirical rates are exact ratios, and the AUC
    column is constant across bins and inside [0, 1e6]."""
    from iceberg_diag_spark.operators.textops import (
        classifier_auc_calibration,
    )
    from iceberg_diag_spark.sources.tpch import load_table

    docs = load_table(spark, SF_DIR, "documents")
    rows = classifier_auc_calibration(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert len({r.auc_ppm for r in rows}) == 1
    auc = rows[0].auc_ppm
    assert auc is not None and 0 <= auc <= 1_000_000
    for r in rows:
        assert 0 <= r.bin_id <= 9
        assert r.pos_rate_ppm == 1_000_000 * r.n_pos // r.n_docs
        assert r.calib_gap_ppm == r.mean_pred_ppm - r.pos_rate_ppm

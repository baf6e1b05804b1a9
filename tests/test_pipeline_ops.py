"""Unit tests for the round-3 pipeline operators: deterministic
sampling, table profiling, triangle counting, inter-event stats,
retention cohorts, token histogram, centroid stats.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from iceberg_diag_spark.operators import profiling, sampling
from iceberg_diag_spark.operators.graph import triangle_count


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_sample_deterministic(docs):
    a = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 20).collect()}
    b = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 20).collect()}
    assert a == b
    # roughly 20% — generous tolerance, the point is non-degeneracy
    assert 0.05 < len(a) / 300 < 0.45


def test_hash_sample_stable_under_growth(spark, docs):
    """A row's membership depends only on its own key: sampling a
    superset never changes which of the original rows are kept."""
    small = {r.doc_id for r in sampling.hash_sample(docs, "doc_id", 20).collect()}
    grown = docs.unionAll(
        spark.createDataFrame([(i, "de") for i in range(300, 600)],
                              "doc_id long, lang string")
    )
    big = {r.doc_id for r in sampling.hash_sample(grown, "doc_id", 20).collect()}
    assert {d for d in big if d < 300} == small


def test_stratified_rates(docs):
    got = sampling.stratified_hash_sample(
        docs, "doc_id", {"fr": 100}, "lang", default_pct=0
    ).collect()
    # fr fully kept, en fully dropped
    assert all(r.lang == "fr" for r in got)
    assert len(got) == 100


def test_hash_sample_rejects_bad_pct(docs):
    with pytest.raises(ValueError, match="pct"):
        sampling.hash_sample(docs, "doc_id", 101)


def test_profile_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, 1.0), (2, "b", None)],
        "k long, s string, v double",
    )
    rows = {
        r.column_name: r
        for r in profiling.profile(
            df, {"k": "int", "s": "str", "v": "num"}
        ).collect()
    }
    assert rows["k"].n_rows == 3 and rows["k"].n_nulls == 0
    assert rows["k"].n_distinct == 2
    assert rows["k"].min_repr == "1" and rows["k"].max_repr == "2"
    assert rows["s"].n_nulls == 1 and rows["s"].min_repr == "a"
    assert rows["v"].n_nulls == 1
    assert rows["v"].min_repr == "100" and rows["v"].max_repr == "250"


def test_triangle_count_known_graph(spark):
    # triangle 1-2-3 plus a dangling edge 3-4 and a second triangle
    # 2-3-4 sharing an edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)], "doc_a long, doc_b long"
    )
    [row] = triangle_count(edges).collect()
    assert row.edge_count == 5
    assert row.triangle_count == 2


def test_triangle_count_no_triangles(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    [row] = triangle_count(edges).collect()
    assert row.triangle_count == 0


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_interevent_stats_exact(spark):
    from iceberg_diag_spark.operators.events import interevent_stats

    t0 = datetime.datetime(2020, 1, 1)
    rows = [
        (1, t0, 7, "a"),
        (2, t0 + datetime.timedelta(seconds=10), 7, "a"),
        (3, t0 + datetime.timedelta(seconds=40), 7, "a"),
        (4, t0, 8, "a"),  # single-event user → filtered out
    ]
    got = {r.user_id: r for r in interevent_stats(_ev(spark, rows)).collect()}
    assert set(got) == {7}
    r = got[7]
    assert r.n_events == 3
    assert r.span_us == 40_000_000
    assert r.max_gap_us == 30_000_000
    assert r.avg_gap_seconds == pytest.approx(20.0)


def test_retention_cohorts_exact(spark):
    from iceberg_diag_spark.operators.events import retention_cohorts

    monday = datetime.datetime(1995, 1, 2)
    wk = datetime.timedelta(days=7)
    rows = [
        (1, monday, 1, "a"),                 # user 1 cohort week 0
        (2, monday + wk, 1, "a"),            # active week 1
        (3, monday + wk, 2, "a"),            # user 2 cohort week 1
        (4, monday + 3 * wk, 2, "a"),        # active week 3 (since=2)
    ]
    got = {
        (r.cohort_week, r.weeks_since): r.active_users
        for r in retention_cohorts(_ev(spark, rows)).collect()
    }
    assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 2): 1}


def test_token_histogram_buckets(spark):
    from iceberg_diag_spark.operators.textops import token_histogram

    rows = [
        (1, "one two three", "en"),          # 3 tokens → <=8
        (2, " ".join(["w"] * 9), "en"),      # 9 tokens → <=16
        (3, " ".join(["w"] * 600), "fr"),    # 600 tokens → 513+
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r.lang, r.bucket): (r.doc_count, r.avg_tokens)
        for r in token_histogram(df).collect()
    }
    assert got[("en", "<=8")] == (1, 3.0)
    assert got[("en", "<=16")] == (1, 9.0)
    assert got[("fr", "513+")] == (1, 600.0)


def test_centroid_stats_known_vectors(spark):
    from iceberg_diag_spark.operators.similarity import label_centroid_stats

    rows = [
        (1, [3.0, 0.0], 0),
        (2, [0.0, 4.0], 0),
        (3, [1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r.label: r for r in label_centroid_stats(df).collect()}
    assert got[0].n_vecs == 2
    assert got[0].avg_norm == pytest.approx(3.5)       # (3+4)/2
    assert got[0].centroid_norm == pytest.approx(2.5)  # |(1.5, 2)|
    assert got[1].avg_norm == pytest.approx(1.0)


def test_doc_chunks_exact(spark):
    from iceberg_diag_spark.operators.textops import doc_chunks

    rows = [
        (1, " ".join(f"t{i}" for i in range(130))),  # 130 → 3 chunks
        (2, "single"),                               # 1 token → 1 chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_id): r.n_chunk_tokens
        for r in doc_chunks(df, chunk_tokens=64).collect()
    }
    assert got == {(1, 0): 64, (1, 1): 64, (1, 2): 2, (2, 0): 1}


def test_fuzzy_name_pairs_contract(spark):
    from iceberg_diag_spark.operators.textops import fuzzy_name_pairs

    rows = [(i, n) for i, n in enumerate(
        ["red bolt", "red bolts", "red gear", "blue bolt", "ted bolt"]
    )]
    df = spark.createDataFrame(rows, "k long, name string")
    got = {(r.name_a, r.name_b): r.distance
           for r in fuzzy_name_pairs(df, "name").collect()}
    # within the 're' block: bolt/bolts dist 1; bolt/gear dist 4 (out)
    assert got == {("red bolt", "red bolts"): 1}
    # 'ted bolt' (block 'te') and 'blue bolt' (block 'bl') are out of
    # contract by prefix blocking even though edit distance is small
    assert not any("ted bolt" in p or "blue bolt" in p for p in got)


def test_length_deciles_monotone(spark):
    from iceberg_diag_spark.operators.textops import length_deciles

    rows = [(i, i * 10) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = sorted((r.n_chars, r.decile) for r in length_deciles(df).collect())
    deciles = [d for _, d in got]
    assert deciles == sorted(deciles)          # monotone in length
    assert deciles[0] == 1 and deciles[-1] == 10
    # equal lengths → same decile by construction
    df2 = spark.createDataFrame([(i, 5) for i in range(20)],
                                "doc_id long, n_chars long")
    assert {r.decile for r in length_deciles(df2).collect()} == {1}


def test_ngram_decontaminate_exact(spark):
    from iceberg_diag_spark.operators.textops import ngram_decontaminate

    shared = "a b c d e f g h"          # exactly one 8-gram
    train = spark.createDataFrame(
        [(1, shared + " tail words here"),   # contains the eval 8-gram
         (2, "totally different text with no overlap at all"),
         (3, "short")],                      # < 8 tokens → no grams
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, shared)], "doc_id long, text string")
    got = {r.doc_id: r.shared_ngrams
           for r in ngram_decontaminate(train, ev, n=8).collect()}
    assert got == {1: 1}                      # doc 2 clean, doc 3 gram-less


def test_quality_scores_repetition_counts(spark):
    from iceberg_diag_spark.operators.textops import quality_scores

    df = spark.createDataFrame(
        [(1, "x y z x y z x y z"),   # 7 trigrams, 3 distinct → 4 dups
         (2, "a b"),                 # < 3 tokens → 0 trigrams
         (3, "p q r s")],            # 2 trigrams, both unique
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.trigram_count, r.dup_trigram_count)
           for r in quality_scores(df).collect()}
    assert got == {1: (7, 4), 2: (0, 0), 3: (2, 0)}


def test_epoch_shuffle_permutation(spark):
    from iceberg_diag_spark.operators.shuffling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    rows = epoch_shuffle(df, seed="s1").collect()
    # bijection onto 1..N
    assert sorted(r.shuffle_pos for r in rows) == list(range(1, 201))
    # position order must equal (shuffle_key, doc_id) order
    by_pos = sorted(rows, key=lambda r: r.shuffle_pos)
    assert [r.doc_id for r in by_pos] == [
        r.doc_id for r in sorted(rows, key=lambda r: (r.shuffle_key, r.doc_id))
    ]
    # deterministic per seed, different across seeds
    again = epoch_shuffle(df, seed="s1").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in again} == {
        (r.doc_id, r.shuffle_pos) for r in rows
    }
    other = epoch_shuffle(df, seed="s2").collect()
    assert {(r.doc_id, r.shuffle_pos) for r in other} != {
        (r.doc_id, r.shuffle_pos) for r in rows
    }


def test_pack_fold_semantics():
    from iceberg_diag_spark.operators.packing import pack_fold

    # fit-before-append: 100+100 fits 256, +100 would not
    assert pack_fold([100, 100, 100], 256) == [(2, 200), (1, 100)]
    # oversized doc gets its own (truncated) sequence, neighbors pack on
    assert pack_fold([50, 300, 50, 50], 256) == [(1, 50), (1, 300), (2, 100)]
    # oversized first
    assert pack_fold([300, 10], 256) == [(1, 300), (1, 10)]
    assert pack_fold([], 256) == []
    assert pack_fold([256], 256) == [(1, 256)]  # exact fit stays open


def test_pack_fold_invariants():
    from hypothesis import given, strategies as st

    from iceberg_diag_spark.operators.packing import pack_fold

    @given(
        st.lists(st.integers(min_value=1, max_value=500), max_size=60),
        st.integers(min_value=1, max_value=400),
    )
    def check(sizes, cap):
        seqs = pack_fold(sizes, cap)
        assert sum(c for c, _ in seqs) == len(sizes)
        assert sum(t for _, t in seqs) == sum(sizes)
        for cnt, total in seqs:
            # only a lone oversized doc may exceed the capacity
            assert total <= cap or cnt == 1

    check()


def test_pack_sequences_spark_matches_fold(spark):
    from iceberg_diag_spark.operators.packing import pack_fold, pack_sequences

    rows = [
        (i, "s%d" % (i % 2), " ".join("w" for _ in range(10 + 7 * (i % 9))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(
        (r.source, r.shard, r.seq_id, r.doc_count, r.seq_tokens, r.truncated)
        for r in pack_sequences(df, capacity_tokens=64, n_shards=3).collect()
    )
    expect = []
    for src in ("s0", "s1"):
        for shard in range(3):
            toks = [
                10 + 7 * (i % 9)
                for i in range(40)
                if "s%d" % (i % 2) == src and i % 3 == shard
            ]
            for sid, (cnt, total) in enumerate(pack_fold(toks, 64)):
                expect.append((src, shard, sid, cnt, total, total > 64))
    assert got == sorted(expect)


def test_pii_redaction_exact(spark):
    from iceberg_diag_spark.operators.textops import pii_redaction

    rows = [
        (1, "mail bob.smith@corp.example.org now ssn 123-45-6789 call 555-0199 end"),
        (2, "no pii here at all"),
        (3, "two mails a@b.io and c.d@e-f.co plus 555-1234"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_redaction(df).collect()}

    assert (got[1].n_emails, got[1].n_ssns, got[1].n_phones) == (1, 1, 1)
    assert got[1].pii_total == 3
    assert got[2].pii_total == 0
    assert (got[3].n_emails, got[3].n_phones) == (2, 1)

    import hashlib

    expected1 = "mail <EMAIL> now ssn <SSN> call <PHONE> end"
    assert got[1].redacted_md5 == hashlib.md5(expected1.encode()).hexdigest()
    assert got[1].redacted_len == len(expected1)
    # no-PII text passes through untouched
    assert got[2].redacted_md5 == hashlib.md5(b"no pii here at all").hexdigest()


def test_boilerplate_removal_exact(spark):
    import hashlib

    from iceberg_diag_spark.operators.textops import boilerplate_removal

    # "promo" appears in 3 docs -> boilerplate at min_docs=3;
    # unique bodies survive; doc 4 is ALL boilerplate.
    rows = [
        (1, "alpha body one. promo line"),
        (2, "beta body two. promo line"),
        (3, "gamma body three. promo line. extra tail"),
        (4, "promo line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in boilerplate_removal(df, min_docs=3).collect()}

    assert (got[1].n_sentences, got[1].n_kept, got[1].n_dropped) == (2, 1, 1)
    assert got[1].cleaned_md5 == hashlib.md5(b"alpha body one").hexdigest()
    # order preserved across a dropped middle sentence
    assert got[3].cleaned_md5 == hashlib.md5(
        b"gamma body three. extra tail"
    ).hexdigest()
    # fully-boilerplate doc still emitted, cleaned to empty
    assert (got[4].n_kept, got[4].n_dropped) == (0, 1)
    assert got[4].cleaned_md5 == hashlib.md5(b"").hexdigest()
    # normalization: trailing-case variants count as the same form
    rows2 = rows + [(5, "PROMO LINE")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got2 = {r.doc_id: r for r in boilerplate_removal(df2, min_docs=4).collect()}
    assert got2[5].n_dropped == 1


def test_split_assign_partitions_every_row(docs):
    out = sampling.split_assign(docs, "doc_id").collect()
    assert len(out) == 300
    splits = {r.split for r in out}
    assert splits <= {"train", "val", "test"}
    # every row gets exactly one split; proportions are hash-driven
    n_train = sum(1 for r in out if r.split == "train")
    assert 200 < n_train < 300


def test_split_assign_stable_under_growth(spark, docs):
    """A doc's split never changes as the corpus grows — the frozen-
    eval-set property."""
    before = {r.doc_id: r.split
              for r in sampling.split_assign(docs, "doc_id").collect()}
    grown = docs.unionAll(
        spark.createDataFrame([(i, "de") for i in range(300, 600)],
                              "doc_id long, lang string")
    )
    after = {r.doc_id: r.split
             for r in sampling.split_assign(grown, "doc_id").collect()}
    assert all(after[d] == s for d, s in before.items())


def test_split_assign_rejects_no_train_room(docs):
    with pytest.raises(ValueError):
        sampling.split_assign(docs, "doc_id", val_pct=50, test_pct=50)


def test_per_stratum_cap_respects_cap_and_stability(spark, docs):
    capped = sampling.per_stratum_cap(docs, "doc_id", "lang", cap=10)
    rows = capped.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.doc_id)
    assert all(len(v) == 10 for v in by_lang.values())
    # cap larger than the stratum keeps everything
    all_kept = sampling.per_stratum_cap(docs, "doc_id", "lang", cap=10_000)
    assert all_kept.count() == 300
    # chosen members are hash-stable: re-running picks the same docs
    again = {r.doc_id for r in
             sampling.per_stratum_cap(docs, "doc_id", "lang", cap=10).collect()}
    assert again == {d for v in by_lang.values() for d in v}


def test_mixture_weights_alpha_one_is_proportional(spark):
    rows = [(i, "a" if i < 90 else "b", 100) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = {r.source: r for r in sampling.source_mixture_weights(
        df, alpha=1.0).collect()}
    assert out["a"].share_ppm == out["a"].sample_share_ppm == 900_000
    assert out["b"].share_ppm == out["b"].sample_share_ppm in (99_999, 100_000)
    # alpha=0.5 flattens: minority share rises, majority falls
    flat = {r.source: r for r in sampling.source_mixture_weights(
        df, alpha=0.5).collect()}
    assert flat["b"].sample_share_ppm > flat["b"].share_ppm
    assert flat["a"].sample_share_ppm < flat["a"].share_ppm

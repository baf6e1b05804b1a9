"""Round-7b operators: repetition profile, Zipf head, ANN recall
eval, media perceptual-hash near-dup."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_repetition_profile_flags_constructed_loop(spark):
    """A doc that is one phrase repeated must trip both the top-bigram
    and dup-5gram thresholds; a doc of all-distinct words trips
    neither and its metrics are exactly computable by hand."""
    from iceberg_diag_spark.operators.textops import doc_repetition_profile

    docs = spark.createDataFrame(
        [
            (0, "buy now " * 30),            # pure repetition
            (1, "alpha beta gamma delta epsilon zeta"),  # all distinct
            (2, "x"),                          # single word: no grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in doc_repetition_profile(docs).collect()}
    assert rows[0]["repetitive"] and not rows[1]["repetitive"]
    # doc 0: normalized = "buy now buy now ..." (30x, trailing space
    # trimmed) → 60 words, top bigram "buy now" occurs 30 times
    assert rows[0]["n_words"] == 60
    assert rows[0]["top_bigram"] == "buy now"
    assert rows[0]["top_bigram_cnt"] == 30
    # chars = 30*8 - 1 = 239; ppm = 1e6*30*7 // 239
    assert rows[0]["n_chars"] == 239
    assert rows[0]["top_bigram_ppm"] == (1_000_000 * 30 * 7) // 239
    assert rows[0]["dup5_ppm"] > 150_000
    # doc 1: every bigram unique → top count 1, no dup 5-grams
    assert rows[1]["top_bigram_cnt"] == 1
    assert rows[1]["dup5_ppm"] == 0
    # doc 2: shorter than any gram window → zeros, no crash
    assert rows[2]["top_bigram_cnt"] == 0
    assert rows[2]["top_bigram"] == ""
    assert rows[2]["dup5_ppm"] == 0


def test_repetition_profile_tie_breaks_lexically(spark):
    """Two bigrams with the same max count → the lexically smaller
    one is reported (array_sort makes the fold order deterministic)."""
    from iceberg_diag_spark.operators.textops import doc_repetition_profile

    docs = spark.createDataFrame(
        [(0, "zz yy zz yy aa bb aa bb")],
        "doc_id long, text string",
    )
    r = doc_repetition_profile(docs).collect()[0]
    # "aa bb" and "zz yy" both occur twice; "aa bb" sorts first
    assert r["top_bigram"] == "aa bb"
    assert r["top_bigram_cnt"] == 2


def test_repetition_profile_plan_is_shuffle_free(spark):
    """The per-doc fold must not shuffle: no Exchange beyond the
    final presentation sort and the parallelism repartition."""
    from iceberg_diag_spark.operators.textops import doc_repetition_profile

    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), F.col("id").cast("string"), F.lit(" x y z w"))
        .alias("text"),
    )
    plan = doc_repetition_profile(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # rangepartitioning for the output sort is the only exchange
    assert plan.count("Exchange") <= 1, plan


def test_token_zipf_cumulative_share_is_exact(spark):
    """Constructed frequencies: token shares and the cumulative sum
    must be the exact integer DIV values, in rank order."""
    from iceberg_diag_spark.operators.textops import token_zipf_curve

    # 6×a, 3×b, 1×c → total 10
    docs = spark.createDataFrame(
        [(0, "a a a a a a b b b c")], "doc_id long, text string"
    )
    rows = token_zipf_curve(docs, k=3).collect()
    assert [(r["rank"], r["token"], r["cnt"]) for r in rows] == [
        (1, "a", 6), (2, "b", 3), (3, "c", 1)
    ]
    assert [r["share_ppm"] for r in rows] == [600_000, 300_000, 100_000]
    assert [r["cum_share_ppm"] for r in rows] == [600_000, 900_000, 1_000_000]


def test_ann_recall_perfect_when_buckets_capture_everything(spark):
    """Identical vectors share every bucket, so the LSH candidates
    contain the full ground truth → recall@k = 1e6 for every query."""
    from iceberg_diag_spark.operators.similarity import ann_recall_eval

    # 12 copies of one direction (+tiny distinct ids) — every vector
    # lands in the same bucket in every table, so candidate recall
    # is total by construction.
    vecs = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(12)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = ann_recall_eval(emb, k=3, query_mod=6, dim=4).collect()
    assert {r["query_id"] for r in rows} == {0, 6}
    for r in rows:
        assert r["n_exact"] == 3
        assert r["n_hits"] == 3
        assert r["recall_ppm"] == 1_000_000
        assert r["first_miss_rank"] == 0


def test_ann_recall_counts_bucket_misses(spark):
    """A ground-truth neighbor that shares no bucket with the query
    must be reported missed: recall < 1e6 and first_miss_rank set."""
    from iceberg_diag_spark.operators.similarity import ann_recall_eval

    # query 0 aligned with vecs 1-2; vec 3 is the orthogonal odd one
    # out but still lands in SOME bucket — with k=3 and only 3
    # possible neighbors, n_exact=3; whether 3 is hit depends on
    # bucket overlap, so assert only the exact bookkeeping identity.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.1, 0.0, 0.0]),
            (2, [1.0, -0.1, 0.0, 0.0]),
            (3, [-1.0, 0.0, 5.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = ann_recall_eval(emb, k=3, query_mod=4, dim=4).collect()
    assert len(rows) == 1 and rows[0]["query_id"] == 0
    r = rows[0]
    assert r["n_exact"] == 3
    assert 0 <= r["n_hits"] <= 3
    assert r["recall_ppm"] == (1_000_000 * r["n_hits"]) // r["n_exact"]
    assert (r["first_miss_rank"] == 0) == (r["n_hits"] == r["n_exact"])


def test_media_phash_identical_payloads_pair_at_zero(spark):
    """Byte-identical payloads get identical fingerprints → a pair at
    hamming 0; a payload shorter than min_bytes never appears."""
    from iceberg_diag_spark.operators.multimodal import (
        media_phash_near_dup, with_media,
    )

    long_a = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [(0, long_a), (1, long_a), (2, "short")],
        "doc_id long, text string",
    )
    pairs = media_phash_near_dup(with_media(docs)).collect()
    assert {(p["doc_a"], p["doc_b"]): p["hamming"] for p in pairs} == {
        (0, 1): 0
    }


def test_media_phash_plan_stays_jvm_and_payload_free(spark):
    """The pair exchange must carry only (id, fp): no payload column
    below the join, and no Python anywhere."""
    from iceberg_diag_spark.operators.multimodal import (
        media_phash_near_dup, with_media,
    )

    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("payload text body "), F.col("id").cast("string"),
                 F.lit(" tail " * 5)).alias("text"),
    )
    df = media_phash_near_dup(with_media(docs))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # hamming verify happens above the dedup'd join output
    assert "bit_count" in plan


def test_hard_negatives_band_and_rank(spark):
    """Constructed cell: anchor with a near-duplicate (excluded: too
    close), a banded hard negative (kept), and an orthogonal easy
    negative (excluded: below lo). Ranks order by cosine desc."""
    from iceberg_diag_spark.operators.similarity import hard_negative_mining

    # dim=4 vectors; same IVF cell is guaranteed only for identical
    # directions, so use colinear-ish vectors and verify band logic
    # through the produced cosines themselves.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [1.0, 0.01, 0.0, 0.0]),   # ~cos 1.0 → too close
            (2, [1.0, 1.2, 0.0, 0.0]),    # mid-band candidate
            (3, [0.0, 0.0, 1.0, 0.0]),    # orthogonal → too far
        ],
        "vec_id long, embedding array<float>",
    )
    rows = hard_negative_mining(emb, dim=4).collect()
    # every emitted pair is inside the band by contract
    for r in rows:
        assert 300_000 <= r["cos_mppm"] < 850_000, r
    # ranks are 1..k per anchor, ordered by cos desc then id
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r["anchor_id"], []).append(r)
    for rs in by_anchor.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        coss = [r["cos_mppm"] for r in rs]
        assert coss == sorted(coss, reverse=True)
    # the near-dup pair (0,1) must NOT appear as negatives
    assert all(
        {r["anchor_id"], r["negative_id"]} != {0, 1} for r in rows
    )


def test_energy_curve_monotone_and_exact_on_construction(spark):
    """Vectors with all energy in the first 8 dims → every prefix
    captures 100%; a vector with energy only in dim 64 drags the
    min to 0 for every prefix below 64."""
    from iceberg_diag_spark.operators.similarity import (
        embedding_energy_curve,
    )

    front = [(i, [1.0] * 8 + [0.0] * 56) for i in range(4)]
    tail = [(99, [0.0] * 63 + [1.0])]
    emb = spark.createDataFrame(
        front + tail, "vec_id long, embedding array<float>"
    )
    rows = {r["prefix_dim"]: r for r in embedding_energy_curve(emb).collect()}
    assert rows[64]["total_captured_ppm"] == 1_000_000
    assert rows[64]["min_vec_ppm"] == 1_000_000
    for d in (8, 16, 32, 48):
        assert rows[d]["min_vec_ppm"] == 0          # the tail vector
        # 4 front vectors: 8·256² each; tail: 1·256²
        assert rows[d]["total_captured_ppm"] == (
            1_000_000 * (4 * 8 * 256 * 256)
        ) // (4 * 8 * 256 * 256 + 256 * 256)
    # monotone non-decreasing in d
    tots = [rows[d]["total_captured_ppm"] for d in (8, 16, 32, 48, 64)]
    assert tots == sorted(tots)


def test_bloom_advisor_quantifies_minmax_waste(spark):
    """Constructed layout: every file's [lo, hi] covers the probed
    key but only one file contains it → minmax admits all files,
    membership admits 1, waste = n-1."""
    from iceberg_diag_spark.operators.maintenance import bloom_advisor

    rows = []
    for f in range(10):
        rows += [(f, 0), (f, 1000)]        # wide bounds in every file
    rows.append((7, 97))                    # the probe key, one file
    vals = spark.createDataFrame(rows, "file_id long, v long")
    out = {r["probe_key"]: r for r in bloom_advisor(vals).collect()}
    # probes: 0 (in all 10 files) and 97 (in file 7 only)
    assert out[97]["minmax_files"] == 10
    assert out[97]["actual_files"] == 1
    assert out[97]["wasted_files"] == 9
    assert out[97]["wasted_ppm"] == 900_000
    assert out[0]["wasted_files"] == 0


def test_dedup_method_agreement_venn_identity(spark):
    """Exact duplicates land in BOTH pair sets (both collapse to star
    pairs), so a corpus of pure exact dups has overlap_ppm = 1e6 and
    the Venn identities hold exactly."""
    from iceberg_diag_spark.operators.dedup import dedup_method_agreement

    text = "alpha beta gamma delta epsilon zeta eta theta " * 3
    docs = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    r = dedup_method_agreement(docs).collect()[0]
    # 5 copies → 4 star pairs (rep 0 with each member) on both sides
    assert r["n_minhash"] == 4 and r["n_simhash"] == 4
    assert r["n_both"] == 4
    assert r["only_minhash"] == 0 and r["only_simhash"] == 0
    assert r["n_union"] == 4
    assert r["overlap_ppm"] == 1_000_000
    # the identities the aggregate must preserve
    assert r["n_union"] == r["n_both"] + r["only_minhash"] + r["only_simhash"]


def test_stream_repetition_gate_matches_batch_flag(spark, tmp_path):
    """The streaming per-source counts must equal the batch profile's
    flag counts — same expressions, drained once."""
    import os
    from iceberg_diag_spark.operators.textops import doc_repetition_profile
    from iceberg_diag_spark.streaming import stream_ops

    docs = spark.createDataFrame(
        [
            (0, "spam spam " * 30, "en", "srcA", 0),
            (1, "regular words only here thanks", "en", "srcA", 0),
            (2, "buy now " * 25, "en", "srcB", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    docs.coalesce(1).write.parquet(os.path.join(sf_dir, "documents.parquet"))

    out = stream_ops.run_to_table(
        stream_ops.repetition_gate_stream(
            stream_ops.read_documents_stream(spark, sf_dir)
        ),
        "complete",
        "t_stream_rep_gate",
    )
    got = {r["source"]: (r["n_docs"], r["n_repetitive"]) for r in out.collect()}
    prof = doc_repetition_profile(docs).collect()
    want = {}
    for r in prof:
        src = "srcA" if r["doc_id"] in (0, 1) else "srcB"
        n, k = want.get(src, (0, 0))
        want[src] = (n + 1, k + int(r["repetitive"]))
    assert got == want
    assert got["srcA"] == (2, 1) and got["srcB"] == (1, 1)


def test_seasonal_naive_exact_on_constructed_history(spark):
    """Two years of constructed monthly revenue: every 1993 month is
    predicted by its 1992 twin; a deliberate gap month breaks the
    calendar alignment and must drop the misaligned row."""
    import datetime
    from iceberg_diag_spark.operators.events import seasonal_naive_eval

    rows = []
    oid = 0
    for y in (1992, 1993):
        for m in range(1, 13):
            if (y, m) == (1993, 6):
                continue  # hole in the history
            rows.append((oid, datetime.date(y, m, 15), float(100 * m + y - 1992)))
            oid += 1
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    )
    out = {r["month_idx"]: r for r in seasonal_naive_eval(orders).collect()}
    # months 1993-07..12 shifted by the hole: their lag-12 row is no
    # longer exactly 12 months back → excluded; 1993-01..05 align.
    got_months = sorted((r["year"], r["month"]) for r in out.values())
    assert got_months == [(1993, m) for m in range(1, 6)]
    for r in out.values():
        m = r["month"]
        assert r["rev_cents"] == (100 * m + 1) * 100
        assert r["pred_cents"] == 100 * m * 100
        assert r["abs_err_cents"] == 100
        assert r["ape_ppm"] == (1_000_000 * 100) // r["rev_cents"]


def test_artifact_audit_counts_constructed_junk(spark):
    """Constructed artifact-laden docs: every counter verified by
    hand (the synthetic corpus is clean, so the oracle can only pin
    the zero path — this pins the counting)."""
    from iceberg_diag_spark.operators.textops import text_artifact_audit

    docs = spark.createDataFrame(
        [
            (0, "a &amp; b &lt; c <div class=x> see http://ex.com/y", "s1"),
            (1, "clean text only", "s1"),
            (2, "numbers 123 and 45\x07bell", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in text_artifact_audit(docs).collect()}
    s1 = out["s1"]
    assert s1["entity_hits"] == 2          # &amp; &lt;
    assert s1["tag_hits"] == 1             # <div ...>
    assert s1["url_hits"] == 1
    assert s1["ctrl_hits"] == 0
    assert s1["n_docs"] == 2
    assert s1["artifact_ppm"] == (1_000_000 * 4) // s1["total_chars"]
    s2 = out["s2"]
    assert s2["ctrl_hits"] == 1            # \x07
    assert s2["digit_chars"] == 5
    assert s2["digit_ppm"] == (1_000_000 * 5) // s2["total_chars"]


def test_gdpr_simulation_accounting_identities(spark):
    """Constructed layout: users 0 and 101 are forgotten; files
    without them never count; amplification is exact."""
    from iceberg_diag_spark.operators.events import gdpr_delete_simulation

    # file = event_id DIV 4; 3 files: file0 has one forgotten row,
    # file1 none, file2 all forgotten
    rows = [
        (0, 0), (1, 5), (2, 7), (3, 9),        # file 0: 1 deleted
        (4, 3), (5, 11), (6, 13), (7, 17),     # file 1: untouched
        (8, 101), (9, 202), (10, 0), (11, 303),  # file 2: all deleted
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    r = gdpr_delete_simulation(ev, forget_mod=101, rows_per_file=4).collect()[0]
    assert r["n_files"] == 3
    assert r["files_touched"] == 2
    assert r["rows_total"] == 12
    assert r["rows_deleted"] == 5
    assert r["rows_rewritten"] == 3          # file0: 3; file2: 0
    assert r["write_amplification_ppm"] == (1_000_000 * 3) // 5
    assert r["touched_ppm"] == (1_000_000 * 2) // 3

"""Round-16 optimization equivalence pins.

1. the fully-fused one-scan (content hash + wide MinHash signature +
   SimHash fingerprint) relation — `_sig_votes_fused` — matches the
   plain pipelines exactly for every doc shape (empty, sub-shingle,
   NULL text included), so dedup_method_agreement / simhash_near_dup
   can derive all tiers from ONE corpus text scan;
2. simhash_near_dup's fused standalone path emits the identical pair
   set to the explicit marked=/fingerprints= construction that
   replicates the old two-scan path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_diag_spark.operators import dedup
from iceberg_diag_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs_with_edges(spark):
    docs = load_table(spark, SF_DIR, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    edges = spark.createDataFrame(
        [
            (max_id + 1, ""),
            (max_id + 2, "two tokens"),
            (max_id + 3, None),
            (max_id + 4, "   "),
        ],
        "doc_id long, text string",
    )
    return docs.select("doc_id", "text").unionByName(edges), max_id


def test_sig_votes_fused_matches_plain_pipelines(spark):
    """__ch / h* / simhash from the one-scan fused pass equal the
    sha2 projection, minhash_signatures_wide and simhash64 outputs
    doc for doc; simhash is NULL exactly for the NULL-text docs
    simhash64 never emits."""
    all_docs, max_id = _docs_with_edges(spark)
    fused = dedup._sig_votes_fused(all_docs).collect()

    got_ch = {r["doc_id"]: r["__ch"] for r in fused}
    exp_ch = {
        r.doc_id: r.ch
        for r in all_docs.select(
            "doc_id",
            F.sha2(dedup.normalized_text(F.col("text")), 256).alias("ch"),
        ).collect()
    }
    assert got_ch == exp_ch  # every doc present, hashes identical

    hcols = [f"h{s}" for s in range(16)]
    got_sig = {
        r["doc_id"]: tuple(r[h] for h in hcols)
        for r in fused
        if r["h0"] is not None
    }
    exp_sig = {
        r.doc_id: tuple(r[h] for h in hcols)
        for r in dedup.minhash_signatures_wide(all_docs).collect()
    }
    assert got_sig == exp_sig

    got_fp = {
        r["doc_id"]: r["simhash"] for r in fused if r["simhash"] is not None
    }
    exp_fp = {
        r.doc_id: r.simhash for r in dedup.simhash64(all_docs).collect()
    }
    assert got_fp == exp_fp
    # NULL simhash ⟺ the NULL-text doc simhash64 drops; empty and
    # whitespace-only docs DO carry a fingerprint (split('') = [''])
    assert {r["doc_id"] for r in fused if r["simhash"] is None} == {
        max_id + 3
    }
    assert max_id + 1 in got_fp and max_id + 4 in got_fp

    # votes-only variant: same rows, no h* columns
    lite = dedup._sig_votes_fused(all_docs, minhash=False)
    assert set(lite.columns) == {"doc_id", "__ch", "simhash"}
    got_lite = {
        r["doc_id"]: (r["__ch"], r["simhash"]) for r in lite.collect()
    }
    assert got_lite == {
        d: (exp_ch[d], got_fp.get(d)) for d in exp_ch
    }


def test_simhash_near_dup_fused_standalone_identical(spark):
    """The fused one-scan standalone path (marked/fingerprints
    self-derived from _sig_votes_fused) emits the identical pair set
    to the explicit two-scan construction it replaced."""
    all_docs, _ = _docs_with_edges(spark)
    fused_path = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_dup(all_docs, max_hamming=10).collect()
    }
    old_path = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_dup(
            all_docs,
            max_hamming=10,
            marked=dedup.content_rep_marks(all_docs),
            fingerprints=dedup.simhash64(all_docs),
        ).collect()
    }
    assert fused_path == old_path
    assert fused_path  # non-trivial fixture

"""Round-15 optimization equivalence pins: every rewrite in this
round must keep results bit-identical, and these tests pin the two
equivalences the funnel fusion (change set 2) relies on:

1. the s1 language gate — `arrays_overlap(tokens, ALL_STOPWORDS)`
   is exactly `language_best(text)["hits"] > 0` (the struct-argmax
   form it replaced, which defeated codegen subexpression
   elimination on the shared token split);
2. the fused exact-dup mark relation — stage_flags' in-window
   `min(id) over (partition by content_hash)` produces the same
   (id, __keep) mapping as `content_rep_marks`, so passing it into
   `minhash_candidate_pairs(marked=...)` yields the identical
   candidate-pair relation while skipping a full corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_diag_spark.operators import dedup, textops
from iceberg_diag_spark.sources.tpch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_s1_language_gate_equivalence(spark):
    """any-stopword-overlap ⟺ best-language-hits>0, row for row."""
    docs = load_table(spark, SF_DIR, "documents")
    best = textops.language_best("text")
    mismatch = (
        docs.select(
            (best["hits"] > 0).alias("old_gate"),
            F.arrays_overlap(
                textops.tokens(F.col("text")),
                F.array(*[F.lit(w) for w in textops.ALL_STOPWORDS]),
            ).alias("new_gate"),
        )
        .filter(F.col("old_gate") != F.col("new_gate"))
        .count()
    )
    assert mismatch == 0
    # the gate is non-trivial on the fixture (both outcomes occur)
    hits = docs.filter(
        F.arrays_overlap(
            textops.tokens(F.col("text")),
            F.array(*[F.lit(w) for w in textops.ALL_STOPWORDS]),
        )
    ).count()
    assert 0 < hits < docs.count()


def test_fused_marks_match_content_rep_marks(spark):
    """stage_flags' fused (id, __keep) mark relation == the
    content_rep_marks relation it replaced. The fixtures carry no
    byte-identical documents, so inject exact copies (every 3rd doc
    re-id'd above the max id) to exercise real dup groups."""
    base = load_table(spark, SF_DIR, "documents")
    max_id = base.agg(F.max("doc_id")).collect()[0][0]
    copies = base.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(max_id + 1)
    )
    docs = base.unionByName(copies)
    w_ch = Window.partitionBy("__ch")
    fused = (
        docs.select(
            "doc_id",
            F.sha2(
                dedup.normalized_text(F.col("text")), 256
            ).alias("__ch"),
        )
        .select("doc_id", F.min("doc_id").over(w_ch).alias("__keep"))
    )
    expect = {
        (r["doc_id"], r["__keep"])
        for r in dedup.content_rep_marks(docs).select(
            "doc_id", "__keep"
        ).collect()
    }
    got = {(r["doc_id"], r["__keep"]) for r in fused.collect()}
    assert got == expect
    assert any(a != b for a, b in expect)  # real dup groups exist


def test_candidate_pairs_with_shared_marks_identical(spark):
    """minhash_candidate_pairs(marked=<caller relation>) returns the
    exact pair set of the self-derived default."""
    docs = load_table(spark, SF_DIR, "documents")
    marks = dedup.content_rep_marks(docs).select("doc_id", "__keep")
    base = {
        (r.doc_a, r.doc_b, r.n_shared_bands)
        for r in dedup.minhash_candidate_pairs(docs).collect()
    }
    shared = {
        (r.doc_a, r.doc_b, r.n_shared_bands)
        for r in dedup.minhash_candidate_pairs(
            docs, marked=marks
        ).collect()
    }
    assert shared == base
    assert base  # non-trivial fixture

"""Round-7 operators: hybrid retrieve-then-rerank semantics."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hybrid_retrieval_reranks_by_feedback_cosine(spark):
    """BM25 proposes candidates; the pseudo-relevance-feedback cosine
    decides the final order. Construct a corpus where the keyword
    order and the embedding order disagree: the doc with the WEAKEST
    BM25 score among candidates sits closest (cosine) to the
    feedback centroid and must win the rerank."""
    from iceberg_diag_spark.operators.textops import hybrid_retrieval_topk

    # doc 0-1: many query-term hits (top BM25 — the feedback set);
    # doc 2: few hits but embedding aligned with docs 0-1;
    # doc 3: mid BM25, embedding orthogonal to the feedback centroid
    docs = spark.createDataFrame(
        [
            (0, "spark join window " * 6),
            (1, "spark join window " * 5 + "filler"),
            (2, "spark mostly other words here"),
            (3, "spark join other words here too"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.1, 0.0]),
            (2, [1.0, 0.05, 0.0]),   # near the 0+1 centroid
            (3, [0.0, 0.0, 1.0]),    # orthogonal
        ],
        "vec_id long, embedding array<float>",
    )
    got = hybrid_retrieval_topk(
        docs, emb, n_candidates=4, m_feedback=2, k=4
    ).collect()
    by_rank = {r["rank"]: r for r in got}
    assert len(got) == 4
    # cosine order: 0 (exact centroid direction beats its own norm
    # tie-breaks via doc_id), 1, 2 all ~aligned; 3 orthogonal → last
    assert by_rank[4]["doc_id"] == 3
    assert by_rank[4]["cos_mppm"] <= 0 or (
        by_rank[4]["cos_mppm"] < min(by_rank[i]["cos_mppm"] for i in (1, 2, 3))
    )
    # the aligned docs all outrank the orthogonal one despite doc 3
    # beating doc 2 on BM25
    bm25 = {r["doc_id"]: r["bm25_micro"] for r in got}
    assert bm25[3] > bm25[2]
    ranks = {r["doc_id"]: r["rank"] for r in got}
    assert ranks[2] < ranks[3]


def test_hybrid_retrieval_drops_candidates_without_vectors(spark):
    """Inner-join contract: a BM25 candidate with no embedding row
    cannot be reranked and falls out of the result."""
    from iceberg_diag_spark.operators.textops import hybrid_retrieval_topk

    docs = spark.createDataFrame(
        [
            (0, "spark join window spark join"),
            (1, "spark join window"),
            (2, "no keyword overlap at all"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = hybrid_retrieval_topk(
        docs, emb, n_candidates=3, m_feedback=2, k=3
    ).collect()
    assert [r["doc_id"] for r in got] == [0]
    assert got[0]["rank"] == 1

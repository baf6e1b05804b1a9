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


def test_hourly_trend_matches_numpy_ols(spark):
    """Synthetic two-type series: exact OLS slope/r2 agree with a
    numpy polyfit reference (to floor-mppm quantization)."""
    import math

    from iceberg_diag_spark.operators.events import hourly_trend

    rows, eid = [], 0
    base = 1_700_000_000_000_000  # µs epoch, hour-aligned enough
    # type A: y = 5 + 2t (perfect line); type B: constant 7
    for t in range(24):
        for _ in range(5 + 2 * t):
            rows.append((eid, base + t * 3_600_000_000, 1, "A")); eid += 1
        for _ in range(7):
            rows.append((eid, base + t * 3_600_000_000, 1, "B")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    ).select(
        "event_id", "user_id", "event_type",
        (F.col("ts_us") / 1_000_000).cast("timestamp").alias("ts"),
    )
    got = {r["event_type"]: r for r in hourly_trend(ev).collect()}
    assert got["A"]["n_hours"] == 24
    assert got["A"]["slope_mppm"] == 2_000_000  # exactly 2/hour
    assert got["A"]["r2_ppm"] == 999_999 or got["A"]["r2_ppm"] == 1_000_000
    assert got["B"]["slope_mppm"] == 0
    assert got["B"]["r2_ppm"] is None  # zero variance in y


def test_changepoint_finds_constructed_step(spark):
    """A clean level shift at hour 12 (rate 3 → 30) must be the
    CUSUM argmax, with pre/post means matching the construction."""
    from iceberg_diag_spark.operators.events import changepoint_detect

    rows, eid = [], 0
    base = 1_700_000_000_000_000
    for t in range(24):
        rate = 3 if t < 12 else 30
        for _ in range(rate):
            rows.append((eid, base + t * 3_600_000_000, 1, "step")); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string"
    ).select(
        "event_id", "user_id", "event_type",
        (F.col("ts_us") / 1_000_000).cast("timestamp").alias("ts"),
    )
    r = changepoint_detect(ev).collect()[0]
    assert r["cp_idx"] == 12  # last pre-shift hour (1-based)
    assert r["pre_mean_mppm"] == 3_000_000
    assert r["post_mean_mppm"] == 30_000_000
    assert r["shift_mppm"] == 27_000_000


def test_skyline_dominance_property(spark):
    """Every survivor is undominated; every non-survivor is
    dominated by some doc — checked against a brute-force python
    reference on the sf0.001 corpus."""
    from iceberg_diag_spark.operators.textops import quality_length_skyline
    from iceberg_diag_spark.sources.tpch import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {r["doc_id"] for r in quality_length_skyline(docs).collect()}

    import re as _re

    pts = {}
    for r in docs.select("doc_id", "text").collect():
        t = _re.sub(r"\s+", " ", r["text"].strip().lower())
        ws = t.split(" ")
        ttr = (1_000_000 * len(set(ws))) // max(len(ws), 1)
        pts[r["doc_id"]] = (ttr, len(r["text"]))

    def dominated(i):
        ti, ci = pts[i]
        return any(
            (tj >= ti and cj >= ci and (tj > ti or cj > ci))
            for j, (tj, cj) in pts.items()
            if j != i
        )

    want = {i for i in pts if not dominated(i)}
    assert got == want

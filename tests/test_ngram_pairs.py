"""ngram_jaccard_pairs output contract: one row per candidate pair,
including caller-supplied pairs whose member docs have no n-grams at
all (those come back with jaccard=0.0 instead of silently vanishing
— LSH candidates always have shingles, but the operator must not
assume its caller is the LSH stage).
"""

from __future__ import annotations

import pytest

from iceberg_diag_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, ""),              # no tokens → no 3-grams
        (4, "one two"),       # 2 tokens → no 3-grams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_every_candidate_pair_appears(spark, docs):
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (3, 4)], "doc_a long, doc_b long"
    )
    rows = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, cands).collect()
    }
    assert set(rows) == {(1, 2), (1, 3), (3, 4)}
    # overlapping docs: 4 shared 3-grams of 4+4 → jaccard 3/5
    assert rows[(1, 2)] == pytest.approx(3 / 5)
    # one or both members shingle-less → defined 0.0, not a missing row
    assert rows[(1, 3)] == 0.0
    assert rows[(3, 4)] == 0.0


def test_exact_duplicates_score_one(spark):
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    pair = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    [row] = dedup.ngram_jaccard_pairs(dup, pair).collect()
    assert row.jaccard == 1.0

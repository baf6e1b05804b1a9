"""SimHash near-dup pairing: the pigeonhole banding must find every
pair within the Hamming budget (no false negatives by construction),
and near-identical documents must land within that budget while
unrelated ones stay outside it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_diag_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "as morning light fills the quiet kitchen with a soft golden glow"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE.replace("golden", "amber")),          # 1-word edit
        (2, BASE.replace("quick", "swift")),           # 1-word edit
        (3, "completely different content about spark shuffle partitions "
            "and adaptive query execution rewriting join strategies at "
            "runtime based on observed statistics and skew detection"),
        (4, "another unrelated document discussing parquet row groups "
            "column chunks dictionary encoding and predicate pushdown "
            "semantics in modern columnar storage formats today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_identical_docs_pair_up(corpus):
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_dup(corpus, max_hamming=6).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs
    # unrelated docs never pair with the BASE family
    for bad in [(0, 3), (0, 4), (1, 3), (2, 4), (3, 4)]:
        assert bad not in pairs, bad


def test_banding_has_no_false_negatives(corpus):
    """Every pair within the Hamming budget appears — cross-check the
    banded join against the exhaustive O(n²) computation."""
    sh = {r.doc_id: r.simhash for r in dedup.simhash64(corpus).collect()}
    budget = 6
    want = set()
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i < j and bin((sh[i] ^ sh[j]) & ((1 << 64) - 1)).count("1") <= budget:
                want.add((i, j))
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_dup(corpus, max_hamming=budget).collect()
    }
    assert got == want


def test_hamming_values_exact(corpus):
    sh = {r.doc_id: r.simhash for r in dedup.simhash64(corpus).collect()}
    for r in dedup.simhash_near_dup(corpus, max_hamming=6).collect():
        expect = bin((sh[r.doc_a] ^ sh[r.doc_b]) & ((1 << 64) - 1)).count("1")
        assert r.hamming == expect


def test_max_hamming_zero_joins_on_full_fingerprint(spark):
    """max_hamming=0 → one band spanning all 64 bits; the band key is
    the fingerprint itself (a 64-bit mask literal would overflow
    LongType). Only exact fingerprint matches pair up."""
    rows = [(0, BASE), (1, BASE), (2, BASE.replace("golden", "amber"))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_dup(df, max_hamming=0).collect()
    }
    assert got == {(0, 1): 0}

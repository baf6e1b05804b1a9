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


def _brute_pairs(sh: dict, budget: int) -> set:
    ids = sorted(sh)
    return {
        (i, j)
        for i in ids
        for j in ids
        if i < j
        and bin((sh[i] ^ sh[j]) & ((1 << 64) - 1)).count("1") <= budget
    }


@pytest.mark.parametrize("budget", [5, 10])
def test_multiprobe_has_no_false_negatives(corpus, budget):
    """Wide Hamming budgets route through multi-probe banding (wider
    bands + ≤d-bit-flip probes instead of 5-bit exact bands); the
    result must still equal the exhaustive computation. budget=5
    exercises the uneven tail band (3 bands of 21 bits, tail 22 —
    its own mask set); budget=10 is the registry parameterization
    (4 × 16-bit bands, d=2)."""
    sh = {r.doc_id: r.simhash for r in dedup.simhash64(corpus).collect()}
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.simhash_near_dup(corpus, max_hamming=budget).collect()
    }
    assert got == _brute_pairs(sh, budget)


def test_band_plan_keeps_keys_wide():
    """Scale guard: every reachable parameterization must produce
    band keys of ≥ 2^MIN_BAND_BITS distinct values (or a single
    full-fingerprint band) — a 5-bit key means ~n²/32 comparisons
    per band at scale. max_hamming=10 is the registry entry."""
    for k in range(0, 21):
        n_bands, d = dedup._band_plan(k)
        assert n_bands * (d + 1) >= k + 1, (k, n_bands, d)  # pigeonhole holds
        assert n_bands == 1 or 64 // n_bands >= dedup.MIN_BAND_BITS, (
            k, n_bands,
        )


def test_probe_masks_cover_hamming_ball():
    """The mask set for (width, d) is exactly the ≤d-bit-flip ball:
    XOR-probing it from key a hits key b iff a,b differ in ≤ d bits
    inside the band."""
    masks = set(dedup._probe_masks(6, 2))
    assert len(masks) == 1 + 6 + 15
    for m in masks:
        assert bin(m).count("1") <= 2 and m < (1 << 6)


def test_multiprobe_pigeonhole_simulation():
    """Pure-Python simulation of the banding over adversarial bit
    patterns: for every 64-bit pair within budget k=10, some band
    must match after ≤d probes — including errors packed into the
    tail band's high bits."""
    import random

    n_bands, d = dedup._band_plan(10)
    width = 64 // n_bands
    rng = random.Random(7)

    def bands_match(x: int, y: int) -> bool:
        for b in range(n_bands):
            w = 64 - b * width if b == n_bands - 1 else width
            kx = (x >> (b * width)) & ((1 << w) - 1)
            ky = (y >> (b * width)) & ((1 << w) - 1)
            if bin(kx ^ ky).count("1") <= d:
                return True
        return False

    for _ in range(500):
        x = rng.getrandbits(64)
        n_err = rng.randint(0, 10)
        err_bits = rng.sample(range(64), n_err)
        y = x
        for bit in err_bits:
            y ^= 1 << bit
        assert bands_match(x, y), (hex(x), sorted(err_bits))
    # adversarial: all 10 errors in the top 10 bits (tail band)
    x = rng.getrandbits(64)
    y = x ^ (((1 << 10) - 1) << 54)
    assert bands_match(x, y)


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

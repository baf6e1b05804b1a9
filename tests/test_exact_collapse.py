"""Exact-duplicate pre-collapse in the fuzzy-dedup family.

The pathology: byte-identical documents share an LSH bucket in EVERY
band, so a corpus with k exact copies of one page would expand to
k(k-1)/2 candidate pairs — quadratic output no banding scheme can
bound. With collapse_exact (the default), signatures run over one
representative per distinct content and each dup group surfaces as
k-1 (rep, member) star pairs instead.

Also: an end-to-end engine-vs-oracle parity check on a DUP-FUL corpus
(the driver's fixtures are dup-free at the correctness SF, so without
this test the collapse semantics of the DuckDB oracles would only
ever be exercised on inputs where they are a no-op).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from iceberg_diag_spark.operators import dedup
from iceberg_diag_spark.plans.registry import REGISTRY


def test_exact_dup_heavy_corpus_stays_linear(spark):
    # 10k identical docs + 2 distinct near-dup docs: without the
    # collapse this is ~5e7 in-bucket pairs; with it, exactly
    # 9_999 star pairs + the 1 genuine near-dup pair.
    n = 10_000
    rows = [(i, "the same boilerplate page repeated verbatim") for i in range(n)]
    rows += [
        (n, "alpha beta gamma delta epsilon zeta eta theta"),
        (n + 1, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_candidate_pairs(docs).collect()
    star = [r for r in pairs if r.doc_a == 0 and r.doc_b < n]
    assert len(star) == n - 1  # one edge per collapsed member
    assert all(r.n_shared_bands == 4 for r in star)
    # no member×member pairs — the star is the whole dup group's output
    member_pairs = [r for r in pairs if 0 < r.doc_a < n]
    assert member_pairs == []


def test_simhash_collapse_emits_hamming_zero_star(spark):
    rows = [(i, "identical content for every single document here") for i in range(50)]
    rows.append((99, "totally different words about unrelated topics entirely"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.simhash_near_dup(docs, max_hamming=3).collect()
    star = [(r.doc_a, r.doc_b, r.hamming) for r in out if r.doc_b < 99]
    assert sorted(star) == [(0, b, 0) for b in range(1, 50)]


def test_collapse_keeps_members_reachable_via_cc(spark):
    # collapsed members must land in their representative's cluster:
    # docs 1,2 exact dups; doc 3 near-dup of 1; doc 4 unrelated
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta kappa"),
        (3, "alpha beta gamma delta epsilon zeta eta theta lambda"),
        (4, "completely unrelated content with different words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    cc = {
        r.doc_id: r.cluster_id
        for r in dedup.connected_components(
            docs.select("doc_id"), pairs
        ).collect()
    }
    assert cc[1] == cc[2] == cc[3]  # dup member 2 transitively joins
    assert cc[4] != cc[1]


@pytest.fixture(scope="module")
def dupful_dir(tmp_path_factory):
    """A documents.parquet with exact-dup groups AND near-dups — the
    input shape the driver's dup-free fixtures never exercise."""
    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota lambda",
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine eleven",
        "совершенно другой текст на другом языке для разнообразия",
    ]
    rows = []
    doc_id = 0
    for rep in range(3):  # each base text appears 3× (exact dups)
        for t in base:
            rows.append(
                {
                    "doc_id": doc_id,
                    "text": t,
                    "lang": "en",
                    "source": f"src{doc_id % 2}",
                    "n_chars": len(t),
                }
            )
            doc_id += 1
    d = tmp_path_factory.mktemp("dupful")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "minhash_pairs",
        "simhash_near_dup",
        "ngram_jaccard",
        "near_dup_clusters",
        "cluster_representatives",
    ],
)
def test_dupful_oracle_parity(spark, dupful_dir, name):
    spec = REGISTRY[name]
    sdf = spec.build(spark, dupful_dir)
    srows = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{dupful_dir}/documents.parquet'"
    )
    drows = sorted(tuple(r) for r in con.execute(spec.oracle).fetchall())
    con.close()

    assert len(srows) > 0  # the dup-ful corpus must produce pairs
    assert srows == drows

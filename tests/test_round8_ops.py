"""Round-8 operators: exact-substring dedup (Lee et al. span removal)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_substring_dedup_removes_exactly_the_shared_run(spark):
    """Two docs share a 16-token verbatim run; everything else is
    unique. With span=15 the two dup 15-gram starts cover exactly the
    16 shared positions in each doc — surrounding unique context must
    survive, and the rebuilt text must equal the hand-computed
    survivor string."""
    from iceberg_diag_spark.operators.dedup import substring_dedup

    run = " ".join(f"s{i}" for i in range(16))
    a_pre, a_post = "a0 a1 a2", "a3 a4"
    b_pre, b_post = "b0", "b1 b2 b3"
    docs = spark.createDataFrame(
        [
            (1, f"{a_pre} {run} {a_post}"),
            (2, f"{b_pre} {run} {b_post}"),
            (3, "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in substring_dedup(docs, span=15).collect()
    }
    assert got[1]["n_tokens"] == 3 + 16 + 2
    assert got[1]["n_removed"] == 16
    assert got[1]["cleaned_md5"] == _md5(f"{a_pre} {a_post}")
    assert got[2]["n_tokens"] == 1 + 16 + 3
    assert got[2]["n_removed"] == 16
    assert got[2]["cleaned_md5"] == _md5(f"{b_pre} {b_post}")
    # unique doc: untouched
    assert got[3]["n_removed"] == 0
    assert got[3]["cleaned_md5"] == _md5(
        "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12 c13 c14 c15"
    )


def test_substring_dedup_full_doc_duplicate_empties_both(spark):
    """Exact duplicates at least span tokens long are wiped to the
    empty string (the paper removes every copy of a duplicated span —
    survivorship policy is a separate curation stage)."""
    from iceberg_diag_spark.operators.dedup import substring_dedup

    text = " ".join(f"t{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "short unique doc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in substring_dedup(docs, span=15).collect()
    }
    empty_md5 = _md5("")
    assert got[1]["n_removed"] == 20 and got[1]["cleaned_md5"] == empty_md5
    assert got[2]["n_removed"] == 20 and got[2]["cleaned_md5"] == empty_md5
    assert got[3]["n_removed"] == 0


def test_substring_dedup_short_docs_untouched(spark):
    """Docs shorter than span have no full-width gram and can never
    be covered — even verbatim copies of each other."""
    from iceberg_diag_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame(
        [(1, "same tiny doc"), (2, "same tiny doc")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in substring_dedup(docs, span=15).collect()
    }
    assert got[1]["n_removed"] == 0 and got[2]["n_removed"] == 0
    assert got[1]["cleaned_md5"] == _md5("same tiny doc")

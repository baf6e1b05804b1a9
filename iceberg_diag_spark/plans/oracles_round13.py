"""Round-13 registry entry: release_retraction_apply — the executing
sink that closes the reconcile loop (advisor-executing pattern #9):
release_neardup_reconcile NAMES the retraction candidates (doc_b, the
later batch of each cross-increment duplicate pair); this entry
APPLIES them — rewrites only the affected batch/shard files of the
written release and re-derives the per-batch manifest from what is
actually on disk.

Oracle style: the proven funnel chain per increment
(oracles_round12._batch_survivor_chain, parameterized to the release
pdata form so each increment yields its full per-doc release relation
— real md5 shards plus the packing recursion's per-doc group id),
the proven MinHash band-key chain over each survivor set
(oracles_round12._survivor_keys_cte), the pair probe collapsed to the
distinct doc_b retraction set, and a per-batch ledger aggregate with
the same bit_xor membership digests as _RELEASE_MANIFEST_SQL.

The per-doc group id (gid) comes from interval containment against
the pack recursion's boundaries (pbounds srn ranges in row-number
space) — the same fit-before-append partition the engine's
pack_assign_from_counts computes, so counting distinct
(shard, source, gid) among survivors equals the engine's
countDistinct(shard, source, seq_id) over the rewritten files.
"""

from __future__ import annotations

from iceberg_diag_spark.operators import funnel
from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_round12 import (
    _batch_survivor_chain,
    _survivor_keys_cte,
)

# The release pdata form (shard = md5 bucket % RELEASE_N_SHARDS=8 —
# sampling.hash_bucket's parse, identical to _RELEASE_MANIFEST_SQL).
_RELEASE_PDATA = (
    "  SELECT source,\n"
    "         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    "::BIGINT % 8 AS shard,\n"
    "         doc_id, n_tokens AS sz\n"
    "  FROM p4 WHERE s4"
)

# Extend the funnel chain past pgrp with the per-doc group mapping:
# each doc's rn (the pack order) lands in exactly one boundary
# interval [srn, next srn); the trailing overflow boundary (srn > mx)
# is dropped exactly as pgrp drops it.
_RELEASE_ROWS_FINAL = """, pband AS (
  SELECT b.source, b.shard, b.gid, b.srn,
         lead(b.srn) OVER (PARTITION BY b.source, b.shard ORDER BY b.gid) AS nsrn
  FROM pbounds b
  JOIN ptot t ON t.source = b.source AND t.shard = b.shard
            AND b.srn <= t.mx
),
prn AS (
  SELECT source, shard, doc_id, sz,
         row_number() OVER (PARTITION BY source, shard ORDER BY doc_id) AS rn
  FROM pdata
)
SELECT p.source, p.shard, p.doc_id, p.sz, b.gid
FROM prn p
JOIN pband b ON b.source = p.source AND b.shard = p.shard
            AND p.rn >= b.srn AND (b.nsrn IS NULL OR p.rn < b.nsrn)"""


def _batch_release_rows_chain(b: int) -> str:
    """Per-doc release relation for increment `b`: (source, shard,
    doc_id, sz, gid) — exactly the rows the batch=<b> directory
    holds, with gid the packed sequence the doc landed in."""
    return _batch_survivor_chain(
        b, pdata=_RELEASE_PDATA, final=_RELEASE_ROWS_FINAL
    )


_RETRACTION_SQL = (
    "WITH r0 AS MATERIALIZED (\n"
    + _batch_release_rows_chain(0)
    + "\n),\nr1 AS MATERIALIZED (\n"
    + _batch_release_rows_chain(1)
    + "\n),\ns0 AS MATERIALIZED (SELECT doc_id FROM r0),\n"
    "s1 AS MATERIALIZED (SELECT doc_id FROM r1),"
    + _survivor_keys_cte(0)
    + ","
    + _survivor_keys_cte(1)
    + """,
retr AS MATERIALIZED (
  SELECT DISTINCT b.doc_id AS doc_id
  FROM k0 a JOIN k1 b ON a.band = b.band AND a.band_key = b.band_key
),
led AS (
  SELECT 0 AS batch, source, shard, doc_id, sz, gid, FALSE AS rt
  FROM r0
  UNION ALL
  SELECT 1 AS batch, r.source, r.shard, r.doc_id, r.sz, r.gid,
         (t.doc_id IS NOT NULL) AS rt
  FROM r1 r LEFT JOIN retr t USING (doc_id)
)
SELECT CAST(batch AS BIGINT) AS batch,
       CAST(count(*) AS BIGINT) AS n_docs_before,
       CAST(count(*) FILTER (WHERE rt) AS BIGINT) AS n_retracted,
       CAST(count(*) FILTER (WHERE NOT rt) AS BIGINT) AS n_docs_after,
       CAST(count(DISTINCT CASE WHEN NOT rt THEN (shard, source, gid) END)
            AS BIGINT) AS n_seqs_after,
       CAST(sum(sz) AS BIGINT) AS n_tokens_before,
       CAST(coalesce(sum(sz) FILTER (WHERE rt), 0) AS BIGINT)
            AS n_tokens_retracted,
       CAST(coalesce(sum(sz) FILTER (WHERE NOT rt), 0) AS BIGINT)
            AS n_tokens_after,
       bit_xor(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
            FILTER (WHERE NOT rt) AS members_xor_after,
       bit_xor(('0x' || substring(md5('m2|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
            FILTER (WHERE NOT rt) AS members_xor2_after
FROM led
GROUP BY batch
ORDER BY batch
"""
)


def _release_retraction_apply(spark, sf_dir):
    """Build the same genuine 2-increment release as
    release_neardup_reconcile (the md5 doc-id bucket split), run the
    reconcile to get the cross-batch pairs, then EXECUTE the
    retraction against the written release and return the per-batch
    ledger re-derived from the rewritten files. Temp dirs removed
    after the result checkpoint (the ivf_probe_topk try/finally
    discipline)."""
    import shutil
    import tempfile

    from iceberg_diag_spark.plans.oracles_round12 import (
        build_release_increments,
    )

    docs = _t(spark, sf_dir, "documents")
    release = tempfile.mkdtemp(prefix="retraction_release_")
    sig = tempfile.mkdtemp(prefix="retraction_sig_")
    try:
        incs = build_release_increments(docs, release)
        pairs = funnel.release_neardup_reconcile(spark, incs, release, sig)
        # sig_path exercises the signature-store purge under the
        # driver (ledger values are release-derived, so the oracle is
        # unchanged by it)
        out = funnel.release_retraction_apply(
            spark, pairs, release, sig_path=sig
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(release, ignore_errors=True)
        shutil.rmtree(sig, ignore_errors=True)
    return out


REGISTRY.update({
    "release_retraction_apply": QuerySpec(
        _release_retraction_apply, _RETRACTION_SQL,
        "advisor-EXECUTING pattern #9 — APPLY the retraction "
        "release_neardup_reconcile names: every cross-batch pair's "
        "doc_b (the later, mutable-side batch) is removed from the "
        "written release surgically — only affected batch/shard "
        "directories are rewritten (dynamic partition overwrite; "
        "sibling shards never read, byte-untouched; fully-emptied "
        "shard dirs dropped via the Hadoop FS) — and the per-batch "
        "manifest (docs, surviving sequences, tokens, bit_xor "
        "membership digests) is re-derived FROM THE WRITTEN FILES "
        "(rewritten shards re-read from disk, untouched shards "
        "vouched by the pre-pass over the same bytes — the release "
        "is scanned exactly once); sig_path purges the retracted "
        "docs' reconcile signatures with the same surgical idiom so "
        "no later increment can pair against a doc that is gone; "
        "replay-idempotent: re-applying the same pairs retracts 0 "
        "and rewrites nothing",
    ),
})

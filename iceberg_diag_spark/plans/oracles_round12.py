"""Round-12 registry entries: the cross-increment near-dup
reconciliation the incremental release's scoping contract deferred
(funnel.release_neardup_reconcile — signatures persisted alongside
the shards, probed per increment), and the trained-classifier
DEPLOYMENT that closes the score/evaluate/train/apply loop
(textops.classifier_apply_trained).

Oracle style follows the family modules: the reconcile oracle runs
the proven funnel chain (oracles_round8._funnel_family_sql) once per
increment as a nested WITH RECURSIVE subchain scoped to that
increment's documents, then the proven MinHash band-key chain
(oracles_dedup._MINHASH_PAIRS_SQL's sig/keys idiom) over each
survivor set; the apply oracle chains the k-CTE training trajectory
(oracles_round11._train_lr_sql with carry=True) into a per-source
scoring aggregate.
"""

from __future__ import annotations

from iceberg_diag_spark.operators import funnel, textops
from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_round8 import _funnel_family_sql
from iceberg_diag_spark.plans.oracles_round11 import _train_lr_sql

# ------------------------------------------------------------------
# release_neardup_reconcile
# ------------------------------------------------------------------

# The increment split the registry entry uses: the same md5 bucket
# idiom as sampling.hash_bucket (and the release's own shard
# membership), at 2 buckets — deterministic, content-stable, and
# uniform, so near-dup pairs land cross-increment about half the
# time.
_BATCH_PRED = (
    "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
    " % 2 = {b}"
)


def _batch_survivor_chain(
    b: int,
    pdata: str = (
        "  SELECT source, 0 AS shard, doc_id, n_tokens AS sz\n"
        "  FROM p4 WHERE s4"
    ),
    final: str = "SELECT doc_id FROM p4 WHERE s4",
) -> str:
    """The full funnel chain (quality gate → exact dedup → CC
    near-dup collapse → holdout) scoped to increment `b`'s documents,
    as a standalone nested WITH RECURSIVE subquery yielding the
    released survivor ids — exactly what the batch=<b> release
    directory holds (the _RELEASE_MANIFEST_SQL-proven chain, with
    every `documents` reference rebound to the increment). `pdata`
    and `final` default to the reconcile entry's survivor-id form
    (rendered SQL byte-identical to the pre-parameter version,
    pinned in test_round13_ops); oracles_round13 overrides both to
    get the per-doc release relation (real md5 shards + packed
    seq/gid) for the retraction ledger."""
    inner = _funnel_family_sql(pdata=pdata, final=final)
    # rebind the three `documents` scans (fnorm, and the embedded
    # exact-collapse chash/rdocs) to the increment; the aliased form
    # first so the plain replace cannot corrupt it
    inner = inner.replace("FROM documents d JOIN", "FROM bdocs d JOIN")
    inner = inner.replace("FROM documents", "FROM bdocs")
    pred = _BATCH_PRED.format(b=b)
    return inner.replace(
        "WITH RECURSIVE fnorm",
        "WITH RECURSIVE bdocs AS MATERIALIZED (\n"
        f"  SELECT * FROM documents WHERE {pred}\n"
        "),\nfnorm",
        1,
    )


def _survivor_keys_cte(b: int) -> str:
    """Per-survivor MinHash band keys + normalized content hash for
    increment `b` — composes oracles_dedup._SIG_KEYS_CTES (the ONE
    definition of the 16-hash/4-band family, shared with
    _MINHASH_PAIRS_SQL so the two oracles cannot diverge) over the
    docs s{b} released. md5 here vs sha256 engine-side is
    equivalent: both sides only test content-hash EQUALITY."""
    from iceberg_diag_spark.plans.oracles_dedup import _SIG_KEYS_CTES

    return (
        rf"""
k{b} AS MATERIALIZED (
  WITH sdocs AS (
    SELECT d.doc_id,
           regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g') AS nt
    FROM documents d JOIN s{b} USING (doc_id)
  ),
  norm AS (
    SELECT doc_id, md5(nt) AS ch, string_split(nt, ' ') AS toks
    FROM sdocs
  ),
  eg AS (
    SELECT doc_id, unnest(
      CASE WHEN len(toks) >= 3 THEN
        list_distinct(list_transform(
          generate_series(0, greatest(len(toks) - 3, 0)),
          i -> array_to_string(toks[i + 1 : i + 3], ' ')))
      ELSE [] END) AS gram
    FROM norm
  ),
  """
        + _SIG_KEYS_CTES
        + """
  SELECT k.doc_id, k.band, k.band_key, n.ch
  FROM keys k JOIN norm n USING (doc_id)
)"""
    )


_RECONCILE_SQL = (
    "WITH s0 AS MATERIALIZED (\n"
    + _batch_survivor_chain(0)
    + "\n),\ns1 AS MATERIALIZED (\n"
    + _batch_survivor_chain(1)
    + "\n),"
    + _survivor_keys_cte(0)
    + ","
    + _survivor_keys_cte(1)
    + """
SELECT CAST(0 AS BIGINT) AS batch_a, CAST(a.doc_id AS BIGINT) AS doc_a,
       CAST(1 AS BIGINT) AS batch_b, CAST(b.doc_id AS BIGINT) AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_bands,
       max(a.ch = b.ch) AS exact_dup
FROM k0 a JOIN k1 b ON a.band = b.band AND a.band_key = b.band_key
GROUP BY doc_a, doc_b
ORDER BY doc_a, doc_b
"""
)


def build_release_increments(docs, release: str, batches=(0, 1)):
    """Build the md5-bucket increment releases CONCURRENTLY (one
    driver thread per batch — guide-§2.6 job overlap: each increment's
    funnel is a chain of short, eagerly-checkpointed stages that
    leaves most cores idle at every stage tail, and the two builds
    write disjoint batch=<b> directories, so overlapping them is pure
    wall-clock recovery with byte-identical outputs). Returns the
    ordered (batch_id, docs) list the reconcile consumes. Shared by
    release_neardup_reconcile and release_retraction_apply."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from iceberg_diag_spark.operators.sampling import hash_bucket
    from iceberg_diag_spark.sources.sinks import write_assigned_shards

    def _build(b: int):
        d = docs.filter(hash_bucket(F.col("doc_id"), 2) == b)
        asg = funnel.release_assignments(d)
        write_assigned_shards(
            asg,
            f"{release}/batch={b}",
            funnel.RELEASE_N_SHARDS,
            order_cols=("source", "seq_id", "doc_id"),
        )
        return (b, d)

    with ThreadPoolExecutor(max_workers=len(batches)) as pool:
        return list(pool.map(_build, batches))


def _release_neardup_reconcile(spark, sf_dir):
    """Build a genuine 2-increment release (the md5 doc-id bucket
    split), then reconcile it: per increment, persist the survivor
    band signatures alongside the shards and probe the accumulated
    store for cross-batch candidates. Temp dirs are removed after the
    result checkpoint (the ivf_probe_topk try/finally discipline)."""
    import shutil
    import tempfile

    docs = _t(spark, sf_dir, "documents")
    release = tempfile.mkdtemp(prefix="reconcile_release_")
    sig = tempfile.mkdtemp(prefix="reconcile_sig_")
    try:
        incs = build_release_increments(docs, release)
        out = funnel.release_neardup_reconcile(
            spark, incs, release, sig
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(release, ignore_errors=True)
        shutil.rmtree(sig, ignore_errors=True)
    return out


# ------------------------------------------------------------------
# classifier_apply_trained
# ------------------------------------------------------------------


def _classifier_apply_trained(spark, sf_dir):
    return textops.classifier_apply_trained(_t(spark, sf_dir, "documents"))


def _apply_trained_sql(k_steps: int = 12, lr_ppm: int = 2_000_000) -> str:
    """Training trajectory chain (carry=True rides source + the
    hand-set keep) ended with the deployment aggregate: score every
    doc with the step-k weights (integer sign test, no sigmoid) and
    fold the per-source keep/flip/agreement counts."""
    wcols = [f"w{j}" for j in range(6)]
    fcols = ["x0"] + [f"sx{j}" for j in range(1, 6)]
    zsum = " + ".join(f"{w_} * {x_}" for w_, x_ in zip(wcols, fcols))
    final = f"""SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN kt THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_trained,
       CAST(sum(CASE WHEN kh THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_handset,
       CAST(sum(CASE WHEN kt AND NOT kh THEN 1 ELSE 0 END) AS BIGINT) AS n_flip_to_keep,
       CAST(sum(CASE WHEN kh AND NOT kt THEN 1 ELSE 0 END) AS BIGINT) AS n_flip_to_drop,
       CAST(sum(CASE WHEN kt = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_agree_trained,
       CAST(sum(CASE WHEN kh = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_agree_handset
FROM (
  SELECT source, kh, y, ({zsum}) >= 0 AS kt FROM feat, w{k_steps}
)
GROUP BY source
ORDER BY source"""
    return _train_lr_sql(k_steps, lr_ppm, carry=True, final=final)


_APPLY_TRAINED_SQL = _apply_trained_sql()


REGISTRY.update({
    "release_neardup_reconcile": QuerySpec(
        _release_neardup_reconcile, _RECONCILE_SQL,
        "cross-increment near-dup reconciliation — closes the "
        "incremental release's scoping contract (per-increment dedup "
        "cannot see pairs split across increments): each increment's "
        "released survivors get their production MinHash band "
        "signatures + content hash PERSISTED alongside the shards "
        "(idempotent batch=<id> overwrite, byte-stable key-bucketed "
        "files), and each new increment probes the accumulated store "
        "— a bucketed (band, band_key) join of written files, never "
        "all-pairs, never a re-read of prior increments' text; exact "
        "cross-batch dups surface with all bands shared and "
        "exact_dup=true via the persisted hash; doc_b (the later "
        "batch) is the retraction candidate",
    ),
    "classifier_apply_trained": QuerySpec(
        _classifier_apply_trained, _APPLY_TRAINED_SQL,
        "advisor-EXECUTING pattern #8 — DEPLOY the trained "
        "classifier: scores every doc with classifier_train_lr's "
        "step-12 weights (exact integer sign test over the "
        "standardized features, zero extra corpus scans — the "
        "hand-set decision rides the same feature scan) and reports "
        "per source the keep/drop delta vs the production hand-set "
        "gate plus each rule's agreement with the curation-gate "
        "label — the relation a curation owner reads before swapping "
        "the gate; moves the trained-vs-handset comparison from "
        "pytest into an oracled relation",
    ),
})

"""Round-14 registry entry: diag_compaction_apply — the executing
compaction that closes the reference-core loop (advisor-executing
pattern #10): the diagnostics SIMULATE the 750 MiB
check-before-append remediation (``table_metrics.py:111-155,179-197``
→ ``operators/diagnostics.py``); this entry EXECUTES that exact
group plan against a real fragmented layout and re-derives the
after-state from the written files.

Oracle style: the fragmented layout is a deterministic projection of
lineitem (partition = l_returnflag, file = md5 bucket of the row key,
logical size = floor(extendedprice*8) — the files_from_lineitem
scaling idiom), so every ledger column the engine MEASURES from disk
(real post-write file counts via input_file_name, re-read rows and
re-aggregated membership digests) is predictable in SQL: per-file
sums feed the proven bin-pack boundary recursion
(oracles_diag._binpack_cte), and a hash-green row certifies the
physical rewrite — one file per planned group, no row lost, no
partition touched that the plan left alone — not just the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_diag import _binpack_cte

# Fragmentation of the before-layout: md5-bucket rows into this many
# files per partition. 192 keeps per-file logical sizes under the
# 750 MiB cap at every driver scale factor (sf0.1's largest
# partition ≈ 92 GB logical → ~480 MB files), so the pack plan stays
# non-degenerate (multiple files per group) from sf0.001 to sf0.1.
COMPACTION_FRAG_FILES = 192

_COMPACTION_READ_SCHEMA = (
    "row_key string, row_bytes long, file_id long, partition_key string"
)

_ROW_KEY_SQL = (
    "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)"
)

_COMPACTION_SQL = f"""
WITH RECURSIVE rws AS MATERIALIZED (
  SELECT l_returnflag AS partition_key,
         ('0x' || substring(md5({_ROW_KEY_SQL}), 1, 8))::BIGINT
           % {COMPACTION_FRAG_FILES} AS file_id,
         {_ROW_KEY_SQL} AS row_key,
         CAST(FLOOR(l_extendedprice * 8) AS BIGINT) AS row_bytes
  FROM lineitem
),
per_file AS MATERIALIZED (
  SELECT partition_key, file_id,
         count(*) AS n_rows, sum(row_bytes) AS fsz
  FROM rws GROUP BY partition_key, file_id
),
files AS (
  SELECT partition_key, fsz AS file_size_in_bytes, 0 AS content
  FROM per_file
),
{_binpack_cte(["partition_key"])},
planp AS (
  SELECT partition_key,
         count(*) AS groups_planned,
         sum(gsz // 33554432 + 2) AS overhead_planned
  FROM grp GROUP BY partition_key
),
befp AS (
  SELECT partition_key,
         count(*) AS files_before,
         sum(n_rows) AS rows_before,
         sum(fsz) AS size_before,
         sum(fsz // 33554432 + 2) AS overhead_before
  FROM per_file GROUP BY partition_key
),
dig AS (
  SELECT partition_key,
         bit_xor(('0x' || substring(md5(row_key), 1, 15))::BIGINT) AS mx1,
         bit_xor(('0x' || substring(md5('m2|' || row_key), 1, 15))::BIGINT)
           AS mx2
  FROM rws GROUP BY partition_key
)
SELECT b.partition_key,
       CAST(b.files_before AS BIGINT) AS files_before,
       CAST(b.rows_before AS BIGINT) AS rows_before,
       CAST(b.size_before AS BIGINT) AS size_before,
       CAST(b.overhead_before AS BIGINT) AS scan_overhead_before,
       CAST(p.groups_planned AS BIGINT) AS groups_planned,
       CAST(p.overhead_planned AS BIGINT) AS scan_overhead_planned,
       (p.groups_planned < b.files_before) AS compacted,
       CAST(CASE WHEN p.groups_planned < b.files_before
                 THEN p.groups_planned ELSE b.files_before END
            AS BIGINT) AS files_after,
       CAST(b.rows_before AS BIGINT) AS rows_after,
       CAST(b.size_before AS BIGINT) AS size_after,
       CAST(CASE WHEN p.groups_planned < b.files_before
                 THEN p.overhead_planned ELSE b.overhead_before END
            AS BIGINT) AS scan_overhead_after,
       d.mx1 AS members_xor_after,
       d.mx2 AS members_xor2_after
FROM befp b
JOIN planp p USING (partition_key)
JOIN dig d USING (partition_key)
ORDER BY partition_key
"""


def compaction_rows(spark, sf_dir):
    """The deterministic fragmented-layout projection of lineitem:
    (partition_key, file_id, row_key, row_bytes)."""
    from iceberg_diag_spark.operators.sampling import hash_bucket

    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return li.select(
        F.col("l_returnflag").alias("partition_key"),
        hash_bucket(key, COMPACTION_FRAG_FILES).cast("long").alias("file_id"),
        key.alias("row_key"),
        (F.col("l_extendedprice") * 8).cast("long").alias("row_bytes"),
    )


def _diag_compaction_apply(spark, sf_dir):
    """Write the fragmented layout (one real parquet file per
    (partition, file_id) — the repartition-on-the-leaf-key write
    discipline), EXECUTE the bin-pack compaction against it, and
    return the per-partition predicted-vs-measured ledger. Temp dir
    removed after the result checkpoint (the ivf_probe_topk
    try/finally discipline)."""
    import shutil
    import tempfile

    from iceberg_diag_spark.operators.compaction import (
        compact_apply_binpack,
    )

    rows = compaction_rows(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="compaction_apply_")
    try:
        (
            rows.repartition(32, "partition_key", "file_id")
            .sortWithinPartitions("partition_key", "file_id", "row_key")
            .write.mode("overwrite")
            .partitionBy("partition_key", "file_id")
            .parquet(tmp)
        )
        out = compact_apply_binpack(
            spark,
            tmp,
            read_schema=_COMPACTION_READ_SCHEMA,
            row_size=F.col("row_bytes"),
            key=F.col("row_key"),
            order_cols=("row_key",),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------
# diag_clustering_apply — the sort-order twin of the compaction sink:
# clustering_advisor names the column, diag_skip_simulation prices the
# rewrite; this entry EXECUTES exactly the layout the simulation
# models (global value order, fixed rows per file) and measures the
# skipping stats from the written files' min/max bounds.
# --------------------------------------------------------------------

# Arrival-order fragmentation of the before-layout (orderkey chunks —
# the file_column_stats_from_lineitem idiom, coarsened so the layout
# stays a few hundred physical files at sf0.1).
CLUSTER_FRAG_ORDERKEYS = 1024
# Post-rewrite chunking: the simulation's rows-per-file model IS the
# written layout, so prediction and measurement share one parameter.
CLUSTER_ROWS_PER_FILE = 4096

_CLUSTER_READ_SCHEMA = "row_key string, v long, file_id long"

_SWEEP_SQL = """
  SELECT CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(depth) AS BIGINT) AS op,
         CAST(max(depth) + 1 AS BIGINT) AS md,
         CAST(floor(1000000.0 * sum(depth + 1) / (count(*) * count(*)))
              AS BIGINT) AS ad
  FROM (
    SELECT prev_starts - ends_lt AS depth
    FROM (
      SELECT typ,
             COALESCE(SUM(typ) OVER w, 0) AS ends_lt,
             COALESCE(SUM(1 - typ) OVER w, 0) AS prev_starts
      FROM (
        SELECT lo AS value, 0 AS typ, file_id FROM {bounds}
        UNION ALL
        SELECT hi, 1, file_id FROM {bounds}
      )
      WINDOW w AS (ORDER BY value, typ, file_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ) WHERE typ = 0
  )
"""

_CLUSTERING_APPLY_SQL = f"""
WITH rws AS MATERIALIZED (
  SELECT {_ROW_KEY_SQL} AS row_key,
         CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
              AS BIGINT) AS v,
         CAST(l_orderkey // {CLUSTER_FRAG_ORDERKEYS} AS BIGINT) AS file_id
  FROM lineitem
),
bbnd AS MATERIALIZED (
  SELECT file_id, min(v) AS lo, max(v) AS hi FROM rws GROUP BY file_id
),
abnd AS MATERIALIZED (
  SELECT (r - 1) // {CLUSTER_ROWS_PER_FILE} AS file_id,
         min(v) AS lo, max(v) AS hi
  FROM (SELECT v, row_number() OVER (ORDER BY v, row_key) AS r FROM rws)
  GROUP BY 1
),
bef AS ({_SWEEP_SQL.format(bounds="bbnd")}),
aft AS ({_SWEEP_SQL.format(bounds="abnd")}),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         bit_xor(('0x' || substring(md5(row_key), 1, 15))::BIGINT) AS mx1,
         bit_xor(('0x' || substring(md5('m2|' || row_key), 1, 15))::BIGINT)
           AS mx2
  FROM rws
)
SELECT bef.n_files AS files_before,
       tot.n_rows AS rows_before,
       bef.op AS overlap_pairs_before,
       bef.md AS max_depth_before,
       bef.ad AS avg_depth_ppm_before,
       aft.n_files AS files_planned,
       aft.op AS overlap_pairs_planned,
       aft.md AS max_depth_planned,
       aft.ad AS avg_depth_ppm_planned,
       aft.n_files AS files_after,
       tot.n_rows AS rows_after,
       aft.op AS overlap_pairs_after,
       aft.md AS max_depth_after,
       aft.ad AS avg_depth_ppm_after,
       tot.mx1 AS members_xor_after,
       tot.mx2 AS members_xor2_after
FROM bef, aft, tot
"""


def cluster_rows(spark, sf_dir):
    """The deterministic arrival-order layout projection of lineitem:
    (row_key, v = ship_day, file_id = orderkey chunk)."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    return li.select(
        key.alias("row_key"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.lit("1992-01-01").cast("date"),
        )
        .cast("long")
        .alias("v"),
        F.floor(F.col("l_orderkey") / CLUSTER_FRAG_ORDERKEYS)
        .cast("long")
        .alias("file_id"),
    )


def _diag_clustering_apply(spark, sf_dir):
    """Write the arrival-order layout (one real parquet file per
    orderkey chunk), EXECUTE the sorted rewrite the skip simulation
    models, and return the one-row predicted-vs-measured skipping
    ledger. Temp dir removed after the result checkpoint."""
    import shutil
    import tempfile

    from iceberg_diag_spark.operators.compaction import (
        cluster_apply_sorted,
    )

    rows = cluster_rows(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="clustering_apply_")
    try:
        (
            rows.repartition(32, "file_id")
            .sortWithinPartitions("file_id", "v", "row_key")
            .write.mode("overwrite")
            .partitionBy("file_id")
            .parquet(tmp)
        )
        out = cluster_apply_sorted(
            spark,
            tmp,
            read_schema=_CLUSTER_READ_SCHEMA,
            value_col="v",
            key_col="row_key",
            rows_per_file=CLUSTER_ROWS_PER_FILE,
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


REGISTRY.update({
    "diag_clustering_apply": QuerySpec(
        _diag_clustering_apply, _CLUSTERING_APPLY_SQL,
        "advisor-EXECUTING pattern #11 — the sort-order twin of "
        "diag_compaction_apply: clustering_advisor names the column, "
        "diag_skip_simulation prices the rewrite with a closed form; "
        "this entry EXECUTES exactly the layout that form models "
        "(global ship-day order via distributed ranking — "
        "grouped_prefix_sum + per-value row_number, no single-task "
        "window — chunked rows_per_file per physical file, dynamic "
        "partition overwrite + stale-leaf drop) against a real "
        "arrival-order fragmented parquet layout, then MEASURES the "
        "skipping stats from the written files' min/max bounds with "
        "the same endpoint sweep the advisor uses: a hash-green row "
        "certifies predicted-after == measured-after overlap "
        "pairs/max depth/avg depth (and that rows and membership "
        "digests survived the rewrite), not just the simulation",
    ),
    "diag_compaction_apply": QuerySpec(
        _diag_compaction_apply, _COMPACTION_SQL,
        "advisor-EXECUTING pattern #10 — run the reference's own "
        "remediation instead of only pricing it: fragment lineitem "
        "into a real one-file-per-(partition, file_id) parquet "
        "layout, bin-pack the per-file sizes with the EXACT 750 MiB "
        "check-before-append fold the diagnostics simulate "
        "(binpack.py pack_sizes semantics, (size, file_id) "
        "tie-break), rewrite each partition one-physical-file-per-"
        "group (partitions whose plan shows no reduction stay "
        "byte-untouched — surgical, the retraction discipline), and "
        "re-derive the after-state FROM THE WRITTEN FILES: "
        "files_after counts real post-write files, rows/bytes/"
        "membership-digests are re-aggregated from the rewritten "
        "bytes, so the hash-green row certifies predicted-after == "
        "measured-after, not just the plan",
    ),
})

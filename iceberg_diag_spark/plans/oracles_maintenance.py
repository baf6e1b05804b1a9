"""Table-maintenance diagnostics (operators/maintenance.py).

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from iceberg_diag_spark.operators import (
    maintenance,
)
from iceberg_diag_spark.sources.data_files import (
    column_values_from_lineitem,
    file_column_stats_from_lineitem,
    files_from_lineitem,
)
from iceberg_diag_spark.plans.common import FILES_CTE, QuerySpec, REGISTRY, _t


# Table-maintenance diagnostics (operators/maintenance.py): the
# remediations beyond the reference's bin-pack compaction model —
# rewrite-deletes, remove-orphan-files, expire-snapshots, and
# z-order rewrite planning — over the same data_files proxy.
# --------------------------------------------------------------------

def _diag_delete_impact(spark, sf_dir):
    files = files_from_lineitem(_t(spark, sf_dir, "lineitem"))
    return maintenance.delete_impact(files)


_DIAG_DELETE_IMPACT_SQL = f"""
WITH files AS ({FILES_CTE})
SELECT partition_key,
       CAST(sum(CASE WHEN content = 0 THEN 1 ELSE 0 END) AS BIGINT) AS data_files,
       CAST(coalesce(sum(CASE WHEN content = 0 THEN file_size_in_bytes END), 0) AS BIGINT) AS data_bytes,
       CAST(sum(CASE WHEN content = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos_delete_files,
       CAST(coalesce(sum(CASE WHEN content = 1 THEN file_size_in_bytes END), 0) AS BIGINT) AS pos_delete_bytes,
       CAST(sum(CASE WHEN content = 2 THEN 1 ELSE 0 END) AS BIGINT) AS eq_delete_files,
       CAST(coalesce(sum(CASE WHEN content = 2 THEN file_size_in_bytes END), 0) AS BIGINT) AS eq_delete_bytes,
       CAST(sum(file_size_in_bytes // 33554432 + 2) AS BIGINT) AS rewrite_read_cost,
       CASE WHEN sum(CASE WHEN content = 0 THEN 1 ELSE 0 END) = 0 THEN CAST(-1 AS BIGINT)
            ELSE CAST(FLOOR(sum(CASE WHEN content IN (1, 2) THEN 1 ELSE 0 END) * 1000000.0
                            / sum(CASE WHEN content = 0 THEN 1 ELSE 0 END)) AS BIGINT)
       END AS delete_per_data_ppm
FROM files
GROUP BY partition_key
"""


def _diag_orphan_files(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    path = F.concat_ws("-", "l_orderkey", "l_linenumber")
    listed = li.select(
        path.alias("file_path"),
        F.col("l_returnflag").alias("partition_key"),
        (F.col("l_extendedprice") * 1000).cast("long").alias("file_size_in_bytes"),
    )
    referenced = li.filter(
        (F.col("l_orderkey") + F.col("l_linenumber")) % 11 != 0
    ).select(path.alias("file_path"))
    return maintenance.orphan_files(listed, referenced)


_DIAG_ORPHAN_SQL = """
WITH listed AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS file_path,
         l_returnflag AS partition_key,
         CAST(FLOOR(l_extendedprice * 1000) AS BIGINT) AS file_size_in_bytes
  FROM lineitem
),
refs AS (
  SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS file_path
  FROM lineitem WHERE (l_orderkey + l_linenumber) % 11 <> 0
),
j AS (
  SELECT l.partition_key, l.file_size_in_bytes,
         CASE WHEN r.file_path IS NULL THEN 1 ELSE 0 END AS orph
  FROM listed l LEFT JOIN refs r ON l.file_path = r.file_path
)
SELECT partition_key,
       CAST(count(*) AS BIGINT) AS listed_files,
       CAST(sum(file_size_in_bytes) AS BIGINT) AS listed_bytes,
       CAST(sum(orph) AS BIGINT) AS orphan_files,
       CAST(coalesce(sum(CASE WHEN orph = 1 THEN file_size_in_bytes END), 0) AS BIGINT) AS orphan_bytes,
       CAST(FLOOR(sum(orph) * 1000000.0 / count(*)) AS BIGINT) AS orphan_ppm
FROM j
GROUP BY partition_key
"""


def _diag_snapshot_retention(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    files = li.select(
        F.col("l_returnflag").alias("partition_key"),
        (F.col("l_extendedprice") * 1000).cast("long").alias("file_size_in_bytes"),
        (F.col("l_linenumber") % 3).cast("int").alias("content"),
        F.col("l_shipdate").alias("added_at"),
    )
    return maintenance.snapshot_retention(files, retention_days=180)


_DIAG_RETENTION_SQL = """
WITH files AS (
  SELECT l_returnflag AS partition_key,
         CAST(FLOOR(l_extendedprice * 1000) AS BIGINT) AS file_size_in_bytes,
         CAST(l_linenumber % 3 AS INTEGER) AS content,
         l_shipdate AS added_at
  FROM lineitem
),
c AS (SELECT max(added_at) - INTERVAL 180 DAY AS cutoff FROM files)
SELECT partition_key,
       CAST(sum(CASE WHEN added_at < cutoff THEN 1 ELSE 0 END) AS BIGINT) AS expired_files,
       CAST(coalesce(sum(CASE WHEN added_at < cutoff THEN file_size_in_bytes END), 0) AS BIGINT) AS expired_bytes,
       CAST(sum(CASE WHEN added_at < cutoff AND content <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS reclaimable_files,
       CAST(coalesce(sum(CASE WHEN added_at < cutoff AND content <> 0 THEN file_size_in_bytes END), 0) AS BIGINT) AS reclaimable_bytes,
       CAST(sum(file_size_in_bytes)
            - coalesce(sum(CASE WHEN added_at < cutoff AND content <> 0 THEN file_size_in_bytes END), 0) AS BIGINT) AS retained_bytes,
       CAST(count(DISTINCT CASE WHEN added_at < cutoff THEN date_trunc('month', added_at) END) AS BIGINT) AS expired_months
FROM files CROSS JOIN c
GROUP BY partition_key
"""


def _diag_zorder_layout(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    files = li.select(
        (F.col("l_partkey") % 256).cast("int").alias("x"),
        (F.col("l_suppkey") % 256).cast("int").alias("y"),
        (F.col("l_extendedprice") * 1000).cast("long").alias("file_size_in_bytes"),
    )
    return maintenance.zorder_layout(files)


_DIAG_ZORDER_SQL = f"""
WITH files AS (
  SELECT CAST(l_partkey % 256 AS INTEGER) AS x,
         CAST(l_suppkey % 256 AS INTEGER) AS y,
         CAST(FLOOR(l_extendedprice * 1000) AS BIGINT) AS file_size_in_bytes
  FROM lineitem
),
z AS (
  SELECT x, y, file_size_in_bytes,
         CAST({maintenance.morton_sql('x', 'y')} AS BIGINT) AS z
  FROM files
)
SELECT CAST(z // 1024 AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS file_count,
       CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes,
       CAST(min(z) AS BIGINT) AS min_z,
       CAST(max(z) AS BIGINT) AS max_z,
       CAST(min(x) AS BIGINT) AS min_x,
       CAST(max(x) AS BIGINT) AS max_x,
       CAST(min(y) AS BIGINT) AS min_y,
       CAST(max(y) AS BIGINT) AS max_y
FROM z
GROUP BY zbucket
"""


REGISTRY.update({
    "diag_delete_impact": QuerySpec(
        _diag_delete_impact, _DIAG_DELETE_IMPACT_SQL,
        "per-partition delete-file burden (position/equality split, "
        "deletes-per-data ppm, merge-rewrite read cost) — the "
        "rewrite-deletes remediation signal",
    ),
    "diag_orphan_files": QuerySpec(
        _diag_orphan_files, _DIAG_ORPHAN_SQL,
        "orphan-file detection: storage listing anti metadata "
        "references via one left join on unique file_path, per-"
        "partition reclaimable bytes",
    ),
    "diag_snapshot_retention": QuerySpec(
        _diag_snapshot_retention, _DIAG_RETENTION_SQL,
        "expire-snapshots simulation: retention-cutoff scalar "
        "broadcast back, per-partition reclaimable delete bytes and "
        "expired snapshot months",
    ),
    "diag_zorder_layout": QuerySpec(
        _diag_zorder_layout, _DIAG_ZORDER_SQL,
        "z-order rewrite planning: Morton-interleave clustering key "
        "(pure shift/mask codegen), per-bucket file stats and "
        "dimension spans",
    ),
})


# --------------------------------------------------------------------

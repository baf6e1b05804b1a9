"""Iceberg table-diagnostics metrics as a Spark DataFrame pipeline.

Re-expresses the reference aggregation engine
(``icebergdiag/metrics/table_metrics.py:46-155``) Spark-first:

  files ──one exchange──► fused applyInPandas: BEFORE stats +
         bin-pack + AFTER stats, one row per partition   (A1, A8/A9)
  ──single agg──► all 9 global metrics                   (A2-A7, A10)
  unpivot ──► 9-row metric table with improvement        (A11)

Scale notes (100 TB):
- The input relation is Iceberg *metadata* (one row per data file):
  even a 100 TB table is ~1e6-1e8 rows — comfortably shuffle-able.
  Both groupBys shuffle on the same key (partition value), and AQE
  coalesces the tiny post-agg exchanges.
- Per-partition stats are one row per partition; the final global agg
  is a single reduce — no driver-side loops, no collect_list of sizes
  (the pandas fold streams each group's rows once and emits
  per-group aggregates, not file lists).
- The only Python is the sequential bin-pack fold (see binpack.py).

Metric semantics pinned by tests/test_diagnostics_golden.py, derived
from the reference unit test (tests/test_metric_calculator.py:46-91).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from iceberg_diag_spark.functions.cost import (
    CONTENT_DATA,
    FETCH_SIZE,
    MAX_GROUP_BYTE_SIZE,
    MILLISECONDS_PER_SCAN,
    scan_overhead_ms,
)
from iceberg_diag_spark.operators.binpack import pack_group_stats

# Display order + reference display names (table_metric.py:9-18).
METRICS = [
    ("FULL_SCAN_OVERHEAD", "Full Scan Overhead"),
    ("WORST_SCAN_OVERHEAD", "Worst Partition Scan Overhead"),
    ("FILE_COUNT", "Total File Count"),
    ("WORST_FILE_COUNT", "Worst Partition File Count"),
    ("AVG_FILE_SIZE", "Avg Data File Size"),
    ("WORST_AVG_FILE_SIZE", "Worst Partition Avg Data File Size"),
    ("TOTAL_TABLE_SIZE", "Total Table Size"),
    ("LARGEST_PARTITION_SIZE", "Largest Partition Size"),
    ("TOTAL_PARTITIONS", "Total Partitions"),
]


def partition_stats(
    files: DataFrame,
    partition_col: str = "partition_key",
    size_col: str = "file_size_in_bytes",
    content_col: str = "content",
) -> DataFrame:
    """Per-partition BEFORE aggregates — one shuffle, map-side combine.

    Columns out: partition_key, file_count, total_size, scan_overhead,
    data_file_count, data_size. Matches the reference single-pass
    accumulator (table_metrics.py:56-74): counts/sizes/overhead include
    ALL content kinds; data_* are DATA-only (content == 0).
    """
    size = F.col(size_col)
    is_data = F.col(content_col) == CONTENT_DATA
    return files.groupBy(F.col(partition_col).alias("partition_key")).agg(
        F.count("*").alias("file_count"),
        F.sum(size).alias("total_size"),
        F.sum(scan_overhead_ms(size)).alias("scan_overhead"),
        F.sum(F.when(is_data, 1).otherwise(0)).alias("data_file_count"),
        F.coalesce(F.sum(F.when(is_data, size)), F.lit(0)).alias("data_size"),
    )


_PART_AFTER_SCHEMA = (
    "partition_key string, file_count long, total_size long,"
    " scan_overhead long, data_file_count long, data_size long,"
    " after_file_count long, after_scan_overhead long"
)


def partition_stats_with_after(
    files: DataFrame,
    partition_col: str = "partition_key",
    size_col: str = "file_size_in_bytes",
    content_col: str = "content",
    table_col: str | None = None,
) -> DataFrame:
    """BEFORE stats fused with simulated-compaction AFTER stats.

    AFTER per partition (table_metrics.py:136-141): bin-pack DATA file
    sizes; after_file_count = number of groups; after_scan_overhead =
    sum over groups of read_cost(group_total) * 1ms. Partitions whose
    files are all deletes get 0 groups (reference packs an empty list).

    Plan shape: ONE scan → ONE exchange on the partition key → one
    grouped-map pass computing both BEFORE aggregates (vectorized
    numpy sums) and the pack simulation. Round 1 ran BEFORE and AFTER
    as separate relational branches; Catalyst pushes filters/pruning
    through the shared repartition, so the branches never reuse the
    exchange and the source was scanned (and shuffled) twice — the
    dominant cost in the round-1 bench. Fusing halves the I/O and
    removes the before↔after join entirely. The pack fold itself is
    O(#groups · log n) via prefix sums + searchsorted rather than a
    per-row Python loop (semantics pinned against pack_sizes by
    tests/test_binpack.py and the golden suite).

    Output: one row per partition — (partition_key, file_count,
    total_size, scan_overhead, data_file_count, data_size,
    after_file_count, after_scan_overhead). With table_col set, the
    group key is (table, partition) and the table column is carried
    through — the multi-table single-job path (SURVEY §2 X1: the
    reference fans a thread pool across tables; here every table's
    metadata is one unioned relation and Spark schedules all tables'
    partitions as one job).
    """
    import numpy as np
    import pandas as pd

    fetch = FETCH_SIZE
    cap = MAX_GROUP_BYTE_SIZE
    ms = MILLISECONDS_PER_SCAN
    group_cols = ([table_col] if table_col else []) + [partition_col]

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        sizes = pdf[size_col].to_numpy(dtype="int64")
        content = pdf[content_col].to_numpy()
        file_count = int(sizes.size)
        total_size = int(sizes.sum())
        scan_overhead = int((sizes // fetch + 2).sum()) * ms
        data = sizes[content == CONTENT_DATA]
        dfc = int(data.size)
        dsz = int(data.sum())
        groups, cost = pack_group_stats(data, cap)
        aoh = cost * ms
        key_vals = [pdf[c].iloc[0] for c in group_cols]
        return pd.DataFrame(
            [
                key_vals
                + [
                    file_count,
                    total_size,
                    scan_overhead,
                    dfc,
                    dsz,
                    groups,
                    aoh,
                ]
            ],
            columns=(
                ([table_col] if table_col else [])
                + [
                    "partition_key",
                    "file_count",
                    "total_size",
                    "scan_overhead",
                    "data_file_count",
                    "data_size",
                    "after_file_count",
                    "after_scan_overhead",
                ]
            ),
        )

    schema = _PART_AFTER_SCHEMA
    if table_col:
        schema = f"{table_col} string, " + schema
    cols = files.select(
        *[F.col(c) for c in group_cols],
        F.col(size_col),
        F.col(content_col),
    )
    return cols.groupBy(*group_cols).applyInPandas(_stats, schema=schema)


def _aggregate_per_part(per_part: DataFrame, group_cols: list[str]) -> DataFrame:
    """Second-level aggregation over per-partition rows (A2-A7 + the
    A10 argmax), optionally grouped by table for the multi-table
    single-job path. The manifest term of FULL_SCAN_OVERHEAD is added
    by the caller (it is per-table external state, not derivable from
    the files relation).

    Argmax by reduction (A10, table_metrics.py:134-153): track the
    partition with max (before - after) reduction; only reductions
    strictly > 0 qualify (initial max is 0). max() over a struct
    orders lexicographically — reduction first — so one aggregate
    replaces the reference's sequential scan. Ties: the reference
    takes first-seen (dict order); we break by larger before value,
    deterministic under any partitioning.
    """
    fc_red = F.col("file_count") - F.col("after_file_count")
    oh_red = F.col("scan_overhead") - F.col("after_scan_overhead")

    base = per_part.groupBy(*group_cols) if group_cols else per_part
    return base.agg(
        F.coalesce(F.sum("file_count"), F.lit(0)).alias("file_count"),
        F.coalesce(F.sum("total_size"), F.lit(0)).alias("total_size"),
        F.coalesce(F.sum("scan_overhead"), F.lit(0)).alias("scan_overhead_sum"),
        F.coalesce(F.sum("data_file_count"), F.lit(0)).alias("data_file_count"),
        F.coalesce(F.sum("data_size"), F.lit(0)).alias("data_size"),
        F.count("*").alias("total_partitions"),
        # worst = min per-partition average over ALL files (deletes
        # included — PartitionMetrics.average_file_size, :32-34).
        F.coalesce(
            F.min(F.col("total_size") / F.col("file_count")), F.lit(0.0)
        ).alias("worst_avg_file_size"),
        F.coalesce(F.max("total_size"), F.lit(0)).alias("largest_partition_size"),
        F.coalesce(F.sum("after_file_count"), F.lit(0)).alias("after_file_count"),
        F.coalesce(F.sum("after_scan_overhead"), F.lit(0)).alias(
            "after_full_scan_overhead"
        ),
        F.max(
            F.when(
                fc_red > 0,
                F.struct(
                    fc_red.alias("red"),
                    F.col("file_count").alias("before"),
                    F.col("after_file_count").alias("after"),
                ),
            )
        ).alias("worst_fc"),
        F.max(
            F.when(
                oh_red > 0,
                F.struct(
                    oh_red.alias("red"),
                    F.col("scan_overhead").alias("before"),
                    F.col("after_scan_overhead").alias("after"),
                ),
            )
        ).alias("worst_oh"),
    )

def _nine_metric_rows(g: DataFrame, key_cols: list[str]) -> DataFrame:
    """Unpivot the aggregated stats (with full_scan_overhead already
    including the manifest term) into the 9-row metric layout, with
    improvement (A11). key_cols pass through (empty for single-table,
    ["table_name"] for the multi-table job)."""
    g = g.select(
        "*",
        (F.col("data_size") / F.col("data_file_count")).alias("_avg_raw"),
        F.coalesce(F.col("worst_fc.before"), F.lit(0)).alias("worst_file_count"),
        F.coalesce(F.col("worst_fc.after"), F.lit(0)).alias("after_worst_file_count"),
        F.coalesce(F.col("worst_oh.before"), F.lit(0)).alias("worst_scan_overhead"),
        F.coalesce(F.col("worst_oh.after"), F.lit(0)).alias(
            "after_worst_scan_overhead"
        ),
    ).withColumn(
        "avg_file_size",
        F.when(F.col("data_file_count") > 0, F.col("_avg_raw")).otherwise(F.lit(0.0)),
    )

    # Unpivot to the 9-row metric layout. Metrics without a local-mode
    # "after" (table_metric.py:86-96) carry NULL after → NULL improvement.
    pairs = []
    after_map = {
        "FULL_SCAN_OVERHEAD": "after_full_scan_overhead",
        "WORST_SCAN_OVERHEAD": "after_worst_scan_overhead",
        "FILE_COUNT": "after_file_count",
        "WORST_FILE_COUNT": "after_worst_file_count",
    }
    before_map = {
        "FULL_SCAN_OVERHEAD": "full_scan_overhead",
        "WORST_SCAN_OVERHEAD": "worst_scan_overhead",
        "FILE_COUNT": "file_count",
        "WORST_FILE_COUNT": "worst_file_count",
        "AVG_FILE_SIZE": "avg_file_size",
        "WORST_AVG_FILE_SIZE": "worst_avg_file_size",
        "TOTAL_TABLE_SIZE": "total_size",
        "LARGEST_PARTITION_SIZE": "largest_partition_size",
        "TOTAL_PARTITIONS": "total_partitions",
    }
    for ordinal, (key, _display) in enumerate(METRICS):
        before = F.col(before_map[key]).cast("double")
        after = (
            F.col(after_map[key]).cast("double")
            if key in after_map
            else F.lit(None).cast("double")
        )
        pairs.append(
            F.struct(
                F.lit(key).alias("metric"),
                F.lit(ordinal).alias("ordinal"),
                before.alias("before"),
                after.alias("after"),
            )
        )

    rows = g.select(
        *key_cols, F.explode(F.array(*pairs)).alias("m")
    ).select(*key_cols, "m.*")

    # Improvement (A11, table_metric.py:67-70): (1 - after/before)*100;
    # 0 when both are 0; +inf when before is 0 but after isn't; NULL
    # when there is no after value.
    improvement = (
        F.when(F.col("after").isNull(), F.lit(None).cast("double"))
        .when((F.col("before") == 0) & (F.col("after") == 0), F.lit(0.0))
        .when(F.col("before") == 0, F.lit(float("inf")))
        .otherwise((F.lit(1.0) - F.col("after") / F.col("before")) * 100.0)
    )
    return rows.withColumn("improvement", improvement).orderBy(
        *key_cols, "ordinal"
    )


def table_metrics(files: DataFrame, manifest_files_count: int = 0) -> DataFrame:
    """The flagship diagnostics query: 9 metrics with before / after /
    improvement, exactly matching the reference's local mode.

    Output: (metric string, ordinal int, before double, after double
    nullable, improvement double nullable) — 9 rows.
    """
    per_part = partition_stats_with_after(files)
    g = _aggregate_per_part(per_part, []).withColumn(
        "full_scan_overhead",
        F.col("scan_overhead_sum")
        + F.lit(manifest_files_count * MILLISECONDS_PER_SCAN),
    )
    return _nine_metric_rows(g, [])


def multi_table_metrics(
    files: DataFrame,
    manifest_counts: DataFrame,
    table_col: str = "table_name",
) -> DataFrame:
    """ALL tables' diagnostics in ONE Spark job (SURVEY §2 X1 as a
    unioned job instead of the reference's 10-thread pool): `files`
    carries a table_name column (union of every table's `.files`
    relation), `manifest_counts` is the small (table_name,
    manifest_count) side — broadcast, since it is one row per table.

    Output: 9 metric rows per table, keyed by table_name. Scale
    shape: one exchange on (table, partition) feeds the fused
    stats+pack pass, one tiny per-table aggregate follows — 1000
    tables schedule as ordinary partitions of one job, not 1000
    sequential jobs.
    """
    per_part = partition_stats_with_after(files, table_col=table_col)
    g = (
        _aggregate_per_part(per_part, [table_col])
        .join(F.broadcast(manifest_counts), table_col, "left")
        .withColumn(
            "full_scan_overhead",
            F.col("scan_overhead_sum")
            + F.coalesce(F.col("manifest_count"), F.lit(0))
            * MILLISECONDS_PER_SCAN,
        )
    )
    return _nine_metric_rows(g, [table_col])

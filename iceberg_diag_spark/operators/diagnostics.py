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
    after_file_count, after_scan_overhead).
    """
    import numpy as np
    import pandas as pd

    fetch = FETCH_SIZE
    cap = MAX_GROUP_BYTE_SIZE
    ms = MILLISECONDS_PER_SCAN

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        sizes = pdf[size_col].to_numpy(dtype="int64")
        content = pdf[content_col].to_numpy()
        file_count = int(sizes.size)
        total_size = int(sizes.sum())
        scan_overhead = int((sizes // fetch + 2).sum()) * ms
        data = np.sort(sizes[content == CONTENT_DATA])
        dfc = int(data.size)
        dsz = int(data.sum())
        groups = 0
        aoh = 0
        if dfc:
            ps = np.cumsum(data)
            base = 0
            start = 0
            while start < dfc:
                # group = rows [start..e] where e is the FIRST index
                # whose group-relative prefix sum exceeds the cap
                # (check-before-append: the crossing row is included),
                # or the last row if no crossing remains.
                e = int(np.searchsorted(ps, base + cap, side="right"))
                if e >= dfc:
                    e = dfc - 1
                total = int(ps[e]) - base
                aoh += (total // fetch + 2) * ms
                groups += 1
                base = int(ps[e])
                start = e + 1
        return pd.DataFrame(
            [
                [
                    pdf[partition_col].iloc[0],
                    file_count,
                    total_size,
                    scan_overhead,
                    dfc,
                    dsz,
                    groups,
                    aoh,
                ]
            ],
            columns=[
                "partition_key",
                "file_count",
                "total_size",
                "scan_overhead",
                "data_file_count",
                "data_size",
                "after_file_count",
                "after_scan_overhead",
            ],
        )

    cols = files.select(
        F.col(partition_col).alias(partition_col),
        F.col(size_col),
        F.col(content_col),
    )
    return cols.groupBy(partition_col).applyInPandas(
        _stats, schema=_PART_AFTER_SCHEMA
    )


def table_metrics(files: DataFrame, manifest_files_count: int = 0) -> DataFrame:
    """The flagship diagnostics query: 9 metrics with before / after /
    improvement, exactly matching the reference's local mode.

    Output: (metric string, ordinal int, before double, after double
    nullable, improvement double nullable) — 9 rows.
    """
    per_part = partition_stats_with_after(files)

    # Argmax by reduction (A10, table_metrics.py:134-153): track the
    # partition with max (before - after) reduction; only reductions
    # strictly > 0 qualify (initial max is 0). max() over a struct
    # orders lexicographically — reduction first — so one aggregate
    # replaces the reference's sequential scan. Ties: the reference
    # takes first-seen (dict order); we break by larger before value,
    # deterministic under any partitioning.
    fc_red = F.col("file_count") - F.col("after_file_count")
    oh_red = F.col("scan_overhead") - F.col("after_scan_overhead")

    g = per_part.agg(
        F.coalesce(F.sum("file_count"), F.lit(0)).alias("file_count"),
        F.coalesce(F.sum("total_size"), F.lit(0)).alias("total_size"),
        (
            F.coalesce(F.sum("scan_overhead"), F.lit(0))
            + F.lit(manifest_files_count * MILLISECONDS_PER_SCAN)
        ).alias("full_scan_overhead"),
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

    rows = g.select(F.explode(F.array(*pairs)).alias("m")).select("m.*")

    # Improvement (A11, table_metric.py:67-70): (1 - after/before)*100;
    # 0 when both are 0; +inf when before is 0 but after isn't; NULL
    # when there is no after value.
    improvement = (
        F.when(F.col("after").isNull(), F.lit(None).cast("double"))
        .when((F.col("before") == 0) & (F.col("after") == 0), F.lit(0.0))
        .when(F.col("before") == 0, F.lit(float("inf")))
        .otherwise((F.lit(1.0) - F.col("after") / F.col("before")) * 100.0)
    )
    return rows.withColumn("improvement", improvement).orderBy("ordinal")

"""Parallelism hygiene for compute-heavy operators.

The driver-generated test parquet is written as ONE row group per
file, and Spark cannot split a parquet file below row-group
granularity — so every scan arrives as a single task no matter what
`spark.sql.files.maxPartitionBytes` says. Operators that do heavy
per-row work downstream of the scan (shingling, hashing, pandas UDF
decode) must therefore spread the scan output explicitly or run on
one core.

At 100 TB this is a no-op by design: inputs arrive as many
row-groups/files and the partition count already exceeds
defaultParallelism, so `ensure_parallelism` returns the input
unchanged — no extra shuffle on the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IF the plan currently has fewer
    partitions than the session's default parallelism (or an explicit
    floor). The shuffle this introduces moves the small pre-explosion
    rows, not the exploded/decoded output."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

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


def _num_partitions(df: DataFrame) -> int:
    """Partition count of the physical plan WITHOUT the df.rdd
    Python-RDD conversion (which rebuilds serializers per call,
    ~200× slower — round-1 advisory). `execute()` on a non-adaptive
    plan is lazy (builds the RDD DAG, runs no job); for adaptive
    plans (only possible if a caller passes an already-shuffled df)
    it could materialize stages, so fall back to df.rdd there."""
    try:
        plan = df._jdf.queryExecution().executedPlan()
        if "AdaptiveSparkPlan" not in plan.getClass().getSimpleName():
            return plan.execute().getNumPartitions()
    except Exception:
        pass
    return df.rdd.getNumPartitions()


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IF the plan currently has fewer
    partitions than the session's default parallelism (or an explicit
    floor). The shuffle this introduces moves the small pre-explosion
    rows, not the exploded/decoded output."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if _num_partitions(df) < target:
        return df.repartition(target)
    return df

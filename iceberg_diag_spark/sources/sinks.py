"""Write-side surface: partitioned parquet sinks and bucketed tables.

The reference's only sink is a console table (SURVEY §2 S7); a real
lakehouse engine also needs the write strategies that make 100 TB
reads cheap:

- Hive-style partitioned parquet (`partitionBy`): partition pruning
  turns predicate scans into directory listings — a filter on the
  partition column never touches excluded files.
- Bucketed + sorted tables (`bucketBy`/`sortBy` + saveAsTable): joins
  and aggregations on the bucket key read co-located buckets and skip
  the exchange entirely (verified in tests: the joined plan contains
  no Exchange on the bucketed key).

Both are thin wrappers so callers state intent, not mechanics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...],
    mode: str = "overwrite",
) -> None:
    """Write df as Hive-partitioned parquet. Partition columns should
    be low-cardinality (directories per distinct value); readers get
    partition pruning on them for free."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned dataset (partition columns are
    reconstructed from the directory layout)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed
    table. Two tables bucketed the same way on the join key join
    WITHOUT a shuffle — the pre-shuffle is paid once at write time,
    amortized across every subsequent join/agg on that key (the
    canonical strategy for repeatedly-joined 100 TB fact tables)."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)

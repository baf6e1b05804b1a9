"""SURVEY §2 P4 — canonical partition identity for multi-field struct
partitions: Spark groups by the StructType directly (field-wise
comparison), and the bin-pack path canonicalizes with to_json for the
string-keyed pandas stage — both must agree with a manually-keyed
equivalent.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_diag_spark.operators.diagnostics import partition_stats, table_metrics


@pytest.fixture(scope="module")
def struct_files(spark):
    # two-field partition (day, region) — 4 combos, deterministic sizes
    return spark.range(400).select(
        F.struct(
            (F.col("id") % 2).cast("string").alias("day"),
            F.when(F.col("id") % 4 < 2, "eu").otherwise("us").alias("region"),
        ).alias("partition_key"),
        ((F.col("id") % 13 + 1) * 1024 * 1024).alias("file_size_in_bytes"),
        (F.col("id") % 3).cast("int").alias("content"),
    )


def test_groupby_struct_directly(spark, struct_files):
    stats = partition_stats(struct_files)
    rows = stats.collect()
    assert len(rows) == 4  # struct equality is field-wise
    assert sum(r.file_count for r in rows) == 400
    # same numbers as grouping by an explicit canonical string key
    canon = partition_stats(
        struct_files.withColumn(
            "partition_key", F.to_json("partition_key")
        )
    )
    a = sorted((r.file_count, r.total_size, r.data_size) for r in rows)
    b = sorted((r.file_count, r.total_size, r.data_size) for r in canon.collect())
    assert a == b


def test_table_metrics_on_struct_partitions(spark, struct_files):
    # end-to-end 9-metric pipeline with the canonical-string key (the
    # bin-pack pandas stage is string-keyed, as the CLI does for real
    # Iceberg .files partition structs)
    files = struct_files.withColumn("partition_key", F.to_json("partition_key"))
    m = {r.metric: r for r in table_metrics(files, 5).collect()}
    assert m["TOTAL_PARTITIONS"].before == 4.0
    assert m["FILE_COUNT"].before == 400.0
    assert m["FILE_COUNT"].after is not None
    assert 0 < m["FILE_COUNT"].after < 400

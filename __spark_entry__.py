"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship diagnostics query at sf0.001.
queries()      — every implemented operator (SURVEY.md §2 + extensions).
oracle_sql()   — DuckDB-equivalent SQL for the hash-checked subset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_diag_spark.plans.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the 9-metric Iceberg diagnostics table (with
    compaction simulation) over the sf0.001 data_files proxy."""
    return REGISTRY["diag_metrics"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }

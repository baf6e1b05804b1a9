"""Shared infrastructure for the query-registry family modules.

Every operator exposed through the driver contract lives in one of
the plans/oracles_*.py family modules (split from the original
monolithic registry.py as a pure move); they all register into the
REGISTRY dict defined here, and plans/registry.py assembles the
final scoring order.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DF``
with (where expressible) an equivalent DuckDB SQL oracle over the
same parquet tables. The driver hash-compares values column-by-column
after sorting by name, so builders and SQL alias every computed
column identically.

Cross-engine determinism rules used throughout (verified in
tests/test_oracle_parity.py):
- integer casts: Spark ``cast("long")`` truncates while DuckDB
  ``CAST(double AS BIGINT)`` rounds → oracles always use
  ``CAST(FLOOR(x) AS BIGINT)`` (inputs are non-negative).
- money sums: floor-to-integer-cents per row, then exact integer
  sums — immune to float summation order.
- division by FETCH_SIZE (2^25) is exact in doubles, so DIV ≡
  floor(double division) on both engines.
- DuckDB aggregate sums of BIGINT return HUGEINT → always CAST back
  to BIGINT; row_number returns BIGINT → Spark side casts to long.
- timestamps: UTC session timezone; formatted to strings on output.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from iceberg_diag_spark.sources.tpch import load_table

PROXY_MANIFEST_COUNT = 10

# Shared oracle prelude: the lineitem → data_files proxy
# (FIXTURES.md §3: partition=l_returnflag, size≈extendedprice bytes).
FILES_CTE = """
  SELECT l_returnflag AS partition_key,
         CAST(FLOOR(l_extendedprice * 1000) AS BIGINT) AS file_size_in_bytes,
         CAST(l_linenumber % 3 AS INTEGER) AS content
  FROM lineitem
"""


@dataclass(frozen=True)
class QuerySpec:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only driver check
    doc: str


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# Populated by the family modules in their import order (insertion
# order is the within-tier scoring order — see registry._eval_order).
REGISTRY: dict[str, QuerySpec] = {}

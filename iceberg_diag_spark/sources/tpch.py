"""Parquet sources for the driver-generated test tables.

At 100 TB these reads are identical — ``spark.read.parquet`` on an
object-store prefix; Catalyst handles split planning, column pruning
and predicate pushdown. Nothing here materializes data on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType regardless of how the
    generator wrote it. Observed physical types across testdata
    generations: TIMESTAMP(NANOS) (read as long via the legacy conf →
    exact ns→µs integer division; a double division would round at
    1e18 ns instead of truncating like DuckDB), TIMESTAMP(MICROS)
    without tz (Spark reads TIMESTAMP_NTZ → cast; the host runs UTC so
    the instant is unchanged), or already TimestampType (no-op). All
    are pure column expressions — pruning/pushdown survive.
    """
    kind = df.schema["ts"].dataType.typeName()
    if kind in ("long", "bigint"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if kind == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table. Column pruning/pushdown stay available
    because we return the lazy scan, never a cached/collected copy."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return normalize_event_ts(df)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views so ``spark.sql`` queries can
    name them exactly as the DuckDB oracle does."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Catalog surface (SURVEY §2 S1-S3, P1, O1): namespace / table
listing with glob filtering, expressed against the Spark catalog so
the same calls work on an Iceberg catalog
(``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``)
or the local session catalog in tests.

Reference behavior mirrored:
- list_namespaces → sorted namespace names (manager.py:74-76);
- list_tables(db, pattern) → paginated scan + Iceberg-type filter +
  fnmatch glob + sort (manager.py:84-113) — Spark's SHOW TABLES
  handles pagination internally; the glob becomes an anchored regex
  filter evaluated in the engine, not the driver;
- a LIMIT 1 existence probe (manager.py:63-72).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from iceberg_diag_spark.functions.formatting import glob_to_regex


def list_namespaces(spark: SparkSession, catalog: str | None = None) -> DataFrame:
    """Sorted namespace listing (S1/O1)."""
    target = f" IN {catalog}" if catalog else ""
    df = spark.sql(f"SHOW NAMESPACES{target}")
    col = df.columns[0]
    return df.select(F.col(col).alias("namespace")).orderBy("namespace")


def list_tables(
    spark: SparkSession, database: str, pattern: str = "*"
) -> DataFrame:
    """Sorted table listing with glob filter (S2/P1/F4/O1). Raises
    DatabaseNotFound for a missing namespace (reference:
    EntityNotFoundException → DatabaseNotFound, manager.py:81-82)."""
    from pyspark.errors import AnalysisException

    from iceberg_diag_spark.errors import DatabaseNotFound

    try:
        df = spark.sql(f"SHOW TABLES IN {database}")
    except AnalysisException as ex:
        raise DatabaseNotFound(database) from ex
    return (
        df.select(F.col("tableName").alias("table_name"))
        .filter(F.col("table_name").rlike(glob_to_regex(pattern)))
        .orderBy("table_name")
    )


def iceberg_tables(spark: SparkSession, database: str) -> DataFrame:
    """S3: keep only Iceberg-provider tables. Uses the catalog's
    table metadata; non-Iceberg session catalogs yield an empty
    result rather than an error.

    The per-table DESCRIBE probes fan out across a thread pool (the
    reference's own per-table fan-out idiom, X1/cli.py:148): catalog
    RPCs are latency-bound, not CPU-bound, so a 10k-table namespace
    pays ~N/10 sequential waves instead of N round-trips. Spark
    sessions are thread-safe for concurrent sql() calls."""
    from concurrent.futures import ThreadPoolExecutor

    def probe(name: str) -> str | None:
        try:
            detail = spark.sql(
                f"DESCRIBE TABLE EXTENDED {database}.{name}"
            ).collect()
            provider = {
                r["col_name"]: r["data_type"]
                for r in detail
                if r["col_name"] in ("Provider", "Table Properties")
            }
            if "iceberg" in str(provider.get("Provider", "")).lower():
                return name
        except Exception:
            pass
        return None

    names = [t.name for t in spark.catalog.listTables(database)]
    rows: list[tuple[str]] = []
    if names:
        with ThreadPoolExecutor(max_workers=min(10, len(names))) as pool:
            rows = [(n,) for n in pool.map(probe, names) if n is not None]
    return spark.createDataFrame(rows or [], "table_name string").orderBy(
        "table_name"
    )


def connection_probe(spark: SparkSession, catalog: str | None = None) -> bool:
    """S5: LIMIT-1 existence scan validating the catalog binding.

    Returns True when the catalog answers and exposes at least one
    namespace; False for an empty-but-reachable catalog. An unbound /
    misconfigured catalog raises CatalogBindError (the reference maps
    probe failures to its error taxonomy, manager.py:63-72)."""
    from pyspark.errors import AnalysisException

    from iceberg_diag_spark.errors import CatalogBindError

    target = f" IN {catalog}" if catalog else ""
    try:
        rows = spark.sql(f"SHOW NAMESPACES{target}").limit(1).collect()
    except AnalysisException as ex:
        raise CatalogBindError(
            f"catalog probe failed for {catalog or '<session>'}: {ex}"
        ) from ex
    return len(rows) > 0

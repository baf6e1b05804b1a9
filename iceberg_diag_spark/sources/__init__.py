from iceberg_diag_spark.sources.tpch import load_table, register_views, TABLES

__all__ = ["load_table", "register_views", "TABLES"]

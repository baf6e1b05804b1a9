"""CLI entry point mirroring the reference's surface
(icebergdiag/cli.py:40-50,185-192 — EP1 local diagnostics, EP2
catalog listing):

  python -m iceberg_diag_spark                        # list namespaces
  python -m iceberg_diag_spark --database db          # list tables
  python -m iceberg_diag_spark --database db --table-name 'pat*'
                                                      # diagnose tables
  python -m iceberg_diag_spark --files files.parquet  # diagnose a
                                                      # data_files relation

Against an Iceberg catalog the per-table source is the `.files`
metadata table (SURVEY §2 S4); `--files` takes any parquet with the
same (partition_key, file_size_in_bytes, content) shape so the full
pipeline runs without a catalog. Unlike the reference there is no
thread-pool fan-out: each table is one lazy Spark job (SURVEY §2 X1),
and Spark schedules the parallelism.

The reference's --remote mode (EP3) ships AWS credentials to an
external API — deliberately not replicated; its response-parsing
surface lives in sources/response.py.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="iceberg-diag-spark",
        description="PySpark-native Iceberg table diagnostics",
    )
    p.add_argument("--database", help="namespace to list/diagnose")
    p.add_argument(
        "--table-name",
        help="glob pattern of tables to diagnose (requires --database)",
    )
    p.add_argument(
        "--files",
        help="diagnose a data_files-shaped parquet "
        "(partition_key, file_size_in_bytes, content)",
    )
    p.add_argument(
        "--manifest-count", type=int, default=0,
        help="manifest file count for the scan-overhead model",
    )
    p.add_argument(
        "--catalog", help="Spark catalog name (defaults to the session catalog)"
    )
    return p


def _print_df(df, limit: int = 1000) -> None:
    rows = df.limit(limit).collect()
    cols = df.columns
    widths = [
        max(len(c), *(len(str(r[i])) for r in rows)) if rows else len(c)
        for i, c in enumerate(cols)
    ]
    line = " | ".join(c.ljust(w) for c, w in zip(cols, widths))
    print(line)
    print("-" * len(line))
    for r in rows:
        print(" | ".join(str(v).ljust(w) for v, w in zip(r, widths)))


def _diagnose(spark: SparkSession, files_df, manifest_count: int, title: str) -> None:
    from iceberg_diag_spark.operators.diagnostics import table_metrics
    from iceberg_diag_spark.operators.display import format_metrics

    print(f"\n== {title} ==")
    _print_df(format_metrics(table_metrics(files_df, manifest_count)))


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    parser = _build_parser()
    args = parser.parse_args(argv)
    if args.table_name and not args.database:
        # accept a qualified "db.tbl" (reference Table.from_full_name,
        # metrics/table.py:7-13); otherwise the pattern is ambiguous
        from iceberg_diag_spark.functions.identifiers import Table

        t = Table.from_full_name(args.table_name)
        if t.database:
            args.database, args.table_name = t.database, t.table_name
        else:
            parser.error(
                "--table-name requires --database (or a qualified "
                "'db.table' name)"
            )
    own_session = spark is None
    if spark is None:
        from iceberg_diag_spark.session import get_spark

        spark = get_spark(app_name="iceberg-diag-spark-cli")
        spark.sparkContext.setLogLevel("ERROR")

    from iceberg_diag_spark.errors import DiagError
    from iceberg_diag_spark.sources import catalog as cat

    try:
        if args.files:
            _diagnose(
                spark,
                spark.read.parquet(args.files),
                args.manifest_count,
                args.files,
            )
        elif args.database and args.table_name:
            tables = [
                r.table_name
                for r in cat.list_tables(
                    spark, args.database, args.table_name
                ).collect()
            ]
            if not tables:
                from iceberg_diag_spark.errors import NoMatchingTables

                raise NoMatchingTables(args.database, args.table_name)
            from iceberg_diag_spark.sources.iceberg_meta import (
                data_files_from_files_table,
            )

            for t in tables:
                files = data_files_from_files_table(
                    spark.table(f"{args.database}.{t}.files")
                )
                manifests = spark.table(f"{args.database}.{t}.manifests").count()
                _diagnose(spark, files, manifests, f"{args.database}.{t}")
        elif args.database:
            _print_df(cat.list_tables(spark, args.database))
        else:
            _print_df(cat.list_namespaces(spark, args.catalog))
        return 0
    except DiagError as ex:
        print(f"error: {ex}")
        return 1
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())

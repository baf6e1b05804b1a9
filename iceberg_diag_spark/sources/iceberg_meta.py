"""Iceberg metadata-table contract (SURVEY §2 S4).

The production source for diagnostics is the Iceberg metadata tables:

    files     = spark.table("cat.db.tbl.files")
    manifests = spark.table("cat.db.tbl.manifests").count()

(reference: ``icebergdiag/diagnostics/manager.py:154-186`` — it opens
every manifest and consumes exactly three fields per DataFile entry:
``partition`` (a struct), ``file_size_in_bytes``, ``content``; plus
the manifest count.)

No Iceberg runtime jar (and no pyiceberg) ships in this container, so
that call cannot execute here (re-verified rounds 2, 4, 5, 7, 8, 10,
11, 12, 13, and 14: no iceberg/delta/hudi jar or wheel anywhere on
disk including the pyspark jars dir, no pyiceberg import, and no
network — maven-central DNS resolution fails and pip finds no
distribution — to fetch either). This module pins the SHAPE of the integration instead, so
the wiring is real and contract-tested even though the catalog
binding is not exercisable:

- ``FILES_TABLE_SCHEMA`` / ``MANIFESTS_TABLE_SCHEMA`` /
  ``SNAPSHOTS_TABLE_SCHEMA``: the metadata-table columns as the
  public Iceberg spec defines them (content codes 0=DATA,
  1=POSITION_DELETES, 2=EQUALITY_DELETES; partition is a struct typed
  by the table's partition spec — modeled here with a representative
  two-field spec, since the engine only requires *a* struct).
- ``data_files_from_files_table``: the adapter from a real ``.files``
  DataFrame to the engine's canonical data_files relation. The CLI's
  catalog path goes through this adapter, so a deployment with the
  iceberg-spark runtime on the classpath needs no code changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Representative partition-spec struct: identity(date-ish string) +
# bucket(int). Real tables substitute their own spec-derived fields;
# the engine contract only requires struct-typed `partition`.
PARTITION_STRUCT = StructType(
    [
        StructField("dt", StringType()),
        StructField("bucket", IntegerType()),
    ]
)

# `.files` metadata table — consumed fields first (content,
# partition, file_size_in_bytes), plus the spec columns a real scan
# carries alongside them.
FILES_TABLE_SCHEMA = StructType(
    [
        StructField("content", IntegerType()),
        StructField("file_path", StringType()),
        StructField("file_format", StringType()),
        StructField("spec_id", IntegerType()),
        StructField("partition", PARTITION_STRUCT),
        StructField("record_count", LongType()),
        StructField("file_size_in_bytes", LongType()),
    ]
)

# `.manifests` metadata table — the engine consumes only count(*).
MANIFESTS_TABLE_SCHEMA = StructType(
    [
        StructField("content", IntegerType()),
        StructField("path", StringType()),
        StructField("length", LongType()),
        StructField("partition_spec_id", IntegerType()),
        StructField("added_snapshot_id", LongType()),
        StructField("added_data_files_count", IntegerType()),
        StructField("existing_data_files_count", IntegerType()),
        StructField("deleted_data_files_count", IntegerType()),
        StructField(
            "partition_summaries",
            ArrayType(
                StructType(
                    [
                        StructField("contains_null", BooleanType()),
                        StructField("contains_nan", BooleanType()),
                        StructField("lower_bound", StringType()),
                        StructField("upper_bound", StringType()),
                    ]
                )
            ),
        ),
    ]
)

# `.snapshots` metadata table (current-snapshot resolution).
SNAPSHOTS_TABLE_SCHEMA = StructType(
    [
        StructField("committed_at", TimestampType()),
        StructField("snapshot_id", LongType()),
        StructField("parent_id", LongType()),
        StructField("operation", StringType()),
        StructField("manifest_list", StringType()),
        StructField("summary", MapType(StringType(), StringType())),
    ]
)


def data_files_from_files_table(files: DataFrame) -> DataFrame:
    """Adapter: real ``.files`` metadata DataFrame → the engine's
    canonical data_files relation (partition_key string,
    file_size_in_bytes long, content int).

    The struct partition becomes a canonical JSON string key
    (to_json serializes fields in schema order, which is fixed by the
    table's partition spec — deterministic across tasks, the Spark
    analog of the reference's deterministic_repr,
    table_metrics.py:87-91). Aggregating on the struct directly (P4)
    is equally valid; the string key keeps the relation
    parquet-roundtrippable for the --files CLI path.
    """
    return files.select(
        F.to_json(F.col("partition")).alias("partition_key"),
        F.col("file_size_in_bytes").cast("long").alias("file_size_in_bytes"),
        F.col("content").cast("int").alias("content"),
    )


# `.files` with column-level bounds — Iceberg ≥ 1.2 exposes
# readable_metrics: a struct keyed by column name whose fields carry
# TYPED lower_bound/upper_bound (the human-readable projection of the
# binary lower_bounds/upper_bounds maps). The advisor consumes only
# integer-castable columns (int/long/date → days, timestamp → micros).
def READABLE_METRICS_STRUCT(columns: list[str]) -> StructType:
    """Schema factory for a readable_metrics struct over long-typed
    columns (the shape contract-tested against the advisor chain)."""
    per_col = StructType(
        [
            StructField("column_size", LongType()),
            StructField("value_count", LongType()),
            StructField("null_value_count", LongType()),
            StructField("nan_value_count", LongType()),
            StructField("lower_bound", LongType()),
            StructField("upper_bound", LongType()),
        ]
    )
    return StructType([StructField(c, per_col) for c in columns])


def readable_metrics_to_column_stats(files: DataFrame) -> DataFrame:
    """Adapter: ``.files`` rows carrying a readable_metrics struct →
    the clustering_advisor / skip_simulation bounds relation
    (col_name string, file_id long, lo long, hi long).

    Column discovery is schema-driven: every readable_metrics field
    whose lower_bound maps onto the integer line rides along; others
    are skipped (string/binary bounds don't order as integers).
    Type-aware mapping — Spark cannot CAST DATE to BIGINT, and
    CAST(TIMESTAMP AS LONG) yields seconds, so dates go through
    unix_date (days since epoch) and timestamps through unix_micros
    (TIMESTAMP_NTZ via a session-tz cast first; monotonic, which is
    all the sweep needs). file_id = xxhash64(file_path) —
    deterministic, collision-free in practice, and only used as the
    sweep's tie-break. Zero-shuffle projection; one stack() unpivot.
    """
    to_long = {
        "bigint": "CAST({x} AS LONG)",
        "int": "CAST({x} AS LONG)",
        "smallint": "CAST({x} AS LONG)",
        "tinyint": "CAST({x} AS LONG)",
        # unix_date returns INT; stack() needs every row the same
        # type, so widen to LONG here.
        "date": "CAST(unix_date({x}) AS LONG)",
        "timestamp": "unix_micros({x})",
        "timestamp_ntz": "unix_micros(CAST({x} AS TIMESTAMP))",
    }
    rm_type = files.schema["readable_metrics"].dataType
    numeric_cols = []
    for f in rm_type.fields:
        for sub in f.dataType.fields:
            if sub.name == "lower_bound":
                tmpl = to_long.get(sub.dataType.simpleString())
                if tmpl is not None:
                    numeric_cols.append((f.name, tmpl))
    if not numeric_cols:
        raise ValueError(
            "readable_metrics carries no integer-orderable columns"
        )
    stack_args = ", ".join(
        f"'{c}', "
        + tmpl.format(x=f"readable_metrics.{c}.lower_bound")
        + ", "
        + tmpl.format(x=f"readable_metrics.{c}.upper_bound")
        for c, tmpl in numeric_cols
    )
    return (
        files.select(
            F.xxhash64(F.col("file_path")).alias("file_id"),
            F.expr(
                f"stack({len(numeric_cols)}, {stack_args})"
                " AS (col_name, lo, hi)"
            ),
        )
        .filter(F.col("lo").isNotNull() & F.col("hi").isNotNull())
        .select("col_name", "file_id", "lo", "hi")
    )

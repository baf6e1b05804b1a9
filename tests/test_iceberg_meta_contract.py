"""Schema contract for the real Iceberg metadata-table path (S4).

No Iceberg runtime jar ships in this sandbox, so
``spark.table("cat.db.tbl.files")`` cannot execute; these tests pin
the integration SHAPE instead: a DataFrame with the spec's `.files`
schema (struct partition, content int codes, long sizes) flows
through the adapter and the full diagnostics pipeline, and the
manifest count comes from a spec-shaped `.manifests` relation. A
deployment with the runtime jar binds the same code to the real
metadata tables (see cli.py's catalog branch).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_diag_spark.functions.cost import (
    CONTENT_DATA,
    CONTENT_EQUALITY_DELETES,
    CONTENT_POSITION_DELETES,
)
from iceberg_diag_spark.operators.diagnostics import table_metrics
from iceberg_diag_spark.sources.iceberg_meta import (
    FILES_TABLE_SCHEMA,
    MANIFESTS_TABLE_SCHEMA,
    data_files_from_files_table,
)

MIB = 1024 * 1024


def _files_row(content, dt, bucket, size, i=0):
    return (
        content,
        f"s3://bucket/data/f{i}.parquet",
        "PARQUET",
        0,
        {"dt": dt, "bucket": bucket},
        1000,
        size,
    )


@pytest.fixture(scope="module")
def files_df(spark):
    rows = []
    i = 0
    # partition (2024-01-01, 0): 3 data files + 1 positional delete
    for size in [100 * MIB, 200 * MIB, 300 * MIB]:
        rows.append(_files_row(CONTENT_DATA, "2024-01-01", 0, size, i))
        i += 1
    rows.append(
        _files_row(CONTENT_POSITION_DELETES, "2024-01-01", 0, 10 * MIB, i)
    )
    i += 1
    # partition (2024-01-01, 1): 2 data files + 1 equality delete
    for size in [400 * MIB, 500 * MIB]:
        rows.append(_files_row(CONTENT_DATA, "2024-01-01", 1, size, i))
        i += 1
    rows.append(
        _files_row(CONTENT_EQUALITY_DELETES, "2024-01-01", 1, 20 * MIB, i)
    )
    return spark.createDataFrame(rows, FILES_TABLE_SCHEMA)


@pytest.fixture(scope="module")
def manifest_count(spark):
    manifests = spark.createDataFrame(
        [
            (0, "s3://bucket/metadata/m0.avro", 7000, 0, 1, 5, 0, 0, []),
            (0, "s3://bucket/metadata/m1.avro", 7000, 0, 1, 1, 0, 0, []),
        ],
        MANIFESTS_TABLE_SCHEMA,
    )
    return manifests.count()


def test_adapter_emits_canonical_relation(files_df):
    adapted = data_files_from_files_table(files_df)
    assert [f.name for f in adapted.schema.fields] == [
        "partition_key",
        "file_size_in_bytes",
        "content",
    ]
    keys = {r.partition_key for r in adapted.select("partition_key").collect()}
    # struct → canonical JSON key, schema field order, both fields kept
    assert keys == {
        '{"dt":"2024-01-01","bucket":0}',
        '{"dt":"2024-01-01","bucket":1}',
    }


def test_full_pipeline_over_spec_shaped_metadata(files_df, manifest_count):
    adapted = data_files_from_files_table(files_df)
    rows = {
        r.metric: r
        for r in table_metrics(adapted, manifest_count).collect()
    }
    # FILE_COUNT before counts deletes too; after counts packed DATA
    # groups only (750 MiB cap, check-before-append): partition 0 packs
    # 600 MiB into 1 group, partition 1 packs 900 MiB into 1 group.
    assert rows["FILE_COUNT"].before == 7.0
    assert rows["FILE_COUNT"].after == 2.0
    assert rows["TOTAL_PARTITIONS"].before == 2.0
    # delete bytes count toward table size (reference table_metrics.py:63)
    assert rows["TOTAL_TABLE_SIZE"].before == float(1530 * MIB)
    # avg data file size excludes deletes: 1500 MiB / 5
    assert rows["AVG_FILE_SIZE"].before == float(300 * MIB)
    # FULL_SCAN_OVERHEAD before = manifests*1ms + per-file cost;
    # sizes are exact MiB multiples: cost(f) = size//32MiB + 2
    per_file = sum(
        s // (32 * MIB) + 2
        for s in [100, 200, 300, 400, 500, 10, 20]
        for s in [s * MIB]
    )
    assert rows["FULL_SCAN_OVERHEAD"].before == float(
        manifest_count + per_file
    )
    # after: one group per partition → cost(600MiB)+cost(900MiB)
    assert rows["FULL_SCAN_OVERHEAD"].after == float(
        (600 * MIB) // (32 * MIB) + 2 + (900 * MIB) // (32 * MIB) + 2
    )


def test_content_codes_match_iceberg_spec():
    # Iceberg spec: manifest-entry content field codes
    assert CONTENT_DATA == 0
    assert CONTENT_POSITION_DELETES == 1
    assert CONTENT_EQUALITY_DELETES == 2


def test_readable_metrics_advisor_chain(spark):
    """A spec-shaped `.files` relation with readable_metrics bounds
    runs the full sort-column-advisor chain unchanged (the CLI
    --maintenance path on a real Iceberg ≥1.2 metadata table)."""
    from pyspark.sql import Row

    from iceberg_diag_spark.operators.maintenance import clustering_advisor
    from iceberg_diag_spark.sources.iceberg_meta import (
        READABLE_METRICS_STRUCT,
        readable_metrics_to_column_stats,
    )

    def rm(alo, ahi, blo, bhi):
        col = lambda lo, hi: Row(
            column_size=8, value_count=10, null_value_count=0,
            nan_value_count=0, lower_bound=lo, upper_bound=hi,
        )
        return Row(col_a=col(alo, ahi), col_b=col(blo, bhi))

    # col_a: disjoint ranges; col_b: all-overlapping ranges
    rows = [
        Row(file_path=f"s3://b/f{i}.parquet", readable_metrics=rm(
            i * 10, i * 10 + 5, 0, 100 + i))
        for i in range(4)
    ]
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("file_path", StringType()),
            StructField(
                "readable_metrics",
                READABLE_METRICS_STRUCT(["col_a", "col_b"]),
            ),
        ]
    )
    files = spark.createDataFrame(rows, schema)
    stats = readable_metrics_to_column_stats(files)
    assert set(stats.columns) == {"col_name", "file_id", "lo", "hi"}
    out = {r["col_name"]: r for r in clustering_advisor(stats).collect()}
    assert out["col_a"]["overlap_pairs"] == 0
    assert out["col_b"]["overlap_pairs"] == 6  # C(4,2)
    assert out["col_a"]["n_files"] == 4


def test_readable_metrics_temporal_bounds(spark):
    """DATE / TIMESTAMP / TIMESTAMP_NTZ bounds map onto the integer
    line (unix_date days, unix_micros micros) instead of crashing the
    adapter — Spark cannot CAST DATE AS LONG, and a date-partitioned
    table is the single most common Iceberg layout, so this is the
    CLI --maintenance hot path. String bounds are skipped."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql.types import (
        DateType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    from iceberg_diag_spark.sources.iceberg_meta import (
        readable_metrics_to_column_stats,
    )

    def per_col(bound_type):
        return StructType(
            [
                StructField("column_size", LongType()),
                StructField("value_count", LongType()),
                StructField("null_value_count", LongType()),
                StructField("nan_value_count", LongType()),
                StructField("lower_bound", bound_type),
                StructField("upper_bound", bound_type),
            ]
        )

    schema = StructType(
        [
            StructField("file_path", StringType()),
            StructField(
                "readable_metrics",
                StructType(
                    [
                        StructField("event_date", per_col(DateType())),
                        StructField("created_at", per_col(TimestampType())),
                        StructField(
                            "updated_at", per_col(TimestampNTZType())
                        ),
                        StructField("label", per_col(StringType())),
                    ]
                ),
            ),
        ]
    )

    def stats_row(lo, hi):
        return Row(
            column_size=8, value_count=10, null_value_count=0,
            nan_value_count=0, lower_bound=lo, upper_bound=hi,
        )

    d0, d1 = dt.date(1970, 1, 11), dt.date(1970, 1, 21)  # days 10, 20
    t0 = dt.datetime(1970, 1, 1, 0, 0, 1)  # 1_000_000 micros (UTC tz)
    t1 = dt.datetime(1970, 1, 1, 0, 0, 2)
    rows = [
        Row(
            file_path="s3://b/f0.parquet",
            readable_metrics=Row(
                event_date=stats_row(d0, d1),
                created_at=stats_row(t0, t1),
                updated_at=stats_row(t0, t1),
                label=stats_row("aa", "zz"),
            ),
        )
    ]
    files = spark.createDataFrame(rows, schema)
    out = {
        r["col_name"]: r
        for r in readable_metrics_to_column_stats(files).collect()
    }
    assert set(out) == {"event_date", "created_at", "updated_at"}
    assert (out["event_date"]["lo"], out["event_date"]["hi"]) == (10, 20)
    # session tz is UTC in conftest, so micros are exact
    assert (out["created_at"]["lo"], out["created_at"]["hi"]) == (
        1_000_000, 2_000_000,
    )
    assert out["updated_at"]["lo"] < out["updated_at"]["hi"]

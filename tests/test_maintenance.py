"""Unit tests for the table-maintenance diagnostics
(operators/maintenance.py): Morton interleave correctness, delete
burden, orphan detection, and retention semantics on hand-checked
fixtures."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from iceberg_diag_spark.operators import maintenance


def test_morton_z_known_values(spark):
    # x=3 (0b011) -> bits 0,2 ; y=5 (0b101) -> bits 1,5
    # z = 1 + 4 + 2 + 32 = 39
    df = spark.createDataFrame([(3, 5)], "x int, y int")
    z = df.select(
        maintenance.morton_z(F.col("x"), F.col("y")).alias("z")
    ).head()[0]
    assert z == 39
    # interleave is a bijection on 8-bit pairs: 2^16 distinct codes
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("x"),
        (F.col("id") / 256).cast("int").alias("y"),
    )
    n = (
        grid.select(maintenance.morton_z(F.col("x"), F.col("y")).alias("z"))
        .distinct()
        .count()
    )
    assert n == 256 * 256


def test_morton_sql_matches_spark(spark):
    import duckdb

    rows = [(x, y) for x in (0, 1, 7, 200, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x int, y int")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", maintenance.morton_z(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    con = duckdb.connect()
    expr = maintenance.morton_sql("x", "y")
    for (x, y), z in got.items():
        (dz,) = con.execute(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()
        assert dz == z, (x, y)


def test_delete_impact_fixture(spark):
    rows = [
        ("p1", 100, 0),
        ("p1", 200, 0),
        ("p1", 10, 1),
        ("p1", 20, 2),
        ("p2", 50, 1),  # no data files -> ppm = -1
    ]
    files = spark.createDataFrame(
        rows, "partition_key string, file_size_in_bytes long, content int"
    )
    out = {
        r["partition_key"]: r.asDict()
        for r in maintenance.delete_impact(files).collect()
    }
    p1 = out["p1"]
    assert p1["data_files"] == 2 and p1["data_bytes"] == 300
    assert p1["pos_delete_files"] == 1 and p1["eq_delete_bytes"] == 20
    assert p1["delete_per_data_ppm"] == 1_000_000  # 2 deletes / 2 data
    assert p1["rewrite_read_cost"] == 4 * 2  # each file < 32MiB -> cost 2
    assert out["p2"]["delete_per_data_ppm"] == -1


def test_orphan_files_fixture(spark):
    listed = spark.createDataFrame(
        [("a", "p1", 100), ("b", "p1", 50), ("c", "p2", 10)],
        "file_path string, partition_key string, file_size_in_bytes long",
    )
    referenced = spark.createDataFrame([("a",), ("c",)], "file_path string")
    out = {
        r["partition_key"]: r.asDict()
        for r in maintenance.orphan_files(listed, referenced).collect()
    }
    assert out["p1"]["orphan_files"] == 1
    assert out["p1"]["orphan_bytes"] == 50
    assert out["p1"]["orphan_ppm"] == 500_000
    assert out["p2"]["orphan_files"] == 0


def test_snapshot_retention_fixture(spark):
    t = datetime.datetime
    rows = [
        # old delete file -> reclaimable
        ("p1", 100, 1, t(2020, 1, 15)),
        # old data file -> expired but retained
        ("p1", 200, 0, t(2020, 2, 15)),
        # recent file (the max anchor)
        ("p1", 300, 0, t(2021, 1, 1)),
    ]
    files = spark.createDataFrame(
        rows,
        "partition_key string, file_size_in_bytes long, content int, "
        "added_at timestamp",
    )
    (r,) = maintenance.snapshot_retention(files, retention_days=180).collect()
    assert r["expired_files"] == 2
    assert r["expired_bytes"] == 300
    assert r["reclaimable_files"] == 1
    assert r["reclaimable_bytes"] == 100
    assert r["retained_bytes"] == 500
    assert r["expired_months"] == 2


def test_manifest_stats_fixture(spark):
    rows = [
        # spec 0, data manifests: one small, one large
        (0, 0, 100_000, 10, 5, 1),
        (0, 0, 900_000, 40, 20, 0),
        # spec 0, delete manifest
        (0, 1, 50_000, 3, 0, 2),
    ]
    m = spark.createDataFrame(
        rows,
        "partition_spec_id int, content int, length long, "
        "added_data_files_count int, existing_data_files_count int, "
        "deleted_data_files_count int",
    )
    from iceberg_diag_spark.operators import maintenance

    out = {
        (r.partition_spec_id, r.content): r.asDict()
        for r in maintenance.manifest_stats(m).collect()
    }
    d = out[(0, 0)]
    assert d["n_manifests"] == 2
    assert d["total_manifest_bytes"] == 1_000_000
    assert d["total_entries"] == 75
    assert d["small_manifests"] == 1
    assert d["entries_per_manifest"] == 37  # floor(75/2)
    assert out[(0, 1)]["deleted_entries"] == 2


def test_cdc_latest_rows_picks_newest(spark):
    import datetime

    t = datetime.datetime
    rows = [
        (1, t(2024, 1, 1), 7, "click", 1.0, ""),
        (2, t(2024, 1, 2), 7, "click", 2.0, ""),   # newest for (7, click)
        (3, t(2024, 1, 2), 7, "view", 5.0, ""),
        (5, t(2024, 1, 3), 8, "click", 9.0, ""),
        (4, t(2024, 1, 3), 8, "click", 8.0, ""),   # same ts: id 5 wins
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from iceberg_diag_spark.operators.events import cdc_latest_rows

    out = {
        (r.user_id, r.event_type): r
        for r in cdc_latest_rows(ev).collect()
    }
    assert out[(7, "click")].last_event_id == 2
    assert out[(7, "click")].n_versions == 2
    assert out[(7, "view")].n_versions == 1
    assert out[(8, "click")].last_event_id == 5  # id tie-break
    assert out[(8, "click")].last_value_cents == 900

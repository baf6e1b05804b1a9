"""Golden-value acceptance test for the diagnostics pipeline.

Values pinned from the reference unit test
(tests/test_metric_calculator.py:46-91 / BASELINE.md): the fixture's
900 files across 3 partitions with 10 manifest files must produce the
exact 9-metric table.
"""

from __future__ import annotations

import math

import pytest

from iceberg_diag_spark.operators.diagnostics import table_metrics
from iceberg_diag_spark.sources.data_files import (
    GOLDEN_MANIFEST_COUNT,
    golden_fixture_files,
)

GOLDEN = {
    # metric: (before, after, improvement)
    "FILE_COUNT": (900, 9, 99.0),
    "WORST_FILE_COUNT": (400, 3, 99.25),
    "FULL_SCAN_OVERHEAD": (1810, 180, 90.05524861878453),
    "WORST_SCAN_OVERHEAD": (800, 60, 92.5),
    "AVG_FILE_SIZE": (18856891.733333334, None, None),
    "TOTAL_TABLE_SIZE": (11424235520, None, None),
    "LARGEST_PARTITION_SIZE": (3982491648, None, None),
    "TOTAL_PARTITIONS": (3, None, None),
}


@pytest.fixture(scope="module")
def metrics(spark):
    df = table_metrics(golden_fixture_files(spark), GOLDEN_MANIFEST_COUNT)
    return {r["metric"]: r for r in df.collect()}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_metric(metrics, name):
    before, after, improvement = GOLDEN[name]
    row = metrics[name]
    assert row["before"] == pytest.approx(before, rel=0, abs=1e-6)
    if after is None:
        assert row["after"] is None
        assert row["improvement"] is None
    else:
        assert row["after"] == pytest.approx(after, rel=0, abs=1e-6)
        assert row["improvement"] == pytest.approx(improvement, rel=0, abs=1e-9)


def test_all_nine_metrics_present(metrics):
    assert len(metrics) == 9
    assert "WORST_AVG_FILE_SIZE" in metrics
    assert metrics["WORST_AVG_FILE_SIZE"]["before"] > 0


def test_empty_input(spark):
    from iceberg_diag_spark.sources.data_files import FILES_SCHEMA

    empty = spark.createDataFrame([], FILES_SCHEMA)
    rows = {r["metric"]: r for r in table_metrics(empty, 5).collect()}
    assert rows["FILE_COUNT"]["before"] == 0
    assert rows["FILE_COUNT"]["after"] == 0
    assert rows["FILE_COUNT"]["improvement"] == 0.0  # 0/0 rule
    # manifest term still counts toward before overhead; after is 0.
    assert rows["FULL_SCAN_OVERHEAD"]["before"] == 5
    assert rows["FULL_SCAN_OVERHEAD"]["improvement"] == 100.0
    assert rows["TOTAL_PARTITIONS"]["before"] == 0


def test_improvement_inf_when_before_zero(spark):
    # before=0 with after>0 → +inf (table_metric.py:67-70). A table of
    # zero manifest files and only delete files has FULL_SCAN_OVERHEAD
    # before > 0, but WORST_* metrics stay 0/0 → improvement 0.
    from iceberg_diag_spark.sources.data_files import FILES_SCHEMA

    deletes_only = spark.createDataFrame(
        [("p1", 1024, 2), ("p1", 2048, 1)], FILES_SCHEMA
    )
    rows = {r["metric"]: r for r in table_metrics(deletes_only, 0).collect()}
    # 2 files cost 2 units each → before 4ms; no DATA files → 0 groups.
    assert rows["FULL_SCAN_OVERHEAD"]["before"] == 4
    assert rows["FULL_SCAN_OVERHEAD"]["after"] == 0
    assert rows["FILE_COUNT"]["before"] == 2
    assert rows["FILE_COUNT"]["after"] == 0
    # deletes still count "before", pack to 0 groups → reduction 2>0
    # fires the argmax exactly like the reference loop would.
    assert rows["WORST_FILE_COUNT"]["before"] == 2
    assert rows["WORST_FILE_COUNT"]["after"] == 0
    assert rows["AVG_FILE_SIZE"]["before"] == 0.0  # no data files
    assert not math.isinf(rows["FULL_SCAN_OVERHEAD"]["improvement"])

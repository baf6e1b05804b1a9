"""Local replica of the driver's correctness gate: run every
registry query in Spark AND its DuckDB oracle on the same parquet,
then compare row count, column names, and sorted values exactly.

Runs at sf0.001 by default (fast); set PARITY_SF_DIR=/root/testdata/sf0.01
to mirror the driver's gate exactly.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from iceberg_diag_spark.plans.registry import REGISTRY
from iceberg_diag_spark.sources.tpch import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and represent with full precision
        return repr(v + 0.0)
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, ddb, name):
    spec = REGISTRY[name]
    sdf = spec.build(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    sv = _sorted_rows(scols, srows)
    dv = _sorted_rows(dcols, drows)
    mismatches = [i for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={sv[mismatches[0]]} duckdb={dv[mismatches[0]]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    df = REGISTRY[name].build(spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns

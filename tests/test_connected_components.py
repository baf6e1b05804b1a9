import pytest
from pyspark.sql import functions as F
from iceberg_diag_spark.operators import dedup

def test_cc_synthetic(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    edges = spark.createDataFrame([(1,2),(2,3),(5,6)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in dedup.connected_components(nodes, edges).collect()}
    assert got == {1:1, 2:1, 3:1, 4:4, 5:5, 6:5, 7:7}

def test_cc_chain_converges(spark):
    # a 20-node chain: diameter 19 -> needs multiple rounds
    nodes = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    edges = spark.createDataFrame([(i, i+1) for i in range(19)], "doc_a long, doc_b long")
    got = {r.doc_id: r.cluster_id for r in dedup.connected_components(nodes, edges).collect()}
    assert set(got.values()) == {0} and len(got) == 20

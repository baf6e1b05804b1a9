"""Similarity search over the embeddings table.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from iceberg_diag_spark.operators import (
    similarity,
)
from iceberg_diag_spark.plans.common import _t


# --------------------------------------------------------------------
# Similarity search (embeddings)
# --------------------------------------------------------------------

def _ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.cosine_topk(emb, queries, k=5)


_ANN_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, q.q_vec, e.embedding AS n_vec
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
terms AS (
  SELECT query_id, neighbor_id,
         unnest(q_vec) AS x, unnest(n_vec) AS y
  FROM pairs
),
scored AS (
  SELECT query_id, neighbor_id,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dotp,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS qq,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nn
  FROM terms GROUP BY query_id, neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         dotp / (sqrt(qq) * sqrt(nn)) AS cos_raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dotp / (sqrt(qq) * sqrt(nn)) DESC,
                                     neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(cos_raw, 6) AS cos_sim
FROM ranked WHERE rank <= 5
"""


def _lsh_topk(spark, sf_dir):
    return similarity.lsh_topk(_t(spark, sf_dir, "embeddings"), k=5)


def _ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, k=5)


def _lsh_near_dup(spark, sf_dir):
    return similarity.lsh_near_dup_pairs(_t(spark, sf_dir, "embeddings"))


def _emb_near_dup(spark, sf_dir):
    return similarity.embedding_near_dup(_t(spark, sf_dir, "embeddings"))


_EMB_NEAR_DUP_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS va, b.embedding AS vb
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
terms AS (
  SELECT vec_a, vec_b, unnest(va) AS x, unnest(vb) AS y FROM pairs
),
scored AS (
  SELECT vec_a, vec_b,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dotp,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS aa,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS bb
  FROM terms GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b,
       round(dotp / (sqrt(aa) * sqrt(bb)), 6) AS cos_sim
FROM scored
WHERE dotp / (sqrt(aa) * sqrt(bb)) >= 0.45
"""


# --------------------------------------------------------------------

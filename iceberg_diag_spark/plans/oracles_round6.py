"""Round-6 additions: clone detection, DSIR, retrieval scoring, SCD2, privacy audits.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from iceberg_diag_spark.operators import (
    dedup,
    events,
    maintenance,
    multimodal,
    privacy,
    profiling,
    sampling,
    similarity,
    textops,
)
from iceberg_diag_spark.sources.data_files import (
    column_values_from_lineitem,
    file_column_stats_from_lineitem,
    files_from_lineitem,
)
from iceberg_diag_spark.streaming import stream_ops
from iceberg_diag_spark.plans.common import FILES_CTE, QuerySpec, REGISTRY, _t


# Round-6 additions: pairwise clone detection, DSIR importance
# scores, Heaps-law vocabulary growth, file-size skew, split drift.
# --------------------------------------------------------------------

def _winnow_clone_pairs(spark, sf_dir):
    return dedup.winnow_clone_pairs(_t(spark, sf_dir, "documents"))


# Shares the winnowing CTE chain with _WINNOW_SQL; the pair stage
# mirrors the operator exactly: fingerprints in 2..64 docs, pairs
# within a fingerprint's posting list only, >= 2 shared fingerprints.
_WINNOW_CLONE_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, i AS pos,
         ('0x' || substring(md5(array_to_string(toks[i + 1 : i + 3], ' ')), 1, 15))::BIGINT AS gh
  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 3)) AS i
        FROM norm WHERE len(toks) >= 3)
),
win AS (
  SELECT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
  FROM pos
),
sel AS (SELECT DISTINCT doc_id, fp FROM win WHERE wn = 4),
fpc AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) BETWEEN 2 AND 64),
kept AS (SELECT s.doc_id, s.fp FROM sel s JOIN fpc USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2
"""


def _dsir_logratio(spark, sf_dir):
    return textops.dsir_logratio(_t(spark, sf_dir, "documents"))


_DSIR_SQL = r"""
WITH toks AS (
  SELECT doc_id, source = 'src0' AS is_t,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
  FROM documents
),
vocab AS (
  SELECT term,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
  FROM toks GROUP BY term
),
tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS nt, CAST(sum(cr) AS DOUBLE) AS nr,
               CAST(count(*) AS DOUBLE) AS v
        FROM vocab),
scored AS (
  SELECT term,
         CAST(FLOOR((ln(CAST(ct + 1 AS DOUBLE) / (nt + v))
                     - ln(CAST(cr + 1 AS DOUBLE) / (nr + v))) * 1000000.0)
              AS BIGINT) AS lr_micro
  FROM vocab CROSS JOIN tot
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(lr_micro) AS BIGINT) AS sum_lr_micro,
       CAST(FLOOR(CAST(sum(lr_micro) AS DOUBLE) / count(*)) AS BIGINT) AS avg_lr_micro
FROM toks t JOIN scored USING (term)
GROUP BY t.doc_id
"""


def _vocab_growth_curve(spark, sf_dir):
    return textops.vocab_growth_curve(_t(spark, sf_dir, "documents"))


_VOCAB_GROWTH_SQL = r"""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
toks AS (
  SELECT doc_id * 16 // (m + 1) AS shard_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
  FROM documents CROSS JOIN mx
),
per_shard AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY shard_id
),
first_seen AS (SELECT term, min(shard_id) AS shard_id FROM toks GROUP BY term),
news AS (
  SELECT shard_id, CAST(count(*) AS BIGINT) AS new_types
  FROM first_seen GROUP BY shard_id
)
SELECT CAST(p.shard_id AS BIGINT) AS shard_id, p.n_tokens,
       CAST(coalesce(n.new_types, 0) AS BIGINT) AS new_types,
       CAST(sum(coalesce(n.new_types, 0)) OVER (ORDER BY p.shard_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types
FROM per_shard p LEFT JOIN news n ON p.shard_id = n.shard_id
"""


def _diag_file_skew(spark, sf_dir):
    files = files_from_lineitem(_t(spark, sf_dir, "lineitem"))
    return maintenance.file_skew_audit(files)


_DIAG_FILE_SKEW_SQL = f"""
WITH files AS ({FILES_CTE}),
g AS (
  SELECT partition_key,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(file_size_in_bytes) AS BIGINT) AS total_bytes,
         CAST(min(file_size_in_bytes) AS BIGINT) AS min_bytes,
         CAST(max(file_size_in_bytes) AS BIGINT) AS max_bytes,
         CAST(sum(CAST(file_size_in_bytes AS HUGEINT) * file_size_in_bytes)
              AS HUGEINT) AS ss
  FROM files WHERE content = 0
  GROUP BY partition_key
)
SELECT partition_key, n_files, total_bytes, min_bytes, max_bytes,
       -- sqrt keeps dispersion inside int64 at any physical file
       -- size (the variance itself wraps past ~TiB); conversion +
       -- sqrt + divide are fixed-order correctly-rounded IEEE ops
       CAST(FLOOR(sqrt(CAST(n_files * ss
                            - CAST(total_bytes AS HUGEINT) * total_bytes
                            AS DOUBLE)) / n_files) AS BIGINT) AS stddev_bytes,
       CAST((1000000 * max_bytes) // total_bytes AS BIGINT) AS max_share_ppm
FROM g
"""


def _embedding_drift_audit(spark, sf_dir):
    return similarity.embedding_drift_audit(_t(spark, sf_dir, "embeddings"))


_EMB_DRIFT_SQL = """
WITH ex AS (
  SELECT label, vec_id % 2 = 0 AS is_a,
         generate_subscripts(embedding, 1) AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 256.0) AS BIGINT) AS q
  FROM embeddings
),
per_dim AS (
  SELECT label, pos,
         CAST(sum(CASE WHEN is_a THEN q ELSE 0 END) AS HUGEINT) AS sa,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE q END) AS HUGEINT) AS sb,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS nb
  FROM ex GROUP BY label, pos
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(min(na) AS BIGINT) AS n_a,
       CAST(min(nb) AS BIGINT) AS n_b,
       CAST(sum((sa * nb - sb * na) * (sa * nb - sb * na))
            // (CAST(min(na) AS HUGEINT) * min(nb) * min(na) * min(nb))
            AS BIGINT) AS drift_sq_q
FROM per_dim
WHERE na > 0 AND nb > 0
GROUP BY label
"""


def _lsh_topk_exact(spark, sf_dir):
    return similarity.lsh_topk_exact(_t(spark, sf_dir, "embeddings"))


def _lsh_topk_exact_sql() -> str:
    planes = similarity.md5_hyperplanes()
    values = ", ".join(
        f"({t},{p},{d},{h})"
        for t, tp in enumerate(planes)
        for p, row in enumerate(tp)
        for d, h in enumerate(row)
    )
    return f"""
WITH planes(t, p, d, h) AS (VALUES {values}),
ex AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 256.0) AS BIGINT) AS q
  FROM embeddings
),
dots AS (
  SELECT vec_id, t, p, sum(q * h) AS dt
  FROM ex JOIN planes USING (d) GROUP BY vec_id, t, p
),
bks AS (
  SELECT vec_id, t,
         CAST(sum(CASE WHEN dt > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM bks a JOIN bks b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id != b.vec_id
),
pairdots AS (
  SELECT c.query_id, c.neighbor_id,
         sum(ea.q * eb.q) AS dd,
         sum(ea.q * ea.q) AS na2,
         sum(eb.q * eb.q) AS nb2
  FROM cand c
  JOIN ex ea ON ea.vec_id = c.query_id
  JOIN ex eb ON eb.vec_id = c.neighbor_id AND ea.d = eb.d
  GROUP BY c.query_id, c.neighbor_id
),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(floor(1000000.0 * dd / (sqrt(na2) * sqrt(nb2))) AS BIGINT)
           AS cos_mppm
  FROM pairdots WHERE na2 > 0 AND nb2 > 0
),
ranked AS (
  SELECT query_id, neighbor_id, cos_mppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_mppm DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_mppm
FROM ranked WHERE rank <= 5
"""


_LSH_TOPK_EXACT_SQL = _lsh_topk_exact_sql()


def _ivf_topk_exact(spark, sf_dir):
    return similarity.ivf_topk_exact(_t(spark, sf_dir, "embeddings"))


def _ivf_topk_exact_sql() -> str:
    cents = similarity.md5_centroids()
    values = ", ".join(
        f"({c},{d},{h})"
        for c, row in enumerate(cents)
        for d, h in enumerate(row)
    )
    return f"""
WITH cents(c, d, h) AS (VALUES {values}),
ex AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 256.0) AS BIGINT) AS q
  FROM embeddings
),
dists AS (
  SELECT vec_id, c, sum((q - h) * (q - h)) AS d2
  FROM ex JOIN cents USING (d) GROUP BY vec_id, c
),
ranked_cells AS (
  SELECT vec_id, c,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
  FROM dists
),
assigned AS (SELECT vec_id AS neighbor_id, c AS list_id
             FROM ranked_cells WHERE rn = 1),
probes AS (SELECT vec_id AS query_id, c AS list_id
           FROM ranked_cells WHERE rn <= 4),
cand AS (
  SELECT p.query_id, a.neighbor_id
  FROM probes p JOIN assigned a USING (list_id)
  WHERE p.query_id != a.neighbor_id
),
pairdots AS (
  SELECT c.query_id, c.neighbor_id,
         sum(ea.q * eb.q) AS dd,
         sum(ea.q * ea.q) AS na2,
         sum(eb.q * eb.q) AS nb2
  FROM cand c
  JOIN ex ea ON ea.vec_id = c.query_id
  JOIN ex eb ON eb.vec_id = c.neighbor_id AND ea.d = eb.d
  GROUP BY c.query_id, c.neighbor_id
),
scored AS (
  SELECT query_id, neighbor_id,
         CAST(floor(1000000.0 * dd / (sqrt(na2) * sqrt(nb2))) AS BIGINT)
           AS cos_mppm
  FROM pairdots WHERE na2 > 0 AND nb2 > 0
),
ranked AS (
  SELECT query_id, neighbor_id, cos_mppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_mppm DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_mppm
FROM ranked WHERE rank <= 5
"""


_IVF_TOPK_EXACT_SQL = _ivf_topk_exact_sql()


def _embedding_dim_covariance(spark, sf_dir):
    return similarity.embedding_dim_covariance(
        _t(spark, sf_dir, "embeddings")
    )


_EMB_COV_SQL = """
WITH ex AS MATERIALIZED (
  SELECT vec_id AS rid,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024.0) AS BIGINT) AS q
  FROM embeddings
),
mom AS (
  SELECT pos, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(q) AS HUGEINT) AS s,
         CAST(sum(q * q) AS HUGEINT) AS ss
  FROM ex GROUP BY pos
),
top AS (
  SELECT pos FROM mom
  ORDER BY (n * ss - s * s) DESC, pos ASC
  LIMIT 8
),
kept AS (SELECT e.rid, e.pos, e.q FROM ex e JOIN top USING (pos)),
pairs AS (
  SELECT a.pos AS pos_a, b.pos AS pos_b,
         CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum(CAST(a.q AS HUGEINT)) AS HUGEINT) AS sa,
         CAST(sum(CAST(b.q AS HUGEINT)) AS HUGEINT) AS sb,
         CAST(sum(CAST(a.q AS HUGEINT) * b.q) AS HUGEINT) AS sab
  FROM kept a JOIN kept b ON a.rid = b.rid AND a.pos < b.pos
  GROUP BY a.pos, b.pos
)
SELECT CAST(pos_a AS INTEGER) AS pos_a, CAST(pos_b AS INTEGER) AS pos_b,
       n_vecs,
       CAST((n_vecs * sab - sa * sb)
            // (CAST(n_vecs AS HUGEINT) * n_vecs) AS BIGINT) AS cov_q
FROM pairs
"""


REGISTRY.update({
    "lsh_topk_exact": QuerySpec(
        _lsh_topk_exact, _LSH_TOPK_EXACT_SQL,
        "hash-oracle-able approximate kNN: same-bucket candidates "
        "over md5-derived integer hyperplanes, exact integer dots, "
        "total deterministic (cos_mppm desc, neighbor asc) ranking — "
        "approximation lives only in candidate recall",
    ),
    "ivf_topk_exact": QuerySpec(
        _ivf_topk_exact, _IVF_TOPK_EXACT_SQL,
        "hash-oracle-able IVF kNN: fixed md5-derived integer "
        "centroids, exact integer squared-distance assignment "
        "(one array_sort per vector, no corpus-wide window), "
        "n_probe nearest cells per query, exact integer cosine "
        "ranking",
    ),
    "embedding_dim_covariance": QuerySpec(
        _embedding_dim_covariance, _EMB_COV_SQL,
        "pairwise covariance over the top-8 variance dimensions "
        "(exact 128-bit moments, truncating integer division — the "
        "rank-collapse / anisotropy-direction audit; two-phase, "
        "never a D^2 expansion)",
    ),
    "winnow_clone_pairs": QuerySpec(
        _winnow_clone_pairs, _WINNOW_CLONE_SQL,
        "MOSS-style clone pairs: docs sharing >= 2 winnowing "
        "fingerprints (exact shared-span evidence, boilerplate-"
        "capped posting lists, never all-pairs)",
    ),
    "dsir_logratio": QuerySpec(
        _dsir_logratio, _DSIR_SQL,
        "DSIR importance log-ratio per doc (target-vs-rest Laplace "
        "unigram LMs, per-term micro-nat quantization before exact "
        "integer per-doc sums)",
    ),
    "vocab_growth_curve": QuerySpec(
        _vocab_growth_curve, _VOCAB_GROWTH_SQL,
        "Heaps-law vocabulary growth across sequential curriculum "
        "shards: per-shard token volume, first-seen types, cumulative "
        "vocabulary (saturation/noise audit)",
    ),
    "diag_file_skew": QuerySpec(
        _diag_file_skew, _DIAG_FILE_SKEW_SQL,
        "per-partition file-size dispersion: exact 128-bit variance "
        "+ largest-file byte share in ppm (straggler/tiny-file "
        "layout audit)",
    ),
    "embedding_drift_audit": QuerySpec(
        _embedding_drift_audit, _EMB_DRIFT_SQL,
        "split-drift audit: exact rational squared centroid gap "
        "between id-parity halves per label (train/val "
        "exchangeability check)",
    ),
})


# --------------------------------------------------------------------
# Round-6b extensions: retrieval scoring, SCD2 history, privacy audit,
# collocation mining
# --------------------------------------------------------------------

def _bm25_topk(spark, sf_dir):
    return textops.bm25_topk(_t(spark, sf_dir, "documents"))


_BM25_SQL = r"""
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
doclen AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM doclen
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
         CAST(max(dl) AS BIGINT) AS dl
  FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               unnest(toks) AS term
        FROM base) x
  WHERE term IN ('spark', 'join', 'window')
  GROUP BY doc_id, term
),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(FLOOR(1000000.0
              * ln(1.0 + ((t.n_docs - dft.df + 0.5) / (dft.df + 0.5)))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * (tf.dl / t.avgdl)))))
           AS BIGINT) AS s_micro
  FROM tf JOIN dft USING (term) CROSS JOIN totals t
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
       CAST(sum(s_micro) AS BIGINT) AS bm25_micro
FROM scored GROUP BY doc_id
ORDER BY bm25_micro DESC, doc_id ASC
LIMIT 50
"""


def _hybrid_retrieval(spark, sf_dir):
    return textops.hybrid_retrieval_topk(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
    )


_HYBRID_RETRIEVAL_SQL = r"""
WITH base AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
doclen AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM doclen
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
         CAST(max(dl) AS BIGINT) AS dl
  FROM (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
               unnest(toks) AS term
        FROM base) x
  WHERE term IN ('spark', 'join', 'window')
  GROUP BY doc_id, term
),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
sc AS (
  SELECT tf.doc_id,
         CAST(FLOOR(1000000.0
              * ln(1.0 + ((t.n_docs - dft.df + 0.5) / (dft.df + 0.5)))
              * ((tf.tf * 2.2)
                 / (tf.tf + 1.2 * (0.25 + 0.75 * (tf.dl / t.avgdl)))))
           AS BIGINT) AS s_micro
  FROM tf JOIN dft USING (term) CROSS JOIN totals t
),
bm AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_hit,
         CAST(sum(s_micro) AS BIGINT) AS bm25_micro
  FROM sc GROUP BY doc_id
  ORDER BY bm25_micro DESC, doc_id ASC
  LIMIT 50
),
fb AS (
  SELECT doc_id FROM bm
  ORDER BY bm25_micro DESC, doc_id ASC LIMIT 10
),
qv AS (
  SELECT vec_id AS doc_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 256) AS BIGINT)
           AS qd
  FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM bm)
),
fdim AS (
  SELECT pos, CAST(sum(qd) AS BIGINT) AS qs
  FROM qv WHERE doc_id IN (SELECT doc_id FROM fb)
  GROUP BY pos
),
qn AS (SELECT CAST(sum(qs * qs) AS BIGINT) AS nq2 FROM fdim),
dots AS (
  SELECT q.doc_id,
         CAST(sum(q.qd * f.qs) AS BIGINT) AS d,
         CAST(sum(q.qd * q.qd) AS BIGINT) AS nd2
  FROM qv q JOIN fdim f USING (pos)
  GROUP BY q.doc_id
),
rr AS (
  SELECT dots.doc_id,
         CAST(FLOOR(1000000.0 * dots.d
              / (sqrt(qn.nq2) * sqrt(dots.nd2))) AS BIGINT) AS cos_mppm
  FROM dots CROSS JOIN qn
  WHERE dots.nd2 > 0 AND qn.nq2 > 0
)
SELECT doc_id, rank, cos_mppm, n_terms_hit, bm25_micro
FROM (
  SELECT r.doc_id,
         CAST(row_number() OVER (ORDER BY r.cos_mppm DESC, r.doc_id ASC)
           AS BIGINT) AS rank,
         r.cos_mppm, b.n_terms_hit, b.bm25_micro
  FROM rr r JOIN bm b USING (doc_id)
) WHERE rank <= 10
"""


def _bpe_merge_candidates(spark, sf_dir):
    return textops.bpe_merge_candidates(_t(spark, sf_dir, "documents"))


_BPE_MERGE_SQL = r"""
WITH w AS (
  SELECT t AS w, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS t
        FROM documents)
  WHERE len(t) >= 2
  GROUP BY t
),
p AS (
  SELECT substring(w, CAST(unnest(generate_series(1, len(w) - 1)) AS INTEGER), 2) AS pair,
         w, wc
  FROM w
)
SELECT pair,
       CAST(count(DISTINCT w) AS BIGINT) AS n_word_forms,
       CAST(sum(wc) AS BIGINT) AS merge_count
FROM p GROUP BY pair
ORDER BY merge_count DESC, pair ASC
LIMIT 20
"""


def _source_quality_calibration(spark, sf_dir):
    return textops.source_quality_calibration(
        _t(spark, sf_dir, "documents")
    )


_SOURCE_QUALITY_CAL_SQL = r"""
WITH s AS (
  SELECT doc_id, source,
         CAST(FLOOR(1000000
              * CAST(len(list_distinct(string_split(
                  regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
                AS BIGINT)
              / greatest(len(string_split(
                  regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')), 1))
           AS BIGINT) AS ttr_ppm
  FROM documents
),
r AS (
  SELECT doc_id, source, ttr_ppm,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY ttr_ppm, doc_id) AS BIGINT)
           AS src_rank,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
  FROM s
)
SELECT doc_id, source, ttr_ppm, src_rank,
       CAST(FLOOR(1000000 * (src_rank - 1) / greatest(n_s - 1, 1))
         AS BIGINT) AS pct_ppm
FROM r
"""


def _embedding_consistency(spark, sf_dir):
    """Constructed re-crawl (the corpus has no natural exact dups at
    the gate SF): every doc_id % 5 == 0 document re-appears under
    id + 100000 with identical text; its embedding is copied
    verbatim for % 10 == 0 (a CONSISTENT re-embed) and reversed
    otherwise (the stale/mixed-up vector the audit must catch)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs2 = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    emb2 = emb.unionByName(
        emb.filter(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.when(
                F.col("vec_id") % 10 == 0, F.col("embedding")
            ).otherwise(F.reverse(F.col("embedding"))).alias("embedding"),
        )
    )
    return similarity.embedding_consistency_audit(docs2, emb2)


_EMB_CONSISTENCY_SQL = r"""
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents
  WHERE doc_id % 5 = 0
),
emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         CASE WHEN vec_id % 10 = 0 THEN embedding
              ELSE list_reverse(embedding) END AS embedding
  FROM embeddings WHERE vec_id % 5 = 0
),
h AS (
  SELECT doc_id,
         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS hh
  FROM docs2
),
g AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY hh) AS rep_id,
         count(*) OVER (PARTITION BY hh) AS n
  FROM h
),
m AS (SELECT rep_id, doc_id FROM g WHERE n > 1 AND doc_id <> rep_id),
qv AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 256) AS BIGINT)
           AS qd
  FROM emb2
),
ds AS (
  SELECT m.rep_id, m.doc_id,
         CAST(sum(a.qd * b.qd) AS BIGINT) AS d,
         CAST(sum(a.qd * a.qd) AS BIGINT) AS na2,
         CAST(sum(b.qd * b.qd) AS BIGINT) AS nb2
  FROM m JOIN qv a ON a.vec_id = m.rep_id
         JOIN qv b ON b.vec_id = m.doc_id AND b.pos = a.pos
  GROUP BY m.rep_id, m.doc_id
)
SELECT rep_id, doc_id,
       CAST(FLOOR(1000000.0 * d / (sqrt(na2) * sqrt(nb2))) AS BIGINT)
         AS cos_mppm
FROM ds
WHERE na2 > 0 AND nb2 > 0
  AND CAST(FLOOR(1000000.0 * d / (sqrt(na2) * sqrt(nb2))) AS BIGINT)
        < 950000
"""


def _events_scd2(spark, sf_dir):
    return events.scd2_build(_t(spark, sf_dir, "events"))


_EVENTS_SCD2_SQL = """
WITH runs AS (
  SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
f AS (
  SELECT user_id, state, ts_us, event_id
  FROM runs WHERE prev IS NULL OR prev <> state
)
SELECT user_id, state,
       ts_us AS valid_from_us,
       lead(ts_us) OVER w2 AS valid_to_us,
       CAST(row_number() OVER w2 AS BIGINT) AS version_seq,
       CAST(lead(ts_us) OVER w2 IS NULL AS BIGINT) AS is_current
FROM f
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


def _stream_scd2(spark, sf_dir):
    """Streaming SCD2 feed: drain the event stream availableNow and
    emit every interval the run-collapse CLOSES (append mode; the
    open run per user stays in keyed state)."""
    return stream_ops.run_to_table(
        stream_ops.scd2_stream(
            stream_ops.read_events_stream(spark, sf_dir)
        ),
        "append",
        "stream_scd2",
    )


_STREAM_SCD2_SQL = """
WITH runs AS (
  SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER w AS prev
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
f AS (
  SELECT user_id, state, ts_us, event_id
  FROM runs WHERE prev IS NULL OR prev <> state
),
iv AS (
  SELECT user_id, state,
         ts_us AS valid_from_us,
         lead(ts_us) OVER w2 AS valid_to_us,
         CAST(row_number() OVER w2 AS BIGINT) AS version_seq
  FROM f
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
-- disorder_seen is identically 0 under the oracle's single
-- availableNow drain: no row can arrive behind a prior batch's
-- per-user frontier when there is only one batch
SELECT user_id, state, valid_from_us, valid_to_us, version_seq,
       CAST(0 AS BIGINT) AS disorder_seen
FROM iv WHERE valid_to_us IS NOT NULL
"""


def _customer_k_anonymity(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / F.lit(1000))
        .cast("long")
        .alias("acctbal_kb"),
        "c_mktsegment",
    )
    return privacy.k_anonymity_audit(
        cust, ["c_nationkey", "acctbal_kb"], "c_mktsegment"
    )


_K_ANONYMITY_SQL = """
WITH q AS (
  SELECT c_nationkey,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS acctbal_kb,
         c_mktsegment
  FROM customer
),
classes AS (
  SELECT c_nationkey, acctbal_kb,
         CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l
  FROM q GROUP BY c_nationkey, acctbal_kb
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_classes,
       CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
         AS records_at_risk,
       CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS homogeneous_classes,
       CAST(min(n) AS BIGINT) AS min_class_size,
       CAST(min(l) AS BIGINT) AS min_l
FROM classes CROSS JOIN (SELECT unnest([2, 5, 10, 20]) AS k) ks
GROUP BY k
"""


def _pii_density(spark, sf_dir):
    """Same synthetic PII footer as pii_redaction (the corpus ships
    clean), injected into every third doc so the per-source density
    varies and clean docs exercise the zero path."""
    docs = _t(spark, sf_dir, "documents")
    footer = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ssn "),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(1000)).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(100)).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" ph 555-"),
        F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
    )
    tainted = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, footer).otherwise(F.col("text")),
    )
    return textops.pii_density_by_source(tainted)


_PII_DENSITY_SQL = r"""
WITH t AS (
  SELECT source,
         CASE WHEN doc_id % 3 = 0 THEN
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com ssn '
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' ph 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END AS t
  FROM documents
),
c AS (
  SELECT source,
         length(t) AS chars,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
         len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS s,
         len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS p
  FROM t
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN e + s + p > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(sum(e) AS BIGINT) AS n_emails,
       CAST(sum(s) AS BIGINT) AS n_ssns,
       CAST(sum(p) AS BIGINT) AS n_phones,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST((1000000 * sum(e + s + p)) // greatest(sum(chars), 1) AS BIGINT)
         AS pii_per_mchar
FROM c GROUP BY source
"""


def _ngram_dup_curve(spark, sf_dir):
    return dedup.ngram_dup_curve(_t(spark, sf_dir, "documents"))


_NGRAM_DUP_CURVE_SQL = r"""
WITH norm AS (
  SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
ns AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
g AS (
  SELECT ns.n,
         unnest(CASE WHEN len(toks) >= ns.n THEN
            list_transform(generate_series(0, len(toks) - ns.n),
                           i -> md5(array_to_string(toks[i+1:i+ns.n], ' ')))
         ELSE [] END) AS g
  FROM norm CROSS JOIN ns
),
pg AS (SELECT n, g, count(*) AS c FROM g GROUP BY n, g)
SELECT CAST(n AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS total_grams,
       CAST(count(*) AS BIGINT) AS distinct_grams,
       CAST((CAST(sum(c) - count(*) AS HUGEINT) * 1000000) // sum(c)
            AS BIGINT) AS dup_ppm
FROM pg GROUP BY n
"""


def _user_activity_gini(spark, sf_dir):
    return events.user_activity_gini(_t(spark, sf_dir, "events"))


_USER_GINI_SQL = """
WITH counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
hist AS (SELECT c, CAST(count(*) AS BIGINT) AS m FROM counts GROUP BY c),
blocks AS (
  SELECT c, m,
         COALESCE(sum(m) OVER (ORDER BY c
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum_before
  FROM hist
),
mom AS (
  SELECT CAST(sum(m) AS BIGINT) AS n_users,
         CAST(sum(CAST(c AS HUGEINT) * m) AS HUGEINT) AS t_events,
         CAST(max(c) AS BIGINT) AS max_user_events,
         CAST(sum(CAST(c AS HUGEINT)
                  * (CAST(m AS HUGEINT) * cum_before
                     + CAST(m AS HUGEINT) * (m + 1) // 2))
              AS HUGEINT) AS s_rank
  FROM blocks
)
SELECT n_users,
       CAST(t_events AS BIGINT) AS total_events,
       max_user_events,
       CAST((2 * s_rank * 1000000
             - (n_users + 1) * t_events * 1000000)
            // (CAST(n_users AS HUGEINT) * t_events) AS BIGINT)
         AS gini_ppm
FROM mom
"""


def _clone_pairs_verified(spark, sf_dir):
    return dedup.clone_pairs_verified(_t(spark, sf_dir, "documents"))


_CLONE_VERIFIED_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
  FROM documents
),
pos AS (
  SELECT doc_id, i AS pos,
         ('0x' || substring(md5(array_to_string(toks[i + 1 : i + 3], ' ')), 1, 15))::BIGINT AS gh
  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 3)) AS i
        FROM norm WHERE len(toks) >= 3)
),
win AS (
  SELECT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
  FROM pos
),
sel AS (SELECT DISTINCT doc_id, fp FROM win WHERE wn = 4),
fpc AS (SELECT fp FROM sel GROUP BY fp HAVING count(*) BETWEEN 2 AND 64),
kept AS (SELECT s.doc_id, s.fp FROM sel s JOIN fpc USING (fp)),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS shared_fps
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= 2
),
scored AS (
  SELECT c.doc_a, c.doc_b, c.shared_fps,
         CAST(levenshtein(na.nt, nb.nt) AS BIGINT) AS distance,
         CAST(FLOOR(1000000 * levenshtein(na.nt, nb.nt)
              / greatest(length(na.nt), length(nb.nt), 1)) AS BIGINT)
           AS dist_ppm
  FROM cand c
  JOIN norm na ON na.doc_id = c.doc_a
  JOIN norm nb ON nb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, shared_fps, distance, dist_ppm
FROM scored WHERE dist_ppm <= 200000
"""


def _exact_quota_holdout(spark, sf_dir):
    return sampling.exact_quota_holdout(
        _t(spark, sf_dir, "documents"), holdout_ppm=100_000
    )


_EXACT_QUOTA_SQL = """
WITH keyed AS (
  SELECT doc_id, source AS stratum,
         md5(CAST(doc_id AS VARCHAR)) AS mh
  FROM documents
),
counts AS (
  SELECT stratum, CAST(count(*) AS BIGINT) AS n_s
  FROM keyed GROUP BY stratum
),
totals AS (
  SELECT CAST(sum(n_s) AS BIGINT) AS n_total,
         CAST(sum((n_s * 100000) // 1000000) AS BIGINT) AS base_total
  FROM counts
),
quotas AS (
  SELECT stratum,
         (n_s * 100000) // 1000000
           + CASE WHEN row_number() OVER (
                    ORDER BY n_s * 100000
                             - ((n_s * 100000) // 1000000) * 1000000 DESC,
                             stratum ASC)
                    <= (n_total * 100000) // 1000000 - base_total
             THEN 1 ELSE 0 END AS quota
  FROM counts CROSS JOIN totals
)
SELECT k.doc_id, k.stratum, CAST(k.rn AS BIGINT) AS pick_rank
FROM (
  SELECT doc_id, stratum,
         row_number() OVER (PARTITION BY stratum ORDER BY mh, doc_id)
           AS rn
  FROM keyed
) k JOIN quotas USING (stratum)
WHERE k.rn <= quota
"""


def _media_integrity(spark, sf_dir):
    """Synthetic magic headers (the corpus ships text payloads):
    every item gets its declared type's signature prepended EXCEPT
    doc_id % 4 == 0, which gets a junk header — the constructed
    corruption the audit must count per type."""
    media = multimodal.with_media(_t(spark, sf_dir, "documents"))
    magic = None
    for t, h in multimodal.MEDIA_MAGIC.items():
        cond = F.when(F.col("media_type") == t, F.lit(h))
        magic = cond if magic is None else magic.when(
            F.col("media_type") == t, F.lit(h)
        )
    hdr = F.unhex(
        F.when(F.col("doc_id") % 4 == 0, F.lit("DEADBEEF")).otherwise(magic)
    )
    tainted = media.withColumn(
        "payload", F.concat(hdr, F.col("payload"))
    )
    return multimodal.media_integrity_audit(tainted)


_MEDIA_INTEGRITY_SQL = """
WITH p AS (
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1]
           AS media_type,
         from_hex(CASE WHEN doc_id % 4 = 0 THEN 'DEADBEEF'
                       WHEN doc_id % 3 = 0 THEN '89504E47'
                       WHEN doc_id % 3 = 1 THEN '52494646'
                       ELSE '00000018' END) || encode(text) AS payload
  FROM documents
),
c AS (
  SELECT media_type, doc_id,
         substring(hex(payload), 1, 8) =
           CASE media_type WHEN 'image' THEN '89504E47'
                           WHEN 'audio' THEN '52494646'
                           ELSE '00000018' END AS ok
  FROM p
)
SELECT media_type,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt,
       CAST((1000000 * sum(CASE WHEN ok THEN 0 ELSE 1 END)) // count(*)
            AS BIGINT) AS corrupt_ppm,
       CAST(min(CASE WHEN NOT ok THEN doc_id END) AS BIGINT)
         AS example_corrupt_id
FROM c GROUP BY media_type
"""


def _quality_dup_matrix(spark, sf_dir):
    return textops.quality_dup_matrix(_t(spark, sf_dir, "documents"))


_QUALITY_DUP_MATRIX_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CAST(FLOOR(1000000
              * CAST(len(list_distinct(string_split(
                  regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
                AS BIGINT)
              / greatest(len(string_split(
                  regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')), 1))
           AS BIGINT) AS ttr_ppm,
         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
  FROM documents
),
dc AS (SELECT h, count(*) AS n FROM base GROUP BY h),
marked AS (
  SELECT ttr_ppm, CAST(dc.n > 1 AS BIGINT) AS is_dup
  FROM base JOIN dc USING (h)
),
qs AS (
  SELECT [quantile_cont(ttr_ppm, 0.1), quantile_cont(ttr_ppm, 0.2),
          quantile_cont(ttr_ppm, 0.3), quantile_cont(ttr_ppm, 0.4),
          quantile_cont(ttr_ppm, 0.5), quantile_cont(ttr_ppm, 0.6),
          quantile_cont(ttr_ppm, 0.7), quantile_cont(ttr_ppm, 0.8),
          quantile_cont(ttr_ppm, 0.9)] AS q
  FROM marked
),
bucketed AS (
  SELECT 1 + CAST(ttr_ppm > q[1] AS INT) + CAST(ttr_ppm > q[2] AS INT)
           + CAST(ttr_ppm > q[3] AS INT) + CAST(ttr_ppm > q[4] AS INT)
           + CAST(ttr_ppm > q[5] AS INT) + CAST(ttr_ppm > q[6] AS INT)
           + CAST(ttr_ppm > q[7] AS INT) + CAST(ttr_ppm > q[8] AS INT)
           + CAST(ttr_ppm > q[9] AS INT) AS decile,
         ttr_ppm, is_dup
  FROM marked CROSS JOIN qs
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(is_dup) AS BIGINT) AS dup_docs,
       CAST((1000000 * sum(is_dup)) // count(*) AS BIGINT) AS dup_ppm,
       CAST(min(ttr_ppm) AS BIGINT) AS min_ttr_ppm,
       CAST(max(ttr_ppm) AS BIGINT) AS max_ttr_ppm
FROM bucketed GROUP BY decile
"""


def _events_cadence_autocorr(spark, sf_dir):
    return events.cadence_autocorr(_t(spark, sf_dir, "events"))


_CADENCE_AUTOCORR_SQL = """
WITH hrs AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM hrs GROUP BY 1),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS h FROM span
),
dense AS (
  SELECT s.event_type, s.h, COALESCE(hrs.c, 0) AS c
  FROM spine s
  LEFT JOIN hrs ON s.event_type = hrs.event_type AND s.h = hrs.h
),
ks AS (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag_h),
pairs AS (
  SELECT a.event_type, ks.lag_h, a.c AS x, b.c AS y
  FROM dense a CROSS JOIN ks
  JOIN dense b ON b.event_type = a.event_type AND b.h = a.h + ks.lag_h
),
mom AS (
  SELECT event_type, CAST(lag_h AS BIGINT) AS lag_h,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag_h, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx > 0
             AND n_pairs * syy - sy * sy > 0 THEN
         CAST(FLOOR(1000000.0
            * CAST(n_pairs * sxy - sx * sy AS DOUBLE)
            / (SQRT(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
               * SQRT(CAST(n_pairs * syy - sy * sy AS DOUBLE))))
           AS BIGINT)
       ELSE NULL END AS corr_ppm
FROM mom
"""


def _events_hourly_trend(spark, sf_dir):
    return events.hourly_trend(_t(spark, sf_dir, "events"))


_HOURLY_TREND_SQL = """
WITH hrs AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM hrs GROUP BY 1),
spine AS (
  SELECT event_type, lo, unnest(generate_series(lo, hi)) AS h FROM span
),
dense AS (
  SELECT s.event_type, s.h - s.lo AS x, COALESCE(hrs.c, 0) AS y
  FROM spine s
  LEFT JOIN hrs ON s.event_type = hrs.event_type AND s.h = hrs.h
),
mom AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
  FROM dense GROUP BY 1
)
SELECT event_type, n_hours, CAST(sy AS BIGINT) AS total_events,
       CASE WHEN n_hours * sxx - sx * sx > 0 THEN
         CAST(FLOOR(1000000.0
            * CAST(n_hours * sxy - sx * sy AS DOUBLE)
            / CAST(n_hours * sxx - sx * sx AS DOUBLE)) AS BIGINT)
       ELSE NULL END AS slope_mppm,
       CASE WHEN n_hours * sxx - sx * sx > 0
             AND n_hours * syy - sy * sy > 0 THEN
         CAST(FLOOR(1000000.0
            * CAST(n_hours * sxy - sx * sy AS DOUBLE)
            * CAST(n_hours * sxy - sx * sy AS DOUBLE)
            / (CAST(n_hours * sxx - sx * sx AS DOUBLE)
               * CAST(n_hours * syy - sy * sy AS DOUBLE))) AS BIGINT)
       ELSE NULL END AS r2_ppm
FROM mom
"""


def _events_changepoint(spark, sf_dir):
    return events.changepoint_detect(_t(spark, sf_dir, "events"))


_CHANGEPOINT_SQL = """
WITH hrs AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (SELECT event_type, min(h) AS lo, max(h) AS hi FROM hrs GROUP BY 1),
spine AS (
  SELECT event_type, lo, unnest(generate_series(lo, hi)) AS h FROM span
),
dense AS (
  SELECT s.event_type, s.h - s.lo + 1 AS i, COALESCE(hrs.c, 0) AS y
  FROM spine s
  LEFT JOIN hrs ON s.event_type = hrs.event_type AND s.h = hrs.h
),
cum AS (
  SELECT event_type, i,
         sum(CAST(y AS HUGEINT)) OVER (PARTITION BY event_type
                                       ORDER BY i
                                       ROWS UNBOUNDED PRECEDING) AS s_i,
         sum(CAST(y AS HUGEINT)) OVER (PARTITION BY event_type) AS s_n,
         max(i) OVER (PARTITION BY event_type) AS n_hours
  FROM dense
),
dev AS (
  SELECT event_type, i, s_i, s_n, n_hours,
         abs(CAST(n_hours AS HUGEINT) * s_i
             - CAST(i AS HUGEINT) * s_n) AS dev
  FROM cum WHERE i < n_hours
),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY dev DESC, i ASC) AS rk
  FROM dev
)
SELECT event_type,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(i AS BIGINT) AS cp_idx,
       CAST(FLOOR(1000000.0 * CAST(s_i AS DOUBLE) / CAST(i AS DOUBLE))
         AS BIGINT) AS pre_mean_mppm,
       CAST(FLOOR(1000000.0 * CAST(s_n - s_i AS DOUBLE)
            / CAST(n_hours - i AS DOUBLE)) AS BIGINT) AS post_mean_mppm,
       CAST(FLOOR(1000000.0 * (CAST(s_n - s_i AS DOUBLE)
            / CAST(n_hours - i AS DOUBLE)
            - CAST(s_i AS DOUBLE) / CAST(i AS DOUBLE))) AS BIGINT)
         AS shift_mppm
FROM pick WHERE rk = 1
"""


def _orders_pareto_share(spark, sf_dir, ks=(1, 10, 100)):
    """Revenue-concentration audit: the share of total revenue held
    by the top-K customers for K in {1, 10, 100} — the whale-risk
    number. Per-customer revenue folds to exact integer cents; the
    top-max(K) pick is (rev desc, custkey asc) + limit ⇒
    TakeOrderedAndProject; ranking and cumulative sums act on that
    ≤ max(K)-row relation plus one broadcast 1-row grand total."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    top = rev.orderBy(F.desc("rev_cents"), F.asc("o_custkey")).limit(
        max(ks)
    )
    totals = rev.agg(
        F.sum("rev_cents").cast("long").alias("total_cents"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
    w = Window.orderBy(F.desc("rev_cents"), F.asc("o_custkey"))
    ranked = (
        top.withColumn("r", F.row_number().over(w))
        .withColumn(
            "cum",
            F.sum("rev_cents").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        ranked.filter(F.col("r").isin([int(k) for k in ks]))
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("r").cast("long").alias("top_k"),
            F.col("cum").cast("long").alias("top_rev_cents"),
            "total_cents",
            "n_customers",
            F.expr("(1000000 * cum) DIV total_cents").alias("share_ppm"),
        )
    )


_PARETO_SHARE_SQL = """
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
),
t AS (
  SELECT CAST(sum(rev_cents) AS BIGINT) AS total_cents,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM rev
),
rk AS (
  SELECT rev_cents,
         row_number() OVER (ORDER BY rev_cents DESC, o_custkey ASC) AS r,
         sum(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum
  FROM rev
)
SELECT CAST(r AS BIGINT) AS top_k, CAST(cum AS BIGINT) AS top_rev_cents,
       total_cents, n_customers,
       CAST((1000000 * cum) // total_cents AS BIGINT) AS share_ppm
FROM rk CROSS JOIN t
WHERE r IN (1, 10, 100)
"""


def _ivf_balance_audit(spark, sf_dir):
    return similarity.ivf_balance_audit(_t(spark, sf_dir, "embeddings"))


def _ivf_balance_oracle() -> str:
    """Oracle with the same md5-derived centroid constants inlined:
    per vector, argmin of exact integer squared distance over the 16
    centroid literals (ties → lowest cell), then the occupancy
    rollup."""
    from iceberg_diag_spark.operators.similarity import md5_centroids

    cents = md5_centroids(64, 16, 256)
    d2 = []
    for c in range(16):
        arr = ", ".join(str(h) for h in cents[c])
        d2.append(
            f"list_sum(list_transform(list_zip(q, [{arr}]),"
            " p -> CAST((p[1] - p[2]) * (p[1] - p[2]) AS BIGINT)))"
        )
    structs = ", ".join(
        "{'d2': " + d2[c] + f", 'c': {c}" + "}" for c in range(16)
    )
    return f"""
WITH qv AS (
  SELECT list_transform(embedding,
           v -> CAST(FLOOR(CAST(v AS DOUBLE) * 256) AS BIGINT)) AS q
  FROM embeddings
),
a AS (
  SELECT CAST(list_sort(ARRAY[{structs}])[1].c AS BIGINT) AS list_id
  FROM qv
),
c AS (
  SELECT list_id, CAST(count(*) AS BIGINT) AS n_vecs
  FROM a GROUP BY 1
),
t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total FROM c)
SELECT list_id, n_vecs,
       CAST((1000000 * n_vecs) // n_total AS BIGINT) AS share_ppm,
       CAST((1000000 * n_vecs) // n_total - 62500 AS BIGINT) AS dev_ppm
FROM c CROSS JOIN t
"""


_IVF_BALANCE_SQL = _ivf_balance_oracle()


def _quality_length_skyline(spark, sf_dir):
    return textops.quality_length_skyline(_t(spark, sf_dir, "documents"))


_SKYLINE_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(FLOOR(1000000
              * CAST(len(list_distinct(string_split(
                  regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')))
                AS BIGINT)
              / greatest(len(string_split(
                  regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')), 1))
           AS BIGINT) AS ttr_ppm,
         CAST(len(text) AS BIGINT) AS chars
  FROM documents
),
g AS (SELECT ttr_ppm, max(chars) AS mx FROM s GROUP BY 1),
t AS (
  SELECT ttr_ppm, mx,
         COALESCE(max(mx) OVER (ORDER BY ttr_ppm DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), -1) AS hi_mx
  FROM g
)
SELECT s.doc_id, s.ttr_ppm, s.chars
FROM s JOIN t USING (ttr_ppm)
WHERE s.chars > t.hi_mx AND s.chars = t.mx
"""


def _orders_benford(spark, sf_dir):
    return profiling.benford_audit(
        _t(spark, sf_dir, "orders"), "o_totalprice"
    )


_BENFORD_SQL = """
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice > 0
),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM v GROUP BY 1
),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM d)
SELECT digit, n_rows,
       CAST((1000000 * n_rows) // n_total AS BIGINT) AS observed_ppm,
       CAST(FLOOR(1000000.0 * log10(1.0 + 1.0 / digit)) AS BIGINT)
         AS expected_ppm,
       CAST((1000000 * n_rows) // n_total AS BIGINT)
         - CAST(FLOOR(1000000.0 * log10(1.0 + 1.0 / digit)) AS BIGINT)
         AS delta_ppm
FROM d CROSS JOIN t
"""


def _pmi_collocations(spark, sf_dir):
    return textops.pmi_collocations(_t(spark, sf_dir, "documents"))


_PMI_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
bg AS (
  SELECT unnest(CASE WHEN len(toks) >= 2 THEN
           list_transform(generate_series(0, len(toks) - 2),
                          i -> toks[i + 1] || ' ' || toks[i + 2])
         ELSE [] END) AS gram
  FROM norm
),
sp AS (
  SELECT string_split(gram, ' ')[1] AS w1,
         string_split(gram, ' ')[2] AS w2
  FROM bg
),
pairs AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
  FROM sp GROUP BY w1, w2 HAVING count(*) >= 5
),
lft AS (SELECT w1, CAST(count(*) AS BIGINT) AS c_a FROM sp GROUP BY w1),
rgt AS (SELECT w2, CAST(count(*) AS BIGINT) AS c_b FROM sp GROUP BY w2),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sp)
SELECT w1, w2, n_pair,
       CAST(FLOOR(1000000.0
            * (ln(CAST(n_pair AS DOUBLE)) + ln(CAST(n_total AS DOUBLE))
               - ln(CAST(c_a AS DOUBLE)) - ln(CAST(c_b AS DOUBLE))))
         AS BIGINT) AS pmi_micro
FROM pairs JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN tot
ORDER BY pmi_micro DESC, w1 ASC, w2 ASC
LIMIT 100
"""


REGISTRY.update({
    "bm25_topk": QuerySpec(
        _bm25_topk, _BM25_SQL,
        "BM25 retrieval top-k (Lucene idf variant, k1=1.2 b=0.75) — "
        "the keyword first-stage retriever; per-(term,doc) partials "
        "floor-quantized to micro before exact integer per-doc sums",
    ),
    "hybrid_retrieval_topk": QuerySpec(
        _hybrid_retrieval, _HYBRID_RETRIEVAL_SQL,
        "retrieve-then-rerank: BM25 candidates → pseudo-relevance "
        "feedback centroid (integer sum of top-m quantized "
        "embeddings) → exact integer cosine rerank → fused top-k; "
        "candidate ids broadcast-semi-prune the embeddings scan",
    ),
    "bpe_merge_candidates": QuerySpec(
        _bpe_merge_candidates, _BPE_MERGE_SQL,
        "first-iteration BPE merge counts over distinct word forms "
        "weighted by corpus frequency (the tokenizer-training "
        "optimization: pair explode touches the vocabulary, never "
        "the token stream); exact integers, TakeOrderedAndProject",
    ),
    "source_quality_calibration": QuerySpec(
        _source_quality_calibration, _SOURCE_QUALITY_CAL_SQL,
        "per-source percentile calibration of the ttr quality proxy "
        "via the grouped range-shard rank idiom — no whole-source "
        "single-task window; pct_ppm exact from rank arithmetic",
    ),
    "embedding_consistency_audit": QuerySpec(
        _embedding_consistency, _EMB_CONSISTENCY_SQL,
        "cross-modal audit: exact-dup text groups whose embeddings "
        "disagree (stale vector / version skew / row mix-up); star "
        "pattern vs the group representative — linear in dup count, "
        "never quadratic; exact integer cosine",
    ),
    "events_changepoint": QuerySpec(
        _events_changepoint, _CHANGEPOINT_SQL,
        "exact CUSUM changepoint per event type: hour maximizing "
        "|n·S_i − i·S_n| over the gap-filled dense series (integer "
        "common-denominator form, DECIMAL(38,0)); pre/post means and "
        "shift published as fixed-shape double exprs",
    ),
    "events_hourly_trend": QuerySpec(
        _events_hourly_trend, _HOURLY_TREND_SQL,
        "exact OLS trend of the dense hourly arrival series per "
        "event type (capacity planning): DECIMAL(38,0) moments, "
        "slope_mppm + r2_ppm published as fixed-shape double exprs; "
        "gap-filled spine at metadata scale",
    ),
    "orders_pareto_share": QuerySpec(
        _orders_pareto_share, _PARETO_SHARE_SQL,
        "revenue concentration: share of total revenue held by the "
        "top-{1,10,100} customers in exact integer cents — "
        "TakeOrderedAndProject pick + broadcast grand total",
    ),
    "embedding_ivf_balance": QuerySpec(
        _ivf_balance_audit, _IVF_BALANCE_SQL,
        "ANN index health: IVF cell-occupancy profile under the same "
        "md5 coarse quantizer ivf_topk_exact serves — skewed cells "
        "are the silent ANN performance killer; row-local argmin "
        "assignment, one hash aggregate on the n_lists key",
    ),
    "quality_length_skyline": QuerySpec(
        _quality_length_skyline, _SKYLINE_SQL,
        "Pareto frontier (skyline) of (ttr quality, length): docs "
        "dominated by no other; distributed via the per-ttr max "
        "histogram + one bounded running-max window — no corpus "
        "sort",
    ),
    "events_scd2_history": QuerySpec(
        _events_scd2, _EVENTS_SCD2_SQL,
        "type-2 SCD history from the CDC event stream: consecutive-"
        "repeat collapse + half-open validity intervals, one shared "
        "per-user window partitioning (single shuffle)",
    ),
    "stream_scd2_history": QuerySpec(
        _stream_scd2, _STREAM_SCD2_SQL,
        "streaming SCD2 feed (applyInPandasWithState): per-user "
        "keyed state holds the open run, every closed validity "
        "interval is emitted append-mode — equals the batch "
        "scd2_build's closed subset over the finite drain",
    ),
    "customer_k_anonymity": QuerySpec(
        _customer_k_anonymity, _K_ANONYMITY_SQL,
        "k-anonymity / l-diversity release audit over quasi-"
        "identifier classes (nation × balance bucket, segment "
        "sensitive): violations, records-at-risk, homogeneous "
        "classes per candidate k",
    ),
    "orders_benford_audit": QuerySpec(
        _orders_benford, _BENFORD_SQL,
        "Benford first-digit audit over order totals (fabricated-"
        "data detector): decimal-string digit extraction, exact "
        "integer-DIV observed shares vs log10(1+1/d) expectation",
    ),
    "pmi_collocations": QuerySpec(
        _pmi_collocations, _PMI_SQL,
        "top collocations by PMI over the corpus bigram stream "
        "(Church-Hanks; overflow-free log-sum form, micro-nat "
        "floor quantization, min-count hapax pruning)",
    ),
    "pii_density_by_source": QuerySpec(
        _pii_density, _PII_DENSITY_SQL,
        "per-source PII exposure rollup (release gate): docs hit, "
        "per-pattern totals, density per million chars — same "
        "pattern set as pii_redaction, one scan + one source-key "
        "aggregate",
    ),
    "ngram_dup_curve": QuerySpec(
        _ngram_dup_curve, _NGRAM_DUP_CURVE_SQL,
        "duplication-rate curve across n-gram sizes 1-6 (dedup-"
        "policy knee finder): one corpus pass emits all sizes via a "
        "shared lead chain, grams shuffle as fixed-width md5 "
        "digests, DECIMAL-exact ppm",
    ),
    "user_activity_gini": QuerySpec(
        _user_activity_gini, _USER_GINI_SQL,
        "exact Gini of the per-user event-count distribution "
        "(traffic/contribution concentration) via the tied-block "
        "closed form over the count HISTOGRAM - no global user "
        "sort, DECIMAL-exact moments",
    ),
    "clone_pairs_verified": QuerySpec(
        _clone_pairs_verified, _CLONE_VERIFIED_SQL,
        "two-tier near-dup: winnow clone candidates verified by "
        "exact Levenshtein ratio (<= 20% of the longer text) - "
        "quadratic verifier runs only on the stop-listed candidate "
        "set, texts re-join by id after the id-only pair stage",
    ),
    "exact_quota_holdout": QuerySpec(
        _exact_quota_holdout, _EXACT_QUOTA_SQL,
        "exact-proportion stratified holdout via largest-remainder "
        "apportionment (Hamilton method): total exactly "
        "floor(N*ppm/1e6), per-stratum deviation < 1 row, "
        "deterministic md5-order membership — the exact-quota "
        "complement of the hash-threshold stratified_split",
    ),
    "media_integrity_audit": QuerySpec(
        _media_integrity, _MEDIA_INTEGRITY_SQL,
        "magic-byte integrity audit per media type (mislabeled/"
        "truncated ingest detector): hex-then-slice header check, "
        "pure JVM projection + one small-key aggregate with "
        "conditional-min example ids",
    ),
    "quality_dup_matrix": QuerySpec(
        _quality_dup_matrix, _QUALITY_DUP_MATRIX_SQL,
        "quality × duplication joint profile: exact-dup rate per "
        "type-token-ratio decile (joint curation-threshold "
        "evidence); hash-only dup pass + broadcast percentile "
        "edges, text never shuffles",
    ),
    "events_cadence_autocorr": QuerySpec(
        _events_cadence_autocorr, _CADENCE_AUTOCORR_SQL,
        "per-type hourly-arrival Pearson autocorrelation at lags "
        "1/2/3/6/12/24h over the gap-filled dense series (diurnal "
        "rhythm / burst-clustering audit); exact DECIMAL moments, "
        "one fixed-shape correlation expression, NULL on zero "
        "variance",
    ),
})

# --------------------------------------------------------------------

"""Round-7 additions: repetition profile, recall eval, changepoints, hybrid retrieval.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from iceberg_diag_spark.operators import (
    dedup,
    events,
    maintenance,
    multimodal,
    similarity,
    textops,
)
from iceberg_diag_spark.streaming import stream_ops
from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_dedup import (
    _MINHASH_PAIRS_SQL,
    _SIMHASH_NEAR_DUP_SQL,
)
from iceberg_diag_spark.plans.oracles_multimodal import _media


# Round 7b: repetition profile (Gopher filter stats)
# --------------------------------------------------------------------

def _doc_repetition_profile(spark, sf_dir):
    return textops.doc_repetition_profile(_t(spark, sf_dir, "documents"))


_REPETITION_SQL = r"""
WITH base AS (
  SELECT doc_id,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
toks AS (
  SELECT doc_id, string_split(norm, ' ') AS t,
         CAST(length(norm) AS BIGINT) AS tc
  FROM base
),
g AS (
  SELECT toks.doc_id, tc, ns.n,
         unnest(CASE WHEN len(t) >= ns.n THEN
            list_transform(generate_series(1, len(t) - ns.n + 1),
                           i -> array_to_string(t[i:i+ns.n-1], ' '))
         ELSE [] END) AS g
  FROM toks CROSS JOIN (SELECT unnest([2, 3, 5]) AS n) ns
),
cg AS (SELECT doc_id, tc, n, g, CAST(count(*) AS BIGINT) AS c
       FROM g GROUP BY ALL),
tops AS (
  SELECT doc_id, n, g, c FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id, n
                                 ORDER BY c DESC, g) AS rn
    FROM cg) WHERE rn = 1
),
dup5 AS (
  SELECT doc_id,
         CAST(COALESCE(sum((c - 1) * length(g)) FILTER (c > 1), 0)
              AS BIGINT) AS dc
  FROM cg WHERE n = 5 GROUP BY doc_id
),
pd AS (
  SELECT toks.doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         tc AS n_chars,
         COALESCE(t2.g, '') AS top_bigram,
         COALESCE(t2.c, 0) AS top_bigram_cnt,
         (1000000 * COALESCE(t2.c, 0) * length(COALESCE(t2.g, '')))
           // greatest(tc, 1) AS top_bigram_ppm,
         (1000000 * COALESCE(t3.c, 0) * length(COALESCE(t3.g, '')))
           // greatest(tc, 1) AS top_trigram_ppm,
         (1000000 * COALESCE(dup5.dc, 0)) // greatest(tc, 1) AS dup5_ppm
  FROM toks
  LEFT JOIN tops t2 ON t2.doc_id = toks.doc_id AND t2.n = 2
  LEFT JOIN tops t3 ON t3.doc_id = toks.doc_id AND t3.n = 3
  LEFT JOIN dup5 ON dup5.doc_id = toks.doc_id
)
SELECT doc_id, n_words, n_chars, top_bigram,
       CAST(top_bigram_cnt AS BIGINT) AS top_bigram_cnt,
       CAST(top_bigram_ppm AS BIGINT) AS top_bigram_ppm,
       CAST(top_trigram_ppm AS BIGINT) AS top_trigram_ppm,
       CAST(dup5_ppm AS BIGINT) AS dup5_ppm,
       ((top_bigram_ppm > 180000 AND top_bigram_cnt >= 2)
        OR dup5_ppm > 150000) AS repetitive
FROM pd ORDER BY doc_id
"""

REGISTRY.update({
    "doc_repetition_profile": QuerySpec(
        _doc_repetition_profile, _REPETITION_SQL,
        "Gopher-style within-doc repetition filter stats (top "
        "2/3-gram char fraction, repeated-5-gram char mass, "
        "repetitive flag at the published thresholds); ZERO shuffle "
        "-- per-row sorted-array fold, scan-project plan",
    ),
})

def _token_zipf_curve(spark, sf_dir):
    return textops.token_zipf_curve(_t(spark, sf_dir, "documents"))


_ZIPF_SQL = r"""
WITH tok AS (
  SELECT unnest(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS token
  FROM documents
),
cnts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS cnt
  FROM tok WHERE token <> '' GROUP BY token
),
tot AS (SELECT CAST(sum(cnt) AS HUGEINT) AS total FROM cnts),
top AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token) AS rank,
         sum(CAST(cnt AS HUGEINT))
           OVER (ORDER BY cnt DESC, token) AS cum
  FROM cnts
  ORDER BY cnt DESC, token LIMIT 50
)
SELECT CAST(rank AS BIGINT) AS rank, token, cnt,
       CAST((CAST(cnt AS HUGEINT) * 1000000) // total AS BIGINT)
         AS share_ppm,
       CAST((cum * 1000000) // total AS BIGINT) AS cum_share_ppm
FROM top CROSS JOIN tot
ORDER BY rank
"""

REGISTRY.update({
    "token_zipf_curve": QuerySpec(
        _token_zipf_curve, _ZIPF_SQL,
        "Zipf head: top-50 corpus tokens with exact counts, ppm "
        "share, cumulative share (vocabulary-concentration audit); "
        "partial-combine token aggregate + TakeOrderedAndProject, "
        "rank window over the 50 survivors only",
    ),
})

def _ann_recall_eval(spark, sf_dir):
    return similarity.ann_recall_eval(
        _t(spark, sf_dir, "embeddings"), query_mod=50
    )


def _ann_recall_sql() -> str:
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
norms AS (SELECT vec_id, sum(q * q) AS n2 FROM ex GROUP BY vec_id),
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
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY CAST(floor(1000000.0 * dd / (sqrt(na2) * sqrt(nb2)))
                      AS BIGINT) DESC, neighbor_id ASC) AS rank
    FROM pairdots WHERE na2 > 0 AND nb2 > 0
  ) WHERE rank <= 5 AND query_id % 50 = 0
),
bpairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         sum(a.q * b.q) AS dd
  FROM ex a JOIN ex b ON a.d = b.d AND b.vec_id != a.vec_id
  WHERE a.vec_id % 50 = 0
  GROUP BY a.vec_id, b.vec_id
),
exact_topk AS (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT bp.query_id, bp.neighbor_id,
           row_number() OVER (PARTITION BY bp.query_id
             ORDER BY CAST(floor(1000000.0 * bp.dd
                           / (sqrt(nq.n2) * sqrt(nn.n2))) AS BIGINT) DESC,
                      bp.neighbor_id ASC) AS rank
    FROM bpairs bp
    JOIN norms nq ON nq.vec_id = bp.query_id
    JOIN norms nn ON nn.vec_id = bp.neighbor_id
    WHERE nq.n2 > 0 AND nn.n2 > 0
  ) WHERE rank <= 5
)
SELECT e.query_id,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       CAST((1000000 * count(a.neighbor_id)) // count(*) AS BIGINT)
         AS recall_ppm,
       CAST(COALESCE(min(CASE WHEN a.neighbor_id IS NULL
                              THEN e.rank END), 0) AS BIGINT)
         AS first_miss_rank
FROM exact_topk e
LEFT JOIN approx a ON a.query_id = e.query_id
                  AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


_ANN_RECALL_SQL = _ann_recall_sql()


def _retrieval_rank_eval(spark, sf_dir):
    return similarity.retrieval_rank_eval(
        _t(spark, sf_dir, "embeddings")
    )


def _retrieval_rank_sql() -> str:
    """Same LSH/bucket/ground-truth scaffolding as _ann_recall_sql,
    flipped to score the RANKED approx list: MRR / precision@k /
    hit@1 per panel query, zeros for candidate-less queries."""
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
norms AS (SELECT vec_id, sum(q * q) AS n2 FROM ex GROUP BY vec_id),
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
approx AS MATERIALIZED (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY CAST(floor(1000000.0 * dd / (sqrt(na2) * sqrt(nb2)))
                      AS BIGINT) DESC, neighbor_id ASC) AS rank
    FROM pairdots WHERE na2 > 0 AND nb2 > 0
  ) WHERE rank <= 5 AND query_id % 50 = 0
),
bpairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         sum(a.q * b.q) AS dd
  FROM ex a JOIN ex b ON a.d = b.d AND b.vec_id != a.vec_id
  WHERE a.vec_id % 50 = 0
  GROUP BY a.vec_id, b.vec_id
),
exact_topk AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT bp.query_id, bp.neighbor_id,
           row_number() OVER (PARTITION BY bp.query_id
             ORDER BY CAST(floor(1000000.0 * bp.dd
                           / (sqrt(nq.n2) * sqrt(nn.n2))) AS BIGINT) DESC,
                      bp.neighbor_id ASC) AS rank
    FROM bpairs bp
    JOIN norms nq ON nq.vec_id = bp.query_id
    JOIN norms nn ON nn.vec_id = bp.neighbor_id
    WHERE nq.n2 > 0 AND nn.n2 > 0
  ) WHERE rank <= 5
),
scored AS (
  SELECT a.query_id,
         CAST(count(*) AS BIGINT) AS n_retrieved,
         CAST(coalesce(1000000 // min(CASE WHEN r.neighbor_id IS NOT NULL
                                      THEN a.rank END), 0) AS BIGINT)
           AS rr_ppm,
         CAST((1000000 * count(r.neighbor_id)) // 5 AS BIGINT)
           AS precision_ppm,
         max(CASE WHEN a.rank = 1 AND r.neighbor_id IS NOT NULL
                  THEN 1 ELSE 0 END) = 1 AS hit_at_1
  FROM approx a
  LEFT JOIN exact_topk r ON r.query_id = a.query_id
                        AND r.neighbor_id = a.neighbor_id
  GROUP BY a.query_id
)
SELECT p.query_id,
       CAST(coalesce(s.n_retrieved, 0) AS BIGINT) AS n_retrieved,
       CAST(coalesce(s.rr_ppm, 0) AS BIGINT) AS rr_ppm,
       CAST(coalesce(s.precision_ppm, 0) AS BIGINT) AS precision_ppm,
       coalesce(s.hit_at_1, false) AS hit_at_1
FROM (SELECT DISTINCT query_id FROM exact_topk) p
LEFT JOIN scored s ON s.query_id = p.query_id
"""


_RETRIEVAL_RANK_SQL = _retrieval_rank_sql()

REGISTRY.update({
    "retrieval_rank_eval": QuerySpec(
        _retrieval_rank_eval, _RETRIEVAL_RANK_SQL,
        "LSH ranking-quality audit: MRR (integer reciprocal-rank "
        "ppm), precision@k, and hit@1 of the production bucket plan "
        "vs brute-force ground truth on the broadcast query panel; "
        "candidate-less queries emit zero rows explicitly",
    ),
})

REGISTRY.update({
    "ann_recall_eval": QuerySpec(
        _ann_recall_eval, _ANN_RECALL_SQL,
        "ANN recall@k audit: sign-LSH top-k vs brute-force ground "
        "truth under identical integer scoring on a broadcast "
        "1/50-id query panel; WindowGroupLimit partial top-k, "
        "recall + first-missed-rank per query",
    ),
})

def _media_phash_near_dup(spark, sf_dir):
    return multimodal.media_phash_near_dup(_media(spark, sf_dir))


_MEDIA_PHASH_SQL = r"""
WITH p AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS L
  FROM documents
),
fps AS (
  SELECT doc_id,
         list_sum(list_transform(generate_series(0, 15), i ->
           CASE WHEN substring(hx, CAST(2*(1 + (i*(L-1))//16) - 1 AS INT), 2)
                   > substring(hx, CAST(2*(1 + ((i+1)*(L-1))//16) - 1 AS INT), 2)
                THEN CAST(1 AS BIGINT) << i ELSE 0 END)) AS fp
  FROM p WHERE L >= 16
),
bb AS (
  SELECT doc_id, fp, t, (fp >> (4*t)) & 15 AS b
  FROM (SELECT doc_id, fp, unnest(generate_series(0, 3)) AS t FROM fps)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.fp AS fa, b.fp AS fb
  FROM bb a JOIN bb b ON a.t = b.t AND a.b = b.b AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 1
ORDER BY doc_a, doc_b
"""

REGISTRY.update({
    "media_phash_near_dup": QuerySpec(
        _media_phash_near_dup, _MEDIA_PHASH_SQL,
        "decoder-free perceptual-hash (dHash-style) media near-dup "
        "candidates: 16-bit byte-domain difference hash, 4x4-bit "
        "band buckets, xor+bit_count Hamming verify; payloads never "
        "shuffle, hex-slice byte access is engine-portable",
    ),
})

def _hard_negative_mining(spark, sf_dir):
    return similarity.hard_negative_mining(
        _t(spark, sf_dir, "embeddings")
    )


def _hard_negative_sql() -> str:
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
norms AS (SELECT vec_id, sum(q * q) AS n2 FROM ex GROUP BY vec_id),
dists AS (
  SELECT vec_id, c, sum((q - h) * (q - h)) AS d2
  FROM ex JOIN cents USING (d) GROUP BY vec_id, c
),
assigned AS (
  SELECT vec_id, c AS list_id FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM dists JOIN norms USING (vec_id)
    WHERE norms.n2 > 0
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM assigned a JOIN assigned b
    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
),
scored AS (
  SELECT p.vec_a, p.vec_b,
         CAST(floor(1000000.0 * sum(ea.q * eb.q)
              / (sqrt(na.n2) * sqrt(nb.n2))) AS BIGINT) AS cos_mppm
  FROM pairs p
  JOIN ex ea ON ea.vec_id = p.vec_a
  JOIN ex eb ON eb.vec_id = p.vec_b AND ea.d = eb.d
  JOIN norms na ON na.vec_id = p.vec_a
  JOIN norms nb ON nb.vec_id = p.vec_b
  GROUP BY p.vec_a, p.vec_b, na.n2, nb.n2
),
band AS (
  SELECT * FROM scored WHERE cos_mppm >= 300000 AND cos_mppm < 850000
),
orient AS (
  SELECT vec_a AS anchor_id, vec_b AS negative_id, cos_mppm FROM band
  UNION ALL
  SELECT vec_b AS anchor_id, vec_a AS negative_id, cos_mppm FROM band
)
SELECT anchor_id, negative_id, CAST(rank AS BIGINT) AS rank, cos_mppm
FROM (
  SELECT anchor_id, negative_id, cos_mppm,
         row_number() OVER (PARTITION BY anchor_id
                            ORDER BY cos_mppm DESC, negative_id) AS rank
  FROM orient
) WHERE rank <= 3
ORDER BY anchor_id, rank
"""


_HARD_NEGATIVE_SQL = _hard_negative_sql()

REGISTRY.update({
    "hard_negative_mining": QuerySpec(
        _hard_negative_mining, _HARD_NEGATIVE_SQL,
        "contrastive-training hard negatives: per anchor the m "
        "closest vectors inside the [not-random, not-positive) "
        "cosine band, mined within IVF cells (cell-bounded "
        "quadratic riding the index partitioning, unordered pairs "
        "scored once, WindowGroupLimit top-m)",
    ),
})

def _embedding_energy_curve(spark, sf_dir):
    return similarity.embedding_energy_curve(
        _t(spark, sf_dir, "embeddings")
    )


_ENERGY_CURVE_SQL = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 256.0) AS BIGINT) AS q
  FROM embeddings
),
pv AS (
  SELECT vec_id,
         sum(q * q) AS n2,
         sum(CASE WHEN d <= 8  THEN q * q ELSE 0 END) AS e8,
         sum(CASE WHEN d <= 16 THEN q * q ELSE 0 END) AS e16,
         sum(CASE WHEN d <= 32 THEN q * q ELSE 0 END) AS e32,
         sum(CASE WHEN d <= 48 THEN q * q ELSE 0 END) AS e48,
         sum(CASE WHEN d <= 64 THEN q * q ELSE 0 END) AS e64
  FROM ex GROUP BY vec_id
),
nz AS (SELECT * FROM pv WHERE n2 > 0),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum(CAST(n2 AS HUGEINT)) AS HUGEINT) AS tn2,
         CAST(sum(CAST(e8  AS HUGEINT)) AS HUGEINT) AS t8,
         CAST(sum(CAST(e16 AS HUGEINT)) AS HUGEINT) AS t16,
         CAST(sum(CAST(e32 AS HUGEINT)) AS HUGEINT) AS t32,
         CAST(sum(CAST(e48 AS HUGEINT)) AS HUGEINT) AS t48,
         CAST(sum(CAST(e64 AS HUGEINT)) AS HUGEINT) AS t64,
         CAST(min((1000000 * e8)  // n2) AS BIGINT) AS m8,
         CAST(min((1000000 * e16) // n2) AS BIGINT) AS m16,
         CAST(min((1000000 * e32) // n2) AS BIGINT) AS m32,
         CAST(min((1000000 * e48) // n2) AS BIGINT) AS m48,
         CAST(min((1000000 * e64) // n2) AS BIGINT) AS m64
  FROM nz
)
SELECT CAST(u.d AS BIGINT) AS prefix_dim,
       CAST(CASE u.d WHEN 8 THEN (t8 * 1000000) // tn2
                     WHEN 16 THEN (t16 * 1000000) // tn2
                     WHEN 32 THEN (t32 * 1000000) // tn2
                     WHEN 48 THEN (t48 * 1000000) // tn2
                     ELSE (t64 * 1000000) // tn2 END AS BIGINT)
         AS total_captured_ppm,
       CAST(CASE u.d WHEN 8 THEN m8 WHEN 16 THEN m16 WHEN 32 THEN m32
                     WHEN 48 THEN m48 ELSE m64 END AS BIGINT)
         AS min_vec_ppm,
       n_vecs
FROM agg CROSS JOIN (SELECT unnest([8, 16, 32, 48, 64]) AS d) u
ORDER BY prefix_dim
"""

REGISTRY.update({
    "embedding_energy_curve": QuerySpec(
        _embedding_energy_curve, _ENERGY_CURVE_SQL,
        "Matryoshka truncation audit: corpus + worst-vector energy "
        "share captured by each prefix dimension (8/16/32/48/64); "
        "one scan, one DECIMAL(38,0) aggregate, row-local slice "
        "folds",
    ),
})

def _diag_bloom_advisor(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    vals = li.select(
        F.floor(F.col("l_orderkey") / 32).alias("file_id"),
        F.col("l_partkey").alias("v"),
    )
    return maintenance.bloom_advisor(vals)


_DIAG_BLOOM_SQL = """
WITH vals AS (
  SELECT CAST(floor(l_orderkey / 32) AS BIGINT) AS file_id,
         CAST(l_partkey AS BIGINT) AS v
  FROM lineitem
),
fstats AS (
  SELECT file_id, min(v) AS lo, max(v) AS hi FROM vals GROUP BY file_id
),
probes AS (SELECT DISTINCT v AS probe_key FROM vals WHERE v % 97 = 0),
mm AS (
  SELECT probe_key, CAST(count(*) AS BIGINT) AS minmax_files
  FROM fstats JOIN probes ON lo <= probe_key AND probe_key <= hi
  GROUP BY probe_key
),
act AS (
  SELECT probe_key, CAST(count(DISTINCT file_id) AS BIGINT) AS actual_files
  FROM vals JOIN probes ON v = probe_key
  GROUP BY probe_key
)
SELECT mm.probe_key, minmax_files, actual_files,
       CAST(minmax_files - actual_files AS BIGINT) AS wasted_files,
       CAST((1000000 * (minmax_files - actual_files)) // minmax_files
            AS BIGINT) AS wasted_ppm
FROM mm JOIN act ON mm.probe_key = act.probe_key
ORDER BY mm.probe_key
"""

REGISTRY.update({
    "diag_bloom_advisor": QuerySpec(
        _diag_bloom_advisor, _DIAG_BLOOM_SQL,
        "bloom-filter benefit simulator: per probed key, files "
        "admitted by min/max bounds vs files truly containing it — "
        "the exact point-lookup I/O a bloom file-skip would save on "
        "the current layout; broadcast probe panel, membership via "
        "pushdown equi-semi-join",
    ),
})

def _dedup_method_agreement(spark, sf_dir):
    return dedup.dedup_method_agreement(_t(spark, sf_dir, "documents"))


# Venn of the two fuzzy-dedup pair relations: each side is the
# EXISTING oracle chain verbatim (CTE-in-subquery keeps their CTE
# names scoped), so this oracle stays true to the green definitions.
_DEDUP_AGREEMENT_SQL = f"""
WITH mh AS (
  SELECT doc_a, doc_b FROM ({_MINHASH_PAIRS_SQL})
),
shp AS (
  SELECT doc_a, doc_b FROM ({_SIMHASH_NEAR_DUP_SQL})
),
j AS (
  SELECT mh.doc_a IS NOT NULL AS in_mh, shp.doc_a IS NOT NULL AS in_sh
  FROM mh FULL OUTER JOIN shp
    ON mh.doc_a = shp.doc_a AND mh.doc_b = shp.doc_b
)
SELECT CAST(sum(CASE WHEN in_mh THEN 1 ELSE 0 END) AS BIGINT) AS n_minhash,
       CAST(sum(CASE WHEN in_sh THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash,
       CAST(sum(CASE WHEN in_mh AND in_sh THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both,
       CAST(sum(CASE WHEN in_mh AND NOT in_sh THEN 1 ELSE 0 END) AS BIGINT)
         AS only_minhash,
       CAST(sum(CASE WHEN in_sh AND NOT in_mh THEN 1 ELSE 0 END) AS BIGINT)
         AS only_simhash,
       CAST(count(*) AS BIGINT) AS n_union,
       CAST((1000000 * sum(CASE WHEN in_mh AND in_sh THEN 1 ELSE 0 END))
            // greatest(count(*), 1) AS BIGINT) AS overlap_ppm
FROM j
"""

REGISTRY.update({
    "dedup_method_agreement": QuerySpec(
        _dedup_method_agreement, _DEDUP_AGREEMENT_SQL,
        "Venn audit of MinHash-LSH vs SimHash near-dup pair sets "
        "(where the two fuzzy families disagree); both production "
        "bucketed plans, one full outer join on the pair key, one "
        "global aggregate",
    ),
})

def _stream_repetition_gate(spark, sf_dir):
    from iceberg_diag_spark.streaming import stream_ops

    return stream_ops.run_to_table(
        stream_ops.repetition_gate_stream(
            stream_ops.read_documents_stream(spark, sf_dir)
        ),
        "complete",
        "stream_repetition_gate",
    )


_STREAM_REPETITION_SQL = r"""
WITH base AS (
  SELECT doc_id, source,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
toks AS (
  SELECT doc_id, source, string_split(norm, ' ') AS t,
         CAST(length(norm) AS BIGINT) AS tc
  FROM base
),
g AS (
  SELECT toks.doc_id, tc, ns.n,
         unnest(CASE WHEN len(t) >= ns.n THEN
            list_transform(generate_series(1, len(t) - ns.n + 1),
                           i -> array_to_string(t[i:i+ns.n-1], ' '))
         ELSE [] END) AS g
  FROM toks CROSS JOIN (SELECT unnest([2, 5]) AS n) ns
),
cg AS (SELECT doc_id, tc, n, g, CAST(count(*) AS BIGINT) AS c
       FROM g GROUP BY ALL),
top2 AS (
  SELECT doc_id, g, c FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY c DESC, g) AS rn
    FROM cg WHERE n = 2) WHERE rn = 1
),
dup5 AS (
  SELECT doc_id,
         CAST(COALESCE(sum((c - 1) * length(g)) FILTER (c > 1), 0)
              AS BIGINT) AS dc
  FROM cg WHERE n = 5 GROUP BY doc_id
),
flags AS (
  SELECT toks.doc_id, toks.source,
         CASE WHEN ((1000000 * COALESCE(top2.c, 0)
                     * length(COALESCE(top2.g, '')))
                      // greatest(tc, 1) > 180000
                    AND COALESCE(top2.c, 0) >= 2)
               OR (1000000 * COALESCE(dup5.dc, 0))
                    // greatest(tc, 1) > 150000
              THEN 1 ELSE 0 END AS rep
  FROM toks
  LEFT JOIN top2 ON top2.doc_id = toks.doc_id
  LEFT JOIN dup5 ON dup5.doc_id = toks.doc_id
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(rep) AS BIGINT) AS n_repetitive
FROM flags GROUP BY source
"""

REGISTRY.update({
    "stream_repetition_gate": QuerySpec(
        _stream_repetition_gate, _STREAM_REPETITION_SQL,
        "streaming per-source repetition monitor: running doc / "
        "repetitive-doc counts under the shared Gopher-style gate "
        "(with_repetitive_flag — expression-identical to the batch "
        "profile); bounded per-source state, stateless row work",
    ),
})

def _orders_seasonal_naive(spark, sf_dir):
    return events.seasonal_naive_eval(_t(spark, sf_dir, "orders"))


_SEASONAL_NAIVE_SQL = """
WITH monthly AS (
  SELECT (year(CAST(o_orderdate AS DATE)) - 1970) * 12
           + month(CAST(o_orderdate AS DATE)) - 1 AS month_idx,
         CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY month_idx
),
lagged AS (
  SELECT month_idx, rev_cents,
         lag(rev_cents, 12) OVER (ORDER BY month_idx) AS pred_cents,
         month_idx - lag(month_idx, 12) OVER (ORDER BY month_idx) AS gap
  FROM monthly
)
SELECT CAST(month_idx AS BIGINT) AS month_idx,
       CAST(month_idx // 12 + 1970 AS BIGINT) AS year,
       CAST(month_idx % 12 + 1 AS BIGINT) AS month,
       rev_cents,
       CAST(pred_cents AS BIGINT) AS pred_cents,
       CAST(abs(rev_cents - pred_cents) AS BIGINT) AS abs_err_cents,
       CAST((1000000 * abs(rev_cents - pred_cents))
            // greatest(rev_cents, 1) AS BIGINT) AS ape_ppm
FROM lagged
WHERE pred_cents IS NOT NULL AND gap = 12
ORDER BY month_idx
"""

REGISTRY.update({
    "orders_seasonal_naive_eval": QuerySpec(
        _orders_seasonal_naive, _SEASONAL_NAIVE_SQL,
        "seasonal-naive forecast backtest over monthly revenue "
        "(same-month-last-year predictor, exact floor-cents, "
        "calendar-alignment guard); the lag window runs over the "
        "bounded month relation only",
    ),
})

def _text_artifact_audit(spark, sf_dir):
    return textops.text_artifact_audit(_t(spark, sf_dir, "documents"))


_ARTIFACT_AUDIT_SQL = r"""
WITH per_doc AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS chars,
         CAST(len(regexp_extract_all(text, '&(amp|lt|gt|quot|nbsp|#\d+);'))
              AS BIGINT) AS ent,
         CAST(len(regexp_extract_all(text, '<[a-zA-Z/][^>]*>'))
              AS BIGINT) AS tag,
         CAST(len(regexp_extract_all(text, 'https?://[^\s]+'))
              AS BIGINT) AS url,
         CAST(len(regexp_extract_all(text,
              '[\x00-\x08\x0b\x0c\x0e-\x1f]')) AS BIGINT) AS ctl,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS dig
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(chars) AS BIGINT) AS total_chars,
       CAST(sum(ent) AS BIGINT) AS entity_hits,
       CAST(sum(tag) AS BIGINT) AS tag_hits,
       CAST(sum(url) AS BIGINT) AS url_hits,
       CAST(sum(ctl) AS BIGINT) AS ctrl_hits,
       CAST(sum(dig) AS BIGINT) AS digit_chars,
       CAST((1000000 * (sum(ent) + sum(tag) + sum(url) + sum(ctl)))
            // greatest(sum(chars), 1) AS BIGINT) AS artifact_ppm,
       CAST((1000000 * sum(dig)) // greatest(sum(chars), 1) AS BIGINT)
         AS digit_ppm
FROM per_doc GROUP BY source ORDER BY source
"""

REGISTRY.update({
    "text_artifact_audit": QuerySpec(
        _text_artifact_audit, _ARTIFACT_AUDIT_SQL,
        "per-source extraction-artifact scorecard (HTML entities, "
        "leftover tags, raw URLs, control chars, digit noise) as "
        "exact per-mchar densities; row-local regexp_count folds + "
        "one source-key aggregate",
    ),
})


def _gdpr_delete_simulation(spark, sf_dir):
    return events.gdpr_delete_simulation(_t(spark, sf_dir, "events"))

_GDPR_DELETE_SQL = """
WITH per_file AS (
  SELECT CAST(floor(event_id / 256) AS BIGINT) AS f,
         CAST(count(*) AS BIGINT) AS rows_,
         CAST(sum(CASE WHEN user_id % 101 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS dels
  FROM events GROUP BY f
)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN dels > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS files_touched,
       CAST((1000000 * sum(CASE WHEN dels > 0 THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS touched_ppm,
       CAST(sum(rows_) AS BIGINT) AS rows_total,
       CAST(sum(dels) AS BIGINT) AS rows_deleted,
       CAST(sum(CASE WHEN dels > 0 THEN rows_ - dels ELSE 0 END)
            AS BIGINT) AS rows_rewritten,
       CAST((1000000 * sum(CASE WHEN dels > 0 THEN rows_ - dels
                                ELSE 0 END))
            // greatest(sum(dels), 1) AS BIGINT)
         AS write_amplification_ppm
FROM per_file
"""

REGISTRY.update({
    "gdpr_delete_simulation": QuerySpec(
        _gdpr_delete_simulation, _GDPR_DELETE_SQL,
        "right-to-be-forgotten cost simulator: copy-on-write delete "
        "of a deterministic forget-set — files touched, rows "
        "rewritten, write amplification on the current layout; one "
        "per-file aggregate + one global fold",
    ),
})


# ------------------------------------------------------------------

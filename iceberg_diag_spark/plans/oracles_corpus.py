"""Corpus-assembly family: split / cap / mixture / label audits.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from iceberg_diag_spark.operators import (
    dedup,
    events,
    sampling,
    similarity,
    textops,
)
from iceberg_diag_spark.streaming import stream_ops
from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_dedup import (
    _MINHASH_PRS_CTE,
    _lang_list_sql,
)


# Round-4 corpus-assembly family: split / cap / mixture / label audit
# --------------------------------------------------------------------


def _stratified_split(spark, sf_dir):
    """Deterministic 90/5/5 train-val-test assignment (md5-bucket of
    doc_id), audited per source: the count proves every stratum keeps
    its proportions and two independently-salted bit_xor membership
    checksums prove the exact membership, not just the sizes.

    The checksums are commutative/order-insensitive, so the audit
    aggregates with O(1) per-group state and map-side partials — the
    train cell of a 100 TB corpus never materializes its doc_id list
    anywhere (the previous sort_array(collect_list) digest held ~90%
    of a source's ids in ONE aggregation buffer)."""
    df = sampling.split_assign(
        _t(spark, sf_dir, "documents"), key_col="doc_id",
        val_pct=5, test_pct=5,
    )
    xor1, xor2 = sampling.membership_checksums(F.col("doc_id"))
    return df.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        xor1.alias("members_xor"),
        xor2.alias("members_xor2"),
    )


_STRATIFIED_SPLIT_SQL = """
WITH assigned AS (
  SELECT source, doc_id,
         CASE
           WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 5 THEN 'test'
           WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10 THEN 'val'
           ELSE 'train'
         END AS split
  FROM documents
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       bit_xor(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS members_xor,
       bit_xor(('0x' || substring(md5('m2|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS members_xor2
FROM assigned GROUP BY source, split
"""


def _per_source_cap(spark, sf_dir):
    """Cap every source at 10 documents chosen by hash order — the
    over-represented-domain guard. row_number <= k compiles to a
    map-side WindowGroupLimit, so no executor ships a full stratum."""
    return sampling.per_stratum_cap(
        _t(spark, sf_dir, "documents"),
        key_col="doc_id", strata_col="source", cap=10,
    ).select("doc_id", "source", F.col("rk").cast("long").alias("rk"))


_PER_SOURCE_CAP_SQL = """
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
) WHERE rk <= 10
"""


def _source_mixture(spark, sf_dir):
    """Temperature-flattened (alpha=0.5) domain-mixture weights over
    character mass — the sampling table a multilingual training run
    is driven by. Shares emitted as floor-ppm BIGINTs for exact
    cross-engine comparison."""
    return sampling.source_mixture_weights(
        _t(spark, sf_dir, "documents"),
        strata_col="source", weight_col="n_chars", alpha=0.5,
    )


_SOURCE_MIXTURE_SQL = """
WITH m AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS mass
  FROM documents GROUP BY source
)
SELECT source, n_docs, mass,
       CAST(FLOOR(1000000.0 * mass / sum(mass) OVER ()) AS BIGINT) AS share_ppm,
       CAST(FLOOR(1000000.0 * pow(CAST(mass AS DOUBLE), 0.5)
                  / sum(pow(CAST(mass AS DOUBLE), 0.5)) OVER ()) AS BIGINT)
         AS sample_share_ppm
FROM m
"""


def _centroid_confusion(spark, sf_dir):
    return similarity.nearest_centroid_confusion(
        _t(spark, sf_dir, "embeddings")
    )


_CENTROID_CONFUSION_SQL = """
WITH ex AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
cent AS (
  SELECT label AS cand, pos, avg(val) AS c FROM ex GROUP BY label, pos
),
dists AS (
  SELECT ex.vec_id, ex.label, cent.cand,
         CAST(FLOOR(sum((ex.val - cent.c) * (ex.val - cent.c)) * 1000000.0) AS BIGINT) AS d2q
  FROM ex JOIN cent ON ex.pos = cent.pos
  GROUP BY ex.vec_id, ex.label, cent.cand
),
assigned AS (
  SELECT vec_id, label, cand,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cand) AS rn
  FROM dists
)
SELECT label, cand AS predicted, CAST(count(*) AS BIGINT) AS n_vecs
FROM assigned WHERE rn = 1 GROUP BY label, cand
"""


REGISTRY.update({
    "stratified_split": QuerySpec(
        _stratified_split, _STRATIFIED_SPLIT_SQL,
        "deterministic hash-bucket train/val/test split audited per "
        "source (counts + exact-membership md5)",
    ),
    "per_source_cap": QuerySpec(
        _per_source_cap, _PER_SOURCE_CAP_SQL,
        "per-domain document cap by hash order (WindowGroupLimit "
        "map-side top-k)",
    ),
    "source_mixture_weights": QuerySpec(
        _source_mixture, _SOURCE_MIXTURE_SQL,
        "alpha=0.5 temperature domain-mixture sampling weights "
        "(floor-ppm integers)",
    ),
    "nearest_centroid_confusion": QuerySpec(
        _centroid_confusion, _CENTROID_CONFUSION_SQL,
        "nearest-centroid classification confusion counts over the "
        "labeled embedding table",
    ),
})



def _token_entropy(spark, sf_dir):
    return textops.token_entropy(_t(spark, sf_dir, "documents"))


_TOKEN_ENTROPY_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(FLOOR(1000.0 * (log2(sum(c)) - sum(c * log2(c)) / sum(c))) AS BIGINT)
         AS entropy_millibits
FROM tf GROUP BY doc_id
"""


def _quantize_embeddings(spark, sf_dir):
    return similarity.quantize_embeddings_int8(
        _t(spark, sf_dir, "embeddings")
    )


_QUANTIZE_SQL = """
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS max_abs
  FROM embeddings
)
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(FLOOR(max_abs * 1000000.0) AS BIGINT) AS scale_ppm,
       md5(array_to_string(
         list_transform(
           embedding,
           x -> CASE WHEN max_abs = 0 THEN CAST(0 AS BIGINT)
                     ELSE CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / max_abs) AS BIGINT)
                END
         ), ',')) AS q_checksum
FROM m
"""


REGISTRY.update({
    "token_entropy": QuerySpec(
        _token_entropy, _TOKEN_ENTROPY_SQL,
        "per-doc token-distribution entropy (perplexity-proxy quality "
        "signal, floor-millibit integers)",
    ),
    "embedding_quantize_int8": QuerySpec(
        _quantize_embeddings, _QUANTIZE_SQL,
        "symmetric per-vector int8 quantization with checksum-audited "
        "cells and floor-ppm scales",
    ),
})



def _source_overlap(spark, sf_dir):
    return dedup.source_overlap(_t(spark, sf_dir, "documents"))


_SOURCE_OVERLAP_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
fp AS (
  SELECT doc_id, source,
         min(substring(md5(array_to_string(t[i:i+7], ' ')), 1, 16)) AS content_hash
  FROM toks, unnest(generate_series(1, greatest(len(t) - 7, 0))) AS u(i)
  GROUP BY doc_id, source
),
srcs AS (
  SELECT content_hash, list_sort(list(DISTINCT source)) AS s
  FROM fp GROUP BY content_hash HAVING count(DISTINCT source) >= 2
),
ex AS (
  SELECT content_hash, unnest(s) AS src, generate_subscripts(s, 1) AS i
  FROM srcs
),
pairs AS (
  SELECT a.src AS src_a, b.src AS src_b
  FROM ex a JOIN ex b
    ON a.content_hash = b.content_hash AND a.i < b.i
)
SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS shared_contents
FROM pairs GROUP BY src_a, src_b
"""


def _user_event_paths(spark, sf_dir):
    return events.user_event_paths(_t(spark, sf_dir, "events"))


_USER_PATHS_SQL = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events
),
paths AS (
  SELECT user_id, string_agg(event_type, '->' ORDER BY rk) AS path
  FROM ranked WHERE rk <= 5 GROUP BY user_id
)
SELECT path, CAST(count(*) AS BIGINT) AS n_users,
       min(user_id) AS min_user_id
FROM paths GROUP BY path
"""


REGISTRY.update({
    "source_overlap": QuerySpec(
        _source_overlap, _SOURCE_OVERLAP_SQL,
        "cross-source duplicate-content matrix on winnowing "
        "fingerprints (mirror-domain detector)",
    ),
    "user_event_paths": QuerySpec(
        _user_event_paths, _USER_PATHS_SQL,
        "first-k event-type path mining per user with occurrence "
        "counts (funnel discovery)",
    ),
})



def _skew_audit(spark, sf_dir):
    from iceberg_diag_spark.functions.skew import skew_audit
    return skew_audit(_t(spark, sf_dir, "events"), "event_type")


_SKEW_AUDIT_SQL = """
WITH counts AS (
  SELECT coalesce(CAST(event_type AS VARCHAR), '(null)') AS key_repr,
         CAST(count(*) AS BIGINT) AS key_rows
  FROM events GROUP BY 1
),
totals AS (
  SELECT CAST(sum(key_rows) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM counts
),
ranked AS (
  SELECT key_repr, key_rows,
         row_number() OVER (ORDER BY key_rows DESC, key_repr ASC) AS rank
  FROM counts
)
SELECT rank, key_repr, key_rows, total_rows, n_keys,
       CAST(FLOOR(1000000.0 * key_rows / total_rows) AS BIGINT) AS share_ppm
FROM ranked, totals WHERE rank <= 5
"""


REGISTRY.update({
    "events_skew_audit": QuerySpec(
        _skew_audit, _SKEW_AUDIT_SQL,
        "join/agg-key skew diagnostic: top-key row shares in exact "
        "ppm (the pre-salting measurement)",
    ),
})



def _dataset_card(spark, sf_dir):
    """The dataset card: per (source, split) — document count, exact
    whitespace-token budget, and the source's alpha=0.5 sampling
    share — the one table a training run is configured from.
    Composition of split_assign + source_mixture_weights + token
    counting in two shuffles (per-group agg + tiny broadcast join of
    the #sources mixture relation)."""
    docs = _t(spark, sf_dir, "documents")
    assigned = sampling.split_assign(docs, key_col="doc_id")
    per_cell = assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(textops.tokens(F.col("text")))).cast("long").alias(
            "n_tokens"
        ),
    )
    mix = sampling.source_mixture_weights(
        docs, strata_col="source", weight_col="n_chars", alpha=0.5
    ).select("source", "sample_share_ppm")
    return per_cell.join(F.broadcast(mix), "source")


_DATASET_CARD_SQL = r"""
WITH assigned AS (
  SELECT source, doc_id,
         len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_toks,
         CASE
           WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 5 THEN 'test'
           WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10 THEN 'val'
           ELSE 'train'
         END AS split
  FROM documents
),
per_cell AS (
  SELECT source, split,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens
  FROM assigned GROUP BY source, split
),
m AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass FROM documents GROUP BY source
),
mix AS (
  SELECT source,
         CAST(FLOOR(1000000.0 * pow(CAST(mass AS DOUBLE), 0.5)
                    / sum(pow(CAST(mass AS DOUBLE), 0.5)) OVER ()) AS BIGINT)
           AS sample_share_ppm
  FROM m
)
SELECT per_cell.source, split, n_docs, n_tokens, sample_share_ppm
FROM per_cell JOIN mix ON per_cell.source = mix.source
"""


REGISTRY.update({
    "dataset_card": QuerySpec(
        _dataset_card, _DATASET_CARD_SQL,
        "per (source, split) dataset card: docs, exact token budget, "
        "alpha-mixture share (split x mixture composition)",
    ),
})



def _join_cardinality(spark, sf_dir):
    from iceberg_diag_spark.functions.skew import join_cardinality
    return join_cardinality(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "o_orderkey",
    )


_JOIN_CARD_SQL = """
WITH lc AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k, count(*) AS cl
  FROM orders GROUP BY o_orderkey
),
rc AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS cr
  FROM lineitem GROUP BY l_orderkey
),
per_key AS (
  SELECT lc.k, cl * cr AS contrib FROM lc JOIN rc ON lc.k = rc.k
),
w AS (
  SELECT k, contrib FROM per_key ORDER BY contrib DESC, k DESC LIMIT 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders)   AS n_left,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_right,
       (SELECT CAST(count(*) AS BIGINT) FROM per_key)  AS n_join_keys,
       (SELECT CAST(sum(contrib) AS BIGINT) FROM per_key) AS join_rows,
       (SELECT k FROM w)                               AS worst_key_repr,
       (SELECT CAST(contrib AS BIGINT) FROM w)         AS worst_key_rows
"""


REGISTRY.update({
    "join_cardinality_audit": QuerySpec(
        _join_cardinality, _JOIN_CARD_SQL,
        "pre-flight join-explosion detector: exact equi-join output "
        "cardinality + worst-key contribution from key-count sketches",
    ),
})


# --------------------------------------------------------------------
# Round-5 additions: substring-duplication audit, winnowing
# fingerprints, token-budget water-filling, join-selectivity audit
# --------------------------------------------------------------------


def _dup_ngram_spans(spark, sf_dir):
    return dedup.dup_ngram_span_stats(_t(spark, sf_dir, "documents"))


_DUP_NGRAM_SPANS_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
eg AS (
  SELECT doc_id, md5(array_to_string(toks[i + 1 : i + 8], ' ')) AS gh
  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 8)) AS i
        FROM norm WHERE len(toks) >= 8)
),
dup AS (
  SELECT gh FROM (
    SELECT gh, count(DISTINCT doc_id) AS nd FROM eg GROUP BY gh
  ) WHERE nd >= 2
)
SELECT eg.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(dup.gh) AS BIGINT) AS n_dup_grams,
       CAST(FLOOR(1000000.0 * count(dup.gh) / count(*)) AS BIGINT) AS dup_ppm
FROM eg LEFT JOIN dup ON eg.gh = dup.gh
GROUP BY eg.doc_id
"""


def _winnow_fingerprints(spark, sf_dir):
    return dedup.winnow_fingerprints(_t(spark, sf_dir, "documents"))


_WINNOW_SQL = r"""
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
sel AS (SELECT DISTINCT doc_id, fp FROM win WHERE wn = 4)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_fingerprints,
       bit_xor(fp) AS fp_xor
FROM sel GROUP BY doc_id
"""


def _token_budget_waterfill(spark, sf_dir):
    out = sampling.token_budget_waterfill(
        _t(spark, sf_dir, "documents"), budget=100_000,
        strata_col="source", weight_col="n_chars",
    )
    return out.select(
        "source", "mass", "alloc_tokens",
        F.col("exhausted").cast("long").alias("exhausted"),
    )


_WATERFILL_SQL = """
WITH m AS (
  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS mass
  FROM documents GROUP BY source
),
d AS (
  SELECT source, mass,
         row_number() OVER (ORDER BY mass, source) AS rn,
         coalesce(sum(mass) OVER (ORDER BY mass, source
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
           AS prefix_before,
         count(*) OVER () AS n
  FROM m
),
t AS (
  SELECT rn, (100000.0 - prefix_before) / (n - rn + 1) AS theta_i
  FROM d
  WHERE (100000.0 - prefix_before) / (n - rn + 1) <= mass
),
theta AS (SELECT theta_i FROM t ORDER BY rn LIMIT 1)
SELECT source,
       CAST(FLOOR(mass) AS BIGINT) AS mass,
       CAST(FLOOR(LEAST(mass, coalesce((SELECT theta_i FROM theta), mass)))
            AS BIGINT) AS alloc_tokens,
       CAST(((SELECT theta_i FROM theta) IS NULL
             OR mass <= (SELECT theta_i FROM theta)) AS BIGINT) AS exhausted
FROM d
"""


def _join_selectivity(spark, sf_dir):
    from iceberg_diag_spark.functions.skew import join_selectivity
    return join_selectivity(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "o_orderkey",
    )


_JOIN_SELECTIVITY_SQL = """
WITH lc AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS k, count(*) AS cl
  FROM orders GROUP BY o_orderkey
),
rc AS (
  SELECT CAST(l_orderkey AS VARCHAR) AS k, count(*) AS cr
  FROM lineitem GROUP BY l_orderkey
),
j AS (SELECT lc.cl, rc.cr FROM lc FULL JOIN rc ON lc.k = rc.k)
SELECT CAST(sum(cl) AS BIGINT) AS n_left,
       CAST(sum(cr) AS BIGINT) AS n_right,
       CAST(count(cl) AS BIGINT) AS n_keys_left,
       CAST(count(cr) AS BIGINT) AS n_keys_right,
       CAST(count(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL THEN 1 END)
            AS BIGINT) AS n_keys_both,
       CAST(sum(CASE WHEN cr IS NOT NULL THEN cl ELSE 0 END) AS BIGINT)
         AS matched_left,
       CAST(sum(CASE WHEN cl IS NOT NULL THEN cr ELSE 0 END) AS BIGINT)
         AS matched_right,
       CAST(FLOOR(1000000.0 * sum(CASE WHEN cr IS NOT NULL THEN cl ELSE 0 END)
                  / sum(cl)) AS BIGINT) AS match_left_ppm,
       CAST(FLOOR(1000000.0 * sum(CASE WHEN cl IS NOT NULL THEN cr ELSE 0 END)
                  / sum(cr)) AS BIGINT) AS match_right_ppm
FROM j
"""


def _near_dup_by_source(spark, sf_dir):
    """Which domains fuzzily duplicate each other: MinHash near-dup
    candidate pairs labeled with both members' sources, counted per
    unordered source pair — the fuzzy complement of source_overlap's
    exact-hash matrix (a mirror site shows up there; a template-
    rewritten scrape only shows up here)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("src_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("src_b"))
    j = pairs.join(a, "doc_a").join(b, "doc_b")
    return j.groupBy(
        F.least("src_a", "src_b").alias("source_a"),
        F.greatest("src_a", "src_b").alias("source_b"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


_NEAR_DUP_BY_SOURCE_SQL = (
    "WITH "
    + _MINHASH_PRS_CTE.strip()
    + """
, lab AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b
  FROM prs
  JOIN documents da ON prs.doc_a = da.doc_id
  JOIN documents db ON prs.doc_b = db.doc_id
)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
FROM lab GROUP BY source_a, source_b
"""
)


def _weighted_sample(spark, sf_dir):
    """Audit of the deterministic weighted sampler: per source, how
    many docs the weight-proportional hash filter keeps plus the
    O(1)-state xor membership digests proving the exact kept set."""
    kept = sampling.weighted_hash_sample(
        _t(spark, sf_dir, "documents"), key_col="doc_id",
        weight_col="n_chars",
    )
    xor1, xor2 = sampling.membership_checksums(F.col("doc_id"))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        xor1.alias("members_xor"),
        xor2.alias("members_xor2"),
    )


_WEIGHTED_SAMPLE_SQL = """
WITH mw AS (SELECT avg(CAST(n_chars AS DOUBLE)) AS mw FROM documents),
kept AS (
  SELECT source, doc_id
  FROM documents CROSS JOIN mw
  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
        < LEAST(1000000.0, FLOOR(200000.0 * n_chars / mw))
)
SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       bit_xor(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS members_xor,
       bit_xor(('0x' || substring(md5('m2|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) AS members_xor2
FROM kept GROUP BY source
"""


def _dedup_incremental(spark, sf_dir):
    """Incremental ingestion gate exercised on a deterministic split
    of the fixture: even doc_ids play the standing corpus, odd ones
    the incoming batch."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.incremental_dedup_status(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    )


_DEDUP_INCREMENTAL_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_distinct(list_transform(
             generate_series(0, greatest(len(toks) - 3, 0)),
             i -> array_to_string(toks[i + 1 : i + 3], ' ')))
         ELSE [] END AS grams
  FROM norm
),
eg AS (SELECT doc_id, unnest(grams) AS gram FROM grams),
hh AS (
  SELECT doc_id,
         ('0x' || substring(md5(gram), 1, 8))::BIGINT AS g1,
         ('0x' || substring(md5(gram), 9, 8))::BIGINT AS g2
  FROM eg
),
sig AS (
  SELECT doc_id, seed, min((g1 + seed * g2) % 4294967296) AS minhash
  FROM hh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) s
  GROUP BY doc_id, seed
),
keys AS (
  SELECT doc_id, CAST(seed // 4 AS INTEGER) AS band,
         array_to_string(list(minhash ORDER BY seed), '|') AS band_key
  FROM sig GROUP BY doc_id, band
),
ckeys AS (SELECT band, band_key FROM keys WHERE doc_id % 2 = 0),
near AS (
  SELECT DISTINCT k.doc_id
  FROM keys k
  WHERE k.doc_id % 2 = 1
    AND EXISTS (SELECT 1 FROM ckeys c
                WHERE c.band = k.band AND c.band_key = k.band_key)
),
ch AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
  FROM documents
),
exact AS (
  SELECT doc_id FROM ch
  WHERE doc_id % 2 = 1
    AND ch IN (SELECT ch FROM ch WHERE doc_id % 2 = 0)
)
SELECT d.doc_id,
       CASE WHEN e.doc_id IS NOT NULL THEN 'exact'
            WHEN n.doc_id IS NOT NULL THEN 'near_dup'
            ELSE 'novel' END AS status
FROM documents d
LEFT JOIN exact e ON d.doc_id = e.doc_id
LEFT JOIN near n ON d.doc_id = n.doc_id
WHERE d.doc_id % 2 = 1
"""


REGISTRY.update({
    "near_dup_rate_by_source": QuerySpec(
        _near_dup_by_source, _NEAR_DUP_BY_SOURCE_SQL,
        "near-dup candidate-pair counts per unordered source pair "
        "(fuzzy complement of the exact-hash source_overlap matrix)",
    ),
    "doc_weighted_sample": QuerySpec(
        _weighted_sample, _WEIGHTED_SAMPLE_SQL,
        "deterministic weight-proportional hash sample, audited per "
        "source with O(1)-state xor membership digests",
    ),
    "dedup_incremental": QuerySpec(
        _dedup_incremental, _DEDUP_INCREMENTAL_SQL,
        "incremental batch-vs-corpus dedup gate: exact / near_dup / "
        "novel per new doc via semi-join hash and LSH-band probes",
    ),
})


def _lang_confusion(spark, sf_dir):
    """Language-label audit: stopword-voting predicted language vs
    the corpus's labeled lang column as a confusion matrix — the
    label-noise check run before trusting per-language mixture
    weights. Single pass: the voting exprs ride the scan projection
    (no join), one #langs² aggregate."""
    docs = _t(spark, sf_dir, "documents")
    best = textops.language_best()
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_LANG_CONFUSION_SQL = rf"""
WITH norm AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
scores AS (
  SELECT doc_id, lang, 'de' AS cand, len(list_intersect(toks, {_lang_list_sql('de')})) AS hits FROM norm
  UNION ALL
  SELECT doc_id, lang, 'en', len(list_intersect(toks, {_lang_list_sql('en')})) FROM norm
  UNION ALL
  SELECT doc_id, lang, 'es', len(list_intersect(toks, {_lang_list_sql('es')})) FROM norm
  UNION ALL
  SELECT doc_id, lang, 'fr', len(list_intersect(toks, {_lang_list_sql('fr')})) FROM norm
),
best AS (
  SELECT doc_id, lang, cand, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand DESC) AS rn
  FROM scores
)
SELECT lang,
       CASE WHEN hits > 0 THEN cand ELSE 'und' END AS pred_lang,
       CAST(count(*) AS BIGINT) AS n_docs
FROM best WHERE rn = 1
GROUP BY lang, pred_lang
"""


def _corpus_top_ngrams(spark, sf_dir):
    """Corpus-wide top-25 bigrams with occurrence and document
    frequencies — the vocabulary-induction / boilerplate-phrase
    scout. Global top-k via orderBy().limit() compiles to
    TakeOrderedAndProject (per-partition partial top-k, then a k·p
    merge) — never a partition-less window over the full gram
    relation (a trillion-gram corpus would die there); the rank
    window runs over the 25 survivors only."""
    from pyspark.sql import Window

    grams = dedup.word_ngram_rows(
        _t(spark, sf_dir, "documents"), n=2
    )
    counts = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col("doc_id")).alias("n_docs"),
    )
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("gram")).limit(25)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("gram"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", "gram", "n_occurrences", "n_docs")


_CORPUS_TOP_NGRAMS_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
eg AS (
  SELECT doc_id, array_to_string(toks[i + 1 : i + 2], ' ') AS gram
  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 2)) AS i
        FROM norm WHERE len(toks) >= 2)
),
counts AS (
  SELECT gram,
         CAST(count(*) AS BIGINT) AS n_occurrences,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM eg GROUP BY gram
),
ranked AS (
  SELECT gram, n_occurrences, n_docs,
         row_number() OVER (ORDER BY n_occurrences DESC, gram ASC) AS rank
  FROM counts
)
SELECT CAST(rank AS BIGINT) AS rank, gram, n_occurrences, n_docs
FROM ranked WHERE rank <= 25
"""


def _stream_incremental_dedup(spark, sf_dir):
    """Streaming form of the incremental dedup gate: odd doc_ids
    arrive as the stream, even ids are the standing corpus."""
    from iceberg_diag_spark.streaming import stream_ops

    docs_stream = stream_ops.read_documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % 2 == 1
    )
    corpus = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    return stream_ops.run_to_table(
        stream_ops.incremental_exact_dedup_stream(docs_stream, corpus),
        "append",
        "stream_inc_dedup",
    )


_STREAM_INC_DEDUP_SQL = r"""
WITH ch AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
  FROM documents
)
SELECT d.doc_id,
       CASE WHEN d.ch IN (SELECT ch FROM ch WHERE doc_id % 2 = 0)
            THEN 'exact' ELSE 'novel' END AS status
FROM ch d WHERE d.doc_id % 2 = 1
"""


def _quality_gate_ablation(spark, sf_dir):
    """Filter-ablation audit for the curation gates (TTR ≥ 0.4,
    alpha ≥ 0.6, language identified): per gate, how many docs fail
    it at all, how many ONLY it kills (the gate's marginal
    contribution), how many fall to multiple gates, and the survivor
    count — the table that says which filter is doing the work and
    which is redundant before anyone tightens thresholds on a 100 TB
    corpus. Single scan, conditional sums, one 1-row aggregate."""
    docs = _t(spark, sf_dir, "documents")
    q = textops.quality_exprs()
    best = textops.language_best()
    pred_ok = best["hits"] > 0
    e = docs.select(
        (q["type_token_ratio"] >= 0.4).alias("p_ttr"),
        (q["alpha_ratio"] >= 0.6).alias("p_alpha"),
        pred_ok.alias("p_lang"),
    )

    def c(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    p_ttr, p_alpha, p_lang = F.col("p_ttr"), F.col("p_alpha"), F.col("p_lang")
    n_fails = (
        F.when(p_ttr, 0).otherwise(1)
        + F.when(p_alpha, 0).otherwise(1)
        + F.when(p_lang, 0).otherwise(1)
    )
    return e.agg(
        F.count(F.lit(1)).alias("n_total"),
        c(p_ttr & p_alpha & p_lang).alias("n_pass_all"),
        c(~p_ttr).alias("fail_ttr"),
        c(~p_alpha).alias("fail_alpha"),
        c(~p_lang).alias("fail_lang"),
        c(~p_ttr & p_alpha & p_lang).alias("only_ttr"),
        c(p_ttr & ~p_alpha & p_lang).alias("only_alpha"),
        c(p_ttr & p_alpha & ~p_lang).alias("only_lang"),
        c(n_fails >= 2).alias("fail_multi"),
    )


_QUALITY_ABLATION_SQL = rf"""
WITH norm AS (
  SELECT doc_id, text,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
scores AS (
  SELECT doc_id, 'de' AS cand, len(list_intersect(toks, {_lang_list_sql('de')})) AS hits FROM norm
  UNION ALL
  SELECT doc_id, 'en', len(list_intersect(toks, {_lang_list_sql('en')})) FROM norm
  UNION ALL
  SELECT doc_id, 'es', len(list_intersect(toks, {_lang_list_sql('es')})) FROM norm
  UNION ALL
  SELECT doc_id, 'fr', len(list_intersect(toks, {_lang_list_sql('fr')})) FROM norm
),
lang_ok AS (
  SELECT doc_id, max(hits) > 0 AS p_lang FROM scores GROUP BY doc_id
),
gates AS (
  SELECT n.doc_id,
         CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) >= 0.4 AS p_ttr,
         CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) >= 0.6 AS p_alpha,
         l.p_lang
  FROM norm n JOIN lang_ok l ON n.doc_id = l.doc_id
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN p_ttr AND p_alpha AND p_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
       CAST(sum(CASE WHEN NOT p_ttr THEN 1 ELSE 0 END) AS BIGINT) AS fail_ttr,
       CAST(sum(CASE WHEN NOT p_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
       CAST(sum(CASE WHEN NOT p_lang THEN 1 ELSE 0 END) AS BIGINT) AS fail_lang,
       CAST(sum(CASE WHEN NOT p_ttr AND p_alpha AND p_lang THEN 1 ELSE 0 END) AS BIGINT) AS only_ttr,
       CAST(sum(CASE WHEN p_ttr AND NOT p_alpha AND p_lang THEN 1 ELSE 0 END) AS BIGINT) AS only_alpha,
       CAST(sum(CASE WHEN p_ttr AND p_alpha AND NOT p_lang THEN 1 ELSE 0 END) AS BIGINT) AS only_lang,
       CAST(sum(CASE WHEN (CASE WHEN p_ttr THEN 0 ELSE 1 END)
                        + (CASE WHEN p_alpha THEN 0 ELSE 1 END)
                        + (CASE WHEN p_lang THEN 0 ELSE 1 END) >= 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS fail_multi
FROM gates
"""


def _label_silhouette(spark, sf_dir):
    return similarity.label_silhouette(_t(spark, sf_dir, "embeddings"))


_LABEL_SILHOUETTE_SQL = """
WITH ex AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
cent AS (
  SELECT label AS cand, pos, avg(val) AS c FROM ex GROUP BY label, pos
),
dists AS (
  SELECT ex.vec_id, ex.label, cent.cand,
         CAST(FLOOR(sum((ex.val - cent.c) * (ex.val - cent.c)) * 1000000.0) AS BIGINT) AS d2q
  FROM ex JOIN cent ON ex.pos = cent.pos
  GROUP BY ex.vec_id, ex.label, cent.cand
),
own AS (
  SELECT vec_id, label, d2q AS own_d2q FROM dists WHERE cand = label
),
other AS (
  SELECT vec_id, label, min(d2q) AS other_d2q
  FROM dists WHERE cand <> label GROUP BY vec_id, label
)
SELECT o.label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(FLOOR(avg(own_d2q)) AS BIGINT) AS mean_own_d2q,
       CAST(FLOOR(avg(other_d2q)) AS BIGINT) AS mean_other_d2q,
       CAST(FLOOR(1000000.0 * avg(own_d2q) / avg(other_d2q)) AS BIGINT) AS sep_ratio_ppm
FROM own o JOIN other t ON o.vec_id = t.vec_id AND o.label = t.label
GROUP BY o.label
"""


def _stream_quality_gate(spark, sf_dir):
    from iceberg_diag_spark.streaming import stream_ops

    return stream_ops.run_to_table(
        stream_ops.quality_gate_stream(
            stream_ops.read_documents_stream(spark, sf_dir)
        ),
        "complete",
        "stream_quality_gate",
    )


_STREAM_QUALITY_GATE_SQL = rf"""
WITH norm AS (
  SELECT doc_id, source, text,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
scores AS (
  SELECT doc_id, 'de' AS cand, len(list_intersect(toks, {_lang_list_sql('de')})) AS hits FROM norm
  UNION ALL
  SELECT doc_id, 'en', len(list_intersect(toks, {_lang_list_sql('en')})) FROM norm
  UNION ALL
  SELECT doc_id, 'es', len(list_intersect(toks, {_lang_list_sql('es')})) FROM norm
  UNION ALL
  SELECT doc_id, 'fr', len(list_intersect(toks, {_lang_list_sql('fr')})) FROM norm
),
lang_ok AS (SELECT doc_id, max(hits) > 0 AS p_lang FROM scores GROUP BY doc_id),
gates AS (
  SELECT n.source,
         CASE WHEN CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) >= 0.4
               AND CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) >= 0.6
               AND l.p_lang
              THEN 1 ELSE 0 END AS p
  FROM norm n JOIN lang_ok l ON n.doc_id = l.doc_id
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(p) AS BIGINT) AS n_pass
FROM gates GROUP BY source
"""


REGISTRY.update({
    "stream_quality_gate": QuerySpec(
        _stream_quality_gate, _STREAM_QUALITY_GATE_SQL,
        "streaming per-source curation-gate monitor: running "
        "totals/pass counts with #domains-bounded state, same gate "
        "exprs as the batch pipeline",
    ),
})


REGISTRY.update({
    "quality_gate_ablation": QuerySpec(
        _quality_gate_ablation, _QUALITY_ABLATION_SQL,
        "curation-filter ablation: per gate total/exclusive kill "
        "counts + survivors (which filter does the work)",
    ),
    "label_silhouette": QuerySpec(
        _label_silhouette, _LABEL_SILHOUETTE_SQL,
        "centroid-silhouette label-separability audit over "
        "embeddings (own vs nearest-other centroid distance ratio)",
    ),
})


REGISTRY.update({
    "lang_confusion": QuerySpec(
        _lang_confusion, _LANG_CONFUSION_SQL,
        "predicted-vs-labeled language confusion matrix (label-noise "
        "audit for mixture weighting)",
    ),
    "corpus_top_ngrams": QuerySpec(
        _corpus_top_ngrams, _CORPUS_TOP_NGRAMS_SQL,
        "corpus-wide top-25 bigrams with occurrence + doc frequency "
        "(distributed top-k via TakeOrderedAndProject)",
    ),
    "stream_incremental_dedup": QuerySpec(
        _stream_incremental_dedup, _STREAM_INC_DEDUP_SQL,
        "streaming ingestion exact-dedup gate: stream-static hash "
        "semi-probe tags arrivals exact/novel with stateless stream "
        "side",
    ),
})


REGISTRY.update({
    "doc_dup_ngram_spans": QuerySpec(
        _dup_ngram_spans, _DUP_NGRAM_SPANS_SQL,
        "per-doc duplicated-substring audit: share of 8-gram "
        "positions repeated across >= 2 docs (suffix-array-dedup "
        "signal via relational ops)",
    ),
    "doc_winnow_fingerprints": QuerySpec(
        _winnow_fingerprints, _WINNOW_SQL,
        "MOSS winnowing fingerprints (min-hash per sliding gram "
        "window), per-doc count + commutative xor digest",
    ),
    "token_budget_waterfill": QuerySpec(
        _token_budget_waterfill, _WATERFILL_SQL,
        "closed-form water-filling allocation of a fixed token "
        "budget across sources (cap huge domains, take small whole)",
    ),
    "join_selectivity_audit": QuerySpec(
        _join_selectivity, _JOIN_SELECTIVITY_SQL,
        "pre-flight join input-participation audit: matched rows/keys "
        "per side in exact ppm (the semi-join/runtime-filter signal)",
    ),
})


# --------------------------------------------------------------------

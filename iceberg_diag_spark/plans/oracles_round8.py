"""Round-8 additions: substring dedup, corpus funnel, watermark recommendation, CDC merge, KN bigrams, PQ/PCA, attribution.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from iceberg_diag_spark.operators import (
    dedup,
    events,
    multimodal,
    profiling,
    sampling,
    similarity,
    textops,
)
from iceberg_diag_spark.streaming import stream_ops
from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_dedup import (
    _MINHASH_PAIRS_SQL,
    _lang_list_sql,
)
from iceberg_diag_spark.plans.oracles_round5 import (
    _JACCARD_HIST_SQL,
    _QUALITY_CLASSIFIER_SQL,
)
from iceberg_diag_spark.plans.oracles_round7 import _MEDIA_PHASH_SQL


# Round 8: exact-substring dedup (Lee et al. remove-the-span half)
# ------------------------------------------------------------------

def _doc_substring_dedup(spark, sf_dir):
    # span=15 (paper default 50) sized to the synthetic corpus:
    # documents average ~50 tokens, so a 50-token span would only
    # ever fire on full-doc duplicates and test nothing.
    return dedup.substring_dedup(_t(spark, sf_dir, "documents"), span=15)

_SUBSTRING_DEDUP_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, i AS pos, toks[i + 1] AS tok,
         CASE WHEN i + 15 <= len(toks)
              THEN md5(array_to_string(toks[i + 1 : i + 15], ' ')) END AS gh
  FROM (SELECT doc_id, toks, unnest(generate_series(0, len(toks) - 1)) AS i
        FROM norm)
),
dup AS (
  SELECT gh FROM (
    SELECT gh, count(DISTINCT doc_id) AS nd
    FROM pos WHERE gh IS NOT NULL GROUP BY gh
  ) WHERE nd >= 2
),
cov AS (
  SELECT p.doc_id, p.pos, p.tok,
         max(CASE WHEN d.gh IS NOT NULL THEN 1 END)
           OVER (PARTITION BY p.doc_id ORDER BY p.pos
                 ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS cv
  FROM pos p LEFT JOIN dup d ON p.gh = d.gh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(cv) AS BIGINT) AS n_removed,
       md5(coalesce(
         array_to_string(
           list(tok ORDER BY pos) FILTER (WHERE cv IS NULL), ' '),
         '')) AS cleaned_md5
FROM cov GROUP BY doc_id
"""

REGISTRY.update({
    "doc_substring_dedup": QuerySpec(
        _doc_substring_dedup, _SUBSTRING_DEDUP_SQL,
        "Lee et al. exact-substring dedup: remove every token covered "
        "by a 15-token span appearing verbatim in >=2 docs, md5-pin "
        "the rebuilt text; shingle fingerprints + bounded-frame "
        "coverage window instead of a suffix array",
    ),
})


# ------------------------------------------------------------------
# Round 8: fused corpus-build funnel (the release "dataset card")
# ------------------------------------------------------------------

def _corpus_build_funnel(spark, sf_dir):
    from iceberg_diag_spark.operators.funnel import corpus_build_funnel

    return corpus_build_funnel(_t(spark, sf_dir, "documents"))


# The oracle composes the same stage rules the individual entries
# already verify one-by-one (corpus_curation gates, minhash_pairs
# candidates, near_dup_clusters' recursive-CTE connected components
# restricted to stage-2 survivors, exact_quota_holdout apportionment,
# doc_pack_sequences recursion) into one funnel — the composition
# itself is what this entry tests. The pairs CTE embeds _MINHASH_PAIRS_SQL verbatim as a
# parenthesized WITH-subquery (DuckDB scopes inner CTE names, so its
# norm/chash chain cannot collide with the funnel's).
# Shared template for the funnel FAMILY (stage counts + the executed
# release's manifest): one WITH-chain through the per-doc p4 flag
# relation and the pack recursion; {pdata} parameterizes what feeds
# the packer (the funnel packs doc_id%4 shards, the release packs
# md5-bucket shards) and {final} the terminal projection.
_FUNNEL_TEMPLATE = (
    r"""
WITH RECURSIVE fnorm AS (
  SELECT doc_id, source, text,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
perdoc0 AS (
  SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens,
         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch,
         (CAST(len(list_distinct(toks)) AS DOUBLE)
            / greatest(len(toks), 1) >= 0.4
          AND CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1) >= 0.6
          AND greatest(
                len(list_intersect(toks, """
    + "{de}"
    + r""")),
                len(list_intersect(toks, """
    + "{en}"
    + r""")),
                len(list_intersect(toks, """
    + "{es}"
    + r""")),
                len(list_intersect(toks, """
    + "{fr}"
    + r"""))) > 0
         ) AS s1
  FROM fnorm
),
perdoc AS (
  SELECT *,
         (s1 AND doc_id = min(CASE WHEN s1 THEN doc_id END)
                            OVER (PARTITION BY ch)) AS s2
  FROM perdoc0
),
pairs AS (SELECT * FROM (
"""
    + _MINHASH_PAIRS_SQL.strip()
    + r"""
)),
fpairs AS (
  SELECT p.doc_a, p.doc_b
  FROM pairs p
  JOIN perdoc sa ON sa.doc_id = p.doc_a AND sa.s2
  JOIN perdoc sb ON sb.doc_id = p.doc_b AND sb.s2
),
fedges AS (
  SELECT doc_a AS src, doc_b AS dst FROM fpairs
  UNION ALL
  SELECT doc_b, doc_a FROM fpairs
),
freach(node, label) AS (
    SELECT doc_id, doc_id FROM perdoc WHERE s2
  UNION
    SELECT e.src, r.label FROM fedges e JOIN freach r ON r.node = e.dst
),
fcc AS (
  SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
  FROM freach GROUP BY node
),
p3 AS (
  SELECT pd.doc_id, pd.source, pd.n_tokens, pd.s1, pd.s2,
         (pd.s2 AND coalesce(c.cluster_id, pd.doc_id) = pd.doc_id) AS s3
  FROM perdoc pd LEFT JOIN fcc c USING (doc_id)
),
keyed AS (
  SELECT doc_id, source AS stratum, md5(CAST(doc_id AS VARCHAR)) AS mh
  FROM p3 WHERE s3
),
counts AS (
  SELECT stratum, CAST(count(*) AS BIGINT) AS n_s FROM keyed GROUP BY stratum
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
),
picks AS (
  SELECT k.doc_id
  FROM (
    SELECT doc_id, stratum,
           row_number() OVER (PARTITION BY stratum ORDER BY mh, doc_id) AS rn
    FROM keyed
  ) k JOIN quotas USING (stratum)
  WHERE k.rn <= quota
),
p4 AS (
  SELECT p3.doc_id, p3.source, p3.n_tokens, p3.s1, p3.s2, p3.s3,
         (p3.s3 AND pk.doc_id IS NULL) AS s4
  FROM p3 LEFT JOIN picks pk USING (doc_id)
),
pdata AS (
{pdata}
),
ppre AS (
  SELECT source, shard, sz,
         row_number() OVER (PARTITION BY source, shard ORDER BY doc_id) AS rn,
         sum(sz) OVER (PARTITION BY source, shard ORDER BY doc_id) AS ps
  FROM pdata
),
pbounds AS (
  SELECT source, shard, 0 AS gid, CAST(1 AS BIGINT) AS srn,
         CAST(0 AS HUGEINT) AS base
  FROM (SELECT DISTINCT source, shard FROM pdata)
  UNION ALL
  SELECT q.source, q.shard, q.gid + 1,
         CASE WHEN q.ern = q.srn THEN q.ern + 1 ELSE q.ern END,
         CASE WHEN q.ern = q.srn THEN q.eps ELSE q.pps END
  FROM (
    SELECT b.source, b.shard, b.gid, b.srn,
           min(p.rn) AS ern, min(p.ps) AS eps,
           arg_min(p.ps - p.sz, p.rn) AS pps
    FROM pbounds b
    JOIN ppre p ON p.source = b.source AND p.shard = b.shard
              AND p.rn >= b.srn
              AND p.ps - b.base > 256
    GROUP BY b.source, b.shard, b.gid, b.srn
  ) q
),
ptot AS (
  SELECT source, shard, max(rn) AS mx, max(ps) AS total
  FROM ppre GROUP BY source, shard
),
pgrp AS (
  SELECT b.source, b.shard, b.gid,
         coalesce(lead(b.base) OVER w, t.total) - b.base AS toks
  FROM pbounds b
  JOIN ptot t ON t.source = b.source AND t.shard = b.shard
            AND b.srn <= t.mx
  WINDOW w AS (PARTITION BY b.source, b.shard ORDER BY b.gid)
)
{final}"""
)


def _funnel_family_sql(pdata: str, final: str) -> str:
    return _FUNNEL_TEMPLATE.format(
        de=_lang_list_sql("de"),
        en=_lang_list_sql("en"),
        es=_lang_list_sql("es"),
        fr=_lang_list_sql("fr"),
        pdata=pdata,
        final=final,
    )


_FUNNEL_SQL = _funnel_family_sql(
    "  SELECT source, doc_id % 4 AS shard, doc_id, n_tokens AS sz\n"
    "  FROM p4 WHERE s4",
    """SELECT CAST(0 AS BIGINT) AS stage_id, 'raw' AS stage,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS n_tokens
FROM p4
UNION ALL
SELECT 1, 'quality_gate', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
FROM p4 WHERE s1
UNION ALL
SELECT 2, 'exact_dedup', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
FROM p4 WHERE s2
UNION ALL
SELECT 3, 'near_dup', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
FROM p4 WHERE s3
UNION ALL
SELECT 4, 'train', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(n_tokens), 0) AS BIGINT)
FROM p4 WHERE s4
UNION ALL
SELECT 5, 'packed', CAST(count(*) AS BIGINT),
       CAST(coalesce(sum(toks), 0) AS BIGINT)
FROM pgrp
""",
)

# The release packs md5-bucket shards (sampling.hash_bucket's
# '0x'||substr(md5) parse, % RELEASE_N_SHARDS=8) and the manifest
# aggregates pdata itself: n_seqs comes from the pack recursion's
# per-(source, shard, gid) rows, the membership digests are the
# bit_xor 60-bit salted-hash pair (sampling.membership_checksums).
_RELEASE_MANIFEST_SQL = _funnel_family_sql(
    "  SELECT source,\n"
    "         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))"
    "::BIGINT % 8 AS shard,\n"
    "         doc_id, n_tokens AS sz\n"
    "  FROM p4 WHERE s4",
    """SELECT d.shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       q.n_seqs,
       CAST(sum(d.sz) AS BIGINT) AS n_tokens,
       bit_xor(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT) AS members_xor,
       bit_xor(('0x' || substring(md5('m2|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT) AS members_xor2
FROM pdata d
JOIN (SELECT shard, CAST(count(*) AS BIGINT) AS n_seqs
      FROM pgrp GROUP BY shard) q USING (shard)
GROUP BY d.shard, q.n_seqs
""",
)

# ------------------------------------------------------------------
# Round 8: watermark recommendation (batch pick + streaming twin)
# ------------------------------------------------------------------

def _late_tainted_events(ev):
    """The synthetic feed is perfectly ordered (every advisor drop
    count is 0), so the recommendation entries inject deterministic
    per-type disorder: every 20th click arrives 90 s late (only the
    widest candidates absorb it), every 20th error 30 s late (the
    60 s candidate suffices), every 20th view 700 s late (beyond
    even the largest candidate — the meets_target=false branch), and
    signup/purchase stay in order (smallest candidate wins). The
    oracle applies the identical CASE to epoch_us(ts)."""
    delay = (
        F.when(
            (F.col("event_type") == "click")
            & (F.col("event_id") % 20 == 0),
            90_000_000,
        )
        .when(
            (F.col("event_type") == "error")
            & (F.col("event_id") % 20 == 0),
            30_000_000,
        )
        .when(
            (F.col("event_type") == "view")
            & (F.col("event_id") % 20 == 0),
            700_000_000,
        )
        .otherwise(0)
    )
    return ev.withColumn(
        "ts", F.timestamp_micros(F.unix_micros(F.col("ts")) - delay)
    )


_LATE_TAINT_CASE = """
           CASE WHEN event_type = 'click' AND event_id % 20 = 0
                  THEN 90000000
                WHEN event_type = 'error' AND event_id % 20 = 0
                  THEN 30000000
                WHEN event_type = 'view' AND event_id % 20 = 0
                  THEN 700000000
                ELSE 0 END
"""


def _events_watermark_recommendation(spark, sf_dir):
    return events.watermark_recommendation(
        _late_tainted_events(_t(spark, sf_dir, "events")), target_ppm=1_000
    )


_WATERMARK_RECOMMENDATION_SQL = f"""
WITH o AS (
  SELECT event_type,
         epoch_us(ts) - {_LATE_TAINT_CASE} AS ts_us,
         max(epoch_us(ts) - {_LATE_TAINT_CASE}) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier
  FROM events
),
l AS (
  SELECT event_type,
         CASE WHEN frontier IS NULL OR frontier < ts_us THEN 0
              ELSE frontier - ts_us END AS lateness_us
  FROM o
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN lateness_us > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN lateness_us > 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         CAST(sum(CASE WHEN lateness_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
         CAST(sum(CASE WHEN lateness_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS d4
  FROM l GROUP BY event_type
),
u AS (
  SELECT event_type, CAST(1000000 AS BIGINT) AS watermark_us, n_events, d1 AS n_dropped FROM g
  UNION ALL SELECT event_type, 10000000, n_events, d2 FROM g
  UNION ALL SELECT event_type, 60000000, n_events, d3 FROM g
  UNION ALL SELECT event_type, 600000000, n_events, d4 FROM g
),
adv AS (
  SELECT event_type, watermark_us, n_events, n_dropped,
         CAST(floor(1000000.0 * n_dropped / n_events) AS BIGINT) AS drop_ppm
  FROM u
),
ok AS (
  SELECT event_type, min(watermark_us) AS wm
  FROM adv WHERE drop_ppm <= 1000 GROUP BY event_type
),
fb AS (SELECT event_type, max(watermark_us) AS wm FROM adv GROUP BY event_type),
pick AS (
  SELECT f.event_type, coalesce(o2.wm, f.wm) AS wm,
         o2.wm IS NOT NULL AS meets_target
  FROM fb f LEFT JOIN ok o2 USING (event_type)
)
SELECT a.event_type, a.n_events,
       CAST(a.watermark_us AS BIGINT) AS recommended_watermark_us,
       a.n_dropped, a.drop_ppm, p.meets_target
FROM pick p
JOIN adv a ON a.event_type = p.event_type AND a.watermark_us = p.wm
"""


def _stream_watermark_advisor(spark, sf_dir):
    ev = _late_tainted_events(
        stream_ops.read_events_stream(spark, sf_dir)
    )
    return stream_ops.run_to_table(
        stream_ops.watermark_advisor_stream(ev, target_ppm=1_000),
        "update",
        "stream_wm_advisor",
    )


# Single availableNow drain = one batch: cumulative state equals the
# per-type batch computation (the disorder_monitor oracle shape) and
# the integer // ppm matches the stream's arithmetic exactly.
_STREAM_WATERMARK_SQL = f"""
WITH o AS (
  SELECT event_type,
         epoch_us(ts) - {_LATE_TAINT_CASE} AS ts_us,
         max(epoch_us(ts) - {_LATE_TAINT_CASE}) OVER (
           PARTITION BY event_type ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier
  FROM events
),
l AS (
  SELECT event_type,
         CASE WHEN frontier IS NULL OR frontier < ts_us THEN 0
              ELSE frontier - ts_us END AS lateness_us
  FROM o
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN lateness_us > 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN lateness_us > 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         CAST(sum(CASE WHEN lateness_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
         CAST(sum(CASE WHEN lateness_us > 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS d4
  FROM l GROUP BY event_type
),
u AS (
  SELECT event_type, CAST(1000000 AS BIGINT) AS watermark_us, n_events, d1 AS n_dropped FROM g
  UNION ALL SELECT event_type, 10000000, n_events, d2 FROM g
  UNION ALL SELECT event_type, 60000000, n_events, d3 FROM g
  UNION ALL SELECT event_type, 600000000, n_events, d4 FROM g
),
adv AS (
  SELECT event_type, watermark_us, n_events, n_dropped,
         (1000000 * n_dropped) // greatest(n_events, 1) AS drop_ppm
  FROM u
),
ok AS (
  SELECT event_type, min(watermark_us) AS wm
  FROM adv WHERE drop_ppm <= 1000 GROUP BY event_type
),
fb AS (SELECT event_type, max(watermark_us) AS wm FROM adv GROUP BY event_type),
pick AS (
  SELECT f.event_type, coalesce(o2.wm, f.wm) AS wm,
         o2.wm IS NOT NULL AS meets_target
  FROM fb f LEFT JOIN ok o2 USING (event_type)
)
SELECT a.event_type, a.n_events,
       CAST(a.watermark_us AS BIGINT) AS recommended_watermark_us,
       a.n_dropped, CAST(a.drop_ppm AS BIGINT) AS drop_ppm,
       p.meets_target
FROM pick p
JOIN adv a ON a.event_type = p.event_type AND a.watermark_us = p.wm
"""

REGISTRY.update({
    "events_watermark_recommendation": QuerySpec(
        _events_watermark_recommendation, _WATERMARK_RECOMMENDATION_SQL,
        "watermark advisor's decision: per type, the smallest "
        "candidate delay meeting the drop target (or the largest, "
        "flagged) over a deterministically disordered feed; sweep + "
        "struct-min pick, metadata-scale aggregate",
    ),
    "stream_watermark_advisor": QuerySpec(
        _stream_watermark_advisor, _STREAM_WATERMARK_SQL,
        "streaming self-calibrating watermark recommender: per-type "
        "keyed state carries frontier + per-candidate cumulative "
        "would-drop counters, emits the recommended delay each "
        "batch; single-drain equals the per-type batch pick",
    ),
})


# ------------------------------------------------------------------
# Round 8: cross-modal joint dedup (text LSH × media dHash Venn)
# ------------------------------------------------------------------

def _crossmodal_dedup_agreement(spark, sf_dir):
    return multimodal.crossmodal_dedup_agreement(
        _t(spark, sf_dir, "documents")
    )


_CROSSMODAL_AGREEMENT_SQL = f"""
WITH tx AS (
  SELECT doc_a, doc_b FROM ({_MINHASH_PAIRS_SQL})
),
md AS (
  SELECT doc_a, doc_b FROM ({_MEDIA_PHASH_SQL})
),
j AS (
  SELECT tx.doc_a IS NOT NULL AS in_tx, md.doc_a IS NOT NULL AS in_md
  FROM tx FULL OUTER JOIN md
    ON tx.doc_a = md.doc_a AND tx.doc_b = md.doc_b
)
SELECT CAST(sum(CASE WHEN in_tx THEN 1 ELSE 0 END) AS BIGINT) AS n_text,
       CAST(sum(CASE WHEN in_md THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
       CAST(sum(CASE WHEN in_tx AND in_md THEN 1 ELSE 0 END) AS BIGINT)
         AS n_both,
       CAST(sum(CASE WHEN in_tx AND NOT in_md THEN 1 ELSE 0 END) AS BIGINT)
         AS only_text,
       CAST(sum(CASE WHEN in_md AND NOT in_tx THEN 1 ELSE 0 END) AS BIGINT)
         AS only_media,
       CAST(count(*) AS BIGINT) AS n_union,
       CAST((1000000 * sum(CASE WHEN in_tx AND in_md THEN 1 ELSE 0 END))
            // greatest(count(*), 1) AS BIGINT) AS overlap_ppm
FROM j
"""

REGISTRY.update({
    "crossmodal_dedup_agreement": QuerySpec(
        _crossmodal_dedup_agreement, _CROSSMODAL_AGREEMENT_SQL,
        "cross-modal joint-dedup Venn: text MinHash-LSH pairs vs "
        "media dHash pairs over the same multimodal records; both "
        "production bucketed plans, ids-only pair join, one global "
        "aggregate",
    ),
})

# ------------------------------------------------------------------
# Round 8: exact relational k-means (one Lloyd refinement iteration)
# ------------------------------------------------------------------

def _kmeans_lloyd(spark, sf_dir):
    return similarity.kmeans_lloyd(_t(spark, sf_dir, "embeddings"))


def _kmeans_lloyd_sql() -> str:
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
d0 AS (
  SELECT vec_id, c, sum((q - h) * (q - h)) AS d2
  FROM ex JOIN cents USING (d) GROUP BY vec_id, c
),
a0 AS (
  SELECT vec_id, c AS c0 FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM d0
  ) WHERE rn = 1
),
upd AS (
  SELECT c0, d, sum(q) AS s, count(*) AS n
  FROM ex JOIN a0 USING (vec_id) GROUP BY c0, d
),
-- floor(1024*s / n): subtract the POSITIVE mod, then the exact
-- multiple divides exactly under truncating // (matches Spark DIV)
c1 AS (
  SELECT c0, d,
         (s * 1024 - ((s * 1024 % n) + n) % n) // n AS cc
  FROM upd
),
d1 AS (
  SELECT ex.vec_id, c1.c0 AS c,
         sum((q * 1024 - cc) * (q * 1024 - cc)) AS d2
  FROM ex JOIN c1 USING (d) GROUP BY ex.vec_id, c1.c0
),
a1 AS (
  SELECT vec_id, c, d2 FROM (
    SELECT vec_id, c, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM d1
  ) WHERE rn = 1
)
SELECT CAST(a1.c AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(CASE WHEN a0.c0 != a1.c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reassigned,
       CAST(sum(d2) // count(*) AS BIGINT) AS mean_d2
FROM a1 JOIN a0 USING (vec_id)
GROUP BY a1.c
"""


_KMEANS_LLOYD_SQL = _kmeans_lloyd_sql()

REGISTRY.update({
    "kmeans_lloyd": QuerySpec(
        _kmeans_lloyd, _KMEANS_LLOYD_SQL,
        "one exact Lloyd refinement iteration done relationally: "
        "md5-seeded integer assignment, floor-scaled centroid "
        "update, re-assignment, per-cluster size/churn/inertia; "
        "zero-shuffle assignment passes, k-row broadcast centroids",
    ),
})

# ------------------------------------------------------------------
# Round 8: per-source two-sample KS drift test on document length
# ------------------------------------------------------------------

def _source_length_ks(spark, sf_dir):
    return textops.source_length_ks(_t(spark, sf_dir, "documents"))


_SOURCE_LENGTH_KS_SQL = """
WITH sv AS (
  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY source, n_chars
),
vals AS (SELECT v, sum(cnt) AS gcnt FROM sv GROUP BY v),
valc AS (SELECT v, sum(gcnt) OVER (ORDER BY v) AS cum_g FROM vals),
srcs AS (SELECT source, sum(cnt) AS n_source FROM sv GROUP BY source),
tot AS (SELECT sum(cnt) AS n_total FROM sv),
grid AS (
  SELECT s.source, s.n_source, c.v, c.cum_g, coalesce(sv.cnt, 0) AS cnt
  FROM srcs s CROSS JOIN valc c
  LEFT JOIN sv ON sv.source = s.source AND sv.v = c.v
),
ecdf AS (
  SELECT source, n_source, cum_g,
         sum(cnt) OVER (PARTITION BY source ORDER BY v) AS cum_s
  FROM grid
),
agg AS (
  SELECT source, n_source,
         (SELECT n_total FROM tot) - n_source AS n_rest,
         max(abs(cum_s * ((SELECT n_total FROM tot) - n_source)
                 - (cum_g - cum_s) * n_source)) AS d_num
  FROM ecdf GROUP BY source, n_source
)
SELECT source,
       CAST(n_source AS BIGINT) AS n_source,
       CAST(n_rest AS BIGINT) AS n_rest,
       CAST(d_num AS BIGINT) AS d_num,
       CAST((1000000 * d_num) // (n_source * n_rest) AS BIGINT) AS d_ppm,
       CAST(d_num AS HUGEINT) * d_num * 1000000
         > CAST(1844164 AS HUGEINT)
           * (n_source + n_rest) * n_source * n_rest AS reject_95
FROM agg
"""

REGISTRY.update({
    "source_length_ks": QuerySpec(
        _source_length_ks, _SOURCE_LENGTH_KS_SQL,
        "per-source two-sample Kolmogorov-Smirnov drift test on "
        "document length vs the rest of the corpus: exact integer "
        "sup-distance numerator on the global value grid, "
        "cross-multiplied 95% rejection in DECIMAL(38,0); one corpus "
        "shuffle, then metadata-scale grid windows",
    ),
})

# ------------------------------------------------------------------
# Round 8: MERGE-semantics CDC apply (change feed -> final snapshot)
# ------------------------------------------------------------------

def _events_cdc_merge(spark, sf_dir):
    return events.cdc_merge_apply(_t(spark, sf_dir, "events"))


_EVENTS_CDC_MERGE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, value,
         CASE WHEN event_type = 'signup' THEN 'I'
              WHEN event_type = 'error' THEN 'D'
              ELSE 'U' END AS op
  FROM events
),
fr AS (
  SELECT user_id, event_id, value, op,
         max(CASE WHEN op = 'D' THEN event_id END)
           OVER (PARTITION BY user_id) AS last_d
  FROM ev
),
m AS (
  SELECT user_id, event_id, value,
         op IN ('I', 'U')
           AND event_id > coalesce(last_d, -1) AS surv
  FROM fr
)
SELECT user_id,
       sum(CASE WHEN surv THEN 1 ELSE 0 END) > 0 AS present,
       CAST(sum(CASE WHEN surv THEN 1 ELSE 0 END) AS BIGINT) AS n_applied,
       max(CASE WHEN surv THEN event_id END) AS last_event_id,
       max_by(CASE WHEN surv THEN value END,
              CASE WHEN surv THEN event_id END) AS last_value
FROM m GROUP BY user_id
"""

REGISTRY.update({
    "events_cdc_merge": QuerySpec(
        _events_cdc_merge, _EVENTS_CDC_MERGE_SQL,
        "MERGE-semantics change-feed apply: derive I/U/D ops, "
        "tombstone rows at the last delete, materialize the final "
        "per-user snapshot plus tombstone ledger; one user_id "
        "shuffle, two row-local window/agg passes",
    ),
})

# The stream twin shares the batch MERGE oracle; disorder_seen is
# identically 0 under the oracle's single availableNow drain (no row
# can arrive behind a prior batch's per-user frontier when there is
# only one batch).
_STREAM_CDC_MERGE_SQL = _EVENTS_CDC_MERGE_SQL.replace(
    "       max_by(CASE WHEN surv THEN value END,\n"
    "              CASE WHEN surv THEN event_id END) AS last_value",
    "       max_by(CASE WHEN surv THEN value END,\n"
    "              CASE WHEN surv THEN event_id END) AS last_value,\n"
    "       CAST(0 AS BIGINT) AS disorder_seen",
)

REGISTRY.update({
    "stream_cdc_merge": QuerySpec(
        lambda spark, sf_dir: stream_ops.run_to_table(
            stream_ops.cdc_merge_stream(
                stream_ops.read_events_stream(spark, sf_dir)
            ),
            "update",
            "stream_cdc_merge",
        ),
        _STREAM_CDC_MERGE_SQL,
        "streaming MERGE mirror: per-user keyed state (tombstone "
        "frontier + surviving count + latest value) re-emits the "
        "snapshot row per batch; late deletes degrade to an explicit "
        "disorder_seen counter, never a silent guess; one "
        "availableNow drain equals the batch MERGE relation",
    ),
})

# ------------------------------------------------------------------
# Round 8: integer-exact EWMA spike detector on hourly event rates
# ------------------------------------------------------------------

def _events_ewma_anomalies(spark, sf_dir):
    return events.ewma_anomalies(_t(spark, sf_dir, "events"))


# The EWMA recursion s_t = (3*s_{t-1} + 1024*c_t) // 4 replays as a
# recursive CTE over each type's dense hour index — pure integer
# floor arithmetic, bit-identical to the Spark higher-order fold.
_EVENTS_EWMA_SQL = """
WITH RECURSIVE hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS ws,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, ws
),
idx AS (
  SELECT event_type, ws, c,
         row_number() OVER (PARTITION BY event_type ORDER BY ws) AS i
  FROM hourly
),
f AS (
  SELECT event_type, i, ws, c,
         CAST(1024 * c AS BIGINT) AS s, CAST(NULL AS BIGINT) AS sp
  FROM idx WHERE i = 1
  UNION ALL
  SELECT h.event_type, h.i, h.ws, h.c,
         (3 * f.s + 1024 * h.c) // 4, f.s
  FROM f JOIN idx h ON h.event_type = f.event_type AND h.i = f.i + 1
)
SELECT event_type, ws AS window_start, c AS event_count,
       sp AS ewma_prev_scaled,
       CAST((1024 * 1000000 * c) // greatest(sp, 1) AS BIGINT)
         AS spike_ppm
FROM f
WHERE sp IS NOT NULL AND 1024 * c > 2 * sp AND c >= 5
"""

REGISTRY.update({
    "events_ewma_anomalies": QuerySpec(
        _events_ewma_anomalies, _EVENTS_EWMA_SQL,
        "adaptive-baseline spike detector: per-type hourly counts "
        "folded through a 2^10-scaled integer EWMA (alpha=1/4), "
        "flagging hours that double the decayed baseline; one "
        "rollup shuffle, then a bounded per-type array fold",
    ),
})

REGISTRY.update({
    "corpus_build_funnel": QuerySpec(
        _corpus_build_funnel, _FUNNEL_SQL,
        "fused corpus-build pipeline as one DAG: quality gate -> "
        "exact dedup -> connected-components near-dup collapse "
        "(component-min survivor, the production near_dup_clusters "
        "semantics) -> exact-quota holdout -> sequence packing, "
        "emitting the per-stage survivor funnel (the release dataset "
        "card); one enriched corpus pass + the banding chain, stages "
        "share a checkpointed narrow lineage",
    ),
})


def _corpus_release_manifest(spark, sf_dir):
    from iceberg_diag_spark.operators.funnel import corpus_release_manifest

    return corpus_release_manifest(_t(spark, sf_dir, "documents"))


REGISTRY.update({
    "corpus_release_manifest": QuerySpec(
        _corpus_release_manifest, _RELEASE_MANIFEST_SQL,
        "the funnel EXECUTES its release (advisor-executing pattern "
        "#5): stage-4 survivors shard by deterministic md5 bucket, "
        "pack per (source, shard) with the production "
        "fit-before-append fold, and emit the dataset card's "
        "file-level half — per shard: docs, packed sequences, token "
        "mass, and two salted bit_xor membership digests (O(1) agg "
        "state, verifiable by any shard consumer); "
        "funnel.corpus_release writes the same relation as shard=K "
        "parquet and re-derives this manifest from the written files",
    ),
})

# ------------------------------------------------------------------
# Round 8: data-contract expectations audit + shuffle-skew advisor
# ------------------------------------------------------------------

def _events_expectations_audit(spark, sf_dir):
    return events.expectations_audit(_t(spark, sf_dir, "events"))


def _expectations_sql() -> str:
    """Mirror events.EXPECTATION_RULES verbatim (single source of
    truth); the only engine delta is Spark's get_json_object →
    DuckDB's json_extract_string (same signature, same result)."""
    agg_cols = ["CAST(count(*) AS BIGINT) AS n_checked"]
    selects = []
    for rid, sev, pred in events.EXPECTATION_RULES:
        dp = pred.replace("get_json_object", "json_extract_string")
        agg_cols.append(
            f"CAST(sum(CASE WHEN {dp} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS nv_{rid}"
        )
        agg_cols.append(
            f"min(CASE WHEN {dp} THEN event_id END) AS fb_{rid}"
        )
        selects.append(
            f"SELECT '{rid}' AS rule_id, '{sev}' AS severity,"
            f" n_checked, nv_{rid} AS n_violations,"
            f" CAST((1000000 * nv_{rid}) // greatest(n_checked, 1)"
            f" AS BIGINT) AS violation_ppm,"
            f" fb_{rid} AS first_bad_event_id FROM a"
        )
    drop_or = " OR ".join(
        f"({p.replace('get_json_object', 'json_extract_string')})"
        for _r, s, p in events.EXPECTATION_RULES
        if s == "drop"
    )
    agg_cols.append(
        f"CAST(sum(CASE WHEN {drop_or} THEN 1 ELSE 0 END) AS BIGINT)"
        " AS nv_q"
    )
    agg_cols.append(
        f"min(CASE WHEN {drop_or} THEN event_id END) AS fb_q"
    )
    selects.append(
        "SELECT '_quarantine' AS rule_id, 'drop' AS severity,"
        " n_checked, nv_q AS n_violations,"
        " CAST((1000000 * nv_q) // greatest(n_checked, 1) AS BIGINT)"
        " AS violation_ppm, fb_q AS first_bad_event_id FROM a"
    )
    return (
        "WITH a AS (SELECT "
        + ", ".join(agg_cols)
        + " FROM events) "
        + " UNION ALL ".join(selects)
    )


_EXPECTATIONS_SQL = _expectations_sql()


def _shuffle_skew_advisor(spark, sf_dir):
    return events.shuffle_skew_advisor(
        _t(spark, sf_dir, "events"), n_partitions=32
    )


# fair share = ceil(total/32); the md5-hex-prefix hash is engine-
# portable (Spark conv(hex,16,10) ≡ DuckDB CAST('0x'||hex AS BIGINT)
# for the 60-bit prefix, both non-negative).
_SHUFFLE_SKEW_SQL = """
WITH pk AS (
  SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY user_id
),
pp AS (
  SELECT
    CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 15) AS BIGINT)
      % 32 AS partition_id,
    c
  FROM pk
),
bp AS (
  SELECT partition_id,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(c) AS BIGINT) AS max_key_rows
  FROM pp GROUP BY partition_id
),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM bp)
SELECT partition_id, n_rows, n_keys, max_key_rows,
       CAST((1000000 * n_rows) // ((total + 31) // 32) AS BIGINT)
         AS skew_ppm,
       CAST((max_key_rows + (total + 31) // 32 - 1)
            // ((total + 31) // 32) AS BIGINT) AS recommended_salt
FROM bp, t
"""

# ------------------------------------------------------------------
# Round 8: DAU/MAU with exact rolling distinct
# ------------------------------------------------------------------

def _events_dau_mau(spark, sf_dir):
    return events.dau_mau(_t(spark, sf_dir, "events"))


_DAU_MAU_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day
),
cover AS (
  SELECT DISTINCT user_id, CAST(c.d AS DATE) AS day
  FROM ud, unnest(generate_series(CAST(ud.day AS TIMESTAMP),
                                  CAST(ud.day AS TIMESTAMP)
                                    + INTERVAL 29 DAY,
                                  INTERVAL 1 DAY)) c(d)
),
mau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS mau FROM cover GROUP BY day
)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, mau.mau,
       CAST((1000000 * dau.dau) // greatest(mau.mau, 1) AS BIGINT)
         AS stickiness_ppm
FROM dau JOIN mau ON mau.day = dau.day
"""

REGISTRY.update({
    "events_dau_mau": QuerySpec(
        _events_dau_mau, _DAU_MAU_SQL,
        "DAU/MAU stickiness with EXACT rolling 30-day distinct "
        "users: sliding COUNT(DISTINCT) decomposed into user-day "
        "dedup + bounded coverage explode + plain distinct count — "
        "two hash aggregates, uniform 12-byte shuffle rows",
    ),
})

# ------------------------------------------------------------------
# Round 8: LSH banding-parameter advisor
# ------------------------------------------------------------------

def _lsh_param_advisor(spark, sf_dir):
    return dedup.lsh_param_advisor(_t(spark, sf_dir, "documents"))


def _ppm_pow(base_expr: str, exp: int) -> str:
    """Unrolled floored ppm-power chain, identical to the Spark
    aggregate-over-sequence fold (one floor per multiply)."""
    e = "1000000"
    for _ in range(exp):
        e = f"(({e}) * ({base_expr})) // 1000000"
    return e


def _ppm_catch_const(s_ppm: int, r: int, b: int) -> int:
    p1 = 1_000_000
    for _ in range(r):
        p1 = (p1 * s_ppm) // 1_000_000
    miss = 1_000_000
    for _ in range(b):
        miss = (miss * (1_000_000 - p1)) // 1_000_000
    return 1_000_000 - miss


def _lsh_param_sql() -> str:
    branches = []
    for i, (b, r) in enumerate(dedup.LSH_PARAM_CONFIGS):
        p1 = _ppm_pow("s", r)
        miss = _ppm_pow("(1000000 - p1)", b)
        c50 = _ppm_catch_const(500_000, r, b)
        c70 = _ppm_catch_const(700_000, r, b)
        c90 = _ppm_catch_const(900_000, r, b)
        branches.append(f"""
SELECT CAST({b} AS BIGINT) AS bands, CAST({r} AS BIGINT) AS rows_per_band,
       CAST(sum(n_pairs * (1000000 - ({miss}))) // 1000000 AS BIGINT)
         AS expected_caught_pairs,
       CAST({c50} AS BIGINT) AS catch_at_50_ppm,
       CAST({c70} AS BIGINT) AS catch_at_70_ppm,
       CAST({c90} AS BIGINT) AS catch_at_90_ppm
FROM (SELECT s, n_pairs, {p1} AS p1 FROM hm) c{i}""")
    return (
        """
WITH hm AS (
  SELECT CAST(CASE WHEN bucket_ppm >= 1000000 THEN 1000000
              ELSE bucket_ppm + 50000 END AS BIGINT) AS s, n_pairs
  FROM ("""
        + _JACCARD_HIST_SQL
        + """) h
)"""
        + "\nUNION ALL\n".join(branches)
    )


_LSH_PARAM_SQL = _lsh_param_sql()

REGISTRY.update({
    "lsh_param_advisor": QuerySpec(
        _lsh_param_advisor, _LSH_PARAM_SQL,
        "MinHash banding design advisor: every b*r=16 split scored "
        "by the analytic S-curve 1-(1-s^r)^b against the corpus's "
        "observed pair-similarity histogram (floored ppm-power "
        "folds, integer-exact), plus catch probability at fixed "
        "similarity levels; everything post-histogram is "
        "buckets*configs metadata scale",
    ),
})

# ------------------------------------------------------------------
# Round 8: in-session ordered conversion funnel
# ------------------------------------------------------------------

def _session_funnel(spark, sf_dir):
    return events.session_funnel(_t(spark, sf_dir, "events"))


_SESSION_FUNNEL_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, us,
         sum(is_start) OVER (PARTITION BY user_id
                             ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
rn AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY us, event_id) AS rn
  FROM sess
),
st AS (
  SELECT user_id, session_seq, event_type, rn,
         min(CASE WHEN event_type = 'view' THEN rn END)
           OVER (PARTITION BY user_id, session_seq) AS t1
  FROM rn
),
st2 AS (
  SELECT user_id, session_seq, event_type, rn, t1,
         min(CASE WHEN event_type = 'click' AND rn > t1 THEN rn END)
           OVER (PARTITION BY user_id, session_seq) AS t2
  FROM st
),
ps AS (
  SELECT user_id, session_seq,
         bool_or(t1 IS NOT NULL) AS r1,
         bool_or(t2 IS NOT NULL) AS r2,
         bool_or(event_type = 'purchase' AND rn > t2) AS r3
  FROM st2 GROUP BY 1, 2
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM ps
)
SELECT CAST(s.i AS BIGINT) AS step_index, s.step,
       CAST(s.n AS BIGINT) AS n_sessions,
       CAST((1000000 * s.n) // greatest(t.n_sessions, 1) AS BIGINT)
         AS conversion_ppm
FROM tot t, LATERAL (
  SELECT 1 AS i, 'view' AS step, t.n1 AS n
  UNION ALL SELECT 2, 'click', t.n2
  UNION ALL SELECT 3, 'purchase', t.n3
) s
"""

REGISTRY.update({
    "events_session_funnel": QuerySpec(
        _session_funnel, _SESSION_FUNNEL_SQL,
        "ordered conversion funnel scoped to 30-min sessions "
        "(view -> click strictly after -> purchase strictly after): "
        "one user_id shuffle shared by the gap windows, staged mins "
        "on a per-session positional index, bounded final rollup",
    ),
})

# ------------------------------------------------------------------
# Round 8: cohort LTV curves
# ------------------------------------------------------------------

def _cohort_ltv(spark, sf_dir):
    return profiling.cohort_ltv(_t(spark, sf_dir, "orders"))


_COHORT_LTV_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
              AS BIGINT) AS m,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
f AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey),
cs AS (SELECT m0, CAST(count(DISTINCT o_custkey) AS BIGINT)
              AS cohort_size FROM f GROUP BY m0),
cell AS (
  SELECT f.m0, o.m - f.m0 AS month_offset,
         CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
         CAST(sum(o.cents) AS BIGINT) AS revenue_cents
  FROM o JOIN f USING (o_custkey)
  GROUP BY f.m0, o.m - f.m0
),
cum AS (
  SELECT m0, month_offset, n_active, revenue_cents,
         CAST(sum(revenue_cents) OVER (PARTITION BY m0
           ORDER BY month_offset ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS cum
  FROM cell
)
SELECT lpad(CAST(m0 // 12 AS VARCHAR), 4, '0') || '-' ||
         lpad(CAST(m0 % 12 + 1 AS VARCHAR), 2, '0') AS cohort_month,
       CAST(month_offset AS BIGINT) AS month_offset, n_active,
       revenue_cents, cum AS cum_revenue_cents,
       CAST(cum // cohort_size AS BIGINT) AS cum_ltv_cents
FROM cum JOIN cs USING (m0)
"""

REGISTRY.update({
    "customer_cohort_ltv": QuerySpec(
        _cohort_ltv, _COHORT_LTV_SQL,
        "cohort lifetime-value curves: customers cohort by first "
        "order month, revenue accumulates per cohort across month "
        "offsets (floor-cents exact), normalized per member; two "
        "aggregates sharing the custkey shuffle + a bounded-grid "
        "cumulative window",
    ),
})

# ------------------------------------------------------------------
# Round 8: PSI drift of the quality-score distribution
# ------------------------------------------------------------------

def _quality_psi_drift(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # the snapshot_diff release convention: thirds 1,2 = old, 2,0 =
    # new — third 2 carries over, so the score distribution genuinely
    # overlaps and PSI measures the release-to-release shift
    return textops.quality_psi_drift(
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter(F.col("doc_id") % 3 != 1),
    )


# The classifier oracle is reused verbatim per side, with the
# snapshot filter applied at its scan.
def _psi_side_sql(pred: str) -> str:
    body = _QUALITY_CLASSIFIER_SQL.replace(
        "FROM documents", f"FROM documents WHERE {pred}"
    )
    return f"""
  SELECT CAST((z_micro + 20000000) // 500000 AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM ({body}) GROUP BY 1
"""


_QUALITY_PSI_SQL = f"""
WITH ob AS ({_psi_side_sql("doc_id % 3 <> 0")}),
nb AS ({_psi_side_sql("doc_id % 3 <> 1")}),
j AS (
  SELECT coalesce(ob.bucket, nb.bucket) AS bucket,
         coalesce(ob.n, 0) AS n_old, coalesce(nb.n, 0) AS n_new
  FROM ob FULL OUTER JOIN nb ON ob.bucket = nb.bucket
),
s AS (
  SELECT bucket, n_old, n_new,
         CAST(n_old + 1 AS DOUBLE)
           / (sum(n_old) OVER () + count(*) OVER ()) AS p_old,
         CAST(n_new + 1 AS DOUBLE)
           / (sum(n_new) OVER () + count(*) OVER ()) AS p_new
  FROM j
)
SELECT bucket, n_old, n_new,
       CAST(FLOOR((p_new - p_old) * ln(p_new / p_old) * 1000000.0)
            AS BIGINT) AS psi_micro
FROM s
"""

REGISTRY.update({
    "quality_psi_drift": QuerySpec(
        _quality_psi_drift, _QUALITY_PSI_SQL,
        "Population Stability Index of the quality-classifier score "
        "between releases: fixed-grid buckets (shift-then-divide so "
        "truncation = floor on both engines), Laplace-smoothed "
        "shares, one ln-floor per bucket; drift gate before reusing "
        "a tuned threshold",
    ),
})

# ------------------------------------------------------------------
# Round 8: token-budget mixing plan with the repeating-data audit
# ------------------------------------------------------------------

def _data_mixing_plan(spark, sf_dir):
    return sampling.data_mixing_plan(_t(spark, sf_dir, "documents"))


_DATA_MIXING_SQL = """
WITH m AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS mass
  FROM documents GROUP BY source
),
p AS (
  SELECT source, mass,
         (sum(mass) OVER () * 1) // 2 AS budget,
         CAST(FLOOR(CAST((sum(mass) OVER () * 1) // 2 AS DOUBLE)
                    * pow(CAST(mass AS DOUBLE), 0.5)
                    / sum(pow(CAST(mass AS DOUBLE), 0.5)) OVER ())
              AS BIGINT) AS tokens_alloc,
         CAST(FLOOR(1000000.0 * pow(CAST(mass AS DOUBLE), 0.5)
                    / sum(pow(CAST(mass AS DOUBLE), 0.5)) OVER ())
              AS BIGINT) AS sample_share_ppm
  FROM m
)
SELECT source, mass, tokens_alloc, sample_share_ppm,
       CAST((1000000 * tokens_alloc) // greatest(mass, 1) AS BIGINT)
         AS epochs_ppm,
       (1000000 * tokens_alloc) // greatest(mass, 1) > 4000000
         AS over_repeat
FROM p
"""

REGISTRY.update({
    "data_mixing_plan": QuerySpec(
        _data_mixing_plan, _DATA_MIXING_SQL,
        "per-source token plan for a half-corpus training budget "
        "under temperature sampling (alpha=0.5), with the implied "
        "epoch count audited against the ~4-epoch repeating-data "
        "rule; one groupBy to the #sources relation, bounded windows",
    ),
})

# ------------------------------------------------------------------
# Round 8: interpolated Kneser-Ney bigram table
# ------------------------------------------------------------------

def _bigram_kneser_ney(spark, sf_dir):
    return textops.bigram_kneser_ney(_t(spark, sf_dir, "documents"))


_BIGRAM_KN_SQL = r"""
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
c2 AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS c2,
         string_split(gram, ' ')[1] AS w1,
         string_split(gram, ' ')[2] AS w2
  FROM bg GROUP BY gram
),
lft AS (
  SELECT w1, CAST(sum(c2) AS BIGINT) AS c1w,
         CAST(count(*) AS BIGINT) AS n1p_w1
  FROM c2 GROUP BY w1
),
rgt AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n1p_w2 FROM c2 GROUP BY w2
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM c2)
SELECT gram, c2 AS n_pair, c1w AS n_left_total,
       CAST((1000000 * c2) // c1w AS BIGINT) AS mle_ppm,
       CAST((1000000 * (4 * c2 - 3)) // (4 * c1w)
            + (CAST(3000000 AS HUGEINT) * n1p_w1 * n1p_w2)
              // (CAST(4 AS HUGEINT) * c1w * ntot)
            AS BIGINT) AS kn_ppm
FROM c2 JOIN lft USING (w1) JOIN rgt USING (w2), tot
ORDER BY n_pair DESC, gram ASC
LIMIT 100
"""

REGISTRY.update({
    "bigram_kneser_ney": QuerySpec(
        _bigram_kneser_ney, _BIGRAM_KN_SQL,
        "interpolated Kneser-Ney bigram table (d=3/4, continuation "
        "distribution): two hash aggregates on uniform keys + "
        "broadcast 1-row bigram total, top-k via "
        "TakeOrderedAndProject; two ppm floors, DECIMAL-exact "
        "vocabulary-squared numerator",
    ),
})

# ------------------------------------------------------------------
# Round 8: product-quantization codebook audit
# ------------------------------------------------------------------

def _pq_codebook_audit(spark, sf_dir):
    return similarity.pq_codebook_audit(_t(spark, sf_dir, "embeddings"))


def _pq_codebook_sql(
    n_sub: int = 8, n_codes: int = 16, sub_dim: int = 8
) -> str:
    book = similarity.md5_pq_codebook(n_sub, n_codes, sub_dim)
    values = ", ".join(
        f"({m},{c},{d},{h})"
        for m, mc in enumerate(book)
        for c, row in enumerate(mc)
        for d, h in enumerate(row)
    )
    return f"""
WITH book(m, c, d, h) AS (VALUES {values}),
q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * 256.0) AS BIGINT)) AS q
  FROM embeddings
),
d2 AS MATERIALIZED (
  SELECT q.vec_id, b.m, b.c,
         sum((q.q[b.m * {sub_dim} + b.d + 1] - b.h)
             * (q.q[b.m * {sub_dim} + b.d + 1] - b.h)) AS d2
  FROM q, book b GROUP BY 1, 2, 3
),
asg AS MATERIALIZED (
  SELECT vec_id, m, c, d2 FROM (
    SELECT vec_id, m, c, d2,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY d2, c) AS rk
    FROM d2
  ) WHERE rk = 1
),
coords AS (
  SELECT a.m, a.c, t.pos, q.q[a.m * {sub_dim} + t.pos + 1] AS qd, a.d2
  FROM asg a JOIN q ON q.vec_id = a.vec_id, range(0, {sub_dim}) t(pos)
),
pc AS (
  SELECT m, c, pos, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qd) AS HUGEINT) AS s,
         CAST(sum(qd * qd) AS HUGEINT) AS ss,
         CAST(sum(d2) AS HUGEINT) AS sd2
  FROM coords GROUP BY 1, 2, 3
),
cell AS (
  SELECT m, c, max(n) AS n_assigned,
         (sum(sd2) // {sub_dim}) AS seed_d2_sum,
         sum(n * ss - s * s) AS var_num
  FROM pc GROUP BY 1, 2
),
tot AS (
  SELECT m, c, n_assigned, seed_d2_sum, var_num,
         sum(n_assigned) OVER (PARTITION BY m) AS nt
  FROM cell
)
SELECT CAST(m AS INTEGER) AS subspace, CAST(c AS INTEGER) AS code,
       CAST(n_assigned AS BIGINT) AS n_assigned,
       CAST((1000000 * n_assigned) // greatest(nt, 1) AS BIGINT)
         AS occupancy_ppm,
       CAST(seed_d2_sum // n_assigned AS BIGINT) AS mean_seed_d2,
       CAST(var_num // (CAST(n_assigned AS HUGEINT) * n_assigned)
            AS BIGINT) AS mean_refined_d2
FROM tot
"""


_PQ_CODEBOOK_SQL = _pq_codebook_sql()

REGISTRY.update({
    "embedding_pq_codebook": QuerySpec(
        _pq_codebook_audit, _PQ_CODEBOOK_SQL,
        "product-quantization codebook audit: subvectors assign to "
        "md5-seeded codewords row-locally (zero-shuffle fold), one "
        "hash aggregate to the subspace-code-coordinate grid; per "
        "cell occupancy plus seed AND one-Lloyd-step distortion (the "
        "refined figure via exact variance decomposition, no second "
        "corpus pass)",
    ),
})

# ------------------------------------------------------------------
# Round 8: Markov removal-effect attribution
# ------------------------------------------------------------------

def _markov_attribution(spark, sf_dir):
    return events.markov_attribution(_t(spark, sf_dir, "events"))


def _markov_sql(iters: int = 24) -> str:
    """Replay events.markov_attribution: journey edges → 1-row count
    pivot → ppm transition matrix → `iters` chained-CTE Jacobi steps
    for the base chain and each removal chain, floor-identical to
    the Spark higher-order fold."""
    chans = events.MARKOV_CHANNELS
    states = ("START",) + chans
    piv_cols, p_cols = [], []
    for i, s in enumerate(states):
        piv_cols.append(
            f"sum(CASE WHEN src = '{s}' THEN n END) AS t{i}"
        )
        for j, d in enumerate(states):
            if j == 0:
                continue
            piv_cols.append(
                f"sum(CASE WHEN src = '{s}' AND dst = '{d}' THEN n END)"
                f" AS n{i}_{j}"
            )
        piv_cols.append(
            f"sum(CASE WHEN src = '{s}' AND dst = 'CONV' THEN n END)"
            f" AS nc{i}"
        )
        for j in range(1, len(states)):
            p_cols.append(
                f"(1000000 * coalesce(n{i}_{j}, 0))"
                f" // greatest(coalesce(t{i}, 0), 1) AS p{i}_{j}"
            )
        p_cols.append(
            f"(1000000 * coalesce(nc{i}, 0))"
            f" // greatest(coalesce(t{i}, 0), 1) AS pc{i}"
        )
    n_states = len(states)
    pnames = [
        f"p{i}_{j}" for i in range(n_states) for j in range(1, n_states)
    ] + [f"pc{i}" for i in range(n_states)]
    ctes = [
        """seq AS (
  SELECT user_id, event_id, event_type AS cur,
         lag(event_type) OVER w AS prev,
         lead(event_type) OVER w AS nxt
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)""",
        """hops AS (
  SELECT CASE WHEN prev IS NULL OR prev = 'purchase'
              THEN 'START' ELSE prev END AS src,
         CASE WHEN cur = 'purchase' THEN 'CONV' ELSE cur END AS dst
  FROM seq
  UNION ALL
  SELECT cur, 'END' FROM seq WHERE cur != 'purchase' AND nxt IS NULL
)""",
        "edges AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n"
        " FROM hops GROUP BY 1, 2)",
        "piv AS (SELECT " + ", ".join(piv_cols) + " FROM edges)",
        "p AS (SELECT " + ", ".join(p_cols) + " FROM piv)",
    ]
    # chain 0 = base; chain c (1-based channel index) = channel c
    # removed (its incoming mass leaks to END)
    zeros = ", ".join(
        f"CAST(0 AS BIGINT) AS c{ch}_{i}"
        for ch in range(len(chans) + 1)
        for i in range(n_states)
    )
    ctes.append(f"x0 AS (SELECT {zeros}, {', '.join(pnames)} FROM p)")
    for k in range(1, iters + 1):
        cols = []
        for ch in range(len(chans) + 1):
            for i in range(n_states):
                parts = [f"1000000 * pc{i}"]
                for j in range(1, n_states):
                    if ch != 0 and j == ch:
                        continue
                    parts.append(f"p{i}_{j} * c{ch}_{j}")
                cols.append(
                    f"({' + '.join(parts)}) // 1000000 AS c{ch}_{i}"
                )
        ctes.append(
            f"x{k} AS (SELECT {', '.join(cols)},"
            f" {', '.join(pnames)} FROM x{k-1})"
        )
    effs = " + ".join(
        f"greatest(c0_0 - c{ch}_0, 0)" for ch in range(1, len(chans) + 1)
    )
    ctes.append(f"fin AS (SELECT *, {effs} AS tot FROM x{iters})")
    selects = []
    for ch, name in enumerate(chans, start=1):
        selects.append(
            f"SELECT '{name}' AS channel,"
            " CAST(c0_0 AS BIGINT) AS base_conv_ppm,"
            f" CAST(c{ch}_0 AS BIGINT) AS removed_conv_ppm,"
            f" CAST(greatest(c0_0 - c{ch}_0, 0) AS BIGINT)"
            " AS removal_effect_ppm,"
            f" CAST((1000000 * greatest(c0_0 - c{ch}_0, 0))"
            " // greatest(tot, 1) AS BIGINT) AS attribution_ppm"
            " FROM fin"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)
    )


_MARKOV_ATTRIBUTION_SQL = _markov_sql()

REGISTRY.update({
    "events_markov_attribution": QuerySpec(
        _markov_attribution, _MARKOV_ATTRIBUTION_SQL,
        "Markov removal-effect attribution: journeys -> absorbing "
        "chain (one lag-window corpus pass), conversion probability "
        "solved by 24 ppm-integer Jacobi steps on a 1-row matrix "
        "pivot, per-channel credit = conversion drop when the "
        "channel's edges leak to null",
    ),
})

# ------------------------------------------------------------------
# Round 8: Kaplan-Meier return-risk survival over transit time
# ------------------------------------------------------------------

def _return_survival(spark, sf_dir):
    return profiling.return_survival(
        _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    )


# Product-limit fold replayed as a recursive CTE over the bounded
# transit-day grid — floor-compounded ppm survival, bit-identical to
# the Spark higher-order fold (profiling.py:return_survival).
_RETURN_SURVIVAL_SQL = """
WITH RECURSIVE per AS (
  SELECT CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS t,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS d,
         CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 0 ELSE 1 END)
              AS BIGINT) AS c
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1
),
idx AS (
  SELECT t, d, c, row_number() OVER (ORDER BY t) AS i FROM per
),
tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n0 FROM per),
f AS (
  SELECT idx.i, idx.t, idx.d, idx.c, tot.n0 AS n,
         (1000000 * (tot.n0 - idx.d)) // tot.n0 AS s
  FROM idx, tot WHERE idx.i = 1
  UNION ALL
  SELECT h.i, h.t, h.d, h.c,
         f.n - f.d - f.c,
         (f.s * ((f.n - f.d - f.c) - h.d)) // (f.n - f.d - f.c)
  FROM f JOIN idx h ON h.i = f.i + 1
)
SELECT t AS latency_days, n AS n_at_risk, d AS n_returned,
       c AS n_censored,
       CAST((1000000 * d) // n AS BIGINT) AS hazard_ppm,
       CAST(s AS BIGINT) AS survival_ppm
FROM f
"""

REGISTRY.update({
    "lineitem_return_survival": QuerySpec(
        _return_survival, _RETURN_SURVIVAL_SQL,
        "Kaplan-Meier product-limit estimator with right-censoring: "
        "return risk over fulfillment-latency days (kept items "
        "censor at ship); one fact join + one hash aggregate to the bounded day "
        "grid, then an integer ppm fold — survival analysis as a "
        "first-class relational operator",
    ),
})

# ------------------------------------------------------------------
# Round 8: integer-exact top principal component (power iteration)
# ------------------------------------------------------------------

def _pca_power(spark, sf_dir):
    return similarity.pca_power(_t(spark, sf_dir, "embeddings"))


def _pca_sql(dim: int = 64, scale_bits: int = 12, iters: int = 8) -> str:
    """Chained-CTE replay of similarity.pca_power: augmented Gram →
    rescaled scatter matrix → `iters` HUGEINT power iterations with
    the identical sign-aware floor normalization."""
    s = 1 << scale_bits
    d1 = dim + 1
    ctes = [
        f"""q  AS MATERIALIZED (
  SELECT list_append(list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {s}) AS BIGINT)),
         CAST({s} AS BIGINT)) AS qa
  FROM embeddings
)""",
        f"""gram  AS MATERIALIZED (
  SELECT t1.i AS i, t2.j AS j,
         CAST(sum(CAST(qa[t1.i + 1] AS HUGEINT) * qa[t2.j + 1])
              AS HUGEINT) AS g
  FROM q, range(0, {d1}) t1(i), range(0, {d1}) t2(j)
  GROUP BY 1, 2
)""",
        f"""mr  AS MATERIALIZED (
  SELECT a.i, a.j, d.g * a.g - ri.g * rj.g AS mr
  FROM gram a
  JOIN gram d  ON d.i = {dim} AND d.j = {dim}
  JOIN gram ri ON ri.i = a.i AND ri.j = {dim}
  JOIN gram rj ON rj.i = a.j AND rj.j = {dim}
  WHERE a.i < {dim} AND a.j < {dim}
)""",
        """mm  AS MATERIALIZED (
  SELECT greatest(max(abs(mr)), CAST(1 AS HUGEINT)) AS mmax FROM mr
)""",
        """m  AS MATERIALIZED (
  SELECT i, j,
         CASE WHEN mr < 0 THEN -((-mr * 1048576) // mmax)
              ELSE (mr * 1048576) // mmax END AS m
  FROM mr, mm
)""",
        f"""v0  AS MATERIALIZED (
  SELECT t.j AS j, CAST({s} AS HUGEINT) AS v FROM range(0, {dim}) t(j)
)""",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""w{k} AS MATERIALIZED (
  SELECT m.i, sum(m.m * v.v) AS w FROM m JOIN v{k-1} v ON v.j = m.j
  GROUP BY m.i
)"""
        )
        ctes.append(
            f"""v{k} AS MATERIALIZED (
  SELECT w{k}.i AS j,
         CASE WHEN w < 0 THEN -((-w * {s}) // mx)
              ELSE (w * {s}) // mx END AS v
  FROM w{k},
       (SELECT greatest(max(abs(w)), CAST(1 AS HUGEINT)) AS mx
        FROM w{k}) s{k}
)"""
        )
    ctes.append(
        f"""wf AS MATERIALIZED (
  SELECT m.i, sum(m.m * v.v) AS w FROM m JOIN v{iters} v ON v.j = m.j
  GROUP BY m.i
)"""
    )
    ctes.append(
        f"""st AS (
  SELECT sum(v.v * wf.w) AS num, sum(v.v * v.v) AS den
  FROM wf JOIN v{iters} v ON v.j = wf.i
)"""
    )
    ctes.append("t AS (SELECT sum(m) AS tr FROM m WHERE i = j)")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST(v.j AS INTEGER) AS pos, CAST(v.v AS BIGINT) AS v_q,
       CAST((CAST(1000000 AS HUGEINT) * num) // (den * tr) AS BIGINT)
         AS eig_share_ppm
FROM v{iters} v, st, t
"""
    )


_PCA_POWER_SQL = _pca_sql()

REGISTRY.update({
    "embedding_pca_power": QuerySpec(
        _pca_power, _PCA_POWER_SQL,
        "top principal component by integer-exact power iteration: "
        "one augmented-Gram corpus pass (explode + map-side-combined "
        "hash agg), then 8 matrix-relation multiplies at metadata "
        "scale; emits the eigenvector and its variance share — the "
        "embedding-collapse / anisotropy audit",
    ),
})

REGISTRY.update({
    "events_expectations_audit": QuerySpec(
        _events_expectations_audit, _EXPECTATIONS_SQL,
        "declarative data-contract audit (DLT/Great-Expectations "
        "pattern): every rule a conditional sum + min-violator probe "
        "in ONE scan and ONE map-side global aggregate, unpivoted "
        "via stack() to a per-rule relation plus the any-drop-rule "
        "quarantine row; zero corpus shuffle",
    ),
    "stream_expectations_gate": QuerySpec(
        lambda spark, sf_dir: stream_ops.run_to_table(
            stream_ops.expectations_gate_stream(
                stream_ops.read_events_stream(spark, sf_dir)
            ),
            "complete",
            "stream_expectations_gate",
        ),
        _EXPECTATIONS_SQL,
        "streaming data-contract gate: per-row rules expand "
        "statelessly BEFORE the aggregation, so state is one row per "
        "rule (bounded by the contract); same predicate strings as "
        "the batch audit, one availableNow drain equals it exactly",
    ),
    "shuffle_skew_advisor": QuerySpec(
        _shuffle_skew_advisor, _SHUFFLE_SKEW_SQL,
        "pre-flight shuffle-skew diagnosis: per-key counts hashed "
        "into 32 simulated reduce tasks with an engine-portable md5 "
        "hash; per-partition load, skew ppm vs fair share, and the "
        "salt factor that levels the heaviest key — the decision "
        "input for plain hash vs AQE skew-join vs explicit salting",
    ),
})


# ------------------------------------------------------------------

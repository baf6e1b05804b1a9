"""Round-5 LLM-pipeline additions: repetition removal, vocabulary coverage, readability, advisors.

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
from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_diag import _binpack_cte
from iceberg_diag_spark.plans.oracles_dedup import (
    _MINHASH_PRS_CTE,
    _NGRAM_CONTAINMENT_SQL,
    _NGRAM_JACCARD_SQL,
    _ngram_containment,
)
from iceberg_diag_spark.plans.oracles_multimodal import _media
from iceberg_diag_spark.plans.oracles_corpus import _CENTROID_CONFUSION_SQL


# Round-5 LLM-pipeline additions: within-doc repetition removal,
# unigram-LM perplexity proxy, and SemDeDup-style cluster-bucketed
# semantic dedup.
# --------------------------------------------------------------------

def _doc_line_dedup(spark, sf_dir):
    return textops.line_dedup(_t(spark, sf_dir, "documents"))


_DOC_LINE_DEDUP_SQL = r"""
WITH arrs AS (
  SELECT doc_id, regexp_split_to_array(text, '\. ') AS arr FROM documents
),
s AS (
  SELECT doc_id, len(arr) AS n_total,
         unnest(generate_series(1, len(arr))) AS pos, arr
  FROM arrs
),
sent AS (
  SELECT doc_id, n_total, pos, arr[pos] AS sent FROM s
),
first AS (
  SELECT doc_id, sent, min(pos) AS pos, max(n_total) AS n_total
  FROM sent GROUP BY doc_id, sent
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS kept_sentences,
       CAST(max(n_total) - count(*) AS BIGINT) AS removed_sentences,
       md5(string_agg(sent, '. ' ORDER BY pos)) AS cleaned_md5
FROM first GROUP BY doc_id
"""


def _doc_unigram_logprob(spark, sf_dir):
    return textops.unigram_logprob(_t(spark, sf_dir, "documents"))


_DOC_UNIGRAM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
  FROM documents
),
vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM vocab),
scored AS (
  SELECT term,
         CAST(FLOOR(-ln(cnt / n_total) * 1000000.0) AS BIGINT) AS nll_micro
  FROM vocab CROSS JOIN tot
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(nll_micro) AS BIGINT) AS sum_nll_micro,
       CAST(FLOOR(CAST(sum(nll_micro) AS DOUBLE) / count(*)) AS BIGINT) AS avg_nll_micro
FROM toks t JOIN scored USING (term)
GROUP BY t.doc_id
"""


def _semantic_dedup(spark, sf_dir):
    return similarity.semantic_dedup(_t(spark, sf_dir, "embeddings"))


_SEMANTIC_DEDUP_SQL = """
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
  SELECT ex.vec_id, cent.cand,
         CAST(FLOOR(sum((ex.val - cent.c) * (ex.val - cent.c)) * 1000000.0) AS BIGINT) AS d2q
  FROM ex JOIN cent ON ex.pos = cent.pos
  GROUP BY ex.vec_id, cent.cand
),
assigned AS (
  SELECT vec_id, cand AS cluster
  FROM (SELECT vec_id, cand,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cand) AS rn
        FROM dists)
  WHERE rn = 1
),
pairs AS (
  SELECT a.cluster, a.vec_id AS va_id, b.vec_id AS vb_id,
         ea.embedding AS va, eb.embedding AS vb
  FROM assigned a
  JOIN assigned b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
),
terms AS (
  SELECT cluster, va_id, vb_id, unnest(va) AS x, unnest(vb) AS y FROM pairs
),
scored AS (
  SELECT cluster, va_id, vb_id,
         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dotp,
         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS aa,
         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS bb
  FROM terms GROUP BY cluster, va_id, vb_id
),
dropped AS (
  SELECT DISTINCT cluster, vb_id FROM scored
  WHERE CAST(FLOOR(dotp / (sqrt(aa) * sqrt(bb)) * 1000000.0) AS BIGINT) >= 400000
),
nv AS (SELECT cluster, count(*) AS n_vecs FROM assigned GROUP BY cluster),
nd AS (SELECT cluster, count(*) AS n_dropped FROM dropped GROUP BY cluster)
SELECT nv.cluster,
       CAST(nv.n_vecs AS BIGINT) AS n_vecs,
       CAST(coalesce(nd.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(nv.n_vecs - coalesce(nd.n_dropped, 0) AS BIGINT) AS n_kept
FROM nv LEFT JOIN nd ON nv.cluster = nd.cluster
"""


REGISTRY.update({
    "doc_line_dedup": QuerySpec(
        _doc_line_dedup, _DOC_LINE_DEDUP_SQL,
        "within-document repeated-sentence removal (keep first "
        "occurrence), rebuilt text md5-pinned — per-doc state only, "
        "scales with the scan",
    ),
    "doc_unigram_logprob": QuerySpec(
        _doc_unigram_logprob, _DOC_UNIGRAM_SQL,
        "unigram-LM negative log-likelihood per doc (cheap perplexity "
        "proxy for quality filtering), micro-nat integer sums immune "
        "to float summation order",
    ),
    "semantic_dedup": QuerySpec(
        _semantic_dedup, _SEMANTIC_DEDUP_SQL,
        "SemDeDup-style semantic dedup: nearest-centroid clustering "
        "bounds the pairwise cosine pass to within-cluster equi-joins "
        "(never a cross product); per-cluster kept/dropped counts",
    ),
    "ngram_containment": QuerySpec(
        _ngram_containment, _NGRAM_CONTAINMENT_SQL,
        "asymmetric n-gram containment over LSH candidate pairs (the "
        "sub-document/quote-inclusion signal Jaccard misses) — all-"
        "integer output, no float surface",
    ),
})


def _bigram_logprob(spark, sf_dir):
    return textops.bigram_logprob(_t(spark, sf_dir, "documents"))


_BIGRAM_LOGPROB_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2 THEN
           list_transform(generate_series(0, len(toks) - 2),
                          i -> toks[i + 1] || ' ' || toks[i + 2])
         ELSE [] END) AS gram
  FROM norm
),
c2 AS (SELECT gram, count(*) AS c2 FROM bg GROUP BY gram),
c1 AS (SELECT string_split(gram, ' ')[1] AS w1, count(*) AS c1 FROM bg GROUP BY w1),
s AS (
  SELECT gram,
         CAST(FLOOR(-ln(CAST(c2 AS DOUBLE) / c1) * 1000000.0) AS BIGINT) AS nll_micro
  FROM c2 JOIN c1 ON string_split(c2.gram, ' ')[1] = c1.w1
)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(nll_micro) AS BIGINT) AS sum_nll_micro,
       CAST(FLOOR(CAST(sum(nll_micro) AS DOUBLE) / count(*)) AS BIGINT) AS avg_nll_micro
FROM bg JOIN s USING (gram)
GROUP BY bg.doc_id
"""


def _snapshot_diff(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    # overlapping releases: thirds 1,2 are the old snapshot, thirds
    # 2,0 the new — third 2 is carried over verbatim, so all three
    # statuses (added/removed/retained) are exercised
    return dedup.snapshot_diff(
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter(F.col("doc_id") % 3 != 1),
    )


_SNAPSHOT_DIFF_SQL = r"""
WITH a AS (
  SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h,
         min(source) AS src_old, count(*) AS docs_old
  FROM documents WHERE doc_id % 3 <> 0 GROUP BY h
),
b AS (
  SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h,
         min(source) AS src_new, count(*) AS docs_new
  FROM documents WHERE doc_id % 3 <> 1 GROUP BY h
),
j AS (
  SELECT a.src_old, b.src_new, a.docs_old, b.docs_new
  FROM a FULL OUTER JOIN b ON a.h = b.h
)
SELECT CASE WHEN docs_old IS NULL THEN 'added'
            WHEN docs_new IS NULL THEN 'removed'
            ELSE 'retained' END AS status,
       coalesce(src_old, src_new) AS source,
       CAST(count(*) AS BIGINT) AS n_hashes,
       CAST(sum(coalesce(docs_old, 0)) AS BIGINT) AS docs_old,
       CAST(sum(coalesce(docs_new, 0)) AS BIGINT) AS docs_new
FROM j GROUP BY status, source
"""


REGISTRY.update({
    "doc_bigram_logprob": QuerySpec(
        _bigram_logprob, _BIGRAM_LOGPROB_SQL,
        "bigram-LM conditional NLL per doc (catches word-salad with "
        "plausible unigram stats); micro-nat integer sums",
    ),
    "corpus_snapshot_diff": QuerySpec(
        _snapshot_diff, _SNAPSHOT_DIFF_SQL,
        "release-to-release content diff by exact hash: added/removed/"
        "retained per source, hash-only shuffle volume",
    ),
})


def _quality_classifier(spark, sf_dir):
    return textops.quality_classifier_score(_t(spark, sf_dir, "documents"))


_QUALITY_CLASSIFIER_SQL = r"""
WITH f AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
         text
  FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS mtl,
         CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS ttr,
         CAST(len(list_intersect(toks,
           ['the','and','of','to','a','in','is','that','it','for'])) AS DOUBLE)
           / greatest(len(toks), 1) AS sw,
         CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS alpha,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i : i + 2], ' '))
         ELSE [] END AS tri
  FROM f
),
z AS (
  SELECT doc_id,
         -2.3 + (-0.05) * mtl + 1.2 * ttr + 4.0 * sw + 2.5 * alpha
         + (-3.0) * (CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                     / greatest(len(tri), 1)) AS z
  FROM feats
)
SELECT doc_id,
       CAST(FLOOR(z * 1000000.0) AS BIGINT) AS z_micro,
       z >= 0 AS keep
FROM z
"""


def _tokenizer_fertility(spark, sf_dir):
    return textops.tokenizer_fertility(_t(spark, sf_dir, "documents"))


_TOKENIZER_FERTILITY_SQL = r"""
WITH per_doc AS (
  SELECT source,
         len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS words,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS subwords,
         length(text) AS chars
  FROM documents
),
g AS (
  SELECT source,
         count(*) AS n_docs,
         sum(words) AS words,
         sum(subwords) AS subwords,
         sum(chars) AS chars
  FROM per_doc GROUP BY source
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(words AS BIGINT) AS words,
       CAST(subwords AS BIGINT) AS subwords,
       CAST(FLOOR(subwords * 1000000.0 / greatest(words, 1)) AS BIGINT) AS fertility_ppm,
       CAST(FLOOR(chars * 1000000.0 / greatest(subwords, 1)) AS BIGINT) AS chars_per_subword_ppm
FROM g
"""


def _langid_margin(spark, sf_dir):
    return textops.langid_margin(_t(spark, sf_dir, "documents"))


def _lang_list_sql_margin(lang: str) -> str:
    from iceberg_diag_spark.operators.textops import STOPWORDS

    return "[" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


_LANGID_MARGIN_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
scores AS (
""" + "\n  UNION ALL\n".join(
    "  SELECT doc_id, '{lang}' AS lang, "
    "len(list_intersect(toks, {lst})) AS hits FROM norm".format(
        lang=lang, lst=_lang_list_sql_margin(lang)
    )
    for lang in ("de", "en", "es", "fr")
) + r"""
),
ranked AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lang DESC) AS rn
  FROM scores
)
SELECT b.doc_id, b.lang,
       CAST(b.hits AS BIGINT) AS hits,
       CAST(b.hits - s.hits AS BIGINT) AS margin
FROM ranked b JOIN ranked s ON b.doc_id = s.doc_id AND s.rn = 2
WHERE b.rn = 1
"""


def _contamination_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    evs = {
        "eval_a": docs.filter(F.col("doc_id") % 20 == 0),
        "eval_b": docs.filter(F.col("doc_id") % 20 == 10),
    }
    return textops.contamination_report(train, evs, n=8)


_CONTAMINATION_REPORT_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, md5(array_to_string(t[i : i + 7], ' ')) AS g
  FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
),
ev AS (
  SELECT 'eval_a' AS eval_set, g
  FROM (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0)
  UNION ALL
  SELECT 'eval_b', g
  FROM (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 10)
),
tr AS (
  SELECT gr.doc_id, d.source, gr.g
  FROM grams gr JOIN documents d USING (doc_id)
  WHERE gr.doc_id % 10 <> 0
),
hit_docs AS (
  SELECT e.eval_set, t.source, t.doc_id
  FROM tr t JOIN ev e ON t.g = e.g
  GROUP BY 1, 2, 3
),
h2 AS (
  SELECT eval_set, source, count(*) AS contaminated_docs
  FROM hit_docs GROUP BY 1, 2
),
tot AS (
  SELECT source, count(*) AS total_docs
  FROM documents WHERE doc_id % 10 <> 0 GROUP BY source
)
SELECT eval_set, h2.source,
       CAST(contaminated_docs AS BIGINT) AS contaminated_docs,
       CAST(total_docs AS BIGINT) AS total_docs,
       CAST(FLOOR(contaminated_docs * 1000000.0 / total_docs) AS BIGINT)
         AS contaminated_ppm
FROM h2 JOIN tot ON h2.source = tot.source
"""


def _media_dedup_exact(spark, sf_dir):
    return multimodal.media_dedup_stats(_media(spark, sf_dir))


# payload = UTF-8 bytes of text (the ASCII-corpus convention all
# media oracles rely on), so sha256(text) in DuckDB hashes the exact
# same bytes as Spark's sha2(payload).
_MEDIA_DEDUP_SQL = """
WITH m AS (
  SELECT doc_id,
         ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         text
  FROM documents
),
per_hash AS (
  SELECT media_type, sha256(text) AS h,
         count(*) AS cnt, min(length(text)) AS bl
  FROM m GROUP BY media_type, sha256(text)
)
SELECT media_type,
       CAST(sum(cnt) AS BIGINT) AS n_assets,
       CAST(count(*) AS BIGINT) AS distinct_assets,
       CAST(sum(cnt) - count(*) AS BIGINT) AS dup_assets,
       CAST(sum((cnt - 1) * bl) AS BIGINT) AS reclaimable_bytes
FROM per_hash
GROUP BY media_type
"""


def _curriculum_shards(spark, sf_dir):
    return sampling.curriculum_shards(_t(spark, sf_dir, "documents"))


_CURRICULUM_SQL = r"""
WITH f AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
         text
  FROM documents
),
feats AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS mtl,
         CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS ttr,
         CAST(len(list_intersect(toks,
           ['the','and','of','to','a','in','is','that','it','for'])) AS DOUBLE)
           / greatest(len(toks), 1) AS sw,
         CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS alpha,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i : i + 2], ' '))
         ELSE [] END AS tri,
         len(toks) AS n_tokens
  FROM f
),
z AS (
  SELECT doc_id, n_tokens,
         CAST(FLOOR((-2.3 + (-0.05) * mtl + 1.2 * ttr + 4.0 * sw + 2.5 * alpha
         + (-3.0) * (CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                     / greatest(len(tri), 1))) * 1000000.0) AS BIGINT) AS z_micro
  FROM feats
),
banded AS (
  SELECT doc_id, n_tokens,
         CASE WHEN z_micro >= 600000 THEN 'high'
              WHEN z_micro >= 300000 THEN 'mid'
              ELSE 'low' END AS band,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard
  FROM z
),
g AS (
  SELECT band,
         CASE band WHEN 'high' THEN 0 WHEN 'mid' THEN 1 ELSE 2 END AS band_rank,
         shard, count(*) AS n_docs, sum(n_tokens) AS total_tokens
  FROM banded GROUP BY band, shard
)
SELECT band,
       CAST(band_rank AS INTEGER) AS band_rank,
       CAST(shard AS BIGINT) AS shard,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       CAST(FLOOR(n_docs * 1000000.0 / sum(n_docs) OVER (PARTITION BY band))
            AS BIGINT) AS band_share_ppm
FROM g
"""


REGISTRY.update({
    "doc_curriculum_shards": QuerySpec(
        _curriculum_shards, _CURRICULUM_SQL,
        "curriculum training-shard manifest: classifier quality bands "
        "x deterministic hash shards with doc/token counts and exact "
        "band shares — the training-loader input",
    ),
})


def _norm_outliers(spark, sf_dir):
    return similarity.norm_outliers(_t(spark, sf_dir, "embeddings"))


_NORM_OUTLIERS_SQL = """
WITH ex AS (
  SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
norms AS (
  SELECT vec_id, label,
         CAST(FLOOR(sqrt(sum(val * val)) * 1000.0) AS BIGINT) AS x
  FROM ex GROUP BY vec_id, label
),
stats AS (
  SELECT label,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS s2,
         CAST(min(x) AS BIGINT) AS mn,
         CAST(max(x) AS BIGINT) AS mx
  FROM norms GROUP BY label
)
SELECT norms.label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN (n * x - s) * (n * x - s) > 9 * (n * s2 - s * s)
                     THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
       CAST(min(mn) AS BIGINT) AS min_norm_milli,
       CAST(max(mx) AS BIGINT) AS max_norm_milli
FROM norms JOIN stats ON norms.label = stats.label
GROUP BY norms.label
"""


REGISTRY.update({
    "embedding_norm_outliers": QuerySpec(
        _norm_outliers, _NORM_OUTLIERS_SQL,
        "per-label vector-norm outlier audit (poisoned/truncated "
        "batch check): 3-sigma test run entirely in cross-multiplied "
        "integers — no float mean/variance, bit-exact on any engine",
    ),
})


REGISTRY.update({
    "media_dedup_exact": QuerySpec(
        _media_dedup_exact, _MEDIA_DEDUP_SQL,
        "exact media dedup audit by payload sha256 (32-byte hash "
        "shuffle, payloads never move): per-type duplicate counts + "
        "reclaimable bytes",
    ),
})


def _diag_manifest_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    manifests = o.select(
        (F.col("o_orderkey") % 3).cast("int").alias("partition_spec_id"),
        (F.col("o_orderkey") % 2).cast("int").alias("content"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("length"),
        (F.col("o_custkey") % 50).cast("int").alias("added_data_files_count"),
        (F.col("o_custkey") % 30).cast("int").alias("existing_data_files_count"),
        (F.col("o_custkey") % 7).cast("int").alias("deleted_data_files_count"),
    )
    return maintenance.manifest_stats(manifests)


_DIAG_MANIFEST_STATS_SQL = """
WITH manifests AS (
  SELECT CAST(o_orderkey % 3 AS INTEGER) AS partition_spec_id,
         CAST(o_orderkey % 2 AS INTEGER) AS content,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS length,
         CAST(o_custkey % 50 AS INTEGER) AS added_data_files_count,
         CAST(o_custkey % 30 AS INTEGER) AS existing_data_files_count,
         CAST(o_custkey % 7 AS INTEGER) AS deleted_data_files_count
  FROM orders
)
SELECT partition_spec_id, content,
       CAST(count(*) AS BIGINT) AS n_manifests,
       CAST(sum(length) AS BIGINT) AS total_manifest_bytes,
       CAST(sum(added_data_files_count + existing_data_files_count) AS BIGINT) AS total_entries,
       CAST(sum(deleted_data_files_count) AS BIGINT) AS deleted_entries,
       CAST(sum(CASE WHEN length < 200000 THEN 1 ELSE 0 END) AS BIGINT) AS small_manifests,
       CAST(FLOOR(CAST(sum(added_data_files_count + existing_data_files_count) AS DOUBLE)
                  / count(*)) AS BIGINT) AS entries_per_manifest
FROM manifests
GROUP BY partition_spec_id, content
"""


def _events_cdc_dedup(spark, sf_dir):
    from iceberg_diag_spark.operators.events import cdc_latest_rows

    return cdc_latest_rows(_t(spark, sf_dir, "events"))


_EVENTS_CDC_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM events
)
SELECT user_id, event_type,
       CAST(event_id AS BIGINT) AS last_event_id,
       CAST(FLOOR(value * 100) AS BIGINT) AS last_value_cents,
       CAST(n AS BIGINT) AS n_versions
FROM ranked WHERE rn = 1
"""


REGISTRY.update({
    "diag_manifest_stats": QuerySpec(
        _diag_manifest_stats, _DIAG_MANIFEST_STATS_SQL,
        "manifest-layer diagnostics (rewrite_manifests signal): per "
        "(spec, content) manifest count/bytes/entry density + small-"
        "manifest count over the .manifests schema",
    ),
    "events_cdc_dedup": QuerySpec(
        _events_cdc_dedup, _EVENTS_CDC_SQL,
        "CDC latest-row-wins compaction (merge-on-read upsert "
        "semantics): newest version per key with superseded-version "
        "count, one WindowGroupLimit pass",
    ),
})


def _stream_centroid_confusion(spark, sf_dir):
    from iceberg_diag_spark.streaming import stream_ops

    return stream_ops.run_to_table(
        stream_ops.centroid_confusion_stream(
            stream_ops.read_embeddings_stream(spark, sf_dir),
            _t(spark, sf_dir, "embeddings"),
        ),
        "complete",
        "stream_centroid_confusion",
    )


REGISTRY.update({
    "stream_centroid_confusion": QuerySpec(
        # draining the full parquet makes the streaming result equal
        # the batch confusion — the batch oracle applies verbatim
        _stream_centroid_confusion, _CENTROID_CONFUSION_SQL,
        "streaming nearest-centroid drift monitor: one-row static "
        "centroid-array cross join + row-local argmin fold — "
        "stateless per vector, #labels²-bounded count state",
    ),
})


REGISTRY.update({
    "quality_classifier_score": QuerySpec(
        _quality_classifier, _QUALITY_CLASSIFIER_SQL,
        "fasttext-style linear keep/drop classifier over the "
        "heuristic feature vector — fixed-order arithmetic, exact "
        "decision boundary, zero shuffle",
    ),
    "tokenizer_fertility": QuerySpec(
        _tokenizer_fertility, _TOKENIZER_FERTILITY_SQL,
        "tokenizer-fit audit per source: subwords-per-word fertility "
        "and chars-per-subword in floor-ppm integers",
    ),
    "langid_margin": QuerySpec(
        _langid_margin, _LANGID_MARGIN_SQL,
        "language-ID confidence margin (winner vs runner-up hit "
        "counts) — the undecidable slice router",
    ),
    "contamination_report": QuerySpec(
        _contamination_report, _CONTAMINATION_REPORT_SQL,
        "per-(benchmark, source) contamination matrix via one "
        "broadcast union of tagged eval gram sets",
    ),
})


# --------------------------------------------------------------------
# Round-5d additions: vocabulary coverage, readability, char-ngram
# novelty, dedup survivorship accounting, Jaccard threshold
# calibration, and exact distributed RFM segmentation.
# --------------------------------------------------------------------


def _vocab_oov_rate(spark, sf_dir):
    return textops.vocab_oov_rate(_t(spark, sf_dir, "documents"))


_VOCAB_OOV_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, TRUE AS in_vocab FROM (
    SELECT tok, count(*) AS c FROM toks GROUP BY tok
    ORDER BY c DESC, tok ASC LIMIT 1024
  )
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       CAST(FLOOR(1000000.0 * sum(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)
                  / count(*)) AS BIGINT) AS oov_ppm
FROM toks t LEFT JOIN vocab v USING (tok)
GROUP BY source
"""


def _doc_readability(spark, sf_dir):
    return textops.readability_stats(_t(spark, sf_dir, "documents"))


_READABILITY_SQL = r"""
WITH c AS (
  SELECT doc_id,
         greatest(len(list_filter(
           string_split_regex(lower(text), '[.!?]+'),
           s -> trim(s) <> '')), 1) AS n_sents,
         greatest(len(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')), 1)
           AS n_words,
         len(regexp_extract_all(lower(text), '[aeiou]+')) AS n_syllables
  FROM documents
)
SELECT doc_id,
       CAST(n_sents AS BIGINT) AS n_sents,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(FLOOR(1000.0 * (206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
         AS BIGINT) AS flesch_milli
FROM c
"""


def _doc_char_novelty(spark, sf_dir):
    return textops.char_ngram_novelty(_t(spark, sf_dir, "documents"))


_CHAR_NOVELTY_SQL = r"""
WITH g AS (
  SELECT doc_id,
         greatest(length(lower(text)) - 3, 0) AS n_grams,
         lower(text) AS t
  FROM documents
),
d AS (
  SELECT doc_id, n_grams,
         CASE WHEN n_grams > 0 THEN
           len(list_distinct(list_transform(
             generate_series(1, n_grams), i -> substr(t, i, 4))))
         ELSE 0 END AS distinct_grams
  FROM g
)
SELECT doc_id,
       CAST(n_grams AS BIGINT) AS n_grams,
       CAST(distinct_grams AS BIGINT) AS distinct_grams,
       CAST(CASE WHEN n_grams > 0
            THEN FLOOR(1000000.0 * distinct_grams / n_grams)
            ELSE 0 END AS BIGINT) AS novelty_ppm
FROM d
"""


def _dedup_survivorship(spark, sf_dir):
    return dedup.dedup_survivorship(_t(spark, sf_dir, "documents"))


_DEDUP_SURVIVORSHIP_SQL = r"""
WITH h AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS sz,
         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
  FROM documents
),
m AS (
  SELECT *, min(doc_id) OVER (PARTITION BY ch) AS keep FROM h
)
SELECT source,
       CAST(count(*) AS BIGINT) AS docs_total,
       CAST(sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_kept,
       CAST(sum(sz) AS BIGINT) AS bytes_total,
       CAST(sum(CASE WHEN doc_id <> keep THEN sz ELSE 0 END) AS BIGINT)
         AS bytes_dropped,
       CAST(FLOOR(1000000.0 * sum(CASE WHEN doc_id = keep THEN 1 ELSE 0 END)
                  / count(*)) AS BIGINT) AS keep_ppm
FROM m GROUP BY source
"""


def _jaccard_threshold_hist(spark, sf_dir):
    return dedup.jaccard_threshold_histogram(_t(spark, sf_dir, "documents"))


# reuses the full proven ngram_jaccard chain (exact-collapse → LSH
# bands → exact verification) as a subquery, then buckets the rounded
# jaccard into micro-deciles.
_JACCARD_HIST_SQL = (
    """
SELECT bucket_ppm, CAST(count(*) AS BIGINT) AS n_pairs
FROM (
  SELECT CASE WHEN ppm >= 1000000 THEN 1000000
              ELSE least(ppm, 999999) - least(ppm, 999999) % 100000
         END AS bucket_ppm
  FROM (
    SELECT CAST(FLOOR(jaccard * 1000000.0 + 0.5) AS BIGINT) AS ppm
    FROM ("""
    + _NGRAM_JACCARD_SQL
    + """) pj
  ) pp
) b
GROUP BY bucket_ppm
"""
)


def _customer_rfm(spark, sf_dir):
    return profiling.rfm_segments(_t(spark, sf_dir, "orders"))


_CUSTOMER_RFM_SQL = r"""
WITH per AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY o_custkey
),
mx AS (SELECT max(o_orderdate) AS maxd FROM orders),
base AS (
  SELECT p.*,
         CAST(date_diff('day', CAST(last_order AS DATE),
                        CAST(maxd AS DATE)) AS BIGINT) AS recency_days
  FROM per p, mx
),
ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY recency_days, o_custkey) AS r_rank,
         row_number() OVER (ORDER BY frequency, o_custkey) AS f_rank,
         row_number() OVER (ORDER BY monetary_cents, o_custkey) AS m_rank,
         count(*) OVER () AS n
  FROM base
)
SELECT (1 + CAST(FLOOR(5.0 * (r_rank - 1) / n) AS BIGINT)) AS r_seg,
       (1 + CAST(FLOOR(5.0 * (f_rank - 1) / n) AS BIGINT)) AS f_seg,
       (1 + CAST(FLOOR(5.0 * (m_rank - 1) / n) AS BIGINT)) AS m_seg,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monetary_cents) AS BIGINT) AS monetary_cents_total
FROM ranked
GROUP BY r_seg, f_seg, m_seg
"""


REGISTRY.update({
    "vocab_oov_rate": QuerySpec(
        _vocab_oov_rate, _VOCAB_OOV_SQL,
        "per-source out-of-vocabulary rate against the corpus top-1024 "
        "token vocabulary (distributed top-k + one broadcast join)",
    ),
    "doc_readability": QuerySpec(
        _doc_readability, _READABILITY_SQL,
        "per-doc Flesch-style readability from exact sentence/word/"
        "syllable counts (zero-shuffle codegen projection)",
    ),
    "doc_char_novelty": QuerySpec(
        _doc_char_novelty, _CHAR_NOVELTY_SQL,
        "per-doc char-4-gram novelty ratio — the row-local "
        "compressibility/repetition quality proxy",
    ),
    "dedup_survivorship": QuerySpec(
        _dedup_survivorship, _DEDUP_SURVIVORSHIP_SQL,
        "per-source exact-dedup survivor and reclaimed-bytes "
        "accounting (hash-only shuffle, text never moves)",
    ),
    "jaccard_threshold_hist": QuerySpec(
        _jaccard_threshold_hist, _JACCARD_HIST_SQL,
        "near-dup threshold calibration: candidate-pair exact-Jaccard "
        "micro-decile histogram over the production LSH chain",
    ),
    "customer_rfm_segments": QuerySpec(
        _customer_rfm, _CUSTOMER_RFM_SQL,
        "exact equal-count RFM customer grid via the distributed "
        "global-rank primitive (range-sharded windows + broadcast "
        "offsets — no single-task sort)",
    ),
})


# --------------------------------------------------------------------
# Round-5d additions: sort-column advisor over file bounds, per-
# dimension embedding geometry, and the event Markov transition
# matrix.
# --------------------------------------------------------------------

def _diag_clustering_advisor(spark, sf_dir):
    return maintenance.clustering_advisor(
        file_column_stats_from_lineitem(_t(spark, sf_dir, "lineitem"))
    )


_DIAG_CLUSTERING_SQL = """
WITH per_file AS (
  SELECT CAST(floor(l_orderkey / 32) AS BIGINT) AS file_id,
         CAST(min(l_partkey) AS BIGINT) AS pk_lo, CAST(max(l_partkey) AS BIGINT) AS pk_hi,
         CAST(min(l_suppkey) AS BIGINT) AS sk_lo, CAST(max(l_suppkey) AS BIGINT) AS sk_hi,
         CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS pc_lo,
         CAST(max(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS pc_hi,
         CAST(min(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS sd_lo,
         CAST(max(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS sd_hi
  FROM lineitem GROUP BY file_id
),
fs AS (
  SELECT 'l_partkey' AS col_name, file_id, pk_lo AS lo, pk_hi AS hi FROM per_file
  UNION ALL
  SELECT 'l_suppkey', file_id, sk_lo, sk_hi FROM per_file
  UNION ALL
  SELECT 'price_cents', file_id, pc_lo, pc_hi FROM per_file
  UNION ALL
  SELECT 'ship_day', file_id, sd_lo, sd_hi FROM per_file
),
ev AS (
  SELECT col_name, lo AS value, 0 AS typ, file_id FROM fs
  UNION ALL
  SELECT col_name, hi AS value, 1 AS typ, file_id FROM fs
),
swept AS (
  SELECT col_name, typ,
         COALESCE(SUM(typ) OVER w, 0) AS ends_lt,
         COALESCE(SUM(1 - typ) OVER w, 0) AS prev_starts
  FROM ev
  WINDOW w AS (PARTITION BY col_name ORDER BY value, typ, file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
depths AS (
  SELECT col_name, prev_starts - ends_lt AS depth FROM swept WHERE typ = 0
)
SELECT col_name,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(depth) AS BIGINT) AS overlap_pairs,
       CAST(max(depth) + 1 AS BIGINT) AS max_depth,
       CAST(floor(1000000.0 * sum(depth + 1) / (count(*) * count(*))) AS BIGINT)
         AS avg_depth_ppm
FROM depths
GROUP BY col_name
"""


def _embedding_dim_variance(spark, sf_dir):
    return similarity.dim_variance_audit(_t(spark, sf_dir, "embeddings"))


_DIM_VARIANCE_SQL = """
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1024.0) AS BIGINT) AS q
  FROM embeddings
),
g AS (
  -- HUGEINT moments: n*ss wraps int64 near 3M vectors; 128-bit
  -- integers keep the oracle exact at any test scale (the Spark
  -- side mirrors this with DECIMAL(38,0)).
  SELECT pos, CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum(q) AS HUGEINT) AS s,
         CAST(sum(q * q) AS HUGEINT) AS ss
  FROM ex GROUP BY pos
)
-- // truncates toward zero in DuckDB (same as Spark's DIV): exact
-- floor for the non-negative variance numerator; the mean numerator
-- gets an explicit floor correction when negative with remainder.
SELECT CAST(pos AS INTEGER) AS pos, n_vecs,
       CAST((1000000 * s) // n_vecs
            - CASE WHEN 1000000 * s < 0 AND (1000000 * s) % n_vecs != 0
                   THEN 1 ELSE 0 END AS BIGINT) AS mean_q_ppm,
       CAST((n_vecs * ss - s * s) // (CAST(n_vecs AS HUGEINT) * n_vecs)
            AS BIGINT) AS var_q
FROM g
"""


def _event_transitions(spark, sf_dir):
    return events.event_transitions(_t(spark, sf_dir, "events"))


_EVENT_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
counts AS (
  SELECT src, dst,
         CAST(count(*) AS BIGINT) AS n_trans,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM seq WHERE src IS NOT NULL
  GROUP BY src, dst
)
SELECT src, dst, n_trans, n_users,
       CAST(floor(1000000.0 * n_trans / SUM(n_trans) OVER (PARTITION BY src))
            AS BIGINT) AS prob_ppm
FROM counts
"""


def _diag_skip_simulation(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # rows_per_file=128 ≈ the existing layout's rows per synthetic
    # file (32 orderkeys × ~4 line items), so before/after compare
    # layouts of similar file counts.
    return maintenance.skip_simulation(
        column_values_from_lineitem(li),
        file_column_stats_from_lineitem(li),
        rows_per_file=128,
    )


_DIAG_SKIP_SIM_SQL = """
WITH per_file AS (
  SELECT CAST(floor(l_orderkey / 32) AS BIGINT) AS file_id,
         CAST(min(l_partkey) AS BIGINT) AS pk_lo, CAST(max(l_partkey) AS BIGINT) AS pk_hi,
         CAST(min(l_suppkey) AS BIGINT) AS sk_lo, CAST(max(l_suppkey) AS BIGINT) AS sk_hi,
         CAST(min(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS pc_lo,
         CAST(max(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS pc_hi,
         CAST(min(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS sd_lo,
         CAST(max(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS sd_hi
  FROM lineitem GROUP BY file_id
),
fs AS (
  SELECT 'l_partkey' AS col_name, file_id, pk_lo AS lo, pk_hi AS hi FROM per_file
  UNION ALL SELECT 'l_suppkey', file_id, sk_lo, sk_hi FROM per_file
  UNION ALL SELECT 'price_cents', file_id, pc_lo, pc_hi FROM per_file
  UNION ALL SELECT 'ship_day', file_id, sd_lo, sd_hi FROM per_file
),
ev AS (
  SELECT col_name, lo AS value, 0 AS typ, file_id FROM fs
  UNION ALL
  SELECT col_name, hi AS value, 1 AS typ, file_id FROM fs
),
swept AS (
  SELECT col_name, typ,
         COALESCE(SUM(typ) OVER w, 0) AS ends_lt,
         COALESCE(SUM(1 - typ) OVER w, 0) AS prev_starts
  FROM ev
  WINDOW w AS (PARTITION BY col_name ORDER BY value, typ, file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
before AS (
  SELECT col_name,
         CAST(sum(depth) AS BIGINT) AS overlap_pairs_before,
         CAST(max(depth) + 1 AS BIGINT) AS max_depth_before,
         CAST(floor(1000000.0 * sum(depth + 1) / (count(*) * count(*))) AS BIGINT)
           AS avg_depth_ppm_before
  FROM (SELECT col_name, prev_starts - ends_lt AS depth FROM swept WHERE typ = 0)
  GROUP BY col_name
),
cv AS (
  SELECT 'l_partkey' AS col_name, CAST(l_partkey AS BIGINT) AS v FROM lineitem
  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS BIGINT) FROM lineitem
  UNION ALL SELECT 'price_cents', CAST(floor(l_extendedprice * 100) AS BIGINT) FROM lineitem
  UNION ALL SELECT 'ship_day', CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) FROM lineitem
),
vals AS (SELECT col_name, v, CAST(count(*) AS BIGINT) AS k FROM cv GROUP BY col_name, v),
ranked AS (
  SELECT col_name, k,
         1 + COALESCE(SUM(k) OVER (PARTITION BY col_name ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM vals
),
geom AS (
  SELECT col_name, k,
         CAST(floor((s - 1) / 128.0) AS BIGINT) AS f0,
         CAST(floor((s + 126) / 128.0) AS BIGINT) AS a,
         CAST(floor((s + k - 2) / 128.0) AS BIGINT) AS b
  FROM ranked
),
per_val AS (
  SELECT col_name, k, a - f0 AS ra, b - f0 AS rb, b >= a AS spans FROM geom
),
after AS (
  SELECT col_name,
         CAST(ceil(sum(k) / 128.0) AS BIGINT) AS n_files,
         -- (ra+rb)(rb-ra+1) is always even; // keeps each term
         -- integral (exact past 2^53, matching the Spark DIV 2)
         CAST(sum(CASE WHEN spans THEN (ra + rb) * (rb - ra + 1) // 2 ELSE 0 END) AS BIGINT)
           AS overlap_pairs_after,
         CAST(greatest(max(CASE WHEN spans THEN rb + 1 ELSE 1 END), 1) AS BIGINT)
           AS max_depth_after
  FROM per_val GROUP BY col_name
)
SELECT before.col_name,
       n_files,
       overlap_pairs_before,
       overlap_pairs_after,
       max_depth_before,
       max_depth_after,
       avg_depth_ppm_before,
       CAST(floor(1000000.0 * (overlap_pairs_after + n_files)
                  / (n_files * n_files)) AS BIGINT) AS avg_depth_ppm_after,
       CAST(CASE WHEN avg_depth_ppm_before > 0
            THEN floor(1000000.0
                 * floor(1000000.0 * (overlap_pairs_after + n_files)
                         / (n_files * n_files))
                 / avg_depth_ppm_before)
            ELSE 1000000 END AS BIGINT) AS improvement_ppm
FROM before JOIN after ON before.col_name = after.col_name
"""


def _media_shard_plan(spark, sf_dir):
    return multimodal.shard_plan(_media(spark, sf_dir))


_MEDIA_SHARD_SQL = f"""
WITH RECURSIVE files AS (
  SELECT ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         CAST(length(text) AS BIGINT) AS file_size_in_bytes,
         0 AS content
  FROM documents
),
{_binpack_cte(["media_type"], threshold=multimodal.SHARD_TARGET_BYTES)}
SELECT media_type,
       CAST(gid AS BIGINT) AS shard_id,
       CAST(cnt AS BIGINT) AS n_items,
       CAST(gsz AS BIGINT) AS shard_bytes
FROM grp
"""


def _part_affinity(spark, sf_dir):
    return profiling.part_affinity(_t(spark, sf_dir, "lineitem"))


_PART_AFFINITY_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
cnt AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt FROM op GROUP BY pk),
n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM op),
co AS (
  SELECT a.pk AS part_a, b.pk AS part_b, CAST(count(*) AS BIGINT) AS co_orders
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
  HAVING count(*) >= 3
)
SELECT part_a, part_b, co_orders,
       ca.cnt AS orders_a, cb.cnt AS orders_b,
       CAST((1000000 * co_orders * n_orders) // (ca.cnt * cb.cnt) AS BIGINT)
         AS lift_ppm
FROM co
JOIN cnt ca ON ca.pk = co.part_a
JOIN cnt cb ON cb.pk = co.part_b
CROSS JOIN n
"""


def _user_transition_typicality(spark, sf_dir):
    return events.user_transition_typicality(_t(spark, sf_dir, "events"))


_USER_TYPICALITY_SQL = """
WITH seq AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
counts AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n_trans
  FROM seq WHERE src IS NOT NULL
  GROUP BY src, dst
),
matrix AS (
  SELECT src, dst,
         CAST(floor(1000000.0 * n_trans / SUM(n_trans) OVER (PARTITION BY src))
              AS BIGINT) AS prob_ppm
  FROM counts
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(floor(avg(prob_ppm)) AS BIGINT) AS mean_prob_ppm,
       CAST(min(prob_ppm) AS BIGINT) AS min_prob_ppm
FROM seq JOIN matrix USING (src, dst)
WHERE src IS NOT NULL
GROUP BY user_id
"""


def _lsh_near_dup_exact(spark, sf_dir):
    return similarity.lsh_near_dup_exact(_t(spark, sf_dir, "embeddings"))


def _lsh_exact_sql() -> str:
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
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bks a JOIN bks b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairdots AS (
  SELECT c.vec_a, c.vec_b,
         sum(ea.q * eb.q) AS dd,
         sum(ea.q * ea.q) AS na2,
         sum(eb.q * eb.q) AS nb2
  FROM cand c
  JOIN ex ea ON ea.vec_id = c.vec_a
  JOIN ex eb ON eb.vec_id = c.vec_b AND ea.d = eb.d
  GROUP BY c.vec_a, c.vec_b
)
SELECT vec_a, vec_b,
       CAST(floor(1000000.0 * dd / (sqrt(na2) * sqrt(nb2))) AS BIGINT)
         AS cos_mppm
FROM pairdots
WHERE dd > 0 AND 400 * dd * dd >= 81 * na2 * nb2
"""


_LSH_EXACT_SQL = _lsh_exact_sql()


def _stream_disorder_monitor(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.disorder_monitor(ev), "update", "stream_disorder"
    )


_STREAM_DISORDER_SQL = """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier
  FROM events
),
l AS (
  SELECT event_type,
         CASE WHEN frontier IS NULL OR frontier < ts_us THEN 0
              ELSE frontier - ts_us END AS lateness_us
  FROM o
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN lateness_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(max(lateness_us) AS BIGINT) AS max_lateness_us,
       CAST(sum(lateness_us) AS BIGINT) AS total_lateness_us
FROM l
GROUP BY event_type
"""


def _events_watermark_advisor(spark, sf_dir):
    return events.watermark_advisor(_t(spark, sf_dir, "events"))


_WATERMARK_ADVISOR_SQL = """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (
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
)
SELECT event_type, watermark_us, n_events, n_dropped,
       CAST(floor(1000000.0 * n_dropped / n_events) AS BIGINT) AS drop_ppm
FROM u
"""


def _padding_waste_audit(spark, sf_dir):
    from iceberg_diag_spark.operators.packing import padding_waste_audit

    return padding_waste_audit(_t(spark, sf_dir, "documents"))


def _padding_waste_sql() -> str:
    ladder = " ".join(
        f"WHEN n <= {1 << k} THEN {1 << k}" for k in range(4, 21)
    )
    return rf"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n
  FROM documents
),
g AS (
  SELECT 'global_max' AS strategy,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(count(*) * max(n) AS BIGINT) AS padded_tokens
  FROM base
),
p AS (
  SELECT 'pow2_bucket' AS strategy,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n) AS BIGINT) AS total_tokens,
         CAST(sum(CASE {ladder} ELSE {1 << 20} END) AS BIGINT) AS padded_tokens
  FROM base
),
ranked AS (
  SELECT n, CAST((row_number() OVER (ORDER BY n, doc_id) - 1) // 32 AS BIGINT) AS batch
  FROM base
),
bm AS (
  SELECT batch, count(*) AS bn, sum(n) AS bsum, max(n) AS bmax
  FROM ranked GROUP BY batch
),
s AS (
  SELECT 'sorted_batches' AS strategy,
         CAST(sum(bn) AS BIGINT) AS n_docs,
         CAST(sum(bsum) AS BIGINT) AS total_tokens,
         CAST(sum(bn * bmax) AS BIGINT) AS padded_tokens
  FROM bm
),
u AS (SELECT * FROM g UNION ALL SELECT * FROM p UNION ALL SELECT * FROM s)
SELECT strategy, n_docs, total_tokens, padded_tokens,
       CAST(floor(1000000.0 * (padded_tokens - total_tokens) / padded_tokens)
            AS BIGINT) AS waste_ppm
FROM u
"""


_PADDING_WASTE_SQL = _padding_waste_sql()


def _near_dup_kcore(spark, sf_dir):
    from iceberg_diag_spark.operators.graph import kcore

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    return kcore(docs.select("doc_id"), pairs, k=2, rounds=8)


def _kcore_sql() -> str:
    # 8 unrolled simultaneous-peel rounds (recursive CTEs cannot
    # aggregate in the recursive term — the PageRank contract), same
    # fixed count as the engine's loop.
    rounds = []
    for i in range(1, 9):
        prev = f"r{i - 1}"
        rounds.append(
            f"r{i} AS (SELECT s AS node FROM bd "
            f"JOIN {prev} a ON bd.s = a.node "
            f"JOIN {prev} b ON bd.d = b.node "
            f"GROUP BY s HAVING count(*) >= 2)"
        )
    return (
        "WITH "
        + _MINHASH_PRS_CTE.strip()
        + """,
bd AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM prs
       UNION ALL SELECT doc_b, doc_a FROM prs),
r0 AS (SELECT DISTINCT s AS node FROM bd),
"""
        + ",\n".join(rounds)
        + """
SELECT s AS doc_id, CAST(count(*) AS BIGINT) AS core_degree
FROM bd JOIN r8 a ON bd.s = a.node JOIN r8 b ON bd.d = b.node
GROUP BY s HAVING count(*) >= 2
"""
    )


_KCORE_SQL = _kcore_sql()


def _diag_partition_advisor(spark, sf_dir):
    return maintenance.partition_advisor(
        column_values_from_lineitem(_t(spark, sf_dir, "lineitem"))
    )


_DIAG_PARTITION_ADVISOR_SQL = """
WITH cv AS (
  SELECT 'l_partkey' AS col_name, CAST(l_partkey AS BIGINT) AS v FROM lineitem
  UNION ALL SELECT 'l_suppkey', CAST(l_suppkey AS BIGINT) FROM lineitem
  UNION ALL SELECT 'price_cents', CAST(floor(l_extendedprice * 100) AS BIGINT) FROM lineitem
  UNION ALL SELECT 'ship_day', CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) FROM lineitem
),
assigned AS (
  SELECT col_name, 'bucket16' AS transform, ((v % 16) + 16) % 16 AS pk FROM cv
  UNION ALL
  SELECT col_name, 'truncate1024', CAST(floor(v / 1024.0) AS BIGINT) FROM cv
),
per_part AS (
  SELECT col_name, transform, pk, CAST(count(*) AS BIGINT) AS rows_
  FROM assigned GROUP BY col_name, transform, pk
)
SELECT col_name, transform,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rows_) AS BIGINT) AS total_rows,
       CAST(max(rows_) AS BIGINT) AS max_part_rows,
       CAST(floor(sum(rows_) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS avg_part_rows,
       CAST(floor(1000000.0 * max(rows_) * count(*) / sum(rows_)) AS BIGINT) AS skew_ppm
FROM per_part
GROUP BY col_name, transform
"""


def _media_frame_dedup(spark, sf_dir):
    return multimodal.frame_dedup(_media(spark, sf_dir))


_MEDIA_FRAME_DEDUP_SQL = """
WITH f AS (
  SELECT doc_id, substring(text, CAST(fi * 64 + 1 AS BIGINT), 64) AS frame
  FROM (SELECT doc_id, text,
               unnest(range(0, CAST(CEIL(length(text) / 64.0) AS BIGINT), 1)) AS fi
        FROM documents)
)
SELECT md5(frame) AS frame_md5,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_items,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(max(length(frame)) AS BIGINT) AS frame_len,
       CAST(min(doc_id) AS BIGINT) AS example_doc_id,
       CAST((count(*) - 1) * max(length(frame)) AS BIGINT) AS wasted_bytes
FROM f
GROUP BY frame_md5
HAVING count(DISTINCT doc_id) >= 2
"""


def _doc_template_clusters(spark, sf_dir):
    return textops.template_clusters(_t(spark, sf_dir, "documents"))


_TEMPLATE_CLUSTERS_SQL = r"""
WITH pre AS (
  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS n_chars,
         md5(array_to_string(
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')[1:8],
           ' ')) AS template_md5
  FROM documents
)
SELECT template_md5,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(min(doc_id) AS BIGINT) AS example_doc_id,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM pre
GROUP BY template_md5
HAVING count(*) >= 2
"""


def _source_vocab_tv(spark, sf_dir):
    return textops.source_tv_distance(_t(spark, sf_dir, "documents"))


_SOURCE_TV_SQL = r"""
WITH toks AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
counts AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY source, tok
),
totals AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot FROM counts GROUP BY source),
vocab AS (
  SELECT tok FROM (
    SELECT tok, sum(c) AS gc FROM counts GROUP BY tok
    ORDER BY gc DESC, tok ASC LIMIT 1024
  )
),
counts_k AS (SELECT counts.* FROM counts JOIN vocab USING (tok)),
k_mass AS (SELECT source, sum(c) AS k_mass FROM counts_k GROUP BY source),
resid AS (
  SELECT totals.source, ' __other__ ' AS tok,
         CAST(tot - COALESCE(k_mass, 0) AS BIGINT) AS c
  FROM totals LEFT JOIN k_mass ON totals.source = k_mass.source
),
spine AS (SELECT tok, source FROM vocab CROSS JOIN (SELECT source FROM totals)),
grid AS (
  SELECT spine.tok, spine.source, COALESCE(counts_k.c, 0) AS c
  FROM spine LEFT JOIN counts_k
    ON spine.tok = counts_k.tok AND spine.source = counts_k.source
  UNION ALL
  SELECT tok, source, c FROM resid
),
paired AS (
  SELECT a.source AS source_a, b.source AS source_b, a.c AS c_a, b.c AS c_b,
         ta.tot AS tot_a, tb.tot AS tot_b
  FROM grid a JOIN grid b ON a.tok = b.tok AND a.source < b.source
  JOIN totals ta ON ta.source = a.source
  JOIN totals tb ON tb.source = b.source
)
SELECT source_a, source_b,
       CAST(max(tot_a) AS BIGINT) AS n_tokens_a,
       CAST(max(tot_b) AS BIGINT) AS n_tokens_b,
       CAST(floor(1000000.0 * (sum(abs(c_a * tot_b - c_b * tot_a))
                               / (2 * max(tot_a) * max(tot_b)))) AS BIGINT)
         AS tv_ppm
FROM paired
GROUP BY source_a, source_b
"""


def _events_disorder_audit(spark, sf_dir):
    return events.disorder_audit(_t(spark, sf_dir, "events"))


_EVENTS_DISORDER_SQL = """
WITH o AS (
  SELECT event_type, epoch_us(ts) AS ts_us,
         max(epoch_us(ts)) OVER (
           ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS frontier
  FROM events
),
l AS (
  SELECT event_type,
         CASE WHEN frontier IS NULL OR frontier < ts_us THEN 0
              ELSE frontier - ts_us END AS lateness_us
  FROM o
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN lateness_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(max(lateness_us) AS BIGINT) AS max_lateness_us,
       CAST(sum(lateness_us) AS BIGINT) AS total_lateness_us
FROM l
GROUP BY event_type
"""


REGISTRY.update({
    "diag_skip_simulation": QuerySpec(
        _diag_skip_simulation, _DIAG_SKIP_SIM_SQL,
        "sort-order rewrite simulator: exact before/after point-query "
        "depth and overlapping-pair stats per candidate column, the "
        "after-layout computed in closed form from per-value rank "
        "arithmetic (sharded prefix sums — the sorted layout is "
        "never materialized); improvement_ppm in the reference's "
        "before/after remediation idiom",
    ),
    "media_shard_plan": QuerySpec(
        _media_shard_plan, _MEDIA_SHARD_SQL,
        "WebDataset-style tar-shard packing plan per media type "
        "(greedy check-before-append fold over byte lengths; "
        "metadata-only — payloads never move); boundary-recursive "
        "CTE oracle",
    ),
    "part_affinity": QuerySpec(
        _part_affinity, _PART_AFFINITY_SQL,
        "market-basket part affinity: exact co-occurrence support "
        "and lift over orders in 64-bit integer division (per-order "
        "quadratic in bounded basket size, linear in orders — the "
        "association-mining table behind bundling analysis)",
    ),
    "user_transition_typicality": QuerySpec(
        _user_transition_typicality, _USER_TYPICALITY_SQL,
        "per-user behavioral typicality under the corpus Markov "
        "matrix: mean/min transition probability in exact ppm (the "
        "bot/scripted-traffic anomaly score — perplexity ordering "
        "without a logarithm)",
    ),
    "lsh_near_dup_exact": QuerySpec(
        _lsh_near_dup_exact, _LSH_EXACT_SQL,
        "hash-oracle-able sign-LSH near-dup: md5-derived integer "
        "hyperplanes + quantized integer dot products (bucket bits "
        "and the cosine threshold are exact rational arithmetic — "
        "no engine-private float signs), per-bucket-quadratic "
        "candidates, cross-multiplied verification",
    ),
    "stream_disorder_monitor": QuerySpec(
        _stream_disorder_monitor, _STREAM_DISORDER_SQL,
        "streaming watermark-calibration monitor: per-type keyed-"
        "state event-time frontier + cumulative lateness stats "
        "(applyInPandasWithState, vectorized in-batch running max); "
        "single availableNow drain equals the batch per-type audit",
    ),
    "events_watermark_advisor": QuerySpec(
        _events_watermark_advisor, _WATERMARK_ADVISOR_SQL,
        "watermark policy table: exact withWatermark(delay) drop "
        "counts per (event_type, candidate delay) over the arrival-"
        "order lateness relation (shared distributed running-max "
        "core; one conditional-sum aggregate + metadata-size "
        "unpivot)",
    ),
    "padding_waste_audit": QuerySpec(
        _padding_waste_audit, _PADDING_WASTE_SQL,
        "training-batch padding-waste audit: exact pad-token cost of "
        "global-max / power-of-two-bucket / sorted-batch padding "
        "policies (integer CASE-ladder buckets, distributed "
        "global-rank batching — the can't-pack fine-tuning "
        "counterpart of pack_sequences)",
    ),
    "near_dup_kcore": QuerySpec(
        _near_dup_kcore, _KCORE_SQL,
        "2-core of the near-dup graph (fixed-round simultaneous "
        "peel, unrolled-SQL oracle): separates one-template star "
        "clusters (empty core) from mutually-interlinked content "
        "farms — the density companion of triangles/PageRank",
    ),
    "diag_partition_advisor": QuerySpec(
        _diag_partition_advisor, _DIAG_PARTITION_ADVISOR_SQL,
        "partition-spec advisor: simulated bucket/truncate transform "
        "per candidate column with partition-count and row-balance "
        "(skew_ppm) stats — the partition-evolution companion of the "
        "sort-column advisor",
    ),
    "media_frame_dedup": QuerySpec(
        _media_frame_dedup, _MEDIA_FRAME_DEDUP_SQL,
        "cross-item frame-level dedup (shared intro/outro/slate "
        "detector): repeated frame hashes across distinct items with "
        "occurrence and wasted-byte accounting — frame bytes never "
        "shuffle, only their 16-byte hashes",
    ),
    "doc_template_clusters": QuerySpec(
        _doc_template_clusters, _TEMPLATE_CLUSTERS_SQL,
        "template-page detector: clusters of docs sharing the first-"
        "8-token normalized prefix hash (zero-shuffle projection + "
        "one hash-aggregate — the cheap prefix-blocked complement "
        "of near-dup detection)",
    ),
    "source_vocab_tv": QuerySpec(
        _source_vocab_tv, _SOURCE_TV_SQL,
        "pairwise total-variation distance between per-source unigram "
        "distributions over the top-1024 vocabulary + residual bucket "
        "— exact common-denominator BIGINT arithmetic, no logarithm "
        "(the domain-shift audit behind mixture weighting)",
    ),
    "events_disorder_audit": QuerySpec(
        _events_disorder_audit, _EVENTS_DISORDER_SQL,
        "watermark calibration: per-type arrival-order lateness vs "
        "the running event-time frontier, distributed running max "
        "via range shards + broadcast prefix maxes (no global window)",
    ),
    "diag_clustering_advisor": QuerySpec(
        _diag_clustering_advisor, _DIAG_CLUSTERING_SQL,
        "sort-column advisor: exact overlapping-file-pair and point-"
        "query-depth stats per candidate column via an O(n log n) "
        "endpoint sweep over file min/max bounds (no pairwise join) "
        "— ranks which column a sort-order rewrite should target",
    ),
    "embedding_dim_variance": QuerySpec(
        _embedding_dim_variance, _DIM_VARIANCE_SQL,
        "per-dimension embedding mean/variance audit on a fixed "
        "integer grid (dead-dimension / anisotropy check; exact "
        "BIGINT moments, no summation-order ulp)",
    ),
    "event_transitions": QuerySpec(
        _event_transitions, _EVENT_TRANSITIONS_SQL,
        "first-order Markov event-type transition matrix with exact "
        "ppm conditional probabilities (one lag window + one pair "
        "aggregate)",
    ),
})


# --------------------------------------------------------------------

"""Dedup / text analysis over the documents table.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from iceberg_diag_spark.operators import (
    dedup,
    similarity,
    textops,
)
from iceberg_diag_spark.plans.common import _t


# --------------------------------------------------------------------
# Dedup / text analysis (documents)
# --------------------------------------------------------------------

def _dedup_exact_groups(spark, sf_dir):
    return dedup.exact_dedup_groups(_t(spark, sf_dir, "documents"))


_DEDUP_EXACT_SQL = r"""
SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
       CAST(count(*) AS BIGINT) AS dup_count,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM documents
GROUP BY content_hash
"""


def _text_stats(spark, sf_dir):
    return textops.text_stats(_t(spark, sf_dir, "documents"))


_TEXT_STATS_SQL = r"""
WITH norm AS (
  SELECT doc_id, text,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM documents
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS char_len,
       CAST(len(string_split(t, ' ')) AS BIGINT) AS token_count,
       CAST(len(list_distinct(string_split(t, ' '))) AS BIGINT) AS uniq_token_count,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS subword_count
FROM norm
"""


def _lang_stats(spark, sf_dir):
    return textops.lang_stats(_t(spark, sf_dir, "documents"))


_LANG_STATS_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / count(*), 4) AS avg_chars
FROM documents
GROUP BY lang
"""


def _doc_fingerprint(spark, sf_dir):
    return textops.rolling_fingerprint(_t(spark, sf_dir, "documents"))


_DOC_FINGERPRINT_SQL = r"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 8 THEN
           list_distinct(list_transform(
             generate_series(0, greatest(len(toks) - 8, 0)),
             i -> array_to_string(toks[i + 1 : i + 8], ' ')))
         ELSE [] END AS grams
  FROM norm
)
SELECT doc_id,
       coalesce(list_min(list_transform(grams, g -> substring(md5(g), 1, 16))), '') AS fingerprint
FROM grams
"""


def _minhash_pairs(spark, sf_dir):
    return dedup.minhash_candidate_pairs(_t(spark, sf_dir, "documents")).select(
        "doc_a", "doc_b", F.col("n_shared_bands").cast("long").alias("n_shared_bands")
    )


# Exact-duplicate pre-collapse — mirrors dedup.collapse_exact_
# duplicates: representatives (min doc_id per distinct normalized
# text) carry the fuzzy pipeline; collapsed members surface as
# (rep, member) star edges. Grouping by md5 here vs sha256 engine-
# side is equivalent: both group by identical normalized text.
_EXACT_COLLAPSE_CTE = r"""
chash AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
  FROM documents
),
cgrp AS (SELECT ch, min(doc_id) AS keep FROM chash GROUP BY ch),
rdocs AS (SELECT d.* FROM documents d JOIN cgrp ON d.doc_id = cgrp.keep),
star AS (
  SELECT cgrp.keep AS doc_a, chash.doc_id AS doc_b
  FROM chash JOIN cgrp USING (ch)
  WHERE chash.doc_id <> cgrp.keep
)
"""

# The Carter-Wegman hash → 16-seed signature → 4-band key sub-chain
# (everything downstream of an `eg(doc_id, gram)` shingle relation) —
# the ONE definition of the MinHash family both the pair oracle here
# and the round-12 reconcile oracle compose, so the hash family and
# band width cannot silently diverge between oracles (byte-identity
# of _MINHASH_PAIRS_SQL under the extraction is pinned in
# tests/test_round12_ops.py).
_SIG_KEYS_CTES = r"""hh AS (
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
)"""

_MINHASH_PAIRS_SQL = r"""
WITH
""" + _EXACT_COLLAPSE_CTE.strip() + r""",
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM rdocs
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
""" + _SIG_KEYS_CTES + r"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared_bands
FROM keys a
JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
UNION ALL
SELECT doc_a, doc_b, CAST(4 AS BIGINT) AS n_shared_bands FROM star
"""


def _simhash(spark, sf_dir):
    return dedup.simhash64(_t(spark, sf_dir, "documents"))


def _simhash_near_dup(spark, sf_dir):
    return dedup.simhash_near_dup(
        _t(spark, sf_dir, "documents"), max_hamming=10
    ).select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


# SimHash oracle: same md5-halves hash family as the Spark operator
# (g1 = bits 63..32, g2 = bits 31..0 — all bit tests on non-negative
# halves), fingerprint assembled arithmetically so the signed int64
# pattern matches bit-for-bit.
_SIMHASH_VOTES = ",\n         ".join(
    "sum(CASE WHEN ((g{half} >> {k}) & 1) = 1 THEN 1 ELSE -1 END) AS b{b}".format(
        half=1 if b >= 32 else 2, k=b - 32 if b >= 32 else b, b=b
    )
    for b in range(64)
)
_SIMHASH_ASSEMBLE = "\n         + ".join(
    "CASE WHEN b{b} > 0 THEN {val} ELSE 0 END".format(
        b=b, val="(-9223372036854775807 - 1)" if b == 63 else str(1 << b)
    )
    for b in range(64)
)

_SIMHASH_CTE = rf"""
toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
hh AS (
  SELECT doc_id,
         ('0x' || substring(md5(tok), 1, 8))::BIGINT AS g1,
         ('0x' || substring(md5(tok), 9, 8))::BIGINT AS g2
  FROM toks
),
votes AS (
  SELECT doc_id,
         {_SIMHASH_VOTES}
  FROM hh GROUP BY doc_id
),
sh AS (
  SELECT doc_id,
         CAST({_SIMHASH_ASSEMBLE} AS BIGINT) AS simhash
  FROM votes
)
"""

_SIMHASH_SQL = f"""
WITH {_SIMHASH_CTE}
SELECT doc_id, simhash FROM sh
"""

# The banded Spark plan is exact within the Hamming budget (pigeonhole
# guarantees no false negatives; distinct removes multi-band dupes),
# so the oracle can use the semantically-equal all-pairs form — fine
# at oracle scale, while the engine side stays bucketed. Fingerprints
# run over exact-collapse representatives; collapsed members surface
# as hamming-0 star pairs (mirrors simhash_near_dup collapse_exact).
_SIMHASH_NEAR_DUP_SQL = f"""
WITH {_EXACT_COLLAPSE_CTE.strip()},
{_SIMHASH_CTE.replace("FROM documents", "FROM rdocs")}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 10
UNION ALL
SELECT doc_a, doc_b, CAST(0 AS INTEGER) AS hamming FROM star
"""


def _exact_dedup_corpus(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs).select(
        "doc_id", "text", "lang", "source", F.col("n_chars").cast("long").alias("n_chars")
    )


_EXACT_DEDUP_CORPUS_SQL = r"""
WITH h AS (
  SELECT doc_id,
         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
  FROM documents
),
keep AS (SELECT min(doc_id) AS doc_id FROM h GROUP BY ch)
SELECT d.doc_id, d.text, d.lang, d.source, CAST(d.n_chars AS BIGINT) AS n_chars
FROM documents d JOIN keep USING (doc_id)
"""


def _ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    cands = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    return dedup.ngram_jaccard_pairs(docs, cands).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


# grams are computed over ALL documents (star members need their
# gram sets for the jaccard join) but LSH keys only over exact-
# collapse representatives — mirroring the engine, whose candidate
# relation is LSH(reps) ∪ star.
_NGRAM_JACCARD_SQL = r"""
WITH
""" + _EXACT_COLLAPSE_CTE.strip() + r""",
norm AS (
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
eg AS (
  SELECT g.doc_id, unnest(g.grams) AS gram
  FROM grams g JOIN cgrp ON g.doc_id = cgrp.keep
),
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
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keys a
  JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  UNION
  SELECT doc_a, doc_b FROM star
)
SELECT c.doc_a, c.doc_b,
       round(CASE WHEN len(list_distinct(list_concat(ga.grams, gb.grams))) > 0
             THEN CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
                  / len(list_distinct(list_concat(ga.grams, gb.grams)))
             ELSE 0.0 END, 6) AS jaccard
FROM cands c
JOIN grams ga ON ga.doc_id = c.doc_a
JOIN grams gb ON gb.doc_id = c.doc_b
"""


def _ngram_containment(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    cands = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    return dedup.ngram_containment_pairs(docs, cands)


# same candidate chain as _NGRAM_JACCARD_SQL; the final projection is
# integer containment — no float surface anywhere.
_NGRAM_CONTAINMENT_SQL = r"""
WITH
""" + _EXACT_COLLAPSE_CTE.strip() + r""",
norm AS (
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
eg AS (
  SELECT g.doc_id, unnest(g.grams) AS gram
  FROM grams g JOIN cgrp ON g.doc_id = cgrp.keep
),
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
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keys a
  JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  UNION
  SELECT doc_a, doc_b FROM star
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS inter_size,
       CAST(len(ga.grams) AS BIGINT) AS n_grams_a,
       CAST(len(gb.grams) AS BIGINT) AS n_grams_b,
       CASE WHEN len(ga.grams) > 0
            THEN CAST(FLOOR(len(list_intersect(ga.grams, gb.grams)) * 1000000.0
                            / len(ga.grams)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS cont_a_ppm,
       CASE WHEN len(gb.grams) > 0
            THEN CAST(FLOOR(len(list_intersect(ga.grams, gb.grams)) * 1000000.0
                            / len(gb.grams)) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS cont_b_ppm
FROM cands c
JOIN grams ga ON ga.doc_id = c.doc_a
JOIN grams gb ON gb.doc_id = c.doc_b
"""


def _near_dup_clusters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    return dedup.connected_components(docs.select("doc_id"), pairs)


# same minhash CTE chain as _MINHASH_PAIRS_SQL, then transitive
# closure via a recursive CTE: min reachable label == component min
_NEAR_DUP_CLUSTERS_SQL = r"""
WITH RECURSIVE
""" + _EXACT_COLLAPSE_CTE.strip() + r""",
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM rdocs
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
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keys a
  JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  UNION
  SELECT doc_a, doc_b FROM star
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, label) AS (
    SELECT doc_id, doc_id FROM documents
  UNION
    SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
FROM reach GROUP BY node
"""


def _tfidf_top_terms(spark, sf_dir):
    return textops.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(nn.n_docs / df.df), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN nn
),
ranked AS (
  SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tf, score, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def _near_dup_pagerank(spark, sf_dir):
    """PageRank over the MinHash-LSH near-dup graph (second iterative
    algorithm beside connected components): duplicate-cluster hubs
    rank highest — a centrality signal for choosing cluster
    representatives."""
    from iceberg_diag_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    return pagerank(docs.select("doc_id"), pairs, iterations=10)


# Oracle: same minhash chain as the clusters oracle, then ten
# UNROLLED pagerank rounds (recursive CTEs cannot aggregate in the
# recursive term, but a fixed iteration count is just ten chained
# plain CTEs). Summation-order float drift across engines is ~1e-15
# relative — far inside the round(9) contract.
# MinHash-LSH candidate-pair chain through `prs` — shared by the
# PageRank and triangle-count oracles (both run over the near-dup
# pair graph).
_MINHASH_PRS_CTE = _EXACT_COLLAPSE_CTE.strip() + r""",
norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM rdocs
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
prs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keys a
  JOIN keys b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
  UNION
  SELECT doc_a, doc_b FROM star
)
"""

_PAGERANK_PREFIX = (
    "WITH "
    + _MINHASH_PRS_CTE.strip()
    + r""",
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM prs
  UNION ALL
  SELECT doc_b, doc_a FROM prs
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
pr0 AS (
  SELECT doc_id AS node, 1.0 / nn.n AS rank FROM documents CROSS JOIN nn
)
"""
)


def _pagerank_round(i: int) -> str:
    return f"""
pr{i + 1} AS (
  SELECT p.node,
         (0.15 / nn.n) + 0.85 * coalesce(c.s, 0.0) AS rank
  FROM (SELECT node FROM pr0) p
  CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS node, sum(pp.rank / dg.d) AS s
    FROM edges e
    JOIN pr{i} pp ON pp.node = e.src
    JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) c ON c.node = p.node
)
"""


_PAGERANK_SQL = (
    _PAGERANK_PREFIX
    + ","
    + ",".join(_pagerank_round(i) for i in range(10))
    + """
SELECT node AS doc_id, round(rank, 9) AS pagerank FROM pr10
"""
)


def _quality_scores(spark, sf_dir):
    return textops.quality_scores(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.round("mean_token_len", 6).alias("mean_token_len"),
        F.round("type_token_ratio", 6).alias("type_token_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        "trigram_count",
        "dup_trigram_count",
    )


_QUALITY_SCORES_SQL = r"""
WITH norm AS (
  SELECT doc_id, text,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
tri AS (
  SELECT doc_id, text, toks,
         [array_to_string(toks[i : i + 2], ' ')
          FOR i IN generate_series(1, len(toks) - 2)] AS trigrams
  FROM norm
)
SELECT doc_id,
       round(CAST(length(text) AS DOUBLE) / greatest(len(toks), 1), 6) AS mean_token_len,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1), 6) AS type_token_ratio,
       round(CAST(len(list_intersect(toks,
             ['the','and','of','to','a','in','is','that','it','for'])) AS DOUBLE)
             / greatest(len(toks), 1), 6) AS stopword_ratio,
       round(CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS alpha_ratio,
       CAST(len(trigrams) AS BIGINT) AS trigram_count,
       CAST(len(trigrams) - len(list_distinct(trigrams)) AS BIGINT) AS dup_trigram_count
FROM tri
"""


def _language_id(spark, sf_dir):
    return textops.language_id(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        "pred_lang",
        F.col("stopword_hits").cast("long").alias("stopword_hits"),
    )


def _lang_list_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in textops.STOPWORDS[lang])
    return f"[{words}]"


_LANGUAGE_ID_SQL = rf"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
scores AS (
  SELECT doc_id, 'de' AS lang, len(list_intersect(toks, {_lang_list_sql('de')})) AS hits FROM norm
  UNION ALL
  SELECT doc_id, 'en', len(list_intersect(toks, {_lang_list_sql('en')})) FROM norm
  UNION ALL
  SELECT doc_id, 'es', len(list_intersect(toks, {_lang_list_sql('es')})) FROM norm
  UNION ALL
  SELECT doc_id, 'fr', len(list_intersect(toks, {_lang_list_sql('fr')})) FROM norm
),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
  FROM scores
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
       CAST(hits AS BIGINT) AS stopword_hits
FROM best WHERE rn = 1
"""


def _corpus_curation(spark, sf_dir):
    """The end-to-end training-data curation pipeline, composed from
    the individual operators: exact dedup (keep min doc_id per
    content hash) → quality gate (type-token ratio ≥ 0.4, alpha ratio
    ≥ 0.6) → language gate (stopword-ID confidently non-'und') →
    per-language stats of the surviving corpus. ONE scan, ONE
    data-bearing shuffle."""
    docs = _t(spark, sf_dir, "documents")
    q = textops.quality_exprs()
    best = textops.language_best()
    # ONE enriched projection feeds every gate — hash, quality, and
    # language are per-row, so they commute with dedup (the min-id
    # survivor keeps its own values). The dedup survivor is picked
    # with min(doc_id) OVER (PARTITION BY hash): one window shuffle
    # on the uniform 32-byte hash key. Round 1 used a keeper
    # aggregate + semi join, which re-derived the enriched lineage
    # (sha256 + quality + language exprs) on both join sides —
    # effectively the whole 3.1 s bench cost of this query.
    enriched = dedup.ensure_parallelism(docs).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.sha2(dedup.normalized_text(F.col("text")), 256).alias("__ch"),
        q["type_token_ratio"].alias("__ttr"),
        q["alpha_ratio"].alias("__alpha"),
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("pred_lang"),
    )
    keep = F.min("doc_id").over(Window.partitionBy("__ch"))
    kept = enriched.withColumn("__keep", keep).filter(
        (F.col("doc_id") == F.col("__keep"))
        & (F.col("__ttr") >= 0.4)
        & (F.col("__alpha") >= 0.6)
        & (F.col("pred_lang") != "und")
    )
    return kept.groupBy("pred_lang").agg(
        F.count("*").alias("doc_count"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


_CORPUS_CURATION_SQL = r"""
WITH h AS (
  SELECT doc_id,
         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch
  FROM documents
),
keep AS (SELECT min(doc_id) AS doc_id FROM h GROUP BY ch),
deduped AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
norm AS (
  SELECT doc_id, text, n_chars,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM deduped
),
quality AS (
  SELECT doc_id FROM norm
  WHERE CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) >= 0.4
    AND CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
        / greatest(length(text), 1) >= 0.6
),
scores AS (
  SELECT doc_id, 'de' AS lang, len(list_intersect(toks, {de})) AS hits FROM norm
  UNION ALL
  SELECT doc_id, 'en', len(list_intersect(toks, {en})) FROM norm
  UNION ALL
  SELECT doc_id, 'es', len(list_intersect(toks, {es})) FROM norm
  UNION ALL
  SELECT doc_id, 'fr', len(list_intersect(toks, {fr})) FROM norm
),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
  FROM scores
),
lang AS (
  SELECT doc_id, lang AS pred_lang FROM best WHERE rn = 1 AND hits > 0
)
SELECT l.pred_lang,
       CAST(count(*) AS BIGINT) AS doc_count,
       CAST(sum(n.n_chars) AS BIGINT) AS total_chars,
       CAST(min(n.doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(n.doc_id) AS BIGINT) AS max_doc_id
FROM norm n
JOIN quality USING (doc_id)
JOIN lang l USING (doc_id)
GROUP BY l.pred_lang
"""

_CORPUS_CURATION_SQL = _CORPUS_CURATION_SQL.format(
    de=_lang_list_sql("de"),
    en=_lang_list_sql("en"),
    es=_lang_list_sql("es"),
    fr=_lang_list_sql("fr"),
)


def _curated_near_dup(spark, sf_dir):
    """End-to-end composition: text curation (exact dedup survivor +
    quality gates) feeding embedding near-dup — dedup the corpus
    FIRST, then look for semantic near-duplicates among survivors
    only (the standard ordering in a training-data pipeline: exact
    dedup is cheap and shrinks the quadratic-risk input). The
    survivor set semi-joins the embeddings on vec_id == doc_id."""
    docs = _t(spark, sf_dir, "documents")
    q = textops.quality_exprs()
    enriched = dedup.ensure_parallelism(docs).select(
        "doc_id",
        F.sha2(dedup.normalized_text(F.col("text")), 256).alias("__ch"),
        q["type_token_ratio"].alias("__ttr"),
        q["alpha_ratio"].alias("__alpha"),
    )
    keep = F.min("doc_id").over(Window.partitionBy("__ch"))
    survivors = (
        enriched.withColumn("__keep", keep)
        .filter(
            (F.col("doc_id") == F.col("__keep"))
            & (F.col("__ttr") >= 0.4)
            & (F.col("__alpha") >= 0.6)
        )
        .select(F.col("doc_id").alias("vec_id"))
    )
    emb = _t(spark, sf_dir, "embeddings").join(survivors, "vec_id", "semi")
    return similarity.embedding_near_dup(emb, threshold=0.45)


_CURATED_NEAR_DUP_SQL = r"""
WITH norm AS (
  SELECT doc_id, text,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
enr AS (
  SELECT doc_id,
         sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ch,
         CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS ttr,
         CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS alpha
  FROM norm
),
surv AS (
  SELECT doc_id FROM (
    SELECT doc_id, ttr, alpha, min(doc_id) OVER (PARTITION BY ch) AS keep
    FROM enr
  ) WHERE doc_id = keep AND ttr >= 0.4 AND alpha >= 0.6
),
emb AS (
  SELECT * FROM embeddings WHERE vec_id IN (SELECT doc_id FROM surv)
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         a.embedding AS va, b.embedding AS vb
  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
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



"""Round-9/10 additions: CCNet loop, tuned LSH, BPE + unigram trainers, SLI burn rate, Matryoshka audit, mixing execution, corpus release manifest, classifier AUC.

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

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
    _EXACT_COLLAPSE_CTE,
    _MINHASH_PAIRS_SQL,
    _lang_list_sql,
)
from iceberg_diag_spark.plans.oracles_round8 import (
    _DATA_MIXING_SQL,
    _LSH_PARAM_SQL,
)


# Round 9: CCNet loop closed — KN perplexity scoring + source bands
# ------------------------------------------------------------------

def _doc_kn_nll(spark, sf_dir):
    return textops.doc_kn_nll(_t(spark, sf_dir, "documents"))


def _doc_kn_perplexity(spark, sf_dir):
    return textops.doc_kn_perplexity(_t(spark, sf_dir, "documents"))


# Shared NLL chain: the bigram_kneser_ney table CTEs, then per-gram
# probability (pruned-table CASE + continuation backoff, 1-ppm floor),
# per-position micro-nat floor, exact per-doc integer sums.
_KN_NLL_CTE = r"""
norm AS (
  SELECT doc_id, source,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
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
tot AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM c2),
gs AS (
  SELECT gram,
         greatest(CAST(1 AS BIGINT), CASE WHEN c2 >= 2 THEN
           CAST((1000000 * (4 * c2 - 3)) // (4 * c1w)
                + (CAST(3000000 AS HUGEINT) * n1p_w1 * n1p_w2)
                  // (CAST(4 AS HUGEINT) * c1w * ntot) AS BIGINT)
         ELSE CAST((3000000 * n1p_w2) // (4 * ntot) AS BIGINT) END)
           AS p_ppm
  FROM c2 JOIN lft USING (w1) JOIN rgt USING (w2), tot
),
nl AS (
  SELECT gram,
         CAST(floor(-ln(p_ppm / 1000000.0) * 1000000.0) AS BIGINT)
           AS nll_micro
  FROM gs
),
per_doc AS (
  SELECT bg.doc_id,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(nll_micro) AS BIGINT) AS nll_micro
  FROM bg JOIN nl USING (gram) GROUP BY bg.doc_id
)
"""

_DOC_KN_NLL_SQL = (
    "WITH " + _KN_NLL_CTE.strip() + r"""
SELECT d.doc_id, d.source, p.n_bigrams, p.nll_micro,
       CAST(p.nll_micro // p.n_bigrams AS BIGINT) AS avg_nll_micro
FROM per_doc p JOIN documents d USING (doc_id)
"""
)

_DOC_KN_PERPLEXITY_SQL = (
    "WITH " + _KN_NLL_CTE.strip() + r""",
banded AS (
  SELECT d.source,
         CAST(p.nll_micro // p.n_bigrams AS BIGINT) AS avg_nll_micro,
         ntile(10) OVER (
           PARTITION BY d.source
           ORDER BY p.nll_micro // p.n_bigrams, d.doc_id) AS band
  FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT source, CAST(band AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(avg_nll_micro) AS BIGINT) AS lo_avg_nll_micro,
       CAST(max(avg_nll_micro) AS BIGINT) AS hi_avg_nll_micro
FROM banded GROUP BY source, band
"""
)

REGISTRY.update({
    "doc_kn_nll": QuerySpec(
        _doc_kn_nll, _DOC_KN_NLL_SQL,
        "CCNet scoring step: per-doc NLL against the corpus's own "
        "Kneser-Ney bigram table pruned at 2 occurrences, unseen "
        "bigrams backing off to the discounted continuation unigram; "
        "per-distinct-gram scores joined back to the occurrence "
        "relation on the uniform gram key (bigram_logprob shape), "
        "micro-nat floors + exact integer per-doc sums",
    ),
    "doc_kn_perplexity": QuerySpec(
        _doc_kn_perplexity, _DOC_KN_PERPLEXITY_SQL,
        "CCNet keep/drop decision table: doc_kn_nll ranked within "
        "source via the grouped global_rank idiom (range shards + "
        "broadcast offsets, no one-task-per-source window) and cut "
        "into 10 exact-NTILE bands from (rank, n_s) arithmetic; "
        "emits per-(source, band) population and NLL bounds",
    ),
})

# ------------------------------------------------------------------
# Round 9: advisor-executing LSH banding (the sorted_rewrite pattern)
# ------------------------------------------------------------------

def _lsh_near_dup_tuned(spark, sf_dir):
    return dedup.lsh_near_dup_tuned(_t(spark, sf_dir, "documents"))


# Pick rule mirrored verbatim from dedup.lsh_near_dup_tuned: cheapest
# config meeting the 0.7-recall floor, else max recall; ties on bands
# ascending. The advisor subquery is _LSH_PARAM_SQL verbatim (DuckDB
# scopes its inner WITH), the signature chain is the production
# exact-collapsed one, and the tuned keys group seeds by
# seed // picked rows_per_band.
_LSH_TUNED_SQL = (
    r"""
WITH
"""
    + _EXACT_COLLAPSE_CTE.strip()
    + r""",
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
adv AS (SELECT * FROM (
"""
    + _LSH_PARAM_SQL.strip()
    + r"""
)),
pick AS (
  SELECT bands, rows_per_band FROM adv
  ORDER BY (catch_at_70_ppm >= 950000) DESC,
           CASE WHEN catch_at_70_ppm >= 950000
                THEN expected_caught_pairs
                ELSE -catch_at_70_ppm END ASC,
           bands ASC
  LIMIT 1
),
tk0 AS (
  SELECT doc_id, CAST(seed // p.rows_per_band AS INTEGER) AS band,
         seed, minhash
  FROM sig CROSS JOIN pick p
),
tkeys AS (
  SELECT doc_id, band,
         array_to_string(list(minhash ORDER BY seed), '|') AS band_key
  FROM tk0 GROUP BY doc_id, band
),
tpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared_bands
  FROM tkeys a
  JOIN tkeys b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
),
allp AS (
  SELECT doc_a, doc_b, n_shared_bands FROM tpairs
  UNION ALL
  SELECT star.doc_a, star.doc_b, CAST(p.bands AS BIGINT)
  FROM star CROSS JOIN pick p
)
SELECT ap.doc_a, ap.doc_b, ap.n_shared_bands, p.bands, p.rows_per_band
FROM allp ap CROSS JOIN pick p
"""
)

REGISTRY.update({
    "lsh_near_dup_tuned": QuerySpec(
        _lsh_near_dup_tuned, _LSH_TUNED_SQL,
        "advisor-executing LSH banding: the S-curve pick (cheapest "
        "b*r=16 split meeting a 0.95 catch floor at s=0.7, else max "
        "recall) stays a broadcast 1-row relation and parameterizes "
        "the production exact-collapsed banding in the same plan; "
        "all-config band keys from ONE wide-signature pass, bucket "
        "shuffle carries only the picked config's keys",
    ),
})

# ------------------------------------------------------------------
# Round 9: iterated BPE trainer (k unrolled merge blocks)
# ------------------------------------------------------------------

def _bpe_train_merges(spark, sf_dir):
    return textops.bpe_train_merges(_t(spark, sf_dir, "documents"), k=8)


def _bpe_train_sql(k: int = 8) -> str:
    """k unrolled merge blocks, each: pair-count over the previous
    word relation, deterministic top-1 (cnt DESC, pair asc), then the
    boundary-fenced replace() — byte-identical to the Spark loop's
    wrapped-string representation (see textops.bpe_train_merges)."""
    sym_cnt = "((length(s) - length(replace(s, chr(31), ''))) // 2)"
    blocks = [r"""
wrd AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wc
  FROM (SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        FROM documents)
  WHERE w <> '' AND w NOT LIKE '%' || chr(31) || '%'
  GROUP BY w
),
wtot AS (SELECT CAST(sum(wc) AS BIGINT) AS t FROM wrd),
w0 AS MATERIALIZED (
  SELECT w, wc,
         regexp_replace(w, '(.)', chr(31) || '\1' || chr(31), 'g') AS s
  FROM wrd
)"""]
    for i in range(1, k + 1):
        blocks.append(f""",
p{i} AS MATERIALIZED (
  SELECT syms[j] AS lft, syms[j + 1] AS rgt,
         CAST(sum(wc) AS BIGINT) AS cnt
  FROM (
    SELECT wc, syms, unnest(generate_series(1, len(syms) - 1)) AS j
    FROM (SELECT wc, string_split(trim(s, chr(31)),
                                  chr(31) || chr(31)) AS syms
          FROM w{i - 1})
  ) GROUP BY lft, rgt
),
m{i} AS MATERIALIZED (SELECT lft, rgt, cnt FROM p{i} ORDER BY cnt DESC, lft, rgt LIMIT 1),
w{i} AS MATERIALIZED (
  SELECT w, wc, replace(s,
    (SELECT chr(31) || lft || chr(31) || chr(31) || rgt || chr(31)
     FROM m{i}),
    (SELECT chr(31) || lft || rgt || chr(31) FROM m{i})) AS s
  FROM w{i - 1}
)""")
    selects = [f"""
SELECT CAST(0 AS BIGINT) AS step, '' AS left_sym, '' AS right_sym,
       CAST(0 AS BIGINT) AS merge_count,
       CAST(sum(wc * {sym_cnt}) AS BIGINT) AS corpus_symbols,
       CAST((CAST(1000000 AS HUGEINT) * sum(wc * {sym_cnt}))
            // (SELECT t FROM wtot) AS BIGINT) AS fertility_ppm
FROM w0"""]
    for i in range(1, k + 1):
        selects.append(f"""
SELECT CAST({i} AS BIGINT) AS step,
       (SELECT lft FROM m{i}) AS left_sym,
       (SELECT rgt FROM m{i}) AS right_sym,
       (SELECT cnt FROM m{i}) AS merge_count,
       CAST(sum(wc * {sym_cnt}) AS BIGINT) AS corpus_symbols,
       CAST((CAST(1000000 AS HUGEINT) * sum(wc * {sym_cnt}))
            // (SELECT t FROM wtot) AS BIGINT) AS fertility_ppm
FROM w{i}""")
    return "WITH" + "".join(blocks) + "\nUNION ALL".join(selects)


_BPE_TRAIN_SQL = _bpe_train_sql(8)


def _bpe_coverage_sql(k: int = 8) -> str:
    """Same unrolled merge chain as _bpe_train_sql, finishing with the
    per-source application audit: per-source word counts joined onto
    the trained (encoded) word-form relation, DECIMAL ppm ratios."""
    train = _bpe_train_sql(k)
    blocks = train.split("\nSELECT CAST(0 AS BIGINT) AS step,")[0]
    return blocks + rf""",
psrc AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS wc_s
  FROM (SELECT source, unnest(string_split(
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
        FROM documents)
  WHERE w <> '' AND w NOT LIKE '%' || chr(31) || '%'
  GROUP BY source, w
),
enc AS (
  SELECT w,
         (length(s) - length(replace(s, chr(31), ''))) // 2 AS n_sub,
         len(list_filter(string_split(trim(s, chr(31)),
                                      chr(31) || chr(31)),
                         x -> length(x) > 1)) AS n_merged,
         length(w) AS n_chars
  FROM w{k}
),
cov AS (
  SELECT source,
         CAST(sum(wc_s) AS BIGINT) AS words,
         CAST(sum(wc_s * n_chars) AS BIGINT) AS chars,
         CAST(sum(wc_s * n_sub) AS BIGINT) AS subwords,
         CAST(sum(wc_s * n_merged) AS BIGINT) AS merged_subwords
  FROM psrc JOIN enc USING (w)
  GROUP BY source
)
SELECT source, words, chars, subwords, merged_subwords,
       CAST((CAST(1000000 AS HUGEINT) * subwords) // words AS BIGINT)
         AS fertility_ppm,
       CAST((CAST(1000000 AS HUGEINT) * chars) // words AS BIGINT)
         AS baseline_fertility_ppm,
       CAST((CAST(1000000 AS HUGEINT) * merged_subwords) // subwords
            AS BIGINT) AS merged_share_ppm
FROM cov
"""


_BPE_COVERAGE_SQL = _bpe_coverage_sql(8)

def _bpe_vocab_coverage(spark, sf_dir):
    return textops.bpe_vocab_coverage(_t(spark, sf_dir, "documents"), k=8)


REGISTRY.update({
    "bpe_vocab_coverage": QuerySpec(
        _bpe_vocab_coverage, _BPE_COVERAGE_SQL,
        "deployment half of the BPE trainer: the trained word-form "
        "relation IS the encoded corpus, so application is free — "
        "one (source, word) count aggregate joins onto it at "
        "vocabulary scale, emitting per-source fertility vs the "
        "all-characters baseline and the merged-symbol coverage "
        "share (which domains the pooled merges actually serve)",
    ),
    "bpe_train_merges": QuerySpec(
        _bpe_train_merges, _BPE_TRAIN_SQL,
        "iterated BPE tokenizer training, 8 merges deep: the token "
        "stream is aggregated ONCE to distinct word forms "
        "(Heaps-sublinear), then every merge is one pair-count "
        "aggregate + map-side top-1 + a boundary-fenced string "
        "replace on the word relation; emits the merge table with "
        "corpus-symbol and fertility trajectories (step 0 = "
        "all-characters baseline)",
    ),
})

# ------------------------------------------------------------------
# Round 9: Gopher rule battery, detector confusion, Zipf OLS fit,
# SLO burn rate, MinHash estimator calibration
# ------------------------------------------------------------------

def _gopher_rules_audit(spark, sf_dir):
    return textops.gopher_rules_audit(_t(spark, sf_dir, "documents"))


_GOPHER_PANEL_SQL = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"

_GOPHER_RULES_SQL = rf"""
WITH norm AS (
  SELECT source,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
per AS (
  SELECT source,
         len(toks) AS n,
         list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS sum_len,
         len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS alpha_hits,
         len(list_distinct(list_intersect(toks, {_GOPHER_PANEL_SQL}))) AS panel_hits,
         CASE WHEN len(toks) >= 3 THEN len(toks) - 2 ELSE 0 END AS tri_n,
         CASE WHEN len(toks) >= 3 THEN
           len(toks) - 2 - len(list_distinct(list_transform(
             generate_series(0, len(toks) - 3),
             i -> array_to_string(toks[i + 1 : i + 3], ' '))))
         ELSE 0 END AS tri_dup
  FROM norm
),
flags AS (
  SELECT source,
         (n >= 50 AND n <= 100000) AS r_word_count,
         (sum_len >= 3 * n AND sum_len <= 10 * n) AS r_mean_word_len,
         (alpha_hits * 10 >= n * 8) AS r_alpha_words,
         (panel_hits >= 2) AS r_stop_panel,
         (tri_dup * 10 <= tri_n * 3) AS r_dup_trigrams
  FROM per
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN r_word_count THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_word_count,
       CAST(sum(CASE WHEN r_mean_word_len THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_mean_word_len,
       CAST(sum(CASE WHEN r_alpha_words THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_alpha_words,
       CAST(sum(CASE WHEN r_stop_panel THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_stop_panel,
       CAST(sum(CASE WHEN r_dup_trigrams THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_dup_trigrams,
       CAST(sum(CASE WHEN r_word_count AND r_mean_word_len AND r_alpha_words
                      AND r_stop_panel AND r_dup_trigrams THEN 1 ELSE 0 END)
            AS BIGINT) AS n_pass_all,
       CAST((1000000 * sum(CASE WHEN r_word_count AND r_mean_word_len
                                 AND r_alpha_words AND r_stop_panel
                                 AND r_dup_trigrams THEN 1 ELSE 0 END))
            // count(*) AS BIGINT) AS pass_all_ppm
FROM flags GROUP BY source
"""


def _lang_id_confusion(spark, sf_dir):
    return textops.lang_id_confusion(_t(spark, sf_dir, "documents"))


_LANG_CONFUSION_SQL = rf"""
WITH norm AS (
  SELECT doc_id, lang,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
scores AS (
  SELECT doc_id, lang, 'de' AS cand, len(list_intersect(toks, {{de}})) AS hits FROM norm
  UNION ALL
  SELECT doc_id, lang, 'en', len(list_intersect(toks, {{en}})) FROM norm
  UNION ALL
  SELECT doc_id, lang, 'es', len(list_intersect(toks, {{es}})) FROM norm
  UNION ALL
  SELECT doc_id, lang, 'fr', len(list_intersect(toks, {{fr}})) FROM norm
),
best AS (
  SELECT doc_id, lang, cand, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand DESC) AS rn
  FROM scores
),
cells AS (
  SELECT lang, CASE WHEN hits > 0 THEN cand ELSE 'und' END AS pred_lang,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM best WHERE rn = 1 GROUP BY 1, 2
)
SELECT lang, pred_lang, n_docs,
       CAST((1000000 * n_docs) // sum(n_docs) OVER (PARTITION BY lang)
            AS BIGINT) AS label_share_ppm
FROM cells
""".format(
    de=_lang_list_sql("de"),
    en=_lang_list_sql("en"),
    es=_lang_list_sql("es"),
    fr=_lang_list_sql("fr"),
)


def _zipf_fit_audit(spark, sf_dir):
    return textops.zipf_fit_audit(_t(spark, sf_dir, "documents"))


_ZIPF_FIT_SQL = r"""
WITH counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        FROM documents)
  WHERE tok <> ''
  GROUP BY tok
  ORDER BY cnt DESC, tok
  LIMIT 1000
),
xy AS (
  SELECT CAST(floor(ln(rnk) * 1000000) AS HUGEINT) AS x,
         CAST(floor(ln(cnt) * 1000000) AS HUGEINT) AS y
  FROM (SELECT cnt,
               row_number() OVER (ORDER BY cnt DESC, tok) AS rnk
        FROM counts)
),
a AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sx2,
         sum(x * (64000000 - y)) AS sxyf, sum(64000000 - y) AS syf
  FROM xy
)
SELECT CAST(n AS BIGINT) AS n_terms,
       CAST(CASE WHEN n * sx2 - sx * sx = 0 THEN NULL
            ELSE -((n * sxyf - sx * syf) * 1000000 // (n * sx2 - sx * sx))
            END AS BIGINT) AS zipf_slope_micro,
       CAST(CASE WHEN n * sx2 - sx * sx = 0 THEN NULL
            ELSE (sy * 1000000
                  + ((n * sxyf - sx * syf) * 1000000
                     // (n * sx2 - sx * sx)) * sx)
                 // (n * 1000000) END AS BIGINT) AS intercept_micro
FROM a
"""


def _events_sli_burn_rate(spark, sf_dir):
    return events.sli_burn_rate(_t(spark, sf_dir, "events"))


_SLI_BURN_SQL = """
WITH hourly AS (
  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour_epoch,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS window_start,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1, 2
),
framed AS (
  SELECT hour_epoch, window_start, n_events, n_errors,
         sum(n_events) OVER w6 AS n_6h, sum(n_errors) OVER w6 AS e_6h,
         sum(n_events) OVER w24 AS n_24h, sum(n_errors) OVER w24 AS e_24h
  FROM hourly
  WINDOW w6 AS (ORDER BY hour_epoch RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),
         w24 AS (ORDER BY hour_epoch RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT hour_epoch, window_start, n_events, n_errors,
       CAST((1000000 * n_errors) // n_events AS BIGINT) AS err_ppm_1h,
       CAST((1000000 * e_6h) // n_6h AS BIGINT) AS err_ppm_6h,
       CAST((1000000 * e_24h) // n_24h AS BIGINT) AS err_ppm_24h,
       CAST((100 * ((1000000 * n_errors) // n_events)) // 10000 AS BIGINT)
         AS burn_1h_centi,
       CAST((100 * ((1000000 * e_6h) // n_6h)) // 10000 AS BIGINT)
         AS burn_6h_centi,
       ((1000000 * n_errors) // n_events) >= 144000 AS page_fast,
       (((1000000 * e_6h) // n_6h) >= 60000
        AND ((1000000 * n_errors) // n_events) >= 60000) AS page_slow
FROM framed
"""


def _minhash_estimator_audit(spark, sf_dir):
    return dedup.minhash_estimator_audit(_t(spark, sf_dir, "documents"))


# Pairs CTE = _MINHASH_PAIRS_SQL verbatim (production banding, exact
# collapse + star); signatures and distinct shingles re-derived over
# ALL documents so collapsed star members score too.
_MINHASH_ESTIMATOR_SQL = (
    r"""
WITH pairs AS (SELECT * FROM (
"""
    + _MINHASH_PAIRS_SQL.strip()
    + r"""
)),
anorm AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
agrams AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) >= 3 THEN
             list_transform(generate_series(0, len(toks) - 3),
                            i -> array_to_string(toks[i + 1 : i + 3], ' '))
           ELSE [] END) AS gram
    FROM anorm
  )
),
ahh AS (
  SELECT doc_id,
         ('0x' || substring(md5(gram), 1, 8))::BIGINT AS g1,
         ('0x' || substring(md5(gram), 9, 8))::BIGINT AS g2
  FROM agrams
),
asig AS (
  SELECT doc_id, seed, min((g1 + seed * g2) % 4294967296) AS minhash
  FROM ahh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed) s
  GROUP BY doc_id, seed
),
est AS (
  SELECT p.doc_a, p.doc_b, p.n_shared_bands,
         CASE WHEN max(sa.doc_id) IS NULL OR max(sb.doc_id) IS NULL
              THEN CAST(1000000 AS BIGINT)
              ELSE CAST((1000000 * sum(CASE WHEN sa.minhash = sb.minhash
                                            THEN 1 ELSE 0 END)) // 16
                        AS BIGINT) END AS est_jaccard_ppm
  FROM pairs p
  LEFT JOIN asig sa ON sa.doc_id = p.doc_a
  LEFT JOIN asig sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
  GROUP BY 1, 2, 3
),
sizes AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
  FROM agrams GROUP BY doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS n_inter
  FROM pairs p
  JOIN agrams ga ON ga.doc_id = p.doc_a
  JOIN agrams gb ON gb.doc_id = p.doc_b AND gb.gram = ga.gram
  GROUP BY 1, 2
),
exact AS (
  SELECT p.doc_a, p.doc_b,
         CASE WHEN coalesce(za.n_grams, 0) + coalesce(zb.n_grams, 0) = 0
              THEN CAST(1000000 AS BIGINT)
              ELSE CAST((1000000 * coalesce(i.n_inter, 0))
                        // (coalesce(za.n_grams, 0) + coalesce(zb.n_grams, 0)
                            - coalesce(i.n_inter, 0)) AS BIGINT) END
           AS exact_jaccard_ppm
  FROM pairs p
  LEFT JOIN sizes za ON za.doc_id = p.doc_a
  LEFT JOIN sizes zb ON zb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
)
SELECT e.doc_a, e.doc_b, e.n_shared_bands, e.est_jaccard_ppm,
       x.exact_jaccard_ppm,
       CAST(e.est_jaccard_ppm - x.exact_jaccard_ppm AS BIGINT) AS err_ppm
FROM est e JOIN exact x ON x.doc_a = e.doc_a AND x.doc_b = e.doc_b
"""
)


def _unigram_lm_train(spark, sf_dir):
    from iceberg_diag_spark.operators.textops import unigram_lm_train

    return unigram_lm_train(_t(spark, sf_dir, "documents"))


def _uni_score_block(name: str, vocab: str) -> str:
    return f"""{name} AS (
  SELECT piece, l, cnt,
         CAST(floor(-ln((CAST(cnt AS DOUBLE) + 1) / (total + v))
                    * 1000000.0) AS BIGINT) AS nll
  FROM {vocab}, (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                        CAST(count(*) AS BIGINT) AS v FROM {vocab}) t
)"""


# the Viterbi-optimal spans at position pos: prefix cost + piece
# cost equals the optimum (bests is 1-based: bests[j+1] = best[j])
_UNI_CAND = (
    "list_filter(sp, {v} -> {v}.i = pos AND "
    "bests[CAST(pos - {v}.l + 1 AS INT)] + {v}.nll = "
    "bests[CAST(pos + 1 AS INT)])"
)


def _uni_seg_block(m: int) -> str:
    """The sp{m}/dp{m}/bt{m} CTE triple segmenting every word form
    under score{m} — shared by the EM unroll and (round 11) the
    encoder's final segmentation pass."""
    c1 = _UNI_CAND.format(v="x")
    c2 = _UNI_CAND.format(v="y")
    return f"""sp{m} AS (
  SELECT s.w, list(struct_pack(i := s.i, l := s.l, piece := s.piece,
                               nll := v.nll) ORDER BY s.i, s.l) AS sp
  FROM spans s JOIN score{m} v ON v.piece = s.piece
  GROUP BY s.w
),
dp{m}(w, n, i, sp, bests) AS (
  SELECT q.w, CAST(length(q.w) AS BIGINT), CAST(0 AS BIGINT), q.sp,
         [CAST(0 AS BIGINT)]
  FROM sp{m} q
  UNION ALL
  SELECT w, n, i + 1, sp,
         list_append(bests, list_min(list_transform(
           list_filter(sp, x -> x.i = i + 1),
           x -> bests[CAST(i + 2 - x.l AS INT)] + x.nll)))
  FROM dp{m} WHERE i < n
),
bt{m}(w, pos, sp, bests, pieces) AS (
  SELECT w, n, sp, bests, []::VARCHAR[]
  FROM dp{m} WHERE i = n
  UNION ALL
  SELECT w,
         pos - list_max(list_transform({c1}, x -> x.l)),
         sp, bests,
         list_append(pieces,
           list_filter({c1}, x -> x.l =
             list_max(list_transform({c2}, y -> y.l)))[1].piece)
  FROM bt{m} WHERE pos > 0
)"""


def _unigram_sql(
    k_em: int = 2,
    max_piece_len: int = 4,
    n_multi: int = 48,
    max_word_len: int = 24,
) -> str:
    """Unigram-LM hard-EM in DuckDB: the Viterbi forward DP and the
    backtrack are recursive CTEs per word form carrying the bests
    list (integer micro-nat costs, so the DP is exact arithmetic in
    both engines); EM iterations are unrolled as repeated CTE blocks
    (the matryoshka per-dim generation pattern)."""
    return (
        _unigram_chain(k_em, max_piece_len, n_multi, max_word_len)
        + f"""
SELECT piece, CAST(l AS BIGINT) AS piece_len, cnt AS em_count,
       nll AS nll_micro
FROM score{k_em}
"""
    )


def _unigram_chain(
    k_em: int = 2,
    max_piece_len: int = 4,
    n_multi: int = 48,
    max_word_len: int = 24,
) -> str:
    """The full WITH chain through score{k_em} (no final SELECT) —
    shared by the trainer oracle and round 11's encoder oracle."""
    vals = ", ".join(f"({l})" for l in range(1, max_piece_len + 1))

    score_block = _uni_score_block
    em_blocks = []
    for m in range(k_em):
        em_blocks.append(_uni_seg_block(m) + f""",
em{m} AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt
  FROM (SELECT b.w AS w, unnest(b.pieces) AS piece
        FROM bt{m} b WHERE b.pos = 0) u
  JOIN words USING (w)
  GROUP BY piece
),
vocab{m + 1} AS (
  SELECT c.piece, CAST(1 AS INT) AS l,
         CAST(coalesce(e.cnt, 0) AS BIGINT) AS cnt
  FROM chars c LEFT JOIN em{m} e USING (piece)
  UNION ALL
  SELECT piece, CAST(length(piece) AS INT) AS l, cnt
  FROM em{m} WHERE length(piece) >= 2 AND cnt > 0
),
{score_block(f"score{m + 1}", f"vocab{m + 1}")}""")
    em_sql = ",\n".join(em_blocks)
    return rf"""
WITH RECURSIVE words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wc FROM (
    SELECT unnest(string_split(regexp_replace(lower(trim(text)),
                                              '\s+', ' ', 'g'),
                  ' ')) AS w
    FROM documents
  ) t(w)
  WHERE w <> '' AND length(w) <= {max_word_len}
  GROUP BY w
),
pos AS (
  SELECT w, wc, unnest(generate_series(1, length(w))) AS i FROM words
),
spans AS (
  SELECT w, wc, i, l,
         substr(w, CAST(i - l + 1 AS INT), CAST(l AS INT)) AS piece
  FROM pos, (VALUES {vals}) t(l)
  WHERE l <= i
),
seed AS (
  SELECT piece, CAST(l AS INT) AS l, CAST(sum(wc) AS BIGINT) AS cnt
  FROM spans GROUP BY piece, l
),
chars AS (SELECT piece, l, cnt FROM seed WHERE l = 1),
multis AS (SELECT piece, l, cnt FROM seed WHERE l >= 2
           ORDER BY cnt DESC, piece LIMIT {n_multi}),
vocab0 AS (SELECT * FROM chars UNION ALL SELECT * FROM multis),
{score_block("score0", "vocab0")},
{em_sql}"""


_UNIGRAM_SQL = _unigram_sql()


def _classifier_auc_calibration(spark, sf_dir):
    from iceberg_diag_spark.operators.textops import (
        classifier_auc_calibration,
    )

    return classifier_auc_calibration(_t(spark, sf_dir, "documents"))


# AUC over the z_micro histogram (tie-corrected Mann-Whitney; the
# single-node oracle may use a plain cumulative window where the
# Spark side runs the range-sharded prefix) + the fixed p-grid
# calibration bins. The z/feature CTEs mirror
# _QUALITY_CLASSIFIER_SQL; the gate mirrors the funnel's stage-1.
# Shared CTE chain through the per-doc (z_micro, y) relation — the
# classifier score next to the curation-gate label (mirrors
# textops._scored_vs_gate); AUC/calibration and the PR curve append
# their own tails.
_CLASSIFIER_PER_PREFIX = (
    r"""
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
         greatest(
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
    + r"""))) AS lang_hits
  FROM f
),
per AS (
  SELECT CAST(FLOOR((-2.3 + (-0.05) * mtl + 1.2 * ttr + 4.0 * sw
               + 2.5 * alpha
               + (-3.0) * (CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                           / greatest(len(tri), 1))) * 1000000.0)
              AS BIGINT) AS z_micro,
         CAST(ttr >= 0.4 AND alpha >= 0.6 AND lang_hits > 0
              AS BIGINT) AS y
  FROM feats
)"""
)

_CLASSIFIER_AUC_SQL = (
    _CLASSIFIER_PER_PREFIX
    + r""",
perp AS (
  SELECT z_micro, y,
         CAST(FLOOR(1000000.0
                    / (1.0 + exp(-(CAST(z_micro AS DOUBLE) / 1000000.0))))
              AS BIGINT) AS p_micro
  FROM per
),
hist AS (
  SELECT z_micro,
         CAST(sum(y) AS BIGINT) AS n1,
         CAST(count(*) - sum(y) AS BIGINT) AS n0
  FROM perp GROUP BY z_micro
),
pre AS (
  SELECT n1, n0,
         CAST(coalesce(sum(n0) OVER (ORDER BY z_micro
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum0
  FROM hist
),
aucf AS (
  SELECT CASE WHEN sum(n1) = 0 OR sum(n0) = 0 THEN NULL
         ELSE CAST((1000000 * sum(CAST(n1 AS HUGEINT) * (2 * cum0 + n0)))
                   // (2 * CAST(sum(n1) AS HUGEINT) * sum(n0)) AS BIGINT)
         END AS auc_ppm,
         CAST(sum(n1) AS BIGINT) AS n_pos_total,
         CAST(sum(n0) AS BIGINT) AS n_neg_total
  FROM pre
),
bins AS (
  SELECT least(9, p_micro * 10 // 1000000) AS bin_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(y) AS BIGINT) AS n_pos,
         sum(CAST(p_micro AS HUGEINT)) AS sp
  FROM perp GROUP BY 1
)
SELECT CAST(b.bin_id AS BIGINT) AS bin_id, b.n_docs, b.n_pos,
       CAST(b.sp // b.n_docs AS BIGINT) AS mean_pred_ppm,
       CAST(1000000 * CAST(b.n_pos AS HUGEINT) // b.n_docs AS BIGINT)
         AS pos_rate_ppm,
       CAST(b.sp // b.n_docs
            - 1000000 * CAST(b.n_pos AS HUGEINT) // b.n_docs AS BIGINT)
         AS calib_gap_ppm,
       a.auc_ppm, a.n_pos_total, a.n_neg_total
FROM bins b, aucf a
"""
).format(
    de=_lang_list_sql("de"),
    en=_lang_list_sql("en"),
    es=_lang_list_sql("es"),
    fr=_lang_list_sql("fr"),
)

REGISTRY.update({
    "gopher_rules_audit": QuerySpec(
        _gopher_rules_audit, _GOPHER_RULES_SQL,
        "Gopher (Rae et al. 2021) quality-rule battery as a "
        "per-source pass-rate audit: five published heuristics as "
        "integer cross-multiplies riding ONE corpus scan + one "
        "map-side aggregate to the sources relation",
    ),
    "lang_id_confusion": QuerySpec(
        _lang_id_confusion, _LANG_CONFUSION_SQL,
        "confusion matrix of the stopword-voting detector vs the "
        "labeled lang column: zero-shuffle voting projection, one "
        "aggregate to the bounded label*prediction matrix, "
        "label-share window on that matrix only",
    ),
    "zipf_fit_audit": QuerySpec(
        _zipf_fit_audit, _ZIPF_FIT_SQL,
        "OLS fit of ln(freq) on ln(rank) over the top-1000 "
        "vocabulary: token hash-agg + TakeOrderedAndProject top-k, "
        "k-row bounded rank window, one DECIMAL-exact regression "
        "aggregate (flipped ordinate keeps every floor-division "
        "non-negative where Spark DIV and DuckDB // agree)",
    ),
    "unigram_lm_train": QuerySpec(
        _unigram_lm_train, _UNIGRAM_SQL,
        "unigram-LM tokenizer training (SentencePiece/Kudo hard-EM "
        "counterpart of bpe_train_merges): substring-seeded piece "
        "vocabulary, k_em rounds of Viterbi segmentation (row-local "
        "integer array-fold DP over the distinct word-form relation, "
        "longest-piece tie-break) + micro-nat Laplace score "
        "re-estimation, zero-count multi-piece prune; token stream "
        "touched once, scores broadcast, zero driver round-trips",
    ),
    "classifier_auc_calibration": QuerySpec(
        _classifier_auc_calibration, _CLASSIFIER_AUC_SQL,
        "exact classifier evaluation against the production curation "
        "gate: tie-corrected Mann-Whitney ROC-AUC over the score "
        "HISTOGRAM (range-sharded prefix sum, no per-doc global "
        "sort; DECIMAL(38,0) moments) + fixed p-grid calibration "
        "bins of sigmoid-predicted vs empirical keep rate with "
        "integer-exact gaps; one corpus scan, checkpointed 3-column "
        "per-doc lineage, 1-row AUC broadcast onto the bin rows",
    ),
    "events_sli_burn_rate": QuerySpec(
        _events_sli_burn_rate, _SLI_BURN_SQL,
        "multi-window SLO burn-rate audit (SRE workbook pattern at "
        "hourly grain): one shuffle to the hourly rollup, trailing "
        "6h/24h RANGE frames on the metadata-scale hour relation, "
        "integer ppm rates + centi-x burn multiples + fast/slow "
        "paging flags against a 99% objective",
    ),
    "minhash_estimator_audit": QuerySpec(
        _minhash_estimator_audit, _MINHASH_ESTIMATOR_SQL,
        "MinHash estimator calibration on the production candidate "
        "pairs: sketched Jaccard (matching signature coordinates/16) "
        "vs exact distinct-shingle Jaccard with signed error; "
        "bounded by the banding's pairs, signature joined twice on "
        "uniform ids, shingle intersection + set sizes assembled by "
        "a tagged-union fold on the pair key (no pair-scale reattach "
        "joins, no broadcast hints — r11 scale correction)",
    ),
})

# ------------------------------------------------------------------
# Round 9: near-dup source modularity + Holt trend forecast
# ------------------------------------------------------------------

def _neardup_source_modularity(spark, sf_dir):
    from iceberg_diag_spark.operators.graph import source_modularity

    return source_modularity(_t(spark, sf_dir, "documents"))


_SOURCE_MODULARITY_SQL = (
    r"""
WITH pairs AS (SELECT * FROM (
"""
    + _MINHASH_PAIRS_SQL.strip()
    + r"""
)),
lab AS (SELECT doc_id, source AS src FROM documents),
e AS (
  SELECT la.src AS src_a, lb.src AS src_b
  FROM pairs p
  JOIN lab la ON la.doc_id = p.doc_a
  JOIN lab lb ON lb.doc_id = p.doc_b
),
mt AS (SELECT CAST(count(*) AS HUGEINT) AS m FROM e),
intra AS (
  SELECT src_a AS source, CAST(count(*) AS BIGINT) AS intra_edges
  FROM e WHERE src_a = src_b GROUP BY src_a
),
deg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS degree_sum
  FROM (SELECT src_a AS source FROM e
        UNION ALL SELECT src_b FROM e)
  GROUP BY source
)
SELECT d.source, d.degree_sum,
       coalesce(i.intra_edges, 0) AS intra_edges,
       CAST((CAST(1000000 AS HUGEINT)
               * (4 * mt.m * coalesce(i.intra_edges, 0)
                  - CAST(d.degree_sum AS HUGEINT) * d.degree_sum)
             + CAST(1000000 AS HUGEINT) * (4 * mt.m * mt.m))
            // (4 * mt.m * mt.m) - 1000000 AS BIGINT) AS q_contrib_micro
FROM deg d LEFT JOIN intra i USING (source) CROSS JOIN mt
"""
)


def _events_holt_forecast(spark, sf_dir):
    return events.holt_forecast(_t(spark, sf_dir, "events"))


def _fdiv4_sql(x: str) -> str:
    """Floor /4 for signed ints, identical in both engines: subtract
    the non-negative remainder, then divide exactly."""
    return f"(({x}) - ((({x}) % 4 + 4) % 4)) // 4"


_HOLT_LSUM = "(1024 * h.c + 3 * (f.l + f.b))"
_HOLT_LNEW = _fdiv4_sql(_HOLT_LSUM)
_HOLT_BSUM = f"(({_HOLT_LNEW}) - f.l + 3 * f.b)"
_HOLT_BNEW = _fdiv4_sql(_HOLT_BSUM)

_HOLT_SQL = f"""
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
tot AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours
  FROM idx GROUP BY event_type
),
f AS (
  SELECT event_type, i,
         CAST(1024 * c AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
         CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS sae
  FROM idx WHERE i = 1
  UNION ALL
  SELECT h.event_type, h.i,
         {_HOLT_LNEW},
         {_HOLT_BNEW},
         f.n + 1,
         f.sae + abs(1024 * h.c - (f.l + f.b))
  FROM f JOIN idx h ON h.event_type = f.event_type AND h.i = f.i + 1
)
SELECT f.event_type, t.n_hours, f.n AS n_predicted,
       CASE WHEN f.n = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((1000 * f.sae) // (1024 * f.n) AS BIGINT) END
         AS mae_milli,
       f.l AS level_final_scaled,
       f.b AS trend_final_scaled,
       CAST(f.l + f.b AS BIGINT) AS forecast_next_scaled
FROM f JOIN tot t USING (event_type)
WHERE f.i = t.n_hours
"""

REGISTRY.update({
    "neardup_source_modularity": QuerySpec(
        _neardup_source_modularity, _SOURCE_MODULARITY_SQL,
        "Newman modularity of the source partition over the near-dup "
        "candidate graph (is duplication source-assortative?): "
        "production banding pairs + two uniform-id label joins, then "
        "|sources|-scale aggregates; per-source signed contributions "
        "via the shift-DIV trick, DECIMAL-exact m^2 terms",
    ),
    "stream_sli_burn_rate": QuerySpec(
        lambda spark, sf_dir: stream_ops.run_sli_burn_rate_stream(
            spark, sf_dir
        ),
        _SLI_BURN_SQL,
        "streaming burn-rate twin via the accumulated-rollup idiom: "
        "each micro-batch folds into a persistent hourly rollup "
        "(idempotent batch=<id> overwrite), the multi-window burn "
        "table re-frames from the re-summed rollup with the batch "
        "operator's own logic — trailing windows need cross-hour "
        "reads no keyed state can serve; one availableNow drain "
        "equals the batch relation exactly",
    ),
    "events_holt_forecast": QuerySpec(
        _events_holt_forecast, _HOLT_SQL,
        "Holt linear double-exponential smoothing per event type "
        "(alpha=beta=1/4, 2^10-scaled signed integer state, floor-/4 "
        "via remainder subtraction so both engines agree on "
        "negatives): one rollup shuffle + bounded per-type array "
        "fold, one-step-ahead MAE scored in-fold, next-hour forecast "
        "from the final level+trend",
    ),
})

# ------------------------------------------------------------------
# Round 9: Matryoshka truncation audit
# ------------------------------------------------------------------

def _embedding_matryoshka_audit(spark, sf_dir):
    return similarity.matryoshka_audit(_t(spark, sf_dir, "embeddings"))


def _matryoshka_sql(k=5, query_mod=100, dims=(16, 32, 64)) -> str:
    full = dims[-1]

    def dot(d):
        return (
            f"list_sum(list_transform(generate_series(1, {d}),"
            f" i -> n.q[i] * p.qq[i]))"
        )

    norm_cols = ",\n         ".join(
        f"list_sum(list_transform(generate_series(1, {d}),"
        f" i -> q[i] * q[i])) AS n2_{d}"
        for d in dims
    )
    # Zero-prefix guard mirrors the Spark side (ADVICE r9): a zero
    # prefix norm would make DuckDB divide to inf (floor(inf)::BIGINT
    # errors) where Spark yields NULL — both engines pin the cosine
    # to 0 so zero-prefix vectors rank deterministically.
    cos_cols = ",\n         ".join(
        f"CASE WHEN n.n2_{d} = 0 OR p.qn2_{d} = 0 THEN 0 ELSE "
        f"CAST(floor(1000000.0 * {dot(d)}"
        f" / (sqrt(n.n2_{d}) * sqrt(p.qn2_{d}))) AS BIGINT) END AS cos_{d}"
        for d in dims
    )
    qn_cols = ", ".join(f"n2_{d} AS qn2_{d}" for d in dims)
    tks = ",\n".join(
        f"""tk{d} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_{d} DESC, neighbor_id) AS r
    FROM pairs) WHERE r <= {k}
)"""
        for d in dims
    )
    selects = "\nUNION ALL\n".join(
        f"""SELECT e.query_id, CAST({d} AS BIGINT) AS prefix_dim,
       e.n_exact, coalesce(h.n_hits, 0) AS n_hits,
       CAST((1000000 * coalesce(h.n_hits, 0)) // e.n_exact AS BIGINT)
         AS recall_ppm
FROM (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact
      FROM tk{full} GROUP BY query_id) e
LEFT JOIN (SELECT f.query_id, CAST(count(*) AS BIGINT) AS n_hits
           FROM tk{full} f JOIN tk{d} t
             ON t.query_id = f.query_id
            AND t.neighbor_id = f.neighbor_id
           GROUP BY f.query_id) h USING (query_id)"""
        for d in dims[:-1]
    )
    return f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 256)
                                  AS BIGINT)) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, q,
         {norm_cols}
  FROM base
),
panel AS (
  SELECT vec_id AS query_id, q AS qq, {qn_cols}
  FROM norms WHERE vec_id % {query_mod} = 0 AND n2_{full} > 0
),
pairs AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
         {cos_cols}
  FROM norms n CROSS JOIN panel p
  WHERE n.n2_{full} > 0 AND n.vec_id <> p.query_id
),
{tks}
{selects}
"""


_MATRYOSHKA_SQL = _matryoshka_sql()

REGISTRY.update({
    "embedding_matryoshka_audit": QuerySpec(
        _embedding_matryoshka_audit, _MATRYOSHKA_SQL,
        "Matryoshka truncation audit (MRL): recall@k of 16/32-dim "
        "prefix cosine retrieval vs the full 64-dim ranking on the "
        "broadcast 1/query_mod query panel; one quantized pair "
        "relation carries every prefix's cosine, per-query top-k via "
        "WindowGroupLimit, integer dots + the proven float-cosine "
        "floor formula",
    ),
})

# ------------------------------------------------------------------
# Round 9: mixing-plan executing sampler
# ------------------------------------------------------------------

def _data_mixing_sample(spark, sf_dir):
    return sampling.data_mixing_sample(_t(spark, sf_dir, "documents"))


_DATA_MIXING_SAMPLE_SQL = (
    r"""
WITH plan AS (SELECT source, tokens_alloc FROM (
"""
    + _DATA_MIXING_SQL.strip()
    + r"""
)),
keyed AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS w,
         md5(CAST(doc_id AS VARCHAR)) AS k
  FROM documents
),
pre AS (
  SELECT source, doc_id, w, k,
         coalesce(sum(w) OVER (
           PARTITION BY source ORDER BY k, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prefix
  FROM keyed
),
chosen AS (
  SELECT p.source, p.w, pl.tokens_alloc
  FROM pre p JOIN plan pl USING (source)
  WHERE p.prefix < pl.tokens_alloc
)
SELECT source,
       CAST(max(tokens_alloc) AS BIGINT) AS tokens_alloc,
       CAST(count(*) AS BIGINT) AS n_docs_selected,
       CAST(sum(w) AS BIGINT) AS tokens_selected,
       CAST((CAST(1000000 AS HUGEINT) * sum(w))
            // greatest(max(tokens_alloc), 1) AS BIGINT) AS fill_ppm
FROM chosen GROUP BY source
"""
)

REGISTRY.update({
    "data_mixing_sample": QuerySpec(
        _data_mixing_sample, _DATA_MIXING_SAMPLE_SQL,
        "mixing-plan EXECUTION (advisor-executing pattern #4): each "
        "source's token allocation realized as the deterministic "
        "md5-prefix document sample (first overshooting doc "
        "included), cumulative mass via the epoch_shuffle hex-shard "
        "idiom (no one-task-per-source window), broadcast plan join, "
        "per-source fill audit",
    ),
})


# ------------------------------------------------------------------
# Round 10 (post-window additions — scored in the r11 window, see
# registry._ADDED_POST_WINDOW_R10): C4 rule battery
# ------------------------------------------------------------------


def _c4_rules_audit(spark, sf_dir):
    from iceberg_diag_spark.operators.textops import c4_rules_audit

    return c4_rules_audit(_t(spark, sf_dir, "documents"))


_C4_RULES_SQL = r"""
WITH f AS (
  SELECT source, text,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
         string_split(text, chr(10)) AS lines
  FROM documents
),
per AS (
  SELECT source,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines,
            x -> regexp_matches(x, '[.!?"]$')
                 AND len(string_split_regex(trim(x), '\s+')) >= 5))
           AS BIGINT) AS n_kept,
         (length(text) - length(replace(text, '.', ''))
          + length(text) - length(replace(text, '!', ''))
          + length(text) - length(replace(text, '?', ''))) >= 3
           AS r_min_sentences,
         2 * len(list_filter(lines, x -> regexp_matches(x, '[.!?"]$')))
           >= len(lines) AS r_line_punct,
         len(list_filter(lines,
            x -> len(string_split_regex(trim(x), '\s+')) >= 5))
           = len(lines) AS r_line_words,
         NOT contains(lower(text), 'lorem ipsum') AS r_no_lorem,
         NOT contains(text, '{') AS r_no_brace,
         len(list_intersect(toks, ['porn','xxx','viagra','casino'])) = 0
           AS r_no_badwords
  FROM f
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(r_min_sentences AS BIGINT)) AS BIGINT)
         AS n_pass_min_sentences,
       CAST(sum(CAST(r_line_punct AS BIGINT)) AS BIGINT)
         AS n_pass_line_punct,
       CAST(sum(CAST(r_line_words AS BIGINT)) AS BIGINT)
         AS n_pass_line_words,
       CAST(sum(CAST(r_no_lorem AS BIGINT)) AS BIGINT) AS n_pass_no_lorem,
       CAST(sum(CAST(r_no_brace AS BIGINT)) AS BIGINT) AS n_pass_no_brace,
       CAST(sum(CAST(r_no_badwords AS BIGINT)) AS BIGINT)
         AS n_pass_no_badwords,
       CAST(sum(CAST(r_min_sentences AND r_line_punct AND r_line_words
                     AND r_no_lorem AND r_no_brace AND r_no_badwords
                     AS BIGINT)) AS BIGINT) AS n_pass_all,
       CAST(1000000 * sum(CAST(r_min_sentences AND r_line_punct
                     AND r_line_words AND r_no_lorem AND r_no_brace
                     AND r_no_badwords AS BIGINT)) // count(*) AS BIGINT)
         AS pass_all_ppm,
       CAST(sum(n_lines) AS BIGINT) AS lines_total,
       CAST(sum(n_kept) AS BIGINT) AS lines_kept,
       CAST(1000000 * sum(n_kept) // sum(n_lines) AS BIGINT)
         AS line_keep_ppm
FROM per GROUP BY source
"""

REGISTRY.update({
    "c4_rules_audit": QuerySpec(
        _c4_rules_audit, _C4_RULES_SQL,
        "C4 (Raffel et al. 2020 §2.2) cleaning-rule battery per "
        "source, sibling of gopher_rules_audit: six published "
        "heuristics (sentence minimum, terminal-punct line share, "
        "words-per-line, lorem-ipsum, curly-brace, bad-word panel) "
        "as integer cross-multiplies on ONE scan + one map-side "
        "aggregate, plus the line-level retained-mass figure the C4 "
        "line filter would actually keep",
    ),
})

# ------------------------------------------------------------------
# Round 10 (post-window): PR curve + best-F1 operating point
# ------------------------------------------------------------------


def _classifier_pr_curve(spark, sf_dir):
    from iceberg_diag_spark.operators.textops import classifier_pr_curve

    return classifier_pr_curve(_t(spark, sf_dir, "documents"))


_CLASSIFIER_PR_SQL = (
    _CLASSIFIER_PER_PREFIX
    + r""",
hist AS (
  SELECT z_micro,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n1
  FROM per GROUP BY z_micro
),
cum AS (
  SELECT z_micro, n, n1,
         CAST(sum(n1) OVER (ORDER BY z_micro DESC) AS BIGINT) AS tp,
         CAST(sum(n) OVER (ORDER BY z_micro DESC) - sum(n1)
              OVER (ORDER BY z_micro DESC) AS BIGINT) AS fp,
         (SELECT CAST(sum(n1) AS BIGINT) FROM hist) AS p_total
  FROM hist
),
rows_ AS (
  SELECT z_micro, p_total, tp, fp,
         CAST(p_total - tp AS BIGINT) AS fn,
         CAST(1000000 * tp // (tp + fp) AS BIGINT) AS prec_ppm,
         CAST(2000000 * tp // (2 * tp + fp + (p_total - tp)) AS BIGINT)
           AS f1_ppm
  FROM cum WHERE p_total > 0
),
best AS (
  SELECT f1_ppm AS best_f1_ppm, z_micro AS best_threshold_z,
         tp AS best_tp, fp AS best_fp, fn AS best_fn
  FROM rows_ ORDER BY f1_ppm DESC, z_micro DESC LIMIT 1
)
SELECT CAST(g.r_idx * 100000 AS BIGINT) AS recall_grid_ppm,
       CAST(max(r.prec_ppm) AS BIGINT) AS interp_precision_ppm,
       b.best_f1_ppm, b.best_threshold_z, b.best_tp, b.best_fp,
       b.best_fn
FROM generate_series(0, 10) g(r_idx)
JOIN rows_ r ON r.tp * 10 >= g.r_idx * r.p_total
CROSS JOIN best b
GROUP BY g.r_idx, b.best_f1_ppm, b.best_threshold_z, b.best_tp,
         b.best_fp, b.best_fn
"""
).format(
    de=_lang_list_sql("de"),
    en=_lang_list_sql("en"),
    es=_lang_list_sql("es"),
    fr=_lang_list_sql("fr"),
)

REGISTRY.update({
    "classifier_pr_curve": QuerySpec(
        _classifier_pr_curve, _CLASSIFIER_PR_SQL,
        "decision-threshold companion of classifier_auc_calibration: "
        "11-point interpolated-precision PR curve (integer-exact "
        "recall test 10*TP >= r*P, max precision per grid point) + "
        "exact best-F1 operating point (struct-max argmax, "
        "higher-threshold tie-break); all over the score histogram "
        "with descending range-sharded cumulatives, empty when no "
        "gate-positives exist",
    ),
})

# ------------------------------------------------------------------
# Round 10 (post-window): IVF n_probe operating-point sweep
# ------------------------------------------------------------------


def _ivf_nprobe_sweep(spark, sf_dir):
    return similarity.ivf_nprobe_sweep(_t(spark, sf_dir, "embeddings"))


def _ivf_nprobe_sweep_sql(
    k: int = 5, query_mod: int = 100, max_p: int = 8,
    probes=(1, 2, 4, 8),
) -> str:
    cents = similarity.md5_centroids()
    values = ", ".join(
        f"({c},{d},{h})"
        for c, row in enumerate(cents)
        for d, h in enumerate(row)
    )
    probe_values = ", ".join(f"({p})" for p in sorted(probes))
    return f"""
WITH cents(c, d, h) AS (VALUES {values}),
ex AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 256.0) AS BIGINT) AS q
  FROM embeddings
),
norms AS (
  SELECT vec_id, sum(q * q) AS n2 FROM ex GROUP BY vec_id
),
valid AS (SELECT vec_id FROM norms WHERE n2 > 0),
dists AS (
  SELECT e.vec_id, c.c, sum((e.q - c.h) * (e.q - c.h)) AS d2
  FROM ex e JOIN cents c USING (d)
  WHERE e.vec_id IN (SELECT vec_id FROM valid)
  GROUP BY e.vec_id, c.c
),
ranked_cells AS (
  SELECT vec_id, c,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
  FROM dists
),
assigned AS (SELECT vec_id AS neighbor_id, c AS list_id
             FROM ranked_cells WHERE rn = 1),
csizes AS (SELECT list_id, CAST(count(*) AS BIGINT) AS csize
           FROM assigned GROUP BY list_id),
panel AS (SELECT vec_id AS query_id FROM valid
          WHERE vec_id % {query_mod} = 0),
pairdots AS (
  SELECT p.query_id, eb.vec_id AS neighbor_id,
         sum(ea.q * eb.q) AS dd,
         sum(ea.q * ea.q) AS na2,
         sum(eb.q * eb.q) AS nb2
  FROM panel p
  JOIN ex ea ON ea.vec_id = p.query_id
  JOIN ex eb ON eb.d = ea.d
            AND eb.vec_id != p.query_id
            AND eb.vec_id IN (SELECT vec_id FROM valid)
  GROUP BY p.query_id, eb.vec_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY CAST(floor(1000000.0 * dd
                        / (sqrt(na2) * sqrt(nb2))) AS BIGINT) DESC,
                      neighbor_id ASC) AS rank
    FROM pairdots
  ) WHERE rank <= {k}
),
ppr AS (
  SELECT r.vec_id AS query_id, r.c AS list_id,
         CAST(r.rn AS BIGINT) AS prank
  FROM ranked_cells r
  JOIN panel p ON p.query_id = r.vec_id
  WHERE r.rn <= {max_p}
),
reach AS (
  SELECT e.query_id, e.neighbor_id, pr.prank
  FROM exact e
  LEFT JOIN (SELECT pp.query_id, a.neighbor_id, pp.prank
             FROM ppr pp JOIN assigned a USING (list_id)) pr
    ON pr.query_id = e.query_id AND pr.neighbor_id = e.neighbor_id
),
probes(n_probe) AS (VALUES {probe_values}),
recall AS (
  SELECT p.n_probe,
         CAST(count(DISTINCT r.query_id) AS BIGINT) AS n_queries,
         CAST(count(*) AS BIGINT) AS n_exact,
         CAST(sum(CASE WHEN r.prank <= p.n_probe THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM reach r CROSS JOIN probes p
  GROUP BY p.n_probe
),
scanned AS (
  SELECT p.n_probe,
         CAST(sum(s.csize) - count(DISTINCT pp.query_id) AS BIGINT)
           AS scanned_rows,
         CAST(count(DISTINCT pp.query_id) AS BIGINT) AS nq
  FROM ppr pp JOIN csizes s USING (list_id)
  CROSS JOIN probes p
  WHERE pp.prank <= p.n_probe
  GROUP BY p.n_probe
)
SELECT CAST(r.n_probe AS BIGINT) AS n_probe, r.n_queries, r.n_exact,
       r.n_hits,
       CAST(1000000 * r.n_hits // r.n_exact AS BIGINT) AS recall_ppm,
       s.scanned_rows,
       CAST(1000000 * s.scanned_rows
            // (s.nq * ((SELECT count(*) FROM valid) - 1)) AS BIGINT)
         AS scan_frac_ppm
FROM recall r JOIN scanned s USING (n_probe)
"""


_IVF_NPROBE_SWEEP_SQL = _ivf_nprobe_sweep_sql()

REGISTRY.update({
    "ivf_nprobe_sweep": QuerySpec(
        _ivf_nprobe_sweep, _IVF_NPROBE_SWEEP_SQL,
        "IVF operating-point sweep (the n_probe tuning table): exact "
        "recall@k vs brute-force ground truth AND corpus scan "
        "fraction for n_probe in {1,2,4,8}, all from ONE index pass "
        "— the sorted cell ranking is computed once, a neighbor "
        "reached at probe rank r serves every n_probe >= r, and scan "
        "cost reads the broadcast n_lists-row cell-size table; "
        "ground truth is the ann_recall_eval broadcast-panel shape",
    ),
})

# ------------------------------------------------------------------
# Round 10 (post-window): weekly seasonality profile
# ------------------------------------------------------------------


def _events_seasonality_profile(spark, sf_dir):
    return events.seasonality_profile(_t(spark, sf_dir, "events"))


_SEASONALITY_SQL = r"""
WITH hourly AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) // 3600000000 AS BIGINT)
           AS hour_epoch,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
keyed AS (
  SELECT event_type, n,
         CAST((hour_epoch // 24 + 4) % 7 AS BIGINT) AS dow,
         CAST(hour_epoch % 24 AS BIGINT) AS hod
  FROM hourly
),
cells AS (
  SELECT event_type, dow, hod,
         CAST(count(*) AS BIGINT) AS cell_hours,
         CAST(sum(n) AS BIGINT) AS cell_total
  FROM keyed GROUP BY 1, 2, 3
),
overall AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS hours_overall,
         CAST(sum(n) AS BIGINT) AS total_overall
  FROM keyed GROUP BY 1
),
outliers AS (
  SELECT k.event_type, k.dow, k.hod,
         CAST(sum(CASE WHEN k.n * c.cell_hours > 2 * c.cell_total
                         OR 2 * k.n * c.cell_hours < c.cell_total
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_hours
  FROM keyed k
  JOIN cells c USING (event_type, dow, hod)
  GROUP BY 1, 2, 3
)
SELECT c.event_type, c.dow, c.hod, c.cell_hours, c.cell_total,
       CAST((CAST(1000000 AS HUGEINT) * c.cell_total * o.hours_overall)
            // (CAST(c.cell_hours AS HUGEINT) * o.total_overall)
         AS BIGINT) AS seasonal_ppm,
       u.n_outlier_hours
FROM cells c
JOIN overall o USING (event_type)
JOIN outliers u USING (event_type, dow, hod)
"""

REGISTRY.update({
    "events_seasonality_profile": QuerySpec(
        _events_seasonality_profile, _SEASONALITY_SQL,
        "weekly (dow x hod) seasonal-index table per event type with "
        "residual-outlier counts (STL-lite): one corpus shuffle to "
        "the hourly rollup, then metadata-scale 168-cell aggregates, "
        "a broadcast per-type overall, and one uniform-key join for "
        "the 2x-deviation outlier flags; pure epoch arithmetic for "
        "dow/hod (no session-timezone date functions), one floor at "
        "the end in DECIMAL",
    ),
})


def _stream_seasonality_profile(spark, sf_dir):
    return stream_ops.run_seasonality_profile_stream(spark, sf_dir)


REGISTRY.update({
    "stream_seasonality_profile": QuerySpec(
        _stream_seasonality_profile, _SEASONALITY_SQL,
        "streaming twin #21 (accumulated-rollup idiom): per-batch "
        "idempotent batch=<id> (type, hour_epoch) partials + the "
        "batch operator's own cell/outlier logic over the re-summed "
        "rollup — the per-type overall mean re-prices all 168 cells "
        "on any new hour, a cross-key read no keyed state serves; "
        "one availableNow drain provably equals the batch profile",
    ),
})

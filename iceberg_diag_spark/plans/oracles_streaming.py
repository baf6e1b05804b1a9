"""Structured Streaming twins (events drained as a file stream).

Split from plans/registry.py (pure move; see registry.py for the
cross-engine determinism rules every oracle follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from iceberg_diag_spark.operators import (
    dedup,
    events,
    profiling,
    sampling,
    shuffling,
    packing,
    similarity,
    textops,
)
from iceberg_diag_spark.streaming import stream_ops
from iceberg_diag_spark.plans.common import _t
from iceberg_diag_spark.plans.oracles_tpch import _rev_cents
from iceberg_diag_spark.plans.oracles_dedup import (
    _MINHASH_PRS_CTE,
    _NEAR_DUP_CLUSTERS_SQL,
)


# Structured Streaming (events as a file stream, drained with
# availableNow → memory sink; over the complete finite input the
# result equals the batch query, so DuckDB oracles apply)
# --------------------------------------------------------------------

def _stream_tumbling(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.tumbling_counts(ev), "complete", "stream_tumbling"
    )


_STREAM_TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(count(*) AS BIGINT) AS event_count,
       CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY window_start, event_type
"""


def _stream_sliding(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.sliding_counts(ev), "complete", "stream_sliding"
    )


# every event belongs to exactly 2 sliding windows (1h size / 30m
# slide): the ones starting at floor(ts, 30m) and floor(ts, 30m)-30m
_STREAM_SLIDING_SQL = """
WITH starts AS (
  SELECT event_type,
         unnest([make_timestamp(epoch_us(ts) // 1800000000 * 1800000000),
                 make_timestamp(epoch_us(ts) // 1800000000 * 1800000000
                                - 1800000000)]) AS ws
  FROM events
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS event_count
FROM starts
GROUP BY ws, event_type
"""


def _stream_sessions(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.session_windows(ev), "complete", "stream_sessions"
    )


_STREAM_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(is_start) OVER (PARTITION BY user_id
                             ORDER BY epoch_us(ts), event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_last_ts,
       CAST(count(*) AS BIGINT) AS event_count
FROM sess
GROUP BY user_id, session_seq
"""


def _stream_dedup(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.dedup_keys_stream(ev), "append", "stream_dedup"
    )


_STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type FROM events
"""


def _stream_stream_join(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.stream_click_purchase_join(ev), "append", "stream_join"
    )


def _stream_user_stats(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.user_running_stats(ev), "update", "stream_user_stats"
    )


def _stream_static_join(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return stream_ops.run_to_table(
        stream_ops.stream_static_enriched_counts(ev, dim),
        "complete",
        "stream_static",
    )


_STREAM_STATIC_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(c_nationkey AS INTEGER) AS nationkey,
       CAST(count(*) AS BIGINT) AS event_count,
       CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events JOIN customer ON user_id = c_custkey
GROUP BY window_start, nationkey
"""


def _stream_distinct_users(spark, sf_dir):
    ev = stream_ops.read_events_stream(spark, sf_dir)
    return stream_ops.run_to_table(
        stream_ops.distinct_users_per_window(ev),
        "complete",
        "stream_distinct",
    )


_STREAM_DISTINCT_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users
FROM events
GROUP BY window_start
"""


def _events_salted_rollup(spark, sf_dir):
    """Two-stage salted aggregation (functions/skew.py) over the
    power-law event_type key: results are identical to a plain
    groupBy — the oracle proves the salt/merge decomposition exact —
    while the shuffle fans a hot key across 16 subkeys."""
    from iceberg_diag_spark.functions.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    return salted_agg(
        ev,
        ["event_type"],
        {
            "event_count": ("sum", F.count("*")),
            "value_cents": (
                "sum",
                F.sum(F.floor(F.col("value") * 100).cast("long")),
            ),
            "max_value_cents": (
                "max",
                F.max(F.floor(F.col("value") * 100).cast("long")),
            ),
            "min_user_id": ("min", F.min("user_id")),
        },
    )


_EVENTS_SALTED_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS event_count,
       CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(max(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS max_value_cents,
       CAST(min(user_id) AS BIGINT) AS min_user_id
FROM events
GROUP BY event_type
"""


_STREAM_USER_STATS_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS event_count,
       CAST(sum(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
FROM events
GROUP BY user_id
"""


def _doc_hash_sample(spark, sf_dir):
    """Deterministic stratified sample of the corpus: 10% of English
    (the dominant language), 50% of everything else — the
    language-rebalance shape. Membership is a pure md5-bucket filter
    (reference-free, engine-independent, stable under corpus
    growth)."""
    return sampling.stratified_hash_sample(
        _t(spark, sf_dir, "documents"),
        key_col="doc_id",
        rates={"en": 10},
        strata_col="lang",
        default_pct=50,
    ).select("doc_id", "lang", "source")


_DOC_HASH_SAMPLE_SQL = """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
      < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
"""


def _orders_profile(spark, sf_dir):
    """Single-scan schema/data profile of the orders table: null
    counts, distinct cardinalities, and deterministic min/max
    representations for every column."""
    return profiling.profile(
        _t(spark, sf_dir, "orders"),
        {
            "o_orderkey": "int",
            "o_custkey": "int",
            "o_orderstatus": "str",
            "o_totalprice": "num",
            "o_orderdate": "ts",
            "o_orderpriority": "str",
        },
    )


_ORDERS_PROFILE_SQL = """
WITH a AS (
  SELECT count(*) AS n,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS k_nulls,
         count(DISTINCT o_orderkey) AS k_dist,
         CAST(min(o_orderkey) AS VARCHAR) AS k_min,
         CAST(max(o_orderkey) AS VARCHAR) AS k_max,
         sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS c_nulls,
         count(DISTINCT o_custkey) AS c_dist,
         CAST(min(o_custkey) AS VARCHAR) AS c_min,
         CAST(max(o_custkey) AS VARCHAR) AS c_max,
         sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS s_nulls,
         count(DISTINCT o_orderstatus) AS s_dist,
         min(o_orderstatus) AS s_min,
         max(o_orderstatus) AS s_max,
         sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS t_nulls,
         count(DISTINCT o_totalprice) AS t_dist,
         CAST(CAST(FLOOR(min(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS t_min,
         CAST(CAST(FLOOR(max(o_totalprice) * 100) AS BIGINT) AS VARCHAR) AS t_max,
         sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS d_nulls,
         count(DISTINCT o_orderdate) AS d_dist,
         strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS d_min,
         strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS d_max,
         sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS p_nulls,
         count(DISTINCT o_orderpriority) AS p_dist,
         min(o_orderpriority) AS p_min,
         max(o_orderpriority) AS p_max
  FROM orders
)
SELECT 'o_orderkey' AS column_name, CAST(n AS BIGINT) AS n_rows,
       CAST(k_nulls AS BIGINT) AS n_nulls, CAST(k_dist AS BIGINT) AS n_distinct,
       k_min AS min_repr, k_max AS max_repr FROM a
UNION ALL SELECT 'o_custkey', CAST(n AS BIGINT), CAST(c_nulls AS BIGINT),
       CAST(c_dist AS BIGINT), c_min, c_max FROM a
UNION ALL SELECT 'o_orderstatus', CAST(n AS BIGINT), CAST(s_nulls AS BIGINT),
       CAST(s_dist AS BIGINT), s_min, s_max FROM a
UNION ALL SELECT 'o_totalprice', CAST(n AS BIGINT), CAST(t_nulls AS BIGINT),
       CAST(t_dist AS BIGINT), t_min, t_max FROM a
UNION ALL SELECT 'o_orderdate', CAST(n AS BIGINT), CAST(d_nulls AS BIGINT),
       CAST(d_dist AS BIGINT), d_min, d_max FROM a
UNION ALL SELECT 'o_orderpriority', CAST(n AS BIGINT), CAST(p_nulls AS BIGINT),
       CAST(p_dist AS BIGINT), p_min, p_max FROM a
"""


def _doc_token_histogram(spark, sf_dir):
    return textops.token_histogram(_t(spark, sf_dir, "documents"))


_DOC_TOKEN_HIST_SQL = r"""
WITH toks AS (
  SELECT lang,
         len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS n_toks
  FROM documents
)
SELECT lang,
       CASE WHEN n_toks <= 8 THEN '<=8'
            WHEN n_toks <= 16 THEN '<=16'
            WHEN n_toks <= 32 THEN '<=32'
            WHEN n_toks <= 64 THEN '<=64'
            WHEN n_toks <= 128 THEN '<=128'
            WHEN n_toks <= 256 THEN '<=256'
            WHEN n_toks <= 512 THEN '<=512'
            ELSE '513+' END AS bucket,
       CAST(count(*) AS BIGINT) AS doc_count,
       round(avg(n_toks), 4) AS avg_tokens
FROM toks
GROUP BY lang, bucket
"""


def _near_dup_triangles(spark, sf_dir):
    """Triangle count over the MinHash near-dup graph — the cluster-
    density audit (triangles/edges near the clique maximum ⇒ tight
    duplicate clusters, near zero ⇒ chains of borderline pairs)."""
    from iceberg_diag_spark.operators.graph import triangle_count

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    return triangle_count(pairs)


_TRIANGLES_SQL = (
    "WITH "
    + _MINHASH_PRS_CTE.strip()
    + """
SELECT (SELECT CAST(count(*) AS BIGINT) FROM prs) AS edge_count,
       (SELECT CAST(count(*) AS BIGINT)
        FROM prs e1
        JOIN prs e2 ON e1.doc_b = e2.doc_a
        JOIN prs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
         AS triangle_count
"""
)


def _user_interevent_stats(spark, sf_dir):
    return events.interevent_stats(_t(spark, sf_dir, "events"))


_INTEREVENT_SQL = """
WITH g AS (
  SELECT user_id, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS span_us,
       round(avg(gap_us) / 1e6, 6) AS avg_gap_seconds,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM g
GROUP BY user_id
HAVING count(*) >= 2
"""


def _user_retention_cohorts(spark, sf_dir):
    return events.retention_cohorts(_t(spark, sf_dir, "events"))


_RETENTION_SQL = """
WITH ue AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1995-01-02', CAST(ts AS DATE)) // 7 AS BIGINT)
           AS week
  FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM ue GROUP BY user_id)
SELECT cohort_week,
       week - cohort_week AS weeks_since,
       CAST(count(DISTINCT ue.user_id) AS BIGINT) AS active_users
FROM ue JOIN first ON ue.user_id = first.user_id
GROUP BY cohort_week, weeks_since
"""


def _embedding_centroid_stats(spark, sf_dir):
    return similarity.label_centroid_stats(_t(spark, sf_dir, "embeddings"))


_CENTROID_SQL = """
WITH ex AS (
  SELECT label, vec_id,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
per_vec AS (
  SELECT label, vec_id, sqrt(sum(val * val)) AS norm
  FROM ex GROUP BY label, vec_id
),
norms AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         round(avg(norm), 6) AS avg_norm
  FROM per_vec GROUP BY label
),
dims AS (
  SELECT label, pos, avg(val) AS mean_val FROM ex GROUP BY label, pos
),
cent AS (
  SELECT label, round(sqrt(sum(mean_val * mean_val)), 6) AS centroid_norm
  FROM dims GROUP BY label
)
SELECT norms.label, n_vecs, avg_norm, centroid_norm
FROM norms JOIN cent ON norms.label = cent.label
"""


def _doc_chunks(spark, sf_dir):
    return textops.doc_chunks(_t(spark, sf_dir, "documents"), chunk_tokens=64)


_DOC_CHUNKS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
c AS (
  SELECT doc_id, t,
         unnest(generate_series(0, CAST(ceil(len(t) / 64.0) AS INTEGER) - 1)) AS chunk_id
  FROM toks
)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(t[chunk_id * 64 + 1 : chunk_id * 64 + 64]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(t[chunk_id * 64 + 1 : chunk_id * 64 + 64], ' ')) AS chunk_hash
FROM c
"""


def _cluster_representatives(spark, sf_dir):
    """Canonical document per near-dup cluster — the step after
    clustering that actually deduplicates the corpus: keep the
    longest member (ties → smallest id), emit the cluster size so
    downstream can weight or audit. Composition: connected components
    → broadcast-joined doc lengths → per-cluster argmax window."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs).select("doc_a", "doc_b")
    cc = dedup.connected_components(docs.select("doc_id"), pairs)
    member = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
    # Struct-max argmax instead of a row_number window: (n_chars,
    # -doc_id) max picks the longest member with smallest-id
    # tie-break — identical to the old DESC/ASC window rank-1 row —
    # but the aggregate partial-combines map-side, where the window
    # shuffled AND sorted every member row per cluster (guide §2.3).
    best = F.max(
        F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("__negid"))
    )
    return member.groupBy("cluster_id").agg(
        (-best.getField("__negid")).cast("long").alias("rep_doc_id"),
        F.count(F.lit(1)).alias("cluster_size"),
        best.getField("n_chars").cast("long").alias("rep_n_chars"),
    )


# clusters chain (same as _NEAR_DUP_CLUSTERS_SQL) + representative
# selection via the identical (n_chars DESC, doc_id ASC) window.
_CLUSTER_REPS_SQL = _NEAR_DUP_CLUSTERS_SQL.replace(
    "SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id\nFROM reach GROUP BY node",
    """, cc AS (
  SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
  FROM reach GROUP BY node
),
member AS (
  SELECT cc.cluster_id, cc.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY cc.cluster_id
                            ORDER BY d.n_chars DESC, cc.doc_id ASC) AS rn
  FROM cc JOIN documents d ON cc.doc_id = d.doc_id
)
SELECT cluster_id,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS cluster_size,
       CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS rep_n_chars
FROM member GROUP BY cluster_id""",
)


def _part_name_fuzzy(spark, sf_dir):
    return textops.fuzzy_name_pairs(
        _t(spark, sf_dir, "part"), "p_name", max_distance=3, prefix_len=2
    )


_PART_FUZZY_SQL = """
WITH names AS (SELECT DISTINCT p_name AS name FROM part)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INTEGER) AS distance
FROM names a
JOIN names b ON substring(a.name, 1, 2) = substring(b.name, 1, 2)
            AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= 3
"""


def _doc_length_deciles(spark, sf_dir):
    return textops.length_deciles(_t(spark, sf_dir, "documents"))


_DOC_DECILES_SQL = """
WITH qs AS (
  SELECT [quantile_cont(n_chars, 0.1), quantile_cont(n_chars, 0.2),
          quantile_cont(n_chars, 0.3), quantile_cont(n_chars, 0.4),
          quantile_cont(n_chars, 0.5), quantile_cont(n_chars, 0.6),
          quantile_cont(n_chars, 0.7), quantile_cont(n_chars, 0.8),
          quantile_cont(n_chars, 0.9)] AS q
  FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(1 + (CASE WHEN n_chars > q[1] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[2] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[3] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[4] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[5] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[6] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[7] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[8] THEN 1 ELSE 0 END)
              + (CASE WHEN n_chars > q[9] THEN 1 ELSE 0 END) AS BIGINT)
         AS decile
FROM documents CROSS JOIN qs
"""


def _doc_decontamination(spark, sf_dir):
    """Eval set = the deterministic doc_id % 10 == 0 slice; training
    side is the rest. Contamination = any shared 8-gram."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    return textops.ngram_decontaminate(train, ev, n=8)


_DOC_DECONTAM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, md5(array_to_string(t[i : i + 7], ' ')) AS g
  FROM toks, unnest(generate_series(1, len(t) - 7)) AS u(i)
),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS shared_ngrams
FROM grams gr JOIN eval_grams e ON gr.g = e.g
WHERE gr.doc_id % 10 <> 0
GROUP BY gr.doc_id
"""


def _epoch_shuffle(spark, sf_dir):
    return shuffling.epoch_shuffle(
        _t(spark, sf_dir, "documents"), seed="epoch-0"
    )


# The operator's (shard, key, id) total order equals plain (key, id)
# order — the shard is the key's first character, so the oracle is a
# single window. The Spark side still executes it as 16 parallel
# shards + broadcast offsets; only the *contract* collapses.
_EPOCH_SHUFFLE_SQL = """
WITH keyed AS (
  SELECT doc_id, md5('epoch-0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
         AS shuffle_pos
FROM keyed
"""


def _q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: no partsupp in the driver schema —
    a supplier's cost for a part is its minimum observed
    l_extendedprice): for each small LARGE-type part, the EUROPE
    supplier(s) offering it cheapest. The spec's correlated
    min-subquery is expressed as a window min over the part key —
    one shuffle, no self-rejoin. Dims are broadcast; the min is
    taken over per-row integer cents (floor is monotone, so
    min∘floor ≡ floor∘min)."""
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    costs = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * 100).cast("long")
            ).alias("cost_cents")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("__min", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("__min"))
        .select(
            F.floor(F.col("s_acctbal") * 100).cast("long").alias("s_acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "cost_cents",
        )
    )


_Q2_SQL = """
WITH europe_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
costs AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         min(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS cost_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_size <= 15 AND p_type = 'LARGE'
  JOIN europe_supp ON l_suppkey = s_suppkey
  GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name
),
ranked AS (
  SELECT *, min(cost_cents) OVER (PARTITION BY p_partkey) AS min_cost
  FROM costs
)
SELECT CAST(FLOOR(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
       s_name, n_name, p_partkey, cost_cents
FROM ranked WHERE cost_cents = min_cost
"""


def _q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (adapted: lineitem revenue through EUROPE
    suppliers stands in for partsupp stock value): parts whose
    supplied value exceeds 1.5× the mean per-part value. The spec's
    scale-dependent HAVING fraction is replaced by a self-normalizing
    integer cross-multiply (value · 2 · n_parts > 3 · total), exact
    in both engines at bench scales; at extreme corpus sizes the
    compare would move to double/decimal to stay in range."""
    supp_eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vals = (
        li.join(F.broadcast(supp_eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev_cents()).alias("value_cents"))
    )
    tot = vals.agg(
        F.sum("value_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        vals.crossJoin(F.broadcast(tot))
        .filter(
            F.col("value_cents") * 2 * F.col("n_parts")
            > 3 * F.col("total_cents")
        )
        .select("l_partkey", "value_cents")
    )


_Q11_SQL = """
WITH vals AS (
  SELECT l_partkey,
         CAST(sum(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
),
tot AS (SELECT sum(value_cents) AS total_cents, count(*) AS n_parts FROM vals)
SELECT l_partkey, value_cents
FROM vals, tot
WHERE value_cents * 2 * n_parts > 3 * total_cents
"""


def _q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape (adapted: distinct suppliers observed in
    lineitem stand in for partsupp; negative-balance suppliers stand
    in for the spec's complaint-comment exclusion): distinct-supplier
    count per (brand, type, size) for selected part families,
    excluding flagged suppliers by anti-join."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def _q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape (adapted: no ps_availqty — a supplier
    qualifies when it shipped the majority of a gear part's 1997
    volume): AMERICA suppliers dominating at least one part. The
    spec's nested quantity subquery is a window sum over the part
    key; quantities sum as integers so the majority compare is
    exact cross-engine."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = shipped.withColumn(
        "qty_total", F.sum("qty").over(w)
    ).filter(F.col("qty") * 2 > F.col("qty_total"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        dominant.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select("s_suppkey", "s_name")
        .distinct()
    )


_Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (SELECT l_partkey, sum(qty) AS qty_total FROM shipped GROUP BY l_partkey)
SELECT DISTINCT s.s_suppkey, s.s_name
FROM shipped sh
JOIN tot t ON sh.l_partkey = t.l_partkey
JOIN supplier s ON sh.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA' AND sh.qty * 2 > t.qty_total
"""


def _doc_pack_sequences(spark, sf_dir):
    return packing.pack_sequences(
        _t(spark, sf_dir, "documents"), capacity_tokens=256, n_shards=4
    )


# Fit-before-append packing as a boundary recursion (same family as
# the binpack oracle): a sequence starting at row srn with
# base = P(srn-1) ends just BEFORE the first row e where
# P(e) - base > 256 (that doc starts the next sequence), except when
# e == srn — a doc alone over capacity keeps its own sequence.
# Recursion depth = max sequences per (source, shard), not rows.
_DOC_PACK_SQL = r"""
WITH RECURSIVE data AS (
  SELECT source, doc_id % 4 AS shard, doc_id,
         len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS sz
  FROM documents
),
pre AS (
  SELECT source, shard, sz,
         row_number() OVER (PARTITION BY source, shard ORDER BY doc_id) AS rn,
         sum(sz) OVER (PARTITION BY source, shard ORDER BY doc_id) AS ps
  FROM data
),
bounds AS (
  SELECT source, shard, 0 AS gid, CAST(1 AS BIGINT) AS srn,
         CAST(0 AS HUGEINT) AS base
  FROM (SELECT DISTINCT source, shard FROM data)
  UNION ALL
  SELECT q.source, q.shard, q.gid + 1,
         CASE WHEN q.ern = q.srn THEN q.ern + 1 ELSE q.ern END,
         CASE WHEN q.ern = q.srn THEN q.eps ELSE q.pps END
  FROM (
    SELECT b.source, b.shard, b.gid, b.srn,
           min(p.rn) AS ern, min(p.ps) AS eps,
           arg_min(p.ps - p.sz, p.rn) AS pps
    FROM bounds b
    JOIN pre p ON p.source = b.source AND p.shard = b.shard
              AND p.rn >= b.srn
              AND p.ps - b.base > 256
    GROUP BY b.source, b.shard, b.gid, b.srn
  ) q
),
tot AS (
  SELECT source, shard, max(rn) AS mx, max(ps) AS total
  FROM pre GROUP BY source, shard
),
grp AS (
  SELECT b.source, b.shard, b.gid,
         coalesce(lead(b.srn) OVER w, t.mx + 1) - b.srn AS cnt,
         coalesce(lead(b.base) OVER w, t.total) - b.base AS toks
  FROM bounds b
  JOIN tot t ON t.source = b.source AND t.shard = b.shard
            AND b.srn <= t.mx
  WINDOW w AS (PARTITION BY b.source, b.shard ORDER BY b.gid)
)
SELECT source, CAST(shard AS BIGINT) AS shard, CAST(gid AS BIGINT) AS seq_id,
       CAST(cnt AS BIGINT) AS doc_count, CAST(toks AS BIGINT) AS seq_tokens,
       toks > 256 AS truncated
FROM grp
"""


def _boilerplate_removal(spark, sf_dir):
    """Boilerplate pass over documents carrying a per-source footer
    sentence — the synthetic corpus has no natural repeated
    sentences, so the footer (shared by every doc of a source) gives
    the threshold real positives while the body sentence stays
    unique per doc."""
    docs = _t(spark, sf_dir, "documents")
    with_footer = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(". subscribe to "),
            F.col("source"),
            F.lit(" newsletter today"),
        ),
    )
    return textops.boilerplate_removal(with_footer, min_docs=5)


_BOILERPLATE_SQL = r"""
WITH base AS (
  SELECT doc_id,
         text || '. subscribe to ' || source || ' newsletter today' AS t
  FROM documents
),
arrs AS (
  SELECT doc_id, regexp_split_to_array(t, '\. ') AS arr FROM base
),
s AS (
  SELECT doc_id, unnest(generate_series(1, len(arr))) AS pos, arr FROM arrs
),
h AS (
  SELECT doc_id, pos, arr[pos] AS sent,
         md5(lower(trim(arr[pos]))) AS hh
  FROM s
),
boiler AS (
  SELECT hh FROM h GROUP BY hh HAVING count(DISTINCT doc_id) >= 5
),
marked AS (
  SELECT x.doc_id, x.pos, x.sent, b.hh IS NOT NULL AS is_b
  FROM h x LEFT JOIN boiler b ON x.hh = b.hh
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(count(*) - sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       md5(coalesce(
         string_agg(CASE WHEN NOT is_b THEN sent END, '. ' ORDER BY pos),
         '')) AS cleaned_md5
FROM marked GROUP BY doc_id
"""


def _pii_redaction(spark, sf_dir):
    """PII pass over documents carrying a deterministic contact
    footer derived from doc_id — the corpus's own text has no PII by
    construction, so the footer gives the patterns real positives
    while staying exactly reproducible in the oracle."""
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
    return textops.pii_redaction(
        docs.withColumn("text", footer)
    )


_PII_REDACTION_SQL = r"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com ssn '
              || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
              || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ph 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
),
counted AS (
  SELECT doc_id, t,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b')) AS n_ssns,
         len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS n_phones,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
           '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS red
  FROM pii
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(n_ssns AS BIGINT) AS n_ssns,
       CAST(n_phones AS BIGINT) AS n_phones,
       CAST(n_emails + n_ssns + n_phones AS BIGINT) AS pii_total,
       md5(red) AS redacted_md5,
       CAST(length(red) AS BIGINT) AS redacted_len
FROM counted
"""



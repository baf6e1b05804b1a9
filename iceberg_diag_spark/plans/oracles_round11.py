"""Round-11 registry entries: the classifier-training loop closure,
the IVF index-build sink (advisor-executing pattern #6), and the
incremental-release streaming twin.

Oracle style follows the round-9/10 family modules: chained CTEs
mirroring each unrolled Spark stage (the near_dup_pagerank shape),
HUGEINT sums where Spark uses DECIMAL(38,0), sign-aware // via the
CASE idiom wherever a numerator can go negative (Spark DIV truncates,
DuckDB // floors).
"""

from __future__ import annotations

from iceberg_diag_spark.operators import similarity, textops
from iceberg_diag_spark.plans.common import QuerySpec, REGISTRY, _t
from iceberg_diag_spark.plans.oracles_dedup import _lang_list_sql
from iceberg_diag_spark.plans.oracles_round6 import _IVF_TOPK_EXACT_SQL
from iceberg_diag_spark.plans.oracles_round8 import _RELEASE_MANIFEST_SQL
from iceberg_diag_spark.plans.oracles_round9 import (
    _uni_seg_block,
    _unigram_chain,
)
from iceberg_diag_spark.streaming import stream_ops


def _classifier_train_lr(spark, sf_dir):
    return textops.classifier_train_lr(_t(spark, sf_dir, "documents"))


def _sdiv(num: str, den: str) -> str:
    """Truncating division in DuckDB matching Spark's DIV: // floors,
    so negate-divide-negate for negative numerators."""
    return (
        f"(CASE WHEN {num} < 0 THEN -((-({num})) // ({den}))"
        f" ELSE ({num}) // ({den}) END)"
    )


def _train_lr_sql(
    k_steps: int = 12,
    lr_ppm: int = 2_000_000,
    carry: bool = False,
    final: str | None = None,
) -> str:
    """Generate the k-step unrolled GD chain: feats → integer moments
    → standardized features → w0..wk CTEs (gradient aggregate + weight
    update per step) → trajectory union. Mirrors
    textops.classifier_train_lr stage for stage.

    `carry=True` rides (source, kh) — the source label and the
    HAND-SET classifier's keep decision (the proven-green
    quality_classifier_score z expression, oracles_round5) — through
    the f/feats/raw/feat CTEs, and `final` replaces the trajectory
    union with a custom SELECT over (feat, w{k}):
    classifier_apply_trained chains the trained step-k weights into
    a per-source scoring aggregate. Defaults emit the byte-identical
    classifier_train_lr oracle (mirroring textops._lr_feature_rows /
    _lr_standardized's carry parameter)."""
    xs = [f"x{j}" for j in range(1, 6)]
    fcols = ["x0"] + [f"sx{j}" for j in range(1, 6)]
    wcols = [f"w{j}" for j in range(6)]

    c_f = ", source" if carry else ""
    c_feats = ",\n         source" if carry else ""
    # the hand-set keep rule, expression-identical to the r5
    # quality_classifier_score oracle (same left-to-right IEEE sum)
    c_raw = (
        ",\n         source,\n"
        "         (-2.3 + (-0.05) * mtl + 1.2 * ttr + 4.0 * sw"
        " + 2.5 * alpha\n"
        "          + (-3.0) * (CAST(len(tri) - len(list_distinct(tri))"
        " AS DOUBLE)\n"
        "                      / greatest(len(tri), 1))) >= 0 AS kh"
        if carry
        else ""
    )

    feats = r"""
WITH f AS (
  SELECT string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS toks,
         text{c_f}
  FROM documents
),
feats AS (
  SELECT CAST(length(text) AS DOUBLE) / greatest(len(toks), 1) AS mtl,
         CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) AS ttr,
         CAST(len(list_intersect(toks, {en})) AS DOUBLE)
           / greatest(len(toks), 1) AS sw,
         CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE)
           / greatest(length(text), 1) AS alpha,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i : i + 2], ' '))
         ELSE [] END AS tri,
         greatest(
           len(list_intersect(toks, {de})),
           len(list_intersect(toks, {en})),
           len(list_intersect(toks, {es})),
           len(list_intersect(toks, {fr}))) AS lang_hits{c_feats}
  FROM f
),
raw AS MATERIALIZED (
  SELECT CAST(FLOOR(mtl * 1000000) AS BIGINT) AS x1,
         CAST(FLOOR(ttr * 1000000) AS BIGINT) AS x2,
         CAST(FLOOR(sw * 1000000) AS BIGINT) AS x3,
         CAST(FLOOR(alpha * 1000000) AS BIGINT) AS x4,
         CAST(FLOOR((CAST(len(tri) - len(list_distinct(tri)) AS DOUBLE)
                     / greatest(len(tri), 1)) * 1000000) AS BIGINT) AS x5,
         CAST(ttr >= 0.4 AND alpha >= 0.6 AND lang_hits > 0 AS BIGINT) AS y{c_raw}
  FROM feats
)""".format(
        de=_lang_list_sql("de"),
        en=_lang_list_sql("en"),
        es=_lang_list_sql("es"),
        fr=_lang_list_sql("fr"),
        c_f=c_f,
        c_feats=c_feats,
        c_raw=c_raw,
    )

    mus = ",\n         ".join(
        f"CAST(sum(CAST({x} AS HUGEINT)) // count(*) AS HUGEINT) AS mu_{x}"
        for x in xs
    )
    sigs = ",\n         ".join(
        f"greatest(CAST(1 AS HUGEINT), CAST(FLOOR(SQRT(CAST("
        f"(count(*) * sum(CAST({x} AS HUGEINT) * {x})"
        f" - sum(CAST({x} AS HUGEINT)) * sum(CAST({x} AS HUGEINT)))"
        f" // (CAST(count(*) AS HUGEINT) * count(*)) AS DOUBLE)))"
        f" AS HUGEINT)) AS sig_{x}"
        for x in xs
    )
    stats = f""",
stats AS (
  SELECT {mus},
         {sigs}
  FROM raw
)"""

    sxs = ",\n         ".join(
        _sdiv(f"(CAST({x} AS HUGEINT) - mu_{x}) * 1000000", f"sig_{x}")
        + f" AS sx{j}"
        for j, x in enumerate(xs, start=1)
    )
    c_feat = ", source, kh" if carry else ""
    feat = f""",
feat AS MATERIALIZED (
  SELECT CAST(1000000 AS HUGEINT) AS x0,
         {sxs},
         y{c_feat}
  FROM raw, stats
)"""

    w0 = """,
w0 AS MATERIALIZED (
  SELECT """ + ", ".join(
        f"CAST(0 AS HUGEINT) AS w{j}" for j in range(6)
    ) + """
)"""

    steps = []
    zsum = " + ".join(f"{w_} * {x_}" for w_, x_ in zip(wcols, fcols))
    p_expr = (
        f"CAST(FLOOR(1000000.0 / (1.0 + EXP(-(CAST("
        f"{_sdiv(f'({zsum})', '1000000')}"
        f" AS DOUBLE) / 1000000.0)))) AS HUGEINT)"
    )
    for t in range(1, k_steps + 1):
        gsums = ",\n         ".join(
            f"sum((p - 1000000 * y) * {x}) AS g{j}"
            for j, x in enumerate(fcols)
        )
        updates = ",\n         ".join(
            f"CAST(w{j} - "
            + _sdiv(
                f"g{j} * {lr_ppm}", "CAST(n AS HUGEINT) * 1000000000000"
            )
            + f" AS HUGEINT) AS w{j}"
            for j in range(6)
        )
        steps.append(f""",
g{t} AS (
  SELECT count(*) AS n,
         {gsums}
  FROM (SELECT {p_expr} AS p, y, {', '.join(fcols)} FROM feat, w{t-1})
),
w{t} AS MATERIALIZED (
  SELECT {updates}
  FROM w{t-1}, g{t}
)""")

    names = list(textops.LR_WEIGHT_COLS)
    selects = []
    for t in range(k_steps + 1):
        cols = ", ".join(
            f"CAST(w{j} AS BIGINT) AS {name}"
            for j, name in enumerate(names)
        )
        selects.append(
            f"SELECT CAST({t} AS BIGINT) AS step, {cols} FROM w{t}"
        )
    union = "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY step"
    if final is not None:
        union = "\n" + final
    return feats + stats + feat + w0 + "".join(steps) + union


_TRAIN_LR_SQL = _train_lr_sql()


def _ivf_build_index(spark, sf_dir):
    # the EXECUTING entry: writes the cell-partitioned quantized index
    # to a fresh temp dir and returns the manifest recomputed FROM THE
    # WRITTEN FILES — the oracle computes the same manifest from the
    # embeddings table directly, so a hash match vouches for the whole
    # write/read round-trip (the corpus_release discipline)
    return similarity.ivf_build_index(_t(spark, sf_dir, "embeddings"))


def _ivf_build_index_sql() -> str:
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
assigned AS (
  SELECT vec_id, c AS list_id FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM dists) WHERE rn = 1
),
norms AS (SELECT vec_id, sum(q * q) AS n2 FROM ex GROUP BY vec_id)
SELECT CAST(a.list_id AS BIGINT) AS list_id,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(n.n2) AS BIGINT) AS norm_sum,
       bit_xor(('0x' || substring(md5(CAST(a.vec_id AS VARCHAR)), 1, 15))::BIGINT)
         AS members_xor,
       bit_xor(('0x' || substring(md5('m2|' || CAST(a.vec_id AS VARCHAR)), 1, 15))::BIGINT)
         AS members_xor2
FROM assigned a JOIN norms n USING (vec_id)
GROUP BY a.list_id
"""


_IVF_BUILD_INDEX_SQL = _ivf_build_index_sql()


def _ivf_probe_topk(spark, sf_dir):
    # consumer-side closure of pattern #6, driver-scored: build the
    # index into a fresh temp dir, then answer every vector's kNN
    # query FROM THE WRITTEN FILES at ivf_topk_exact's operating
    # point (k=5, n_probe=4, n_lists=16). The oracle is
    # _IVF_TOPK_EXACT_SQL — the direct computation from the
    # embeddings table — so a hash match proves the written
    # list_id=K layout round-trips losslessly AND the probe path
    # (query quantization, cell ranking, candidate pruning, exact
    # integer cosine, tie order) reproduces the exact operator bit
    # for bit on real data, not just the pytest fixture.
    import tempfile

    import shutil

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="ivf_probe_topk_")
    try:
        similarity.ivf_build_index(emb, path=path)  # write is eager
        out = similarity.ivf_probe_index(spark, path, emb).localCheckpoint(
            eager=True
        )
    finally:
        # k rows per vector — checkpoint-then-rmtree keeps /tmp clean
        # across repeated driver/bench runs (the build's path=None
        # discipline; the written-files evidence has already been
        # read), and the finally keeps a failed build/probe from
        # leaking the temp dir
        shutil.rmtree(path, ignore_errors=True)
    return out


def _unigram_lm_encode(spark, sf_dir):
    return textops.unigram_lm_encode(_t(spark, sf_dir, "documents"))


def _unigram_encode_sql(k_em: int = 2, max_word_len: int = 24) -> str:
    """Trainer chain through score{k_em}, one more shared seg block
    (the encoder's segmentation under the FINAL scores), then the
    per-source occurrence join + fertility aggregate. Word filter
    identical to training on both sides (stated domain contract)."""
    return (
        _unigram_chain(k_em=k_em, max_word_len=max_word_len)
        + ",\n"
        + _uni_seg_block(k_em)
        + rf""",
src_w AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT source,
           unnest(string_split(regexp_replace(lower(trim(text)),
                                              '\s+', ' ', 'g'),
                  ' ')) AS w
    FROM documents
  ) t(source, w)
  WHERE w <> '' AND length(w) <= {max_word_len}
  GROUP BY source, w
),
wp AS (
  SELECT w, CAST(len(pieces) AS BIGINT) AS np
  FROM bt{k_em} WHERE pos = 0
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(sum(c * np) AS BIGINT) AS n_pieces,
       CAST(sum(c * length(w)) AS BIGINT) AS n_chars,
       CAST(1000000 * sum(c * np) // sum(c) AS BIGINT) AS fertility_ppm,
       CAST(1000000 * sum(c * length(w)) // sum(c * np) AS BIGINT)
         AS chars_per_piece_ppm
FROM src_w JOIN wp USING (w)
GROUP BY source
"""
    )


_UNIGRAM_ENCODE_SQL = _unigram_encode_sql()


REGISTRY.update({
    "classifier_train_lr": QuerySpec(
        _classifier_train_lr, _TRAIN_LR_SQL,
        "logistic-regression training of the quality keep/drop "
        "classifier against the curation gate (closes the score/"
        "evaluate/train loop): 12 unrolled full-batch GD steps over "
        "the standardized 6-feature integer vector — one corpus scan "
        "into a checkpointed 6-column projection, a 1-row integer-"
        "moments broadcast, then k map-side gradient aggregates with "
        "the 1-row weight state broadcast (zero driver round-trips); "
        "weights stay micro-integers so the whole trajectory is "
        "oracle-able as k chained CTEs",
    ),
    "ivf_build_index": QuerySpec(
        _ivf_build_index, _IVF_BUILD_INDEX_SQL,
        "advisor-EXECUTING pattern #6: builds the IVF index "
        "ivf_nprobe_sweep's operating point assumes — writes the "
        "cell-partitioned quantized index as prunable list_id=K "
        "parquet (one hash repartition, byte-stable re-builds) and "
        "returns the per-cell manifest (occupancy, norm payload "
        "checksum, salted O(1)-state bit_xor membership digests) "
        "recomputed FROM THE WRITTEN FILES; the oracle derives the "
        "same manifest from the table directly, so a hash match "
        "vouches for the whole write/read round-trip; "
        "ivf_probe_index consumes the written index and reproduces "
        "ivf_topk_exact bit for bit (pytest-pinned)",
    ),
    "stream_corpus_release": QuerySpec(
        lambda spark, sf_dir: stream_ops.run_corpus_release_stream(
            spark, sf_dir
        ),
        _RELEASE_MANIFEST_SQL,
        "streaming twin #22 — INCREMENTAL corpus release: each "
        "micro-batch's funnel survivors land via the batch sink "
        "(release_assignments + write_assigned_shards) under an "
        "idempotent batch=<id> overwrite (replayed batches can't "
        "duplicate); manifest re-derived from the accumulated "
        "written files; dedup/holdout/packing scoped per increment "
        "(documented delta — cross-increment dups are the "
        "reconciliation job's, incremental_exact_dedup_stream gates "
        "them at ingest); one availableNow drain equals the batch "
        "corpus_release_manifest, so the shared oracle applies",
    ),
    "unigram_lm_encode": QuerySpec(
        _unigram_lm_encode, _UNIGRAM_ENCODE_SQL,
        "trainer-EXECUTING pattern #7 — closes the tokenizer loop: "
        "encodes the corpus with the unigram-LM vocabulary the "
        "trainer just learned and reports the per-source dataloader "
        "view (word/piece/char mass, fertility, chars-per-piece); "
        "trainer core runs once, ONE extra shared-core Viterbi pass "
        "under the final scores, then a vocabulary-scale hash join "
        "of (source, word) occurrence counts — never a per-token "
        "join; same word-domain filter as training on both engines",
    ),
    "ivf_probe_topk": QuerySpec(
        _ivf_probe_topk, _IVF_TOPK_EXACT_SQL,
        "consumer-side closure of advisor-executing pattern #6, "
        "driver-scored: ivf_build_index writes the cell-partitioned "
        "quantized index to a temp dir, ivf_probe_index answers "
        "every vector's kNN from the WRITTEN list_id=K files at "
        "ivf_topk_exact's operating point (k=5, n_probe=4) — the "
        "oracle is ivf_topk_exact's own SQL computed directly from "
        "the embeddings table, so a hash-green row proves the "
        "written index round-trips losslessly and the probe path "
        "reproduces the direct exact computation bit for bit; a "
        "probe of p cells reads p directories (partition pruning), "
        "never the corpus",
    ),
})

"""Deduplication operators over document corpora.

Scale posture (100 TB): every variant reduces to hash → shuffle on the
hash → per-bucket work, which is the canonical scalable shape: the
shuffle key is uniformly distributed (cryptographic / minhash values),
so no salting is needed; map-side combine collapses duplicates early.
No driver-side state anywhere.

Operators:
- exact_dedup_groups / exact_dedup: content-hash exact dedup (sha256
  of normalized text).
- minhash_signatures / minhash_candidate_pairs: MinHash + LSH banding
  near-dup. Hashes are md5-hex (computable identically in any SQL
  engine → DuckDB-oracle checkable, unlike engine-private hash fns).
- simhash64: 64-bit SimHash over word unigrams via bit-vote
  aggregation, plus hamming-distance candidate pairing.
- ngram_jaccard_pairs: exact n-gram Jaccard similarity for candidate
  verification.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def normalized_text(col: Column) -> Column:
    """Canonical text form shared by all dedup ops: lowercase, trim,
    collapse whitespace runs."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical (normalized) texts: one row per distinct
    content hash with the surviving (minimum) id and duplicate count.

    One shuffle on sha256 — uniform key, no skew. At 100 TB, text
    leaves the scan only as its hash (project-then-shuffle), so
    shuffle volume is ~32B/row regardless of document size.
    """
    h = F.sha2(normalized_text(F.col(text_col)), 256)
    return (
        docs.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keep_doc_id"),
        )
    )


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Return the de-duplicated corpus (first id per content hash
    survives). Window-free formulation: aggregate keeps the shuffle
    at hash granularity; the join back is on the uniform id key."""
    keep = exact_dedup_groups(docs, text_col, id_col).select(
        F.col("keep_doc_id").alias(id_col)
    )
    return docs.join(keep, id_col, "semi")


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of the normalized text as an array of
    strings (distinct). Built-ins only: split → transform over a
    sliding index range → array_distinct."""
    toks = F.split(normalized_text(col), " ")
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(F.when(cnt >= n, grams).otherwise(F.array()))


def minhash_signatures_wide(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """Per-document MinHash signature, one column per seed: for seed
    s in 0..num_hashes-1, min over shingles of md5(s || '#' ||
    shingle). Output: (doc_id, h0..h{n-1}).

    Shape matters at scale: ONE groupBy(doc_id) with num_hashes
    min-aggregates — the shuffle carries one row per (doc, shingle),
    NOT per (doc, shingle, seed); map-side combine collapses it to
    one row per doc per task before the exchange. md5-as-hex keeps
    every hash reproducible in plain SQL for the DuckDB oracle; a
    100 TB deployment would swap in xxhash64(seed||gram) for ~10×
    cheaper hashing with identical pipeline shape.
    """
    grams = word_ngrams(F.col(text_col), ngram)
    exploded = docs.select(F.col(id_col), grams.alias("grams")).select(
        F.col(id_col), F.explode("grams").alias("gram")
    )
    aggs = [
        F.min(F.md5(F.concat_ws("#", F.lit(s), F.col("gram")))).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    ngram: int = 3,
) -> DataFrame:
    """Long-form signature view (doc_id, seed, minhash) — an unpivot
    of the wide aggregation (kept for API parity / inspection)."""
    wide = minhash_signatures_wide(docs, text_col, id_col, num_hashes, ngram)
    pairs = F.array(
        *[
            F.struct(F.lit(s).alias("seed"), F.col(f"h{s}").alias("minhash"))
            for s in range(num_hashes)
        ]
    )
    return wide.select(F.col(id_col), F.explode(pairs).alias("p")).select(
        id_col, "p.seed", "p.minhash"
    )


def minhash_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    ngram: int = 3,
) -> DataFrame:
    """LSH banding: split the signature into `bands` bands of
    num_hashes/bands consecutive seeds, concatenate each band into a
    bucket key, and self-join on (band, bucket). Output: candidate
    (doc_a, doc_b, n_shared_bands) pairs with doc_a < doc_b.

    Scale: the self-join key is (band_id, band_hash) — uniformly
    distributed, so the shuffle is balanced; only near-identical
    documents collide, keeping the join output linear in the number
    of true near-dups rather than quadratic in corpus size.
    """
    rows_per_band = num_hashes // bands
    wide = minhash_signatures_wide(docs, text_col, id_col, num_hashes, ngram)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    *[F.col(f"h{b * rows_per_band + i}") for i in range(rows_per_band)],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    band_keys = wide.select(F.col(id_col), F.explode(band_structs).alias("b")).select(
        id_col, "b.band", "b.band_key"
    )
    a = band_keys.select(F.col(id_col).alias("doc_a"), "band", "band_key")
    b = band_keys.select(F.col(id_col).alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity over word n-gram sets for candidate
    pairs (verification stage after LSH). Joins shingle sets in, then
    array_intersect/union — all JVM built-ins."""
    shingled = docs.select(
        F.col(id_col), word_ngrams(F.col(text_col), ngram).alias("grams")
    )
    ga = shingled.select(
        F.col(id_col).alias("doc_a"), F.col("grams").alias("grams_a")
    )
    gb = shingled.select(
        F.col(id_col).alias("doc_b"), F.col("grams").alias("grams_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    return (
        candidates.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(union > 0, inter.cast("double") / union)
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word unigrams: per token take the 64-bit
    xxhash, each bit votes +1/-1, sign of the vote sum forms the
    fingerprint bit. Pure built-ins: explode → per-bit conditional
    sums via transform over bit positions → reassemble with
    aggregate(shiftleft|or).

    Output: (doc_id, simhash long). NOTE: xxhash64 is Spark-private,
    so this operator gets rows-only oracle coverage; cross-engine
    reproducibility is provided by the md5 MinHash family instead.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    # One hash-agg pass with 64 conditional sums (bit votes) — stays
    # entirely in whole-stage codegen, no per-bit explode.
    vote_cols = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{b}")
        for b in range(64)
    ]
    votes = toks.groupBy(id_col).agg(*vote_cols)
    fingerprint = None
    for b in range(64):
        bit = F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint.bitwiseOR(bit)
    return votes.select(F.col(id_col), fingerprint.alias("simhash"))

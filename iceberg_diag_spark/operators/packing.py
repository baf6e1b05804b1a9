"""Sequence packing — fold documents into fixed token-budget training
windows, the sample-packing step every LLM pretraining pipeline runs
between curation and batching.

Semantics (fit-before-append, the packing counterpart of binpack.py's
check-before-append): walk docs in doc_id order within a shard; append
a doc to the open sequence only if the running token total stays
within the capacity, otherwise close the sequence and start a new one
with that doc. A single doc longer than the capacity forms its own
sequence, flagged ``truncated`` (training would split it; the packer
just reports it).

Spark mapping: grouped-map ``applyInPandas`` keyed by
(source, shard) where shard = doc_id % n_shards. The shard key is the
scale lever — packing is embarrassingly parallel across shards, so at
100 TB you raise n_shards until each group's token metadata fits one
task comfortably (the pandas frame holds one int per doc, not the
text: ~8 MB per million docs). Output is one row per packed sequence,
already aggregated, so nothing wide crosses the shuffle in either
direction. Deterministic for a fixed (capacity, n_shards): no RNG,
order is doc_id.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from iceberg_diag_spark.operators.textops import tokens

PACK_SCHEMA = (
    "source string, shard long, seq_id long, doc_count long, "
    "seq_tokens long, truncated boolean"
)


def pack_fold(token_counts, capacity: int):
    """Pure-python reference fold (also used in property tests):
    list of (doc_count, seq_tokens) per packed sequence, in order."""
    seqs: list[tuple[int, int]] = []
    count = 0
    total = 0
    for t in token_counts:
        t = int(t)
        if count and total + t > capacity:
            seqs.append((count, total))
            count = 0
            total = 0
        count += 1
        total += t
    if count:
        seqs.append((count, total))
    return seqs


def pack_sequences(
    docs: DataFrame,
    capacity_tokens: int = 256,
    n_shards: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into training sequences of <= capacity_tokens
    whitespace tokens (per (source, shard); shard = doc_id % n_shards).

    Output: (source, shard, seq_id, doc_count, seq_tokens, truncated)
    — truncated is true only for single-doc sequences whose doc alone
    exceeds the capacity.
    """
    base = docs.select(
        "source",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("long").alias("shard"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        src = pdf["source"].iloc[0]
        shard = int(pdf["shard"].iloc[0])
        rows = [
            (src, shard, sid, cnt, total, total > capacity_tokens)
            for sid, (cnt, total) in enumerate(
                pack_fold(pdf["n_tokens"].to_numpy(), capacity_tokens)
            )
        ]
        return pd.DataFrame(
            rows,
            columns=[
                "source", "shard", "seq_id", "doc_count", "seq_tokens",
                "truncated",
            ],
        )

    return base.groupBy("source", "shard").applyInPandas(
        _pack, schema=PACK_SCHEMA
    )

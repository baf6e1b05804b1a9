"""Deterministic sampling — the reproducibility primitive a training-
data pipeline needs: the same corpus snapshot must yield the same
sample on every engine, every run, every cluster size.

`rand()`-based sampling is none of those (seed × partitioning
dependent), so the samplers here key on a content-stable hash bucket:
md5 of the row key → first 8 hex digits → integer bucket. A row's
membership depends only on its key, which also makes samples STABLE
under corpus growth (adding rows never evicts old sample members) —
the property that lets a downstream eval set stay frozen while the
corpus doubles. The md5-integer idiom is the same cross-engine trick
as the MinHash family, so samples are oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string
    form. Uniform for any key type with a canonical string cast."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    pct: int,
    buckets: int = 100,
) -> DataFrame:
    """Keep rows whose hash bucket < pct — a deterministic ~pct%
    sample. Pure filter: pushes past everything Catalyst can push
    through, shuffles nothing."""
    if not 0 <= pct <= buckets:
        raise ValueError(f"pct must be in [0, {buckets}], got {pct}")
    return df.filter(hash_bucket(F.col(key_col), buckets) < pct)


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    rates: dict[str, int],
    strata_col: str,
    default_pct: int = 0,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum sampling rates (e.g. rebalance languages: keep 10%
    of English, 100% of low-resource langs). `rates` maps stratum
    value → pct; strata absent from the map get default_pct. Still a
    single deterministic filter — no shuffle, no per-stratum passes."""
    pct_col: Column = F.lit(default_pct)
    for value, pct in sorted(rates.items()):
        if not 0 <= pct <= buckets:
            raise ValueError(f"rate for {value!r} must be in [0, {buckets}]")
        pct_col = F.when(F.col(strata_col) == value, pct).otherwise(pct_col)
    return df.filter(hash_bucket(F.col(key_col), buckets) < pct_col)

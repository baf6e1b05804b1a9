"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join splitting (enabled in session.py) handles skewed
JOINS at runtime, but a groupBy on a pathological key (one key = 30%
of 100 TB) still funnels that key's rows through one reduce task.
Salting splits each key into `n_salts` subkeys for a parallel partial
aggregate, then a cheap second aggregate over n_salts rows per key
merges the partials — the standard two-stage shape for power-law keys
(word counts, user activity, null-heavy dimensions).

Only algebraic aggregates (sum/count/min/max) can be salted this way;
the helper exposes exactly those.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    aggs maps output column → (merge_fn_name, partial_expr), where
    merge_fn_name ∈ {'sum', 'min', 'max'} re-combines partials —
    e.g. {"cnt": ("sum", F.count("*")), "mx": ("max", F.max("v"))}.
    Stage 1 groups by (key, random_salt) — uniform fan-out even for a
    single hot key; stage 2 groups by key over n_salts partial rows.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    merge = {
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
    }
    return partial.groupBy(*key_cols).agg(
        *[
            merge[fn](f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )

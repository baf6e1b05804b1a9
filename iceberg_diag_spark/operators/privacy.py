"""Privacy-risk audits over tabular data — the structured-data
complement of textops.pii_redaction (which scrubs free text).

A training-data pipeline that ingests user-derived tables needs to
know, before release, how re-identifiable the quasi-identifier
combinations are. The classical measures are k-anonymity (every
quasi-identifier equivalence class has ≥ k members — Sweeney 2002)
and l-diversity (each class carries ≥ l distinct sensitive values —
Machanavajjhala et al. 2007); this module computes the audit
matrices for both, exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from iceberg_diag_spark.functions.parallel import ensure_parallelism


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k_levels: Sequence[int] = (2, 5, 10, 20),
) -> DataFrame:
    """k-anonymity / l-diversity audit: group records into
    quasi-identifier equivalence classes once, then report, for each
    candidate k, how far the table is from k-anonymous and how many
    classes are sensitive-homogeneous (the attribute-disclosure
    worst case, l = 1).

    Distributed shape: ONE hash aggregate on the quasi-identifier
    tuple builds the class relation (count + distinct-sensitive per
    class — map-side combine applies; the QID key is as uniform as
    the data itself, and no row carries more than the projected QID
    columns). The per-k rollup explodes the CLASS relation (already
    ≤ one row per distinct QID tuple) by the constant k list and
    hash-aggregates to len(k_levels) rows — no second pass over the
    records, no window anywhere.

    Output, one row per k (all counts exact BIGINT):
      (k, n_classes, n_violating_classes, records_at_risk,
       homogeneous_classes, min_class_size, min_l)
    where records_at_risk counts rows in classes smaller than k —
    the rows a release at that k would have to suppress or
    generalize — and min_l = 1 means at least one class leaks its
    sensitive attribute outright.
    """
    classes = (
        ensure_parallelism(df)
        .select(*[F.col(c) for c in quasi_cols], F.col(sensitive_col))
        .groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(sensitive_col).cast("long").alias("l"),
        )
    )
    ks = F.array(*[F.lit(int(k)).cast("long") for k in k_levels])
    return (
        classes.select(F.explode(ks).alias("k"), "n", "l")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_violating_classes"),
            F.sum(F.when(F.col("n") < F.col("k"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("records_at_risk"),
            F.sum(F.when(F.col("l") == 1, 1).otherwise(0))
            .cast("long")
            .alias("homogeneous_classes"),
            F.min("n").cast("long").alias("min_class_size"),
            F.min("l").cast("long").alias("min_l"),
        )
    )

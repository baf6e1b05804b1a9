"""Display layer: format the 9-metric diagnostics table into the
reference's human-readable 4-column layout (Metric / Before / After /
Improvement) as a DataFrame of strings.

Semantics mirrored from the reference
(icebergdiag/metrics/table_metric.py:86-176,
table_metrics_displayer.py:26-46):
- metric types: duration (ms) / int / size (bytes) decide formatting;
- AVG_FILE_SIZE, WORST_AVG_FILE_SIZE never show improvement;
- durations with before<10ms and after<10ms display "0.00%";
- WORST_AVG_FILE_SIZE is hidden in local mode;
- missing after → empty strings.

Everything is column expressions (format ladders), so the display
transform itself distributes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from iceberg_diag_spark.functions.formatting import (
    format_duration_ms,
    format_percent,
    format_size,
)
from iceberg_diag_spark.operators.diagnostics import METRICS

DURATION_METRICS = ["FULL_SCAN_OVERHEAD", "WORST_SCAN_OVERHEAD"]
INT_METRICS = ["FILE_COUNT", "WORST_FILE_COUNT", "TOTAL_PARTITIONS"]
SIZE_METRICS = [
    "AVG_FILE_SIZE",
    "WORST_AVG_FILE_SIZE",
    "TOTAL_TABLE_SIZE",
    "LARGEST_PARTITION_SIZE",
]
NO_IMPROVEMENT_METRICS = ["AVG_FILE_SIZE", "WORST_AVG_FILE_SIZE"]
REMOTE_ONLY_METRICS = ["WORST_AVG_FILE_SIZE"]

_DISPLAY_NAMES = dict(METRICS)


def format_metrics(metrics: DataFrame, mode: str = "local") -> DataFrame:
    """(metric, ordinal, before, after, improvement) → formatted
    display rows (metric_name, before, after, improvement strings)."""
    is_duration = F.col("metric").isin(DURATION_METRICS)
    is_int = F.col("metric").isin(INT_METRICS)

    def fmt(value):
        return (
            F.when(value.isNull(), F.lit(""))
            .when(is_duration, format_duration_ms(value))
            .when(is_int, value.cast("long").cast("string"))
            .otherwise(format_size(value))
        )

    improvement = (
        F.when(F.col("metric").isin(NO_IMPROVEMENT_METRICS), F.lit(""))
        .when(F.col("improvement").isNull(), F.lit(""))
        .when(
            is_duration & (F.col("before") < 10) & (F.col("after") < 10),
            F.lit("0.00%"),
        )
        .otherwise(format_percent(F.col("improvement")))
    )

    name_expr = F.col("metric")
    for key, display in _DISPLAY_NAMES.items():
        name_expr = F.when(F.col("metric") == key, F.lit(display)).otherwise(
            name_expr
        )

    out = metrics.select(
        F.col("ordinal"),
        name_expr.alias("metric_name"),
        fmt(F.col("before")).alias("before"),
        fmt(F.col("after")).alias("after"),
        improvement.alias("improvement"),
    )
    if mode == "local":
        out = out.filter(
            ~F.col("metric_name").isin(
                [_DISPLAY_NAMES[m] for m in REMOTE_ONLY_METRICS]
            )
        )
    return out.orderBy("ordinal").drop("ordinal")

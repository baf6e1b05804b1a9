"""Human-readable formatting as pure column expressions (SURVEY §2
F1-F3; reference: icebergdiag/metrics/table_metric.py:62-65,134-176).

These are display-layer concerns, but implemented as JVM expressions
(when-ladders over log-scaled units) rather than Python UDFs so a
formatted export of a billion-row result is still a codegen'd scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SIZE_UNITS = ["B", "KB", "MB", "GB", "TB", "PB"]


def format_size(size: Column) -> Column:
    """bytes → '1.21 KB' (÷1024 ladder, 2 decimals, B..PB).

    Mirrors table_metric.py:164-176: unit advances while size >= 1024
    and a larger unit exists, i.e. PB is the terminal unit.
    """
    expr = None
    for i, unit in enumerate(_SIZE_UNITS):
        scaled_i = size.cast("double") / (1024.0 ** i)
        cond = scaled_i < 1024.0
        value = F.format_string(f"%.2f {unit}", scaled_i)
        if i == len(_SIZE_UNITS) - 1:
            # terminal unit — no further division regardless of size
            expr = expr.otherwise(value)
        elif expr is None:
            expr = F.when(cond, value)
        else:
            expr = expr.when(cond, value)
    return expr


def format_duration_ms(ms: Column) -> Column:
    """milliseconds → '1h 0m 0s' / '2m 5s' / '5.5s' / '<0.01s'
    (table_metric.py:134-150, including trailing-zero stripping on
    the seconds-only form)."""
    total_seconds = ms.cast("double") / 1000.0
    hours = F.floor(total_seconds / 3600).cast("long")
    minutes = F.floor((total_seconds % 3600) / 60).cast("long")
    seconds = total_seconds % 60
    secs_str = F.regexp_replace(
        F.regexp_replace(F.format_string("%.2f", seconds), r"0+$", ""),
        r"\.$",
        "",
    )
    return (
        F.when(
            hours > 0,
            F.format_string(
                "%dh %dm %ds", hours, minutes, F.floor(seconds).cast("long")
            ),
        )
        .when(
            minutes > 0,
            F.format_string("%dm %ds", minutes, F.floor(seconds).cast("long")),
        )
        .when((seconds > 0) & (seconds < 0.01), F.lit("<0.01s"))
        .otherwise(F.concat(secs_str, F.lit("s")))
    )


def format_percent(x: Column) -> Column:
    """float → '12.34%' (table_metric.py:62-65)."""
    return F.format_string("%.2f%%", x.cast("double"))


def glob_to_regex(pattern: str) -> str:
    """fnmatch-style glob → anchored Java regex (SURVEY §2 F4/P1):
    ``*`` → ``.*``, ``?`` → ``.``, everything else quoted."""
    special = set(r".^$+{}[]()|\\")
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch in special:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"

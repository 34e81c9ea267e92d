"""Table profiling: per-column null/distinct statistics in one pass.

The data-quality primitive every ingestion pipeline runs before trusting
a new drop: row count, null count, and distinct count per column, from a
SINGLE aggregation over the scan (one pass, partial-aggregable) followed
by a stack() unpivot of the one-row result — never one job per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Output: (column, n_rows, n_nulls, n_distinct) — one row per column,
    ordered by the caller's sort. ``n_distinct`` is the exact distinct
    count EXCLUDING nulls (count(distinct) semantics in any engine).

    Plan: one global aggregate (3 measures × |columns|, partials
    combine map-side; the single-row final merge is the whitelisted
    watermark shape) + a driver-free stack() unpivot.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    # Positional internal aliases + escaped label literals: a column
    # named "order date", "risk-score", or "it's" must profile fine —
    # its raw name never becomes an identifier inside the selectExpr.
    aggs = [F.count(F.lit(1)).alias("_n")]
    for idx, c in enumerate(cols):
        aggs.append(
            F.sum(F.when(df[c].isNull(), 1).otherwise(0)).alias(f"_null_{idx}")
        )
        aggs.append(F.count_distinct(df[c]).alias(f"_dist_{idx}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        "'{}', _null_{}, _dist_{}".format(
            c.replace("\\", "\\\\").replace("'", "\\'"), idx, idx
        )
        for idx, c in enumerate(cols)
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_nulls, n_distinct)",
        "_n AS n_rows",
    ).select(
        "column_name",
        F.col("n_rows").cast("long"),
        F.col("n_nulls").cast("long"),
        F.col("n_distinct").cast("long"),
    )

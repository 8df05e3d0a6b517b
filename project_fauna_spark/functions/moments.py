"""Exact-integer Pearson moment helpers — the "ts_acf_daily contract".

For INTEGER-valued variables, all five Pearson moments (n, Σx, Σy,
Σxy, Σx², Σy²) accumulate exactly in decimal(38,0) (HUGEINT in the
DuckDB oracles), so the correlation's only float operations are the
final division and two IEEE-exact sqrts of identical integers — the
cross-engine float contract shared by ts_acf_daily,
ts_crosscorr_daily, text_heaps_diagnostic and (single-variable form)
dq_seasonal_adjusted_anomaly.  Centralized so a precision-bound change
(e.g. the decimal(19,0) per-value width) lands in ONE place; a
per-operator copy that drifts silently breaks parity for that operator
only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dec19(c: Column) -> Column:
    """Per-value exact-integer cast feeding decimal moment sums."""
    return c.cast("decimal(19,0)")


def int_pearson_moments(
    df: DataFrame, group_cols: list[str], x: str = "x", y: str = "y"
) -> DataFrame:
    """Per-group exact moments of two INTEGER columns.

    Emits ``np_l`` (count) and decimal-exact ``sx, sy, sxy, sxx, syy``
    — feed to :func:`pearson_corr` for the correlation column.
    """
    cx, cy = dec19(F.col(x)), dec19(F.col(y))
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("np_l"),
        F.sum(cx).alias("sx"),
        F.sum(cy).alias("sy"),
        F.sum(cx * cy).alias("sxy"),
        F.sum(cx * cx).alias("sxx"),
        F.sum(cy * cy).alias("syy"),
    )


def pearson_terms() -> tuple[Column, Column, Column, Column]:
    """(num, dx, dy, corr) over :func:`int_pearson_moments` output.

    ``corr = num / (√dx · √dy)`` with all three operands cast to
    double from the same exact integers on both engines; callers
    filter or NULL-guard on ``dx > 0 AND dy > 0`` (zero variance).
    """
    np_d = F.col("np_l").cast("decimal(38,0)")
    num = np_d * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = np_d * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = np_d * F.col("syy") - F.col("sy") * F.col("sy")
    corr = num.cast("double") / (
        F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))
    )
    return num, dx, dy, corr

"""Vector (array<float/double>) expression builders.

Pure Catalyst higher-order functions — JVM-side, no UDFs.  The fold
order is the array index order, which makes results deterministic and
(given identical inputs) bit-identical across engines that fold the
same way — the property the similarity oracles rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def euclidean_dist(a: Column, b: Column) -> Column:
    """Euclidean distance of two array<float/double> columns.

    Index-ordered fold from a 0.0 init — bit-compatible with DuckDB's
    init-less ``list_reduce`` because ``0.0 + d₁ == d₁`` exactly for
    the non-negative squared terms, after which both engines perform
    the identical add sequence; the closing sqrt is IEEE-exact.
    """
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    sq = F.aggregate(
        F.zip_with(da, db, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    return F.sqrt(sq)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, double math.

    Index-ordered fold (``F.aggregate``) — deterministic, JVM-side,
    no UDF.
    """
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    nb = F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    return dot / F.sqrt(na * nb)

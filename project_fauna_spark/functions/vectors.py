"""Vector (array<float/double>) expression builders.

Pure Catalyst higher-order functions — JVM-side, no UDFs.  The fold
order is the array index order, which makes results deterministic and
(given identical inputs) bit-identical across engines that fold the
same way — the property the similarity oracles rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


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

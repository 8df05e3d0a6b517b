"""Shared char-level word-hash fold (base 31, mod 1e9+7).

The per-word rolling polynomial hash used by ``text_fingerprint`` and
``text_winnowing_fingerprint`` — BOTH the Spark HOF spelling and the
DuckDB ``list_reduce`` spelling live here so the two can never drift
apart (cross-engine parity depends on them being bit-identical).
Non-registering home per the repo convention (shared Spark helpers in
functions/, shared SQL next to them when the pair must stay in sync).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

WORDHASH_MOD = 1_000_000_007


def word_hashes(words: Column) -> Column:
    """array<string> → array<long>: per-word base-31 char fold mod P."""
    return F.transform(
        words,
        lambda w: F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.length(w)),
                lambda i: F.ascii(F.substr(w, i, F.lit(1))).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 31 + c) % WORDHASH_MOD,
        ),
    )


# DuckDB spelling of the same fold over a ``words`` list column.
SQL_WORD_HASHES = f"""
             list_transform(words, w ->
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, length(w) + 1),
                                  i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
                 (acc, c) -> (acc * 31 + c) % {WORDHASH_MOD}))
"""

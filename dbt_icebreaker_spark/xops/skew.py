"""Skew mitigation for large joins (SURVEY §4 scale contract).

At 100 TB the failure mode of an equi-join is a handful of hot keys:
one task receives a whole key's rows on both sides and runs for hours
while the rest of the cluster idles. Defense layers, in order:

1. AQE skew-join (``spark.sql.adaptive.skewJoin.enabled``, on by
   default here) — splits oversized sort-merge partitions at runtime.
   It handles one-sided skew; it cannot split a build side, and it
   never helps when the hot key's rows must still meet in one task on
   BOTH sides.
2. ``broadcast()`` the small side — no shuffle, no skew, but only
   below the broadcast threshold.
3. Salting (this module) — the remaining case: both sides too big to
   broadcast AND the same key hot on both. The fat side gets a random
   salt in [0, n); the other side is replicated n ways; the join key
   becomes (key, salt), so one hot key fans out across n tasks.
   Replication multiplies the replicated side n×: pick the SMALLER
   side to replicate and keep n modest (8-32).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__skew_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join that spreads hot keys across ``n_salts`` tasks.

    ``skewed`` (the side with hot keys — usually the fact/event side)
    gets a per-row salt; ``other`` is replicated once per salt value
    via a posexploded sequence (rows × n_salts). The salt assignment
    is ``rand(seed)``-based: WHICH salt a row gets never affects the
    result (every salted copy of the matching ``other`` row is
    identical), only how evenly the hot key spreads.

    Only inner and left joins are supported: under right/full outer
    semantics the unmatched replicated rows would surface n times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: a "
            "right/full join would emit each unmatched replicated row "
            "n_salts times"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        SALT_COL, (F.rand(seed) * n_salts).cast("int")
    )
    replicated = other.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, keys + [SALT_COL], how).drop(SALT_COL)


def top_keys(
    df: DataFrame, on: str | Sequence[str], k: int = 20
) -> DataFrame:
    """Diagnostic: the k heaviest join keys and their row counts —
    run this (cheap: one partial-aggregated groupBy) before deciding
    between AQE, broadcast, and salting. Output: (key cols..., n)."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"))
        .limit(k)
    )

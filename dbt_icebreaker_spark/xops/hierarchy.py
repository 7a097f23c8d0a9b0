"""Deep-hierarchy flattening via iterative doubling (pointer jumping).

The CONNECT BY rendering (transpiler/transforms.rewrite_connect_by)
materializes one Spark job per LEVEL — correct and fast to depth
~10²–10³, but depth-5 000 chains take ~10 minutes (the per-level
scheduling floor measured in SCALE.md) and the ORDER SIBLINGS BY /
NOCYCLE variants OOM on their O(depth²) ancestor arrays. This module
is the scale path those guards point at: O(log depth) self-joins
instead of O(depth) jobs — the same large/small-star idea as
``dedup.dedup_clusters``'s connected components, specialized to
forests where each node also needs its DEPTH.

Reference parity: Snowflake exposes deep hierarchies through CONNECT
BY / recursive CTEs only; this operator is the Spark-native answer for
the regime where per-level recursion is the bottleneck (bill-of-
materials chains, thread ancestry, deep org mirrors).

Scale shape: each round joins ``cur`` with itself on ``anc = node``
(hash shuffle on the doubling key), and every round DOUBLES the
resolved ancestor distance, so depth 10⁶ resolves in 20 rounds. Rows
already anchored at a root pass through the join unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def flatten_hierarchy(
    df: DataFrame,
    node_col: str,
    parent_col: str,
    max_rounds: int = 64,
) -> DataFrame:
    """(node, root, depth) for every node of a forest.

    ``df`` holds one row per node with its parent id (NULL for roots).
    Returns columns ``node``, ``root`` (the chain's top ancestor) and
    ``depth`` (0 for roots), typed from the input id column.

    Iterative doubling: the state row ``(node, anc, dist, done)``
    means "``anc`` is ``node``'s ancestor ``dist`` levels up; ``done``
    marks ``anc`` as a root". One round rewrites ``anc`` to ``anc``'s
    own ancestor — distances double each round, so ``max_rounds=64``
    covers any depth a BIGINT can count. A node set that never
    converges within the bound can only be a CYCLE (a forest of depth
    ≤ 2⁶⁴ does not exist) — the error names offending nodes instead of
    looping forever. A parent id that is not itself a node (an orphan
    reference) is treated as the chain's root.

    Each round ends in ``localCheckpoint`` (NOT persist): the round's
    plan references the previous round's twice, so without LINEAGE
    truncation the logical plan doubles per round — 2^rounds plan
    nodes OOM the driver during analysis long before any data moves.
    Checkpointing caps the plan at one join; on a cluster the
    executor-local blocks trade fault-tolerance for exactly this
    truncation (re-run the operator on loss — it is deterministic).
    """
    cur = df.select(
        F.col(node_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(node_col)).alias("anc"),
        F.when(F.col(parent_col).isNull(), F.lit(0))
        .otherwise(F.lit(1)).cast("long").alias("dist"),
        F.col(parent_col).isNull().alias("done"),
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        pending = cur.filter(~F.col("done")).count()
        if pending == 0:
            return cur.select(
                F.col("node"),
                F.col("anc").alias("root"),
                F.col("dist").alias("depth"),
            )
        a, b = cur.alias("a"), cur.alias("b")
        cur = (
            a.join(b, F.col("a.anc") == F.col("b.node"), "left")
            .select(
                F.col("a.node").alias("node"),
                F.when(F.col("a.done"), F.col("a.anc"))
                .otherwise(F.coalesce(F.col("b.anc"), F.col("a.anc")))
                .alias("anc"),
                F.when(F.col("a.done"), F.col("a.dist"))
                .otherwise(F.col("a.dist")
                           + F.coalesce(F.col("b.dist"), F.lit(0)))
                .alias("dist"),
                # a join MISS means the ancestor id is not itself a
                # node (an orphan parent reference) — terminal: treat
                # the dangling id as the chain's root rather than
                # spinning to the cycle error
                (F.col("a.done")
                 | F.coalesce(F.col("b.done"), F.lit(False))
                 | F.col("b.node").isNull())
                .alias("done"),
            )
            .localCheckpoint(eager=True)
        )
    stuck = [
        str(r.node)
        for r in cur.filter(~F.col("done")).limit(5).collect()
    ]
    raise ValueError(
        f"flatten_hierarchy: no convergence after {max_rounds} "
        f"doubling rounds — the parent chain of node(s) "
        f"{', '.join(stuck)} never reaches a root, which means the "
        "'forest' contains a cycle. Break the cycle (or deduplicate "
        "the parent column) and rerun; CONNECT BY NOCYCLE can locate "
        "short cycles on a bounded sample."
    )

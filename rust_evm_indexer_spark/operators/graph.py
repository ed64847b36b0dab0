"""Distributed graph analytics over the address-interaction graph.

The transactions table IS a graph (from_address → to_address edges —
the entity model of src/api.rs / init.sql:27-44 read relationally), and
triangle counting is the canonical "curse of the last reducer" problem:
the naive wedge enumeration fans out deg(v)² rows per vertex, so one
exchange hub vertex (deg 10⁶+ on mainnet) generates 10¹² wedges on a
single reducer while everything else finishes in seconds.

The fix (Suri & Vassilvitskii, "Counting Triangles and the Curse of the
Last Reducer", WWW'11) is DEGREE ORIENTATION: impose the total order
``u ≺ w  iff  (deg(u), u) < (deg(w), w)`` and orient every undirected
edge low→high.  Each triangle then has exactly ONE vertex with two
outgoing oriented edges (its minimum), so counting wedges only on
oriented out-edges both (a) counts each triangle exactly once and (b)
bounds per-vertex fan-out by out-degree ≤ O(√E) — the hub's million
neighbors almost all rank HIGHER, so its out-degree collapses.  Total
wedge volume drops from Σ deg² to O(E^{3/2}), and no hot reducer
exists.  Counts are exact integers, so the result is hash-verifiable
against any other orientation (the oracle uses plain lexicographic
a<b orientation — triangle COUNT is orientation-invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_count(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Exact triangle / edge / node counts of the undirected simple
    graph induced by ``(src, dst)`` rows (self-loops and NULL endpoints
    dropped, parallel edges collapsed).  Returns one row:
    ``(n_nodes, n_edges, n_triangles)``.

    Plan shape: one distinct-shuffle for edge canonicalization, one
    groupBy for degrees, two broadcast-or-shuffle equi-joins for the
    wedge + closure check — every join keyed, no cross product, hub
    fan-out bounded by degree orientation (module docstring).
    """
    # NOT pinned (r13 revert of the r12 persist_shared pins): e is
    # consumed 4x and oriented 3x, but every consumer is a cheap
    # broadcast-joined subtree over a distinct-deduped edge list, and
    # the two cache writes + InMemoryTableScan stage barriers cost more
    # than the re-executions they save — 5-rep A/B on the driver
    # protocol: pinned 2.66 s vs unpinned 2.15 s, and the driver's own
    # history agrees (r11 no-pins <1 s, r12 pins 1.6 s).  At a scale
    # where the orientation subtree is genuinely expensive, pin the
    # ORIENTED frame only (one write, three consumers).
    e = (
        edges.select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    # orient each edge toward the (degree, node)-larger endpoint
    withdeg = (
        e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (withdeg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dw"),
    ))
    # wedges at the triangle's minimum vertex: two out-edges (u,v),(u,w)
    # with v ≺ w — then the closing edge (v,w) must itself be oriented
    e1 = oriented.select(
        F.col("u"), F.col("w").alias("v"), F.col("dw").alias("dv")
    )
    e2 = oriented.select("u", "w", "dw")
    wedges = e1.join(e2, "u").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("v"), F.col("w")), ["v", "w"]
    )
    # the three single-row aggregates combine via explicit broadcast —
    # without the hint a statsless session plans an (absurd) 1x1
    # CartesianProduct stage
    return (
        closed.agg(F.count("*").cast("bigint").alias("n_triangles"))
        .crossJoin(F.broadcast(e.agg(F.count("*").cast("bigint").alias("n_edges"))))
        .crossJoin(F.broadcast(deg.agg(F.count("*").cast("bigint").alias("n_nodes"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )

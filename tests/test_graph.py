"""triangle_count semantics: known graphs, degeneracies, and equality
with a brute-force census on a random graph (the catalog oracle then
re-proves it cross-engine on the EVM tx graph)."""

from __future__ import annotations

from itertools import combinations

import random

from rust_evm_indexer_spark.operators.graph import triangle_count


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "s string, t string")
    return triangle_count(df, "s", "t").first()


def test_k4_has_four_triangles(spark):
    nodes = ["a", "b", "c", "d"]
    r = _run(spark, [(u, v) for u, v in combinations(nodes, 2)])
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)


def test_path_and_star_have_none(spark):
    r = _run(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert r["n_triangles"] == 0
    # hub star: the degree-orientation worst case input, still 0
    r = _run(spark, [("hub", f"n{i}") for i in range(20)])
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (21, 20, 0)


def test_self_loops_parallel_edges_and_nulls_ignored(spark):
    pairs = [
        ("a", "b"), ("b", "a"), ("a", "b"),  # parallel/reversed collapse
        ("a", "a"),                            # self loop dropped
        ("a", None), (None, "c"),              # NULL endpoints dropped
        ("b", "c"), ("c", "a"),
    ]
    r = _run(spark, pairs)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (3, 3, 1)


def test_matches_bruteforce_on_random_graph(spark):
    rng = random.Random(7)
    n = 30
    edges = sorted(
        {
            (f"v{min(a, b):02d}", f"v{max(a, b):02d}")
            for a, b in (
                (rng.randrange(n), rng.randrange(n)) for _ in range(150)
            )
            if a != b
        }
    )
    eset = set(edges)
    want = sum(
        1
        for x, y, z in combinations(sorted({v for e in edges for v in e}), 3)
        if (x, y) in eset and (x, z) in eset and (y, z) in eset
    )
    r = _run(spark, list(edges))
    assert r["n_triangles"] == want and want > 0
    assert r["n_edges"] == len(edges)

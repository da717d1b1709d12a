"""Connected-components operator pinned against a pure-Python union-find
on deterministic random graphs, plus adversarial shapes (long chains,
which require the pointer-jumping rounds to converge within max_iter)."""

import pytest
import random

from erpl_web_spark.operators.graph import component_summary, connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {}
    touched = {u for e in edges for u in e}
    for x in touched:
        comp[x] = find(x)
    # normalize: component label = min member
    groups = {}
    for x, r in comp.items():
        groups.setdefault(find(r), []).append(x)
    out = {}
    for members in groups.values():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def _spark_components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, "src", "dst")
    return {r["id"]: r["component"] for r in got.collect()}


@pytest.mark.parametrize("seed,n,m", [(7, 300, 220), (13, 120, 40), (99, 50, 200)])
def test_random_graph_matches_union_find(spark, seed, n, m):
    # sparse (many small components), very sparse, and dense (one giant
    # component) regimes
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [e for e in edges if e[0] != e[1]]
    assert _spark_components(spark, edges) == _union_find(n, edges)


def test_long_chain_converges(spark):
    # Path graph 0-1-2-...-40: worst case for plain propagation
    # (diameter 40); pointer jumping must close it within max_iter=25.
    edges = [(i, i + 1) for i in range(40)]
    got = _spark_components(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_two_cliques_and_bridge(spark):
    a = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    b = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    got = _spark_components(spark, a + b)
    assert {got[i] for i in range(5)} == {0}
    assert {got[i] for i in range(10, 15)} == {10}
    # bridging edge merges the components
    got2 = _spark_components(spark, a + b + [(4, 10)])
    assert set(got2.values()) == {0}


def test_component_summary(spark):
    edges = [(1, 2), (2, 3), (7, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    summary = {
        r["component"]: (r["n_members"], r["member_min"], r["member_max"])
        for r in component_summary(connected_components(df, "src", "dst")).collect()
    }
    assert summary == {1: (3, 1, 3), 7: (2, 7, 8)}


def test_unconverged_raises_not_silent(spark):
    """Exhausting max_iter without the fixpoint must raise — silently
    returning over-segmented labels would make downstream curation drop
    the wrong documents with no signal."""
    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "src", "dst", max_iter=1)
    # the same graph converges (and is correct) at the default cap
    got = _spark_components(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_hub_star_graph(spark):
    """A 2000-leaf hub (the worst skew shape a boilerplate dup-cluster
    produces): converges fast, every node labels to the hub minimum."""
    edges = [(0, i) for i in range(1, 2001)]
    got = _spark_components(spark, edges)
    assert len(got) == 2001 and set(got.values()) == {0}


def test_component_best_picks_highest_score(spark):
    from pyspark.sql import functions as F
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    scores = spark.createDataFrame(
        [(1, 0.25), (2, 0.75), (3, 0.75), (10, 0.5), (11, 0.5), (99, 1.0)],
        "doc_id long, quality_score double",
    )
    from erpl_web_spark.operators.graph import component_best, connected_components

    comp = connected_components(edges, "id_a", "id_b")
    best = {r["component"]: (r["keep_id"], r["best_score"])
            for r in component_best(comp, scores, "doc_id", "quality_score").collect()}
    assert best[1] == (2, 0.75)   # max score wins; tie (2 vs 3) -> smaller id
    assert best[10] == (10, 0.5)  # tie -> smaller id
    assert 99 not in {k for k, _ in best.values()}  # singletons aren't in components
    # WindowGroupLimit prunes the rank: plan must not sort whole clusters globally
    plan = component_best(comp, scores, "doc_id", "quality_score")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_graph_operators_release_internal_caches(spark):
    """r15: the iterative graph operators materialize their result via
    localCheckpoint and release every operator-internal persist before
    returning — the module cache registry must stay empty (no
    accumulation RuntimeWarning on long-lived drivers), and the
    returned frames must still be fully consumable afterwards."""
    from erpl_web_spark.operators import release_tracked, tracked_count
    from erpl_web_spark.operators.graph import (
        kcore_peel,
        label_propagation,
        pagerank_int,
        triangle_counts,
    )

    release_tracked()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (5, 6)], "src long, dst long"
    )
    results = [
        pagerank_int(edges, iterations=3, symmetrize=True),
        pagerank_int(edges, iterations=3, tol=0),
        label_propagation(edges, iterations=2),
        kcore_peel(edges, k=2, rounds=2),
        triangle_counts(edges),
    ]
    assert tracked_count() == 0, "graph-internal persists leaked to the registry"
    # the returned frames read their own checkpoint blocks
    for df in results:
        assert df.count() > 0

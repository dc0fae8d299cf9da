"""PageRank (operators/graph.py) vs a pure-Python power-iteration
reference: dangling mass, parallel edges, mass conservation, layout
independence, cache hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from kafka_streams_task_spark.operators.graph import out_degrees, pagerank


def _reference_pagerank(edges, n_iter, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {u: 0 for u in nodes}
    for u, _ in edges:
        deg[u] += 1
    r = {u: 1.0 / n for u in nodes}
    for _ in range(n_iter):
        dangling = sum(r[u] for u in nodes if deg[u] == 0)
        base = (1.0 - d) / n + d * dangling / n
        im = {u: 0.0 for u in nodes}
        for u, v in edges:
            im[v] += r[u] / deg[u]
        r = {u: base + d * im[u] for u in nodes}
    return r


# a graph with: a cycle (1->2->3->1), a dangling sink (4), a hub feeding
# it (2->4), parallel edges (3->1 twice), and an isolated-ish chain 5->6
EDGES = [(1, 2), (2, 3), (3, 1), (3, 1), (2, 4), (5, 6)]


def _edges_df(spark, edges=EDGES):
    return spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])


def test_out_degrees_counts_parallel_and_sinks(spark):
    got = {r.node: r.deg for r in out_degrees(_edges_df(spark)).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 0, 5: 1, 6: 0}


@pytest.mark.parametrize("n_iter", [1, 4])
def test_pagerank_matches_reference(spark, n_iter):
    got = {r.node: r.rank for r in pagerank(_edges_df(spark), n_iter=n_iter).collect()}
    ref = _reference_pagerank(EDGES, n_iter)
    assert set(got) == set(ref)
    for u in ref:
        assert got[u] == pytest.approx(ref[u], rel=1e-12, abs=1e-15)


def test_pagerank_mass_conserved(spark):
    got = pagerank(_edges_df(spark), n_iter=6).collect()
    assert sum(r.rank for r in got) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_ranks_authority(spark):
    # in the cycle+sink graph, node 1 receives two parallel edges from 3
    # plus nothing else; 6 only receives from the leaf 5 — a pure-cycle
    # member must outrank the chain sink after enough iterations
    got = {r.node: r.rank for r in pagerank(_edges_df(spark), n_iter=10).collect()}
    assert got[1] > got[6]
    assert got[2] > got[4] * 0.5  # sanity: hub has non-vanishing rank


def test_pagerank_layout_independent(spark):
    e = _edges_df(spark)
    r1 = {r.node: r.rank for r in pagerank(e.repartition(1), n_iter=3).collect()}
    r2 = {r.node: r.rank for r in pagerank(e.repartition(5, "dst"), n_iter=3).collect()}
    for u in r1:
        assert r1[u] == pytest.approx(r2[u], rel=1e-12, abs=1e-15)


def test_pagerank_empty_graph(spark):
    empty = _edges_df(spark).filter("src < 0")
    assert pagerank(empty, n_iter=2).collect() == []


def test_pagerank_leaves_one_checkpoint(spark):
    jsc = spark.sparkContext._jsc
    before = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()}
    out = pagerank(_edges_df(spark), n_iter=4)
    out.count()
    leaked = {int(k) for k in jsc.getPersistentRDDs().keySet().toArray()} - before
    assert len(leaked) <= 1, f"leaked cached RDDs: {sorted(leaked)}"


def test_pagerank_null_endpoints_do_not_leak_mass(spark):
    edges = spark.createDataFrame(
        [Row(src=u, dst=v) for u, v in EDGES]
        + [Row(src=None, dst=1), Row(src=2, dst=None)]
    )
    got = pagerank(edges, n_iter=5).collect()
    assert sum(r.rank for r in got) == pytest.approx(1.0, abs=1e-9)
    assert all(r.node is not None for r in got)
    # degrees are computed AFTER the null drop: node 2's out-degree must
    # not count the dropped edge (else its cycle contribution halves)
    ref = _reference_pagerank(EDGES, 5)
    byn = {r.node: r.rank for r in got}
    for u in ref:
        assert byn[u] == pytest.approx(ref[u], rel=1e-12, abs=1e-15)


def _brute_triangles(edges):
    import itertools

    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    n = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            n += 1
    return n


def test_triangle_count_matches_brute_force(spark):
    import random

    from kafka_streams_task_spark.operators.graph import triangle_count

    rng = random.Random(17)
    for trial in range(3):
        edges = list({
            tuple(sorted((rng.randrange(14), rng.randrange(14))))
            for _ in range(30)
        })
        # add duplicates, reversals, and a self-loop: normalization fodder
        noisy = edges + [(v, u) for u, v in edges[:5]] + [(3, 3)]
        df = spark.createDataFrame([Row(src=u, dst=v) for u, v in noisy])
        got = triangle_count(df).first()["n_triangles"]
        assert got == _brute_triangles(edges), f"trial {trial}"


def test_triangle_count_known_graphs(spark):
    from kafka_streams_task_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert triangle_count(
        spark.createDataFrame([Row(src=u, dst=v) for u, v in k4])
    ).first()["n_triangles"] == 4
    path = [(0, 1), (1, 2), (2, 3)]
    assert triangle_count(
        spark.createDataFrame([Row(src=u, dst=v) for u, v in path])
    ).first()["n_triangles"] == 0

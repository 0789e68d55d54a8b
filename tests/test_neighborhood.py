"""neighborhood_function_exact vs brute BFS; hyperball accuracy gate."""
import numpy as np
import pytest


def _brute_nf(edges, t_max):
    adj = {}
    nodes = set()
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        nodes.add(s)
        nodes.add(d)
    reach = {u: {u} for u in nodes}
    out = [(0, sum(len(v) for v in reach.values()))]
    for t in range(1, t_max + 1):
        for u in nodes:
            add = set()
            for v in reach[u]:
                add |= adj.get(v, set())
            reach[u] |= add
        out.append((t, sum(len(v) for v in reach.values())))
    return out


@pytest.fixture(scope="module")
def graph(spark):
    rng = np.random.default_rng(7)
    edges = {(int(rng.integers(0, 60)), int(rng.integers(0, 60)))
             for _ in range(150)}
    edges |= {(i, i + 1) for i in range(0, 20)}        # a long chain
    edges = sorted(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    return df, edges


@pytest.mark.parametrize("t_max", [0, 1, 3, 6])
def test_exact_matches_brute_bfs(graph, t_max):
    from cartwright_spark.functions.neighborhood import (
        neighborhood_function_exact)
    df, edges = graph
    got = [(r.t, r.pairs) for r in neighborhood_function_exact(df, t_max)
           .orderBy("t").collect()]
    assert got == _brute_nf(edges, t_max)


def test_exact_early_exit_pads_converged(spark):
    from cartwright_spark.functions.neighborhood import (
        neighborhood_function_exact)
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = [(r.t, r.pairs)
            for r in neighborhood_function_exact(df, t_max=5)
            .orderBy("t").collect()]
    # converges at t=2 (1->{1,2,3}, 2->{2,3}, 3->{3}); padded after
    assert rows == [(0, 3), (1, 5), (2, 6), (3, 6), (4, 6), (5, 6)]


def test_hyperball_tracks_exact(graph):
    """HLL p=7 per-node error ~9%; summed over 60 nodes the aggregate
    estimate should track N(t) well within 15%."""
    from cartwright_spark.functions.neighborhood import (
        hyperball, neighborhood_function_exact)
    df, _ = graph
    exact = {r.t: r.pairs
             for r in neighborhood_function_exact(df, 4).collect()}
    est = {r.t: r.est_pairs for r in hyperball(df, 4, p=7).collect()}
    for t, n in exact.items():
        assert est[t] == pytest.approx(n, rel=0.15), (t, n, est[t])


def test_guards(spark):
    from cartwright_spark.functions.neighborhood import (
        hyperball, neighborhood_function_exact)
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        neighborhood_function_exact(df, -1)
    with pytest.raises(ValueError):
        hyperball(df, -1)


# --- kcore (iterative peel) ----------------------------------------------


def _brute_kcore(edges, k):
    adj = {}
    for s, d in edges:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    alive = set(adj)
    while True:
        drop = {u for u in alive
                if len(adj[u] & alive) < k}
        if not drop:
            return alive
        alive -= drop


@pytest.mark.parametrize("k", [1, 2, 3])
def test_kcore_matches_bruteforce(graph, k):
    from cartwright_spark.functions.graph import kcore
    df, edges = graph
    got = {r.node for r in kcore(df, k=k).collect()}
    assert got == _brute_kcore(edges, k)


def test_kcore_pendant_chain_peels_iteratively(spark):
    """Cycle 0-1-2-3-0 with pendant chain 3-10-11-12-13: the chain
    peels one node per round (4 rounds), the cycle survives."""
    from cartwright_spark.functions.graph import kcore
    edges = [(0, 1), (1, 2), (2, 3), (3, 0),
             (3, 10), (10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert {r.node for r in kcore(df, k=2).collect()} == {0, 1, 2, 3}


def test_kcore_empty_core(spark):
    from cartwright_spark.functions.graph import kcore
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert kcore(df, k=2).count() == 0        # a path has no 2-core
    with pytest.raises(ValueError):
        kcore(df, k=0)

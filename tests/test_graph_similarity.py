"""Neighborhood Jaccard + modularity — functions/graph.py."""
import pytest


def _edges(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs],
                                 "src string, dst string")


def test_neighbor_jaccard_path(spark):
    from cartwright_spark.functions.graph import neighbor_jaccard
    # path a-b-c: (a,c) share exactly {b}; deg(a)=deg(c)=1
    out = neighbor_jaccard(_edges(spark, [("a", "b"), ("b", "c")]),
                           min_common=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.u, r.v, r.common, r.du, r.dv) == ("a", "c", 1, 1, 1)
    assert r.jaccard == pytest.approx(1.0)


def test_neighbor_jaccard_excludes_existing_edges(spark):
    from cartwright_spark.functions.graph import neighbor_jaccard
    # triangle: every pair is adjacent -> no candidates
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    assert neighbor_jaccard(_edges(spark, tri), min_common=1).count() == 0


def test_neighbor_jaccard_partial_overlap(spark):
    from cartwright_spark.functions.graph import neighbor_jaccard
    # N(x)={z1,z2,y2}, N(y)={z1,z2,y1-side...}: construct
    # x-z1, x-z2, x-w, y-z1, y-z2 -> pair (x,y): common=2, du=3, dv=2
    e = [("x", "z1"), ("x", "z2"), ("x", "w"), ("y", "z1"), ("y", "z2")]
    rows = {(r.u, r.v): r
            for r in neighbor_jaccard(_edges(spark, e),
                                      min_common=2).collect()}
    r = rows[("x", "y")]
    assert r.common == 2 and {r.du, r.dv} == {3, 2}
    assert r.jaccard == pytest.approx(2.0 / 3.0)


def test_neighbor_jaccard_hub_cap(spark):
    from cartwright_spark.functions.graph import neighbor_jaccard
    star = [("hub", f"s{i}") for i in range(10)]
    # hub degree 10 > max_hub 4 -> hub can't be the shared z
    assert neighbor_jaccard(_edges(spark, star), max_hub=4,
                            min_common=1).count() == 0
    with pytest.raises(ValueError, match="max_hub"):
        neighbor_jaccard(_edges(spark, star), max_hub=1)


def test_modularity_two_cliques(spark):
    from cartwright_spark.functions.graph import modularity
    k3a = [("a1", "a2"), ("a2", "a3"), ("a1", "a3")]
    k3b = [("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    comm = spark.createDataFrame(
        [(n, n[0]) for n in ("a1", "a2", "a3", "b1", "b2", "b3")],
        "node string, comm string")
    out = {r.comm: r for r in
           modularity(_edges(spark, k3a + k3b), comm).collect()}
    # two disconnected K3s: each q_c = 3/6 - (6/12)^2 = 0.25
    for c in ("a", "b"):
        assert out[c].m_c == 3 and out[c].d_c == 6
        assert out[c].q_c == pytest.approx(0.25)


def test_modularity_single_community_is_zero(spark):
    from cartwright_spark.functions.graph import modularity
    e = [("a", "b"), ("b", "c"), ("c", "d")]
    comm = spark.createDataFrame([(n, 0) for n in "abcd"],
                                 "node string, comm int")
    out = modularity(_edges(spark, e), comm).collect()
    assert len(out) == 1
    assert out[0].m_c == 3 and out[0].d_c == 6
    assert out[0].q_c == pytest.approx(0.0)


def test_modularity_community_without_intra_edges(spark):
    from cartwright_spark.functions.graph import modularity
    # bipartite a-b: with comm = side, no intra edges at all
    e = [("a1", "b1"), ("a2", "b2")]
    comm = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("b1", "B"), ("b2", "B")],
        "node string, comm string")
    out = {r.comm: r for r in modularity(_edges(spark, e), comm).collect()}
    assert out["A"].m_c == 0 and out["A"].d_c == 2
    assert out["A"].q_c == pytest.approx(0.0 - 0.25)


def test_ppr_two_node_closed_form(spark):
    import pytest as _pt
    from cartwright_spark.functions.graph import personalized_pagerank
    # a -> b, seed {a}: r(a) converges to (1-d)+d*dang*1 with all of
    # a's mass flowing to dangling b each round; hand-iterate to check
    e = _edges(spark, [("a", "b")])
    d = 0.85
    ra, rb = 1.0, 0.0
    for _ in range(10):
        dang = rb                       # b has no out-edges
        ra, rb = (1 - d) * 1.0 + d * dang * 1.0, d * ra
    out = {r.id: r.ppr for r in
           personalized_pagerank(e, ["a"], iters=10).collect()}
    assert out["a"] == _pt.approx(ra, rel=1e-12)
    assert out["b"] == _pt.approx(rb, rel=1e-12)


def test_ppr_mass_conserved_and_seed_locality(spark):
    import pytest as _pt
    from cartwright_spark.functions.graph import personalized_pagerank
    # two disconnected 2-cycles; seeding one leaves the other at 0
    e = _edges(spark, [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")])
    out = {r.id: r.ppr for r in
           personalized_pagerank(e, ["a"], iters=6).collect()}
    assert out["x"] == 0.0 and out["y"] == 0.0
    assert sum(out.values()) == _pt.approx(1.0, rel=1e-12)
    assert out["a"] > out["b"] > 0.0


def test_ppr_validation(spark):
    import pytest as _pt
    from cartwright_spark.functions.graph import personalized_pagerank
    e = _edges(spark, [("a", "b")])
    with _pt.raises(ValueError, match="seeds"):
        personalized_pagerank(e, [])
    with _pt.raises(ValueError, match="iters"):
        personalized_pagerank(e, ["a"], iters=0)


def test_ktruss_triangle_with_pendant(spark):
    from cartwright_spark.functions.graph import ktruss_edges
    # triangle abc + pendant edge c-d: 3-truss keeps the triangle only
    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    out = {(r.u, r.v): r.support
           for r in ktruss_edges(e, k=3, rounds=3).collect()}
    assert out == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}


def test_ktruss_k4_survives_k4_truss(spark):
    from cartwright_spark.functions.graph import ktruss_edges
    # K4: every edge in 2 triangles -> survives k=4 (support >= 2)
    k4 = [(a, b) for i, a in enumerate("wxyz")
          for b in "wxyz"[i + 1:]]
    out = ktruss_edges(_edges(spark, k4), k=4, rounds=3).collect()
    assert len(out) == 6 and all(r.support == 2 for r in out)
    # but k=5 (support >= 3) peels everything
    assert ktruss_edges(_edges(spark, k4), k=5, rounds=3).count() == 0


def test_ktruss_cascading_peel(spark):
    from cartwright_spark.functions.graph import ktruss_edges
    # two triangles sharing edge (b,c), plus a tail making a fragile
    # triangle that only dies after the first peel removes its side
    e = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
         ("d", "e"), ("c", "e")]
    # k=4: edge (b,c) has support 2, all others 1 -> everything peels
    # (cascade: removing support-1 edges kills (b,c)'s triangles too)
    assert ktruss_edges(_edges(spark, e), k=4, rounds=4).count() == 0


def test_ktruss_validation(spark):
    import pytest as _pt
    from cartwright_spark.functions.graph import ktruss_edges
    e = _edges(spark, [("a", "b")])
    with _pt.raises(ValueError, match="k must"):
        ktruss_edges(e, k=1)
    with _pt.raises(ValueError, match="rounds"):
        ktruss_edges(e, rounds=0)

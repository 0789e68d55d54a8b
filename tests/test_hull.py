"""convex_hull: brute-force extreme-point parity, partition invariance,
degenerate groups, coordinate guard."""

import numpy as np
import pytest

from cartwright_spark.spatial.hull import convex_hull


def _brute_vertices(pts):
    """Strict hull vertices by the chord characterization (the oracle's
    definition, independent of the engine's monotone chain)."""
    pts = sorted(set(pts))
    ux, lx = {}, {}
    for x, y in pts:
        ux[x] = max(ux.get(x, y), y)
        lx[x] = min(lx.get(x, y), y)

    def chain(ext, upper):
        out = set()
        items = sorted(ext.items())
        for px, py in items:
            dominated = False
            for ax, ay in items:
                if ax >= px:
                    continue
                for bx, by in items:
                    if bx <= px:
                        continue
                    cross = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
                    if (cross <= 0) if upper else (cross >= 0):
                        dominated = True
                        break
                if dominated:
                    break
            if not dominated:
                out.add((px, py))
        return out

    return chain(ux, True) | chain(lx, False)


def test_hand_cases(spark):
    rows = [("a", 0, 0), ("a", 4, 0), ("a", 4, 4), ("a", 0, 4),
            ("a", 2, 2), ("a", 2, 0),        # interior + mid-edge
            ("b", 1, 1),                       # singleton
            ("c", 0, 0), ("c", 1, 1), ("c", 2, 2), ("c", 3, 3),
            ("d", 5, 5), ("d", 5, 5),          # duplicates
            ("e", 7, 0), ("e", 7, 9), ("e", 7, 4)]  # vertical line
    df = spark.createDataFrame(rows, ["grp", "x", "y"]).repartition(8)
    got = {(r.grp, r.x, r.y) for r in convex_hull(df).collect()}
    assert got == {("a", 0, 0), ("a", 4, 0), ("a", 4, 4), ("a", 0, 4),
                   ("b", 1, 1), ("c", 0, 0), ("c", 3, 3), ("d", 5, 5),
                   ("e", 7, 0), ("e", 7, 9)}


def test_random_bruteforce_parity_and_partition_invariance(spark):
    rng = np.random.default_rng(7)
    rows = [(f"g{g}", int(x), int(y))
            for g in range(4)
            for x, y in rng.integers(-50, 51, (150, 2))]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    want = {}
    for g in range(4):
        pts = [(x, y) for gg, x, y in rows if gg == f"g{g}"]
        want.update({(f"g{g}", x, y): 1 for x, y in _brute_vertices(pts)})
    for nparts in (1, 7, 32):
        got = {(r.grp, r.x, r.y)
               for r in convex_hull(df.repartition(nparts)).collect()}
        assert got == set(want), f"nparts={nparts}"


def test_coord_guard(spark):
    df = spark.createDataFrame([("a", 2_000_000_000, 0), ("a", 0, 1)],
                               ["grp", "x", "y"])
    with pytest.raises(Exception, match="too large"):
        convex_hull(df).collect()

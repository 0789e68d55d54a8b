"""Dynamic time warping — operators/dtw.py."""
import pytest


def _traces(spark, seqs):
    rows = [(t, p, y) for t, ys in seqs.items()
            for p, y in enumerate(ys)]
    return spark.createDataFrame(rows, "trace_id long, pos int, y long")


def _pairs(spark, ps):
    return spark.createDataFrame(ps, "a_id long, b_id long")


def test_dtw_kernel_reference_values():
    from cartwright_spark.operators.dtw import _dtw_int
    # identical sequences align perfectly
    assert _dtw_int([1, 2, 3], [1, 2, 3]) == 0
    # classic textbook case: [1,2,3] vs [1,1,2,3] warps the 1
    assert _dtw_int([1, 2, 3], [1, 1, 2, 3]) == 0
    # constant shift: every alignment costs the shift
    assert _dtw_int([0, 0, 0], [5, 5, 5]) == 15
    # single elements: plain absolute difference
    assert _dtw_int([7], [3]) == 4
    # brute-force cross-check on a small pair
    import itertools
    a, b = [3, 1, 4, 1, 5], [2, 7, 1, 8]
    def brute(a, b):
        import functools
        @functools.lru_cache(None)
        def d(i, j):
            if i == 0 and j == 0:
                return abs(a[0] - b[0])
            if i < 0 or j < 0:
                return 10 ** 9
            return abs(a[i] - b[j]) + min(d(i - 1, j), d(i, j - 1),
                                          d(i - 1, j - 1))
        return d(len(a) - 1, len(b) - 1)
    assert _dtw_int(a, b) == brute(tuple(a), tuple(b))


def test_dtw_pairs_dataframe(spark):
    from cartwright_spark.operators.dtw import dtw_pairs
    tr = _traces(spark, {1: [1, 2, 3], 2: [1, 1, 2, 3], 3: [0, 0, 0]})
    out = {(r.a_id, r.b_id): r for r in
           dtw_pairs(tr, _pairs(spark, [(1, 2), (1, 3)])).collect()}
    assert out[(1, 2)].dtw == 0
    assert out[(1, 2)].n == 3 and out[(1, 2)].m == 4
    assert out[(1, 3)].dtw == 6        # [1,2,3] vs [0,0,0]


def test_dtw_position_order_not_insert_order(spark):
    from cartwright_spark.operators.dtw import dtw_pairs
    rows = [(1, 2, 30), (1, 0, 10), (1, 1, 20),
            (2, 0, 10), (2, 1, 20), (2, 2, 30)]
    tr = spark.createDataFrame(rows, "trace_id long, pos int, y long")
    out = dtw_pairs(tr, _pairs(spark, [(1, 2)])).collect()[0]
    assert out.dtw == 0                # same series once sorted by pos


def test_dtw_area_guard(spark):
    from cartwright_spark.operators.dtw import dtw_pairs
    tr = _traces(spark, {1: list(range(10)), 2: list(range(10))})
    with pytest.raises(Exception, match="max_cells"):
        dtw_pairs(tr, _pairs(spark, [(1, 2)]), max_cells=50).collect()
    with pytest.raises(ValueError, match="max_cells"):
        dtw_pairs(tr, _pairs(spark, [(1, 2)]), max_cells=1)

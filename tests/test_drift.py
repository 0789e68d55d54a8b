"""psi_drift: reference parity, empty-bucket smoothing, clamping,
identity and guards."""

import math

import numpy as np
import pytest

from cartwright_spark.operators.drift import psi_drift


def _ref(ref, cur, width=5.0, bins=20):
    cr, cc = [0] * bins, [0] * bins
    for v in ref:
        cr[min(max(int(v // width), 0), bins - 1)] += 1
    for v in cur:
        cc[min(max(int(v // width), 0), bins - 1)] += 1
    nr, nc = len(ref), len(cur)
    s = 0.0
    for i in range(bins):
        p = (cr[i] + 1) / (nr + bins)
        q = (cc[i] + 1) / (nc + bins)
        s += (p - q) * math.log(p / q)
    return s


def _run(spark, groups, **kw):
    rows = [(g, float(v), bool(r))
            for g, (ref, cur) in groups.items()
            for vs, r in ((ref, True), (cur, False)) for v in vs]
    df = spark.createDataFrame(rows, ["grp", "v", "is_ref"])
    return {r.grp: r for r in psi_drift(df, value_col="v", **kw).collect()}


def test_shift_detected_identity_near_zero(spark):
    rng = np.random.default_rng(4)
    ref = rng.normal(30, 10, 400).tolist()
    groups = {"shift": (ref, rng.normal(55, 12, 300).tolist()),
              "same": (ref, rng.normal(30, 10, 350).tolist()),
              "ident": (ref, ref)}
    got = _run(spark, groups)
    for g, (a, b) in groups.items():
        assert got[g].psi == pytest.approx(_ref(a, b), abs=1e-12), g
    assert got["ident"].psi == pytest.approx(0.0, abs=1e-12)
    assert got["shift"].psi > 0.25 > got["same"].psi


def test_reference_parity_and_empty_buckets(spark):
    # current slice squeezed into 2 buckets: 18 empty buckets with
    # unequal n_ref/n_cur MUST still contribute smoothing terms
    ref = [float(v) for v in range(0, 100)]
    cur = [1.0] * 7 + [6.0] * 5
    got = _run(spark, {"g": (ref, cur)})
    assert got["g"].psi == pytest.approx(_ref(ref, cur), abs=1e-12)
    assert (got["g"].n_ref, got["g"].n_cur) == (100, 12)


def test_out_of_range_clamped(spark):
    ref = [-50.0, 500.0, 2.0]
    cur = [3.0, 1000.0]
    got = _run(spark, {"g": (ref, cur)})
    assert got["g"].psi == pytest.approx(_ref(ref, cur), abs=1e-12)


def test_guards(spark):
    with pytest.raises(ValueError):
        _run(spark, {"g": ([1.0], [1.0])}, bin_width=0)
    with pytest.raises(ValueError):
        _run(spark, {"g": ([1.0], [1.0])}, n_bins=1)

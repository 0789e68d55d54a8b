"""Generate→validate round-trips for the 82-label taxonomy.

Mirrors the reference suites (tests/test_dates.py:64-69,
test_partial_dates.py, test_timespans.py, test_geos.py, test_misc.py):
each label's seeded generator produces values that its own validator
accepts at or above the label's threshold. Reference xfails are asserted
as documented behavior: misc labels and the shadowed country_name always
fail; city_suffix values don't survive the gazetteer probe.
"""

import numpy as np
import pandas as pd
import pytest

from cartwright_spark.taxonomy.registry import all_labels, ordered_labels

N = 500
XFAIL_LABELS = {"city_suffix"}  # probe can't match generic suffixes (test_geos.py:31)


def test_label_space_is_82():
    reg = all_labels()
    assert len(reg) == 82
    kinds = pd.Series([sp.kind for sp in reg.values()]).value_counts().to_dict()
    assert kinds["date"] == 47
    assert kinds["partial_date"] == 7
    assert kinds["timespan"] == 6
    assert kinds["geo"] == 8   # 9 − country_name collision
    assert kinds["misc"] == 14


def test_country_name_collision_is_misc():
    # misc loads after geos in the reference registry (category_helpers.py:10)
    sp = all_labels()["country_name"]
    assert sp.kind == "misc"
    assert sp.valid_count(pd.Series(["Germany", "France", "Japan"])) == 0


@pytest.mark.parametrize("label", sorted(all_labels().keys()))
def test_generate_validate_roundtrip(label):
    sp = all_labels()[label]
    rng = np.random.default_rng(123)
    vals = pd.Series(sp.generate(N, rng)).astype(str)
    cnt = sp.valid_count(vals)
    if sp.kind == "misc":
        assert cnt == 0, f"misc decoy {label} must never validate"
    elif label in XFAIL_LABELS:
        assert cnt == 0
    else:
        assert cnt >= N * sp.threshold, f"{label}: {cnt}/{N}"


def test_cascade_self_identification():
    """Each non-decoy label's data, run through the full bank with the
    cascade's (pass-rate, priority) ranking, must come back as itself —
    this is what the LSTM's argmax provided in the reference."""
    rng = np.random.default_rng(7)
    mistakes = []
    for sp in ordered_labels():
        if sp.kind == "misc" or sp.label in XFAIL_LABELS:
            continue
        vals = pd.Series(sp.generate(99, rng)).astype(str)
        n = len(vals)
        best, best_rate = None, -1.0
        for cand in ordered_labels():
            cnt = cand.valid_count(vals)
            if cnt <= 0 or cnt < n * cand.threshold:
                continue
            rate = cnt / n
            if rate > best_rate + 1e-12:
                best, best_rate = cand, rate
        if best is None or best.label != sp.label:
            mistakes.append((sp.label, None if best is None else best.label))
    assert not mistakes, f"cascade misidentified: {mistakes}"

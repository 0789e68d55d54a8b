"""OPERATORS.md freshness gate (VERDICT r4 item 8).

The index is GENERATED from the contract (queries() + oracle_sql() +
bench list + tests/ grep); a new query landing without a regenerated
OPERATORS.md — or a hand edit drifting from the contract — fails here.
No Spark session needed: the generator only parses source.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _load_generator():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gen_operators_md",
        os.path.join(REPO, "scripts", "gen_operators_md.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_operators_md_is_fresh():
    build = _load_generator().build
    path = os.path.join(REPO, "OPERATORS.md")
    assert os.path.exists(path), "OPERATORS.md missing — run scripts/gen_operators_md.py"
    cur = open(path, encoding="utf-8").read()
    assert cur == build(), (
        "OPERATORS.md is stale — run scripts/gen_operators_md.py")


def test_operators_md_row_per_query():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    body = open(os.path.join(REPO, "OPERATORS.md"), encoding="utf-8").read()
    for name in m.queries():
        assert f"| `{name}` |" in body, f"no OPERATORS.md row for {name}"

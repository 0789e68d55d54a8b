"""Fuzzy string matching — from-scratch fuzzywuzzy-compatible scorers.

The reference uses ``fuzz.ratio`` / ``fuzz.token_sort_ratio`` (pure-python
fuzzywuzzy mode is difflib.SequenceMatcher based) for header matching and
gazetteer probes (reference utils.py:10-21, geos.py:11-88,
categorize.py:287-352). We reimplement on the stdlib so behavior is
self-contained and deterministic:

  ratio(a, b)            = round(100 * 2*M / (len(a)+len(b)))   [difflib]
  token_sort_ratio(a, b) = ratio(" ".join(sorted(tokens)), ...)

Scale note: these run only on metadata-scale inputs (column headers) and on
small per-column sample probes against a broadcast gazetteer — never in the
per-document hot path, which uses exact/tokenized broadcast joins instead.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

_TOKEN_RE = re.compile(r"[\W_]+", re.UNICODE)


def ratio(a: str, b: str) -> int:
    """fuzz.ratio parity: scaled difflib real-quick... full ratio, rounded."""
    a, b = str(a), str(b)
    if not a and not b:
        return 100
    m = SequenceMatcher(None, a, b)
    return int(round(100 * m.ratio()))


def _token_sort_prep(s: str) -> str:
    tokens = _TOKEN_RE.split(str(s).lower().strip())
    return " ".join(sorted(t for t in tokens if t)).strip()


def token_sort_ratio(a: str, b: str) -> int:
    return ratio(_token_sort_prep(a), _token_sort_prep(b))


def fuzzy_match(a: str, b: str, ratio_: int = 95) -> bool:
    """reference utils.py:10-14 — lowercased ratio strictly greater-than."""
    return ratio(str(a).lower(), str(b).lower()) > ratio_


def extract_one(query: str, choices, scorer=token_sort_ratio):
    """fuzzywuzzy.process.extractOne parity: best (choice, score) or None."""
    best = None
    best_score = -1
    for c in choices:
        s = scorer(str(query), str(c))
        if s > best_score:
            best, best_score = c, s
    if best is None:
        return None
    return best, best_score

"""The 82-label registry: label → (category fields, threshold, validator,
proposal gate, seeded generator, cascade priority).

Label space parity with the reference (category_helpers.py:8-29, built from
categories/{geos,dates,timespans,misc,partial_dates}.py): 47 date formats +
7 partial dates + 6 timespans + 9 geo + 14 misc − 1 collision = 82. The
``country_name`` collision (misc loads after geos, so the always-failing
misc validator shadows the geo fuzzy probe — geos.py:65 vs misc.py:44,
xfail'd in tests/test_geos.py:31) is reproduced deliberately.

The reference ranks candidate labels by LSTM log-softmax score and validates
best-first (categorize.py:222-237). This engine scores by running *all*
validators vectorized and ranking by pass-rate; ``priority`` breaks ties
deterministically and ``gate`` reproduces the LSTM's candidate-proposal role
for shape-ambiguous labels (SURVEY.md §7.3): unix_time needs 9-13 digit
strings, partial %Y needs 4-digit strings, %Y%d needs 5-6 digit strings.
"""

from __future__ import annotations

import datetime
import string
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Callable

import numpy as np
import pandas as pd

from cartwright_spark.sources import gazetteers as gz
from cartwright_spark.taxonomy import validators as V


@dataclass
class LabelSpec:
    label: str                       # return_label(): format string or class name
    kind: str                        # date | partial_date | timespan | geo | misc
    priority: int                    # global tie-break rank (lower wins)
    threshold: float = 0.85          # CategoryBases.py:51; partial_dates 0.99
    category: str | None = None
    subcategory: str | None = None
    format: str | None = None
    parser: str | None = None
    series_level: bool = False       # validator consumes the whole sample
    validate: Callable[[pd.Series], np.ndarray] | None = None   # per-value mask
    validate_series: Callable[[pd.Series], int] | None = None   # -> valid count
    gate: Callable[[pd.Series], bool] | None = None              # proposal gate
    generate: Callable[[int, np.random.Generator], list[str]] | None = None

    def valid_count(self, series: pd.Series) -> int:
        if self.gate is not None and not self.gate(series):
            return 0
        if self.series_level:
            return int(self.validate_series(series))
        return int(self.validate(series).sum())


# ---------------------------------------------------------------------------
# generators (seeded; replace Faker — FIXTURES.md F3)
# ---------------------------------------------------------------------------

_EPOCH_LO = int(datetime.datetime(1970, 1, 2).timestamp())
_EPOCH_HI = int(datetime.datetime(2035, 12, 30).timestamp())


def _rand_dts(n: int, rng: np.random.Generator) -> list[datetime.datetime]:
    secs = rng.integers(_EPOCH_LO, _EPOCH_HI, size=n)
    return [datetime.datetime.utcfromtimestamp(int(s)) for s in secs]


def gen_strftime(fmt: str):
    def g(n: int, rng: np.random.Generator) -> list[str]:
        return [d.strftime(fmt) for d in _rand_dts(n, rng)]
    return g


def gen_choice(options):
    def g(n: int, rng: np.random.Generator) -> list[str]:
        opts = list(options)
        return [str(opts[int(i)]) for i in rng.integers(0, len(opts), size=n)]
    return g


def gen_timespan(fmt_half: str, sep: str):
    """two rendered dates joined by sep, randomly space-padded
    (reference CategoryBases.py:78-82 space_seperator)."""
    def g(n: int, rng: np.random.Generator) -> list[str]:
        a = _rand_dts(n, rng)
        b = _rand_dts(n, rng)
        pad = rng.integers(0, 2, size=n)
        return [
            x.strftime(fmt_half) + (f" {sep} " if p else sep) + y.strftime(fmt_half)
            for x, y, p in zip(a, b, pad)
        ]
    return g


def _fmt6(x: float) -> str:
    return f"{x:.6f}"


def gen_latitude(n, rng):
    return [_fmt6(v) for v in rng.uniform(-90, 90, size=n)]


def gen_longitude(n, rng):
    return [_fmt6(v) for v in rng.uniform(-180, 180, size=n)]


def gen_latlong(n, rng):
    # reference geos.py:165-169: digits randomly truncated
    cuts = [15, 15, 15, 13, -1, -2, -3]
    out = []
    for la, lo, c1, c2 in zip(
        rng.uniform(-90, 90, size=n), rng.uniform(-180, 180, size=n),
        rng.integers(0, len(cuts), size=n), rng.integers(0, len(cuts), size=n),
    ):
        out.append(_fmt6(la)[: cuts[int(c1)]] + ", " + _fmt6(lo)[: cuts[int(c2)]])
    return out


def gen_unix_time(n, rng):
    return [str(int(v)) for v in rng.integers(10**9, 4102506000, size=n)]


_FIRST_NAMES = ["James", "Mary", "Robert", "Patricia", "John", "Jennifer",
                "Michael", "Linda", "David", "Elizabeth", "Ana", "Luis",
                "Wei", "Yuki", "Amara", "Kofi", "Elena", "Omar"]
_LANGS = ["English", "Spanish", "French", "German", "Mandarin", "Hindi",
          "Arabic", "Portuguese", "Russian", "Japanese", "Swahili"]
_PREFIXES = ["Mr.", "Mrs.", "Ms.", "Dr.", "Prof."]
_WORDS = ["data", "spark", "table", "query", "join", "river", "mountain",
          "green", "system", "window", "filter", "batch", "vector", "model"]


def gen_percent(n, rng):
    return [f"{v:.1f}%" for v in rng.uniform(0, 100, size=n)]


def gen_ssn(n, rng):
    return [f"{a:03d}-{b:02d}-{c:04d}" for a, b, c in zip(
        rng.integers(1, 900, n), rng.integers(1, 100, n), rng.integers(1, 10000, n))]


def gen_phone(n, rng):
    return [f"({a:03d}) {b:03d}-{c:04d}" for a, b, c in zip(
        rng.integers(200, 1000, n), rng.integers(100, 1000, n), rng.integers(0, 10000, n))]


def gen_zip(n, rng):
    return [f"{v:05d}" for v in rng.integers(501, 99951, size=n)]


def gen_paragraph(n, rng):
    out = []
    for _ in range(n):
        k = int(rng.integers(8, 20))
        out.append(" ".join(_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), k)) + ".")
    return out


def gen_pyfloat(n, rng):
    return [str(round(float(v), 4)) for v in rng.uniform(-1e5, 1e5, size=n)]


def gen_email(n, rng):
    return [f"user{int(i)}@example.org" for i in rng.integers(0, 10**6, size=n)]


def gen_pystr(n, rng):
    letters = np.array(list(string.ascii_letters))
    return ["".join(letters[rng.integers(0, len(letters), 10)]) for _ in range(n)]


# ---------------------------------------------------------------------------
# gates — reproduce the LSTM's proposal role for shape-ambiguous labels
# ---------------------------------------------------------------------------

def _regex_gate(pattern: str, frac: float = 0.5):
    def gate(s: pd.Series) -> bool:
        m = s.astype(str).str.match(pattern)
        return bool(m.mean() >= frac)
    return gate


# ---------------------------------------------------------------------------
# registry construction (priority = list position)
# ---------------------------------------------------------------------------

_DATE_SEPS = ["-", "/", "_", "."]


def _date_spec(fmt: str, priority: int, *, gate=None, generate=None) -> LabelSpec:
    return LabelSpec(
        label=fmt, kind="date", priority=priority, category="time",
        subcategory="date", format=fmt, parser="Util",
        validate=lambda s, f=fmt: V.v_strptime(s, f),
        gate=gate, generate=generate or gen_strftime(fmt),
    )


@lru_cache(maxsize=1)
def all_labels() -> dict[str, LabelSpec]:
    specs: list[LabelSpec] = []
    p = 0

    def nxt() -> int:
        nonlocal p
        p += 1
        return p

    # 1) compound datetime formats (most specific)
    specs.append(_date_spec("%Y-%m-%dT%H:%M:%S", nxt()))
    for sep in _DATE_SEPS:
        specs.append(_date_spec(f"%Y{sep}%m{sep}%d %H:%M:%S", nxt()))
    for lead in ("%m", "%d"):
        other = "%d" if lead == "%m" else "%m"
        for sep in _DATE_SEPS:
            specs.append(_date_spec(f"{lead}{sep}{other}{sep}%Y %H:%M:%S", nxt()))
    specs.append(_date_spec("%A, %B %d, %Y, %H:%M:%S", nxt()))
    specs.append(_date_spec("%m/%d/%y %H:%M:%S %p", nxt()))

    # 2) long/worded dates
    for fmt in ("%A, %B %d, %Y", "%B %d, %Y", "%d %B %Y", "%a, %d %b %Y", "%d %B %y"):
        specs.append(_date_spec(fmt, nxt()))

    # 3) date-only numeric formats
    for sep in _DATE_SEPS:
        specs.append(_date_spec(f"%Y{sep}%m{sep}%d", nxt()))
    specs.append(_date_spec("%Y%m%d", nxt()))
    for lead in ("%m", "%d"):
        other = "%d" if lead == "%m" else "%m"
        for sep in _DATE_SEPS:
            specs.append(_date_spec(f"{lead}{sep}{other}{sep}%Y", nxt()))
        for sep in _DATE_SEPS:
            specs.append(_date_spec(f"{lead}{sep}{other}{sep}%y", nxt()))
    for sep in _DATE_SEPS:
        specs.append(_date_spec(f"%Y{sep}%m", nxt()))
    specs.append(_date_spec("%Y%d", nxt(), gate=_regex_gate(r"^\d{5,6}$")))

    # 4) unix epoch seconds (dates.py:4-17)
    specs.append(LabelSpec(
        label="unix_time", kind="date", priority=nxt(), category="time",
        subcategory="date", format="unix_time", parser="Util",
        validate=V.v_unix_time, gate=_regex_gate(r"^-?\d{9,13}$"),
        generate=gen_unix_time,
    ))

    # 5) partial dates (partial_dates.py:5-81; %Y/%m/%d strict 0.99)
    sp = _date_spec("%B", nxt(), generate=gen_choice([m.title() for m in V.MONTHS_B]))
    sp.kind = "partial_date"
    specs.append(sp)
    specs.append(LabelSpec(
        label="%b", kind="partial_date", priority=nxt(), category="time",
        subcategory="date", format="%b", parser="Util",
        validate=lambda s: V.v_member_lower(s, V.MONTHS_b),
        generate=gen_choice(V.MONTHS_b),
    ))
    sp = _date_spec("%A", nxt(), generate=gen_choice([d.title() for d in V.DAYS_A]))
    sp.kind = "partial_date"
    specs.append(sp)
    specs.append(LabelSpec(
        label="%a", kind="partial_date", priority=nxt(), category="time",
        subcategory="date", format="%a", parser="Util",
        validate=lambda s: V.v_member_lower(s, V.DAYS_a),
        generate=gen_choice(V.DAYS_a),
    ))
    for fmt, gen in (
        ("%m", gen_choice([f"{i:02d}" for i in range(1, 13)])),
        ("%d", gen_choice([f"{i:02d}" for i in range(1, 29)])),
    ):
        sp = _date_spec(fmt, nxt(), generate=gen)
        sp.kind, sp.threshold = "partial_date", 0.99
        specs.append(sp)
    sp = _date_spec("%Y", nxt(), gate=_regex_gate(r"^\d{4}$"),
                    generate=gen_choice([str(y) for y in range(1970, 2036)]))
    sp.kind, sp.threshold = "partial_date", 0.99
    specs.append(sp)

    # 6) timespans (timespans.py:7-114)
    ts_defs = [
        ("%Y-%Y", "-", None), ("%Y:%Y", ":", None),
        ("%B %d, %Y - %B %d, %Y", "-", "%B %d, %Y"),
        ("%d-%m-%Y:%d-%m-%Y", ":", "%d-%m-%Y"),
        ("%d/%m/%Y:%d/%m/%Y", ":", "%d/%m/%Y"),
        ("%d/%m/%Y-%d/%m/%Y", "-", "%d/%m/%Y"),
    ]
    for fmt, sep, half in ts_defs:
        if half is None:
            val = (lambda s, sp_=sep: V.v_timespan_years(s, sp_))
            gen = gen_timespan("%Y", sep)
        else:
            val = (lambda s, sp_=sep, h=half: V.v_timespan_dates(s, sp_, h))
            gen = gen_timespan(half, sep)
        specs.append(LabelSpec(
            label=fmt, kind="timespan", priority=nxt(), category="time",
            subcategory="timespan", format=fmt, parser=None,
            validate=val, generate=gen,
        ))

    # 7) geo labels (geos.py)
    specs.append(LabelSpec("ISO3", "geo", nxt(), category="geo", subcategory="ISO3",
                           validate=V.v_iso3, generate=gen_choice(sorted(gz.iso3_set()))))
    specs.append(LabelSpec("ISO2", "geo", nxt(), category="geo", subcategory="ISO2",
                           validate=V.v_iso2, generate=gen_choice(sorted(gz.iso2_set()))))
    specs.append(LabelSpec("latlong", "geo", nxt(), category="geo", subcategory="latlong",
                           validate=V.v_latlong, generate=gen_latlong))
    specs.append(LabelSpec("latitude", "geo", nxt(), category="geo", subcategory="latitude",
                           validate=V.v_latitude, generate=gen_latitude))
    specs.append(LabelSpec("longitude", "geo", nxt(), category="geo", subcategory="longitude",
                           validate=V.v_longitude, generate=gen_longitude))
    specs.append(LabelSpec("continent", "geo", nxt(), category="geo", subcategory="continent",
                           validate=V.v_continent, generate=gen_choice(gz.continent_terms())))
    specs.append(LabelSpec("city", "geo", nxt(), category="geo", subcategory="city",
                           series_level=True, validate_series=V.v_city_series,
                           generate=gen_choice(gz.city_names())))
    specs.append(LabelSpec("city_suffix", "geo", nxt(), category="geo",
                           subcategory="city_suffix", series_level=True,
                           validate_series=V.v_city_series,
                           generate=gen_choice(["port", "ville", "berg", "ton",
                                                "furt", "mouth", "stad", "burgh"])))

    # 8) misc decoys — validate_series → 0 (CategoryBases.py:102-108), so the
    # final category is always None. 'country_name' here shadows the geo
    # fuzzy probe (label collision, see module docstring).
    misc_gens = {
        "first_name": gen_choice(_FIRST_NAMES),
        "percent": gen_percent,
        "ssn": gen_ssn,
        "language_name": gen_choice(_LANGS),
        "country_name": gen_choice(gz.country_names()),
        "phone_number": gen_phone,
        "zipcode": gen_zip,
        "paragraph": gen_paragraph,
        "pyfloat": gen_pyfloat,
        "email": gen_email,
        "prefix": gen_choice(_PREFIXES),
        "pystr": gen_pystr,
        "boolean": gen_choice(["True", "False"]),
        "boolean_letter": gen_choice(["t", "f", "T", "F"]),
    }
    for name, gen in misc_gens.items():
        specs.append(LabelSpec(name, "misc", nxt(), series_level=True,
                               validate_series=lambda s: 0, generate=gen))

    reg = {sp.label: sp for sp in specs}
    assert len(reg) == 82, f"label space must be 82, got {len(reg)}"
    return reg


def ordered_labels() -> list[LabelSpec]:
    return sorted(all_labels().values(), key=lambda sp: sp.priority)

"""Result records and enums.

Mirrors the reference's pydantic schema surface (reference
``cartwright/schemas.py:42-166``) as plain dataclasses/enums — the values are
the contract our fixtures assert; pydantic itself is an implementation detail
we drop.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class Category(str, enum.Enum):
    geo = "geo"
    time = "time"
    boolean = "boolean"
    # kept for schema parity with the reference's wall-clock budget path
    # (categorize.py:34-37); this engine never emits it (SURVEY.md §3 E1).
    timeout = "timeout"


class Matchtype(str, enum.Enum):
    fuzzy = "fuzzy"
    LSTM = "LSTM"  # name kept for parity; our scorer is the validator bank


class Parser(str, enum.Enum):
    util = "Util"
    arrow = "arrow"


class Uniformity(str, enum.Enum):
    PERFECT = "PERFECT"
    UNIFORM = "UNIFORM"
    NOT_UNIFORM = "NOT_UNIFORM"


# reference schemas.py:111-126 — seconds per unit
TIME_UNITS: dict[str, float] = {
    "millisecond": 1e-3,
    "second": 1.0,
    "minute": 60.0,
    "hour": 3600.0,
    "day": 86400.0,
    "week": 604800.0,
    "year": 365 * 86400.0,
    "month": 365 * 86400.0 / 12,
    "decade": 10 * 365 * 86400.0 + 2 * 86400.0,
    "century": 100 * 365 * 86400.0 + 24 * 86400.0,
    "millennium": 1000 * 365 * 86400.0 + 242 * 86400.0,
}

# reference schemas.py:128-132 — degrees per unit
ANGLE_UNITS: dict[str, float] = {
    "degrees": 1.0,
    "minutes": 1.0 / 60.0,
    "seconds": 1.0 / 3600.0,
}


@dataclass
class Classification:
    """One column's detection outcome (reference schemas.py:150-161)."""

    column: str
    category: str | None = None
    subcategory: str | None = None
    format: str | None = None
    match_type: list[str] = field(default_factory=list)
    parser: str | None = None
    fuzzy_column: dict | None = None

    def to_dict(self) -> dict:
        return {
            "column": self.column,
            "category": self.category,
            "subcategory": self.subcategory,
            "format": self.format,
            "match_type": self.match_type,
            "Parser": self.parser,
            "fuzzyColumn": self.fuzzy_column,
        }


@dataclass
class Resolution:
    """Temporal/angular resolution (reference schemas.py:134-140)."""

    uniformity: str
    unit: str
    resolution: float
    error: float


@dataclass
class GeoSpatialResolution:
    lat: Resolution | None = None
    lon: Resolution | None = None
    square: Resolution | None = None

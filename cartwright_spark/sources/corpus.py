"""Deterministic synthetic Common-Crawl-style pages corpus.

Schema per BASELINE.json ``input_hint``:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Every field is a pure function of the row index ``i`` (FIXTURES.md F1), so
the corpus is byte-identical at any parallelism/partitioning — the property
the extraction invariant and resume tests rely on. Generation is distributed
(``spark.range`` → ``mapInPandas``), so a 10^6-row bench corpus is built in
parallel without driver materialization.

Embedded detectables: "lat, lon" coordinate pairs (20% in 3 hot urban boxes
~0.1°x0.1° to exercise hot-cell skew), gazetteer city/country names, ISO2/
ISO3 codes, dates in reference formats, plus distractor prose.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cartwright_spark.sources.gazetteers import (
    HOT_BOXES,
    cities_pdf,
    countries_pdf,
)

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("lang", T.StringType(), False),
])

_LANGS = ["en", "es", "fr", "de", "pt"]
_CATEGORIES = ["news", "blog", "wiki", "shop", "forum"]
_DATE_FMTS = ["%Y-%m-%d", "%m/%d/%Y", "%d %B %Y", "%B %d, %Y", "%Y/%m/%d"]
_PROSE = ["the river runs past the old mill", "markets opened higher today",
          "a recipe for winter stew", "local teams drew at the stadium",
          "notes on distributed query engines", "travel tips for the north"]

# land-ish boxes for the 80% non-hot coordinates
_LAND_BOXES = [(-35.0, 10.0, 60.0, 40.0), (25.0, -110.0, 49.0, -70.0),
               (-30.0, 115.0, -12.0, 150.0), (5.0, 70.0, 30.0, 90.0),
               (35.0, -10.0, 60.0, 30.0)]


def _coord_for(i: int) -> tuple[float, float]:
    """Deterministic coordinate for row i; 20% land in hot boxes."""
    h = (i * 2654435761) & 0xFFFFFFFF  # Knuth multiplicative hash
    u1 = ((h >> 8) & 0xFFFF) / 65536.0
    u2 = ((h >> 16) & 0xFFFF) / 65536.0
    if i % 5 == 0:  # hot 20%
        _, bla, blo = HOT_BOXES[i % len(HOT_BOXES)]
        return bla - 0.05 + 0.1 * u1, blo - 0.05 + 0.1 * u2
    lo0, la0, lo1, la1 = None, None, None, None
    b = _LAND_BOXES[i % len(_LAND_BOXES)]
    la0, lo0, la1, lo1 = b
    return la0 + (la1 - la0) * u1, lo0 + (lo1 - lo0) * u2


def _row(i: int, cities: list[str], countries: list[tuple[str, str, str]]) -> tuple:
    import datetime

    lat, lon = _coord_for(i)
    city = cities[i % len(cities)]
    cname, iso2, iso3 = countries[(i * 7) % len(countries)]
    d = datetime.datetime(2021, 1, 1) + datetime.timedelta(seconds=(i * 104729) % (4 * 365 * 86400))
    date_str = d.strftime(_DATE_FMTS[i % len(_DATE_FMTS)])
    prose = _PROSE[i % len(_PROSE)]
    text = (
        f"{prose}. Report filed from {city}, {cname} ({iso3}) on {date_str}. "
        f"Station at {lat:.6f}, {lon:.6f} recorded reading {((i * 31) % 997) / 10.0}. "
        f"Contact office {iso2} district {i % 89}."
    )
    html = (
        f"<html><head><title>t{i}</title><meta charset=\"utf-8\"/></head>"
        f"<body><nav>home | about</nav><p>{text}</p>"
        f"<footer>&copy; site{i % 97}</footer></body></html>"
    ).encode("utf-8")
    url = f"https://site{i % 97}.example/{_CATEGORIES[i % len(_CATEGORIES)]}/{i}"
    ts = datetime.datetime(2023, 1, 1) + datetime.timedelta(seconds=int(i) * 7919 % (10**9))
    return (url, ts, html, text, _LANGS[i % len(_LANGS)])


def generate_pages(spark: SparkSession, n_rows: int = 2000,
                   partitions: int | None = None) -> DataFrame:
    cities = list(cities_pdf()["city"])
    countries = [tuple(r) for r in countries_pdf().itertuples(index=False)]

    def build(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [_row(int(i), cities, countries) for i in ids]
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
            yield out

    rng = spark.range(0, n_rows, numPartitions=partitions or max(4, n_rows // 50000))
    return rng.mapInPandas(build, PAGES_SCHEMA)

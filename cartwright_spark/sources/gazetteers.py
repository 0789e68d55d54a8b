"""Gazetteer tables — countries / cities / states / continents.

The reference ships four lookup CSVs loaded into class-level pandas frames
(reference CategoryBases.py:24-51; sizes 246 / 24,534 / 72 / 7). We rebuild
the same *shapes* from public knowledge plus deterministic synthesis
(FIXTURES.md F4): a core of real ISO-3166 names/codes and well-known cities
(public facts), padded with seeded synthetic rows to the reference row
counts. Generation and validation share these tables, so fixture round-trips
are exact.

At query time gazetteers are broadcast — they are the canonical small-dim
side of every membership/similarity join (SURVEY.md §2.3 J1-J4). Python-set
variants exist for use inside pandas UDF closures.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# continents — reference resources/continent_lookup.csv incl. the 'NA' fixup
# (CategoryBases.py:50: pandas reads the North-America code as NaN)
# ---------------------------------------------------------------------------
CONTINENTS: list[tuple[str, str]] = [
    ("AF", "Africa"),
    ("NA", "North America"),
    ("OC", "Oceania"),
    ("AN", "Antarctica"),
    ("AS", "Asia"),
    ("EU", "Europe"),
    ("SA", "South America"),
]

# ---------------------------------------------------------------------------
# countries — real ISO-3166 core (public facts), padded to 246 rows with
# synthetic entries using the X* private-use code space (no collisions).
# ---------------------------------------------------------------------------
_REAL_COUNTRIES: list[tuple[str, str, str]] = [
    ("Afghanistan", "AF", "AFG"), ("Albania", "AL", "ALB"), ("Algeria", "DZ", "DZA"),
    ("Andorra", "AD", "AND"), ("Angola", "AO", "AGO"), ("Argentina", "AR", "ARG"),
    ("Armenia", "AM", "ARM"), ("Australia", "AU", "AUS"), ("Austria", "AT", "AUT"),
    ("Azerbaijan", "AZ", "AZE"), ("Bangladesh", "BD", "BGD"), ("Belarus", "BY", "BLR"),
    ("Belgium", "BE", "BEL"), ("Bolivia", "BO", "BOL"), ("Brazil", "BR", "BRA"),
    ("Bulgaria", "BG", "BGR"), ("Cambodia", "KH", "KHM"), ("Cameroon", "CM", "CMR"),
    ("Canada", "CA", "CAN"), ("Chad", "TD", "TCD"), ("Chile", "CL", "CHL"),
    ("China", "CN", "CHN"), ("Colombia", "CO", "COL"), ("Croatia", "HR", "HRV"),
    ("Cuba", "CU", "CUB"), ("Cyprus", "CY", "CYP"), ("Czechia", "CZ", "CZE"),
    ("Denmark", "DK", "DNK"), ("Ecuador", "EC", "ECU"), ("Egypt", "EG", "EGY"),
    ("Estonia", "EE", "EST"), ("Ethiopia", "ET", "ETH"), ("Finland", "FI", "FIN"),
    ("France", "FR", "FRA"), ("Georgia", "GE", "GEO"), ("Germany", "DE", "DEU"),
    ("Ghana", "GH", "GHA"), ("Greece", "GR", "GRC"), ("Guatemala", "GT", "GTM"),
    ("Honduras", "HN", "HND"), ("Hungary", "HU", "HUN"), ("Iceland", "IS", "ISL"),
    ("India", "IN", "IND"), ("Indonesia", "ID", "IDN"), ("Iran", "IR", "IRN"),
    ("Iraq", "IQ", "IRQ"), ("Ireland", "IE", "IRL"), ("Israel", "IL", "ISR"),
    ("Italy", "IT", "ITA"), ("Jamaica", "JM", "JAM"), ("Japan", "JP", "JPN"),
    ("Jordan", "JO", "JOR"), ("Kazakhstan", "KZ", "KAZ"), ("Kenya", "KE", "KEN"),
    ("Kuwait", "KW", "KWT"), ("Latvia", "LV", "LVA"), ("Lebanon", "LB", "LBN"),
    ("Libya", "LY", "LBY"), ("Lithuania", "LT", "LTU"), ("Luxembourg", "LU", "LUX"),
    ("Madagascar", "MG", "MDG"), ("Malaysia", "MY", "MYS"), ("Mali", "ML", "MLI"),
    ("Malta", "MT", "MLT"), ("Mexico", "MX", "MEX"), ("Mongolia", "MN", "MNG"),
    ("Morocco", "MA", "MAR"), ("Mozambique", "MZ", "MOZ"), ("Myanmar", "MM", "MMR"),
    ("Nepal", "NP", "NPL"), ("Netherlands", "NL", "NLD"), ("New Zealand", "NZ", "NZL"),
    ("Nicaragua", "NI", "NIC"), ("Niger", "NE", "NER"), ("Nigeria", "NG", "NGA"),
    ("Norway", "NO", "NOR"), ("Oman", "OM", "OMN"), ("Pakistan", "PK", "PAK"),
    ("Panama", "PA", "PAN"), ("Paraguay", "PY", "PRY"), ("Peru", "PE", "PER"),
    ("Philippines", "PH", "PHL"), ("Poland", "PL", "POL"), ("Portugal", "PT", "PRT"),
    ("Qatar", "QA", "QAT"), ("Romania", "RO", "ROU"), ("Russia", "RU", "RUS"),
    ("Rwanda", "RW", "RWA"), ("Saudi Arabia", "SA", "SAU"), ("Senegal", "SN", "SEN"),
    ("Serbia", "RS", "SRB"), ("Singapore", "SG", "SGP"), ("Slovakia", "SK", "SVK"),
    ("Slovenia", "SI", "SVN"), ("Somalia", "SO", "SOM"), ("South Africa", "ZA", "ZAF"),
    ("South Korea", "KR", "KOR"), ("Spain", "ES", "ESP"), ("Sri Lanka", "LK", "LKA"),
    ("Sudan", "SD", "SDN"), ("Sweden", "SE", "SWE"), ("Switzerland", "CH", "CHE"),
    ("Syria", "SY", "SYR"), ("Taiwan", "TW", "TWN"), ("Tajikistan", "TJ", "TJK"),
    ("Tanzania", "TZ", "TZA"), ("Thailand", "TH", "THA"), ("Tunisia", "TN", "TUN"),
    ("Turkey", "TR", "TUR"), ("Uganda", "UG", "UGA"), ("Ukraine", "UA", "UKR"),
    ("United Arab Emirates", "AE", "ARE"), ("United Kingdom", "GB", "GBR"),
    ("United States", "US", "USA"), ("Uruguay", "UY", "URY"),
    ("Uzbekistan", "UZ", "UZB"), ("Venezuela", "VE", "VEN"),
    ("Vietnam", "VN", "VNM"), ("Yemen", "YE", "YEM"), ("Zambia", "ZM", "ZMB"),
    ("Zimbabwe", "ZW", "ZWE"), ("Antarctica", "AQ", "ATA"), ("Greenland", "GL", "GRL"),
]

N_COUNTRIES = 246  # reference row count (BASELINE.md)

_SYL_A = ["Zor", "Vel", "Kan", "Bru", "Tal", "Mor", "Quel", "Ard", "Fen", "Gol",
          "Hale", "Ister", "Jun", "Kel", "Lor", "Nan", "Ost", "Pell", "Rud", "Sol"]
_SYL_B = ["andia", "ovia", "istan", "land", "mark", "onia", "aria", "ester",
          "ia", "burg", "avia", "ora"]


@lru_cache(maxsize=1)
def countries_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(42)
    rows = list(_REAL_COUNTRIES)
    seen_names = {r[0] for r in rows}
    i = 0
    while len(rows) < N_COUNTRIES:
        name = _SYL_A[int(rng.integers(len(_SYL_A)))] + _SYL_B[int(rng.integers(len(_SYL_B)))]
        if name in seen_names:
            i += 1
            name = f"{name} {i}"
        seen_names.add(name)
        k = len(rows) - len(_REAL_COUNTRIES)
        iso2 = "X" + chr(ord("A") + k % 26)  # private-use: XA..XZ (cycles w/ iso3 unique)
        iso3 = "X" + chr(ord("A") + (k // 26) % 26) + chr(ord("A") + k % 26)
        rows.append((name, iso2, iso3))
    return pd.DataFrame(rows, columns=["country_name", "iso2", "iso3"])


# ---------------------------------------------------------------------------
# states/provinces — 72 rows like the reference (US states + DC + territories
# + Canadian provinces/territories + armed-forces codes)
# ---------------------------------------------------------------------------
_STATES: list[tuple[str, str]] = [
    ("AL", "Alabama"), ("AK", "Alaska"), ("AZ", "Arizona"), ("AR", "Arkansas"),
    ("CA", "California"), ("CO", "Colorado"), ("CT", "Connecticut"),
    ("DE", "Delaware"), ("FL", "Florida"), ("GA", "Georgia"), ("HI", "Hawaii"),
    ("ID", "Idaho"), ("IL", "Illinois"), ("IN", "Indiana"), ("IA", "Iowa"),
    ("KS", "Kansas"), ("KY", "Kentucky"), ("LA", "Louisiana"), ("ME", "Maine"),
    ("MD", "Maryland"), ("MA", "Massachusetts"), ("MI", "Michigan"),
    ("MN", "Minnesota"), ("MS", "Mississippi"), ("MO", "Missouri"),
    ("MT", "Montana"), ("NE", "Nebraska"), ("NV", "Nevada"),
    ("NH", "New Hampshire"), ("NJ", "New Jersey"), ("NM", "New Mexico"),
    ("NY", "New York"), ("NC", "North Carolina"), ("ND", "North Dakota"),
    ("OH", "Ohio"), ("OK", "Oklahoma"), ("OR", "Oregon"), ("PA", "Pennsylvania"),
    ("RI", "Rhode Island"), ("SC", "South Carolina"), ("SD", "South Dakota"),
    ("TN", "Tennessee"), ("TX", "Texas"), ("UT", "Utah"), ("VT", "Vermont"),
    ("VA", "Virginia"), ("WA", "Washington"), ("WV", "West Virginia"),
    ("WI", "Wisconsin"), ("WY", "Wyoming"), ("DC", "District of Columbia"),
    ("AS", "America Samoa"), ("GU", "Guam"), ("MP", "Northern Mariana Islands"),
    ("PR", "Puerto Rico"), ("VI", "Virgin Islands"), ("AA", "Armed Forces Americas"),
    ("AE", "Armed Forces Europe"), ("AP", "Armed Forces Pacific"),
    ("AB", "Alberta"), ("BC", "British Columbia"), ("MB", "Manitoba"),
    ("NB", "New Brunswick"), ("NF", "Newfoundland"), ("NT", "Northwest Territories"),
    ("NS", "Nova Scotia"), ("NU", "Nunavut"), ("ON", "Ontario"),
    ("PE", "Prince Edward Island"), ("QC", "Quebec"), ("SK", "Saskatchewan"),
    ("YT", "Yukon"),
]

# ---------------------------------------------------------------------------
# cities — real anchors (public coordinates, ~2dp accuracy is ample for the
# kNN/skew fixtures) + seeded synthetic fill. Three "hot boxes" (dense urban
# clusters ~0.1°x0.1°) exercise hot-cell skew handling (FIXTURES.md F1/F4).
# ---------------------------------------------------------------------------
_REAL_CITIES: list[tuple[str, float, float]] = [
    ("New York", 40.71, -74.01), ("Los Angeles", 34.05, -118.24),
    ("Chicago", 41.88, -87.63), ("London", 51.51, -0.13),
    ("Paris", 48.86, 2.35), ("Berlin", 52.52, 13.41), ("Madrid", 40.42, -3.70),
    ("Rome", 41.90, 12.50), ("Tokyo", 35.68, 139.69), ("Osaka", 34.69, 135.50),
    ("Beijing", 39.90, 116.41), ("Shanghai", 31.23, 121.47),
    ("Delhi", 28.61, 77.21), ("Mumbai", 19.08, 72.88), ("Cairo", 30.04, 31.24),
    ("Lagos", 6.52, 3.38), ("Nairobi", -1.29, 36.82),
    ("Johannesburg", -26.20, 28.05), ("Moscow", 55.76, 37.62),
    ("Istanbul", 41.01, 28.98), ("Dubai", 25.20, 55.27),
    ("Singapore", 1.35, 103.82), ("Sydney", -33.87, 151.21),
    ("Melbourne", -37.81, 144.96), ("Auckland", -36.85, 174.76),
    ("Sao Paulo", -23.55, -46.63), ("Rio de Janeiro", -22.91, -43.17),
    ("Buenos Aires", -34.60, -58.38), ("Lima", -12.05, -77.04),
    ("Bogota", 4.71, -74.07), ("Mexico City", 19.43, -99.13),
    ("Toronto", 43.65, -79.38), ("Vancouver", 49.28, -123.12),
    ("Seattle", 47.61, -122.33), ("San Francisco", 37.77, -122.42),
    ("Boston", 42.36, -71.06), ("Miami", 25.76, -80.19),
    ("Houston", 29.76, -95.37), ("Denver", 39.74, -104.99),
    ("Amsterdam", 52.37, 4.90), ("Brussels", 50.85, 4.35),
    ("Vienna", 48.21, 16.37), ("Zurich", 47.37, 8.54), ("Prague", 50.08, 14.44),
    ("Warsaw", 52.23, 21.01), ("Stockholm", 59.33, 18.07),
    ("Oslo", 59.91, 10.75), ("Copenhagen", 55.68, 12.57),
    ("Helsinki", 60.17, 24.94), ("Lisbon", 38.72, -9.14),
    ("Athens", 37.98, 23.73), ("Seoul", 37.57, 126.98),
    ("Bangkok", 13.76, 100.50), ("Jakarta", -6.21, 106.85),
    ("Manila", 14.60, 120.98), ("Hanoi", 21.03, 105.85),
]

# (name, center_lat, center_lon) — dense clusters for skew tests
HOT_BOXES: list[tuple[str, float, float]] = [
    ("hotbox_nyc", 40.75, -73.99),
    ("hotbox_london", 51.50, -0.12),
    ("hotbox_tokyo", 35.68, 139.70),
]

N_CITIES = 24534  # reference city CSV row count (CategoryBases.py:24-51)


@lru_cache(maxsize=1)
def cities_pdf() -> pd.DataFrame:
    """24,534 rows — reference-parity scale (round-1 gap: 500). Real
    anchors + hot-box clusters + seeded synthetic fill. Synthetic names are
    two alphabetic words ('Zorandia Kelovia') built from a shuffled
    syllable-pair enumeration: unique by construction, detectable by the
    capitalized-gram scan (digit-suffixed names never match the word
    regex), and sharing only ~240 distinct first words — which is what the
    gram prefilter keys on."""
    rng = np.random.default_rng(4242)
    rows = [(n, la, lo) for (n, la, lo) in _REAL_CITIES]
    # hot-box cluster cities: 60 per box
    for bi, (bname, bla, blo) in enumerate(HOT_BOXES):
        for j in range(60):
            rows.append((
                f"{bname}_{j}",
                round(bla + float(rng.uniform(-0.05, 0.05)), 6),
                round(blo + float(rng.uniform(-0.05, 0.05)), 6),
            ))
    # synthetic fill: shuffled enumeration of two-word syllable names
    base = [a + b for a in _SYL_A for b in _SYL_B]          # 240 words
    n_need = N_CITIES - len(rows)
    combos = rng.permutation(len(base) * len(base))[:n_need]
    la = np.round(rng.uniform(-55, 70, n_need), 6)
    lo = np.round(rng.uniform(-180, 180, n_need), 6)
    for idx, c in enumerate(combos):
        rows.append((f"{base[c // len(base)]} {base[c % len(base)]}",
                     float(la[idx]), float(lo[idx])))
    return pd.DataFrame(rows, columns=["city", "lat", "lon"])


def states_pdf() -> pd.DataFrame:
    return pd.DataFrame(_STATES, columns=["state_code", "state_name"])


def continents_pdf() -> pd.DataFrame:
    return pd.DataFrame(CONTINENTS, columns=["continent_code", "continent_name"])


# ---- python-set accessors (for UDF closures / driver-side probes) ---------

@lru_cache(maxsize=1)
def iso2_set() -> frozenset[str]:
    return frozenset(countries_pdf()["iso2"])


@lru_cache(maxsize=1)
def iso3_set() -> frozenset[str]:
    return frozenset(countries_pdf()["iso3"])


@lru_cache(maxsize=1)
def country_names() -> tuple[str, ...]:
    return tuple(countries_pdf()["country_name"])


@lru_cache(maxsize=1)
def city_names() -> tuple[str, ...]:
    return tuple(cities_pdf()["city"])


@lru_cache(maxsize=1)
def continent_terms() -> tuple[str, ...]:
    """Names + codes — the *intended* continent lookup (reference
    geos.py:116-132 iterates the lookup DataFrame's column names by accident;
    SURVEY.md §2.3 J4 documents replicating the intended semantics)."""
    return tuple([c for c, _ in CONTINENTS] + [n for _, n in CONTINENTS])


# ---- Spark DataFrame accessors (broadcast-sized dims) ----------------------

def countries_df(spark):
    return spark.createDataFrame(countries_pdf())


def cities_df(spark):
    return spark.createDataFrame(cities_pdf())


def states_df(spark):
    return spark.createDataFrame(states_pdf())


def continents_df(spark):
    return spark.createDataFrame(continents_pdf())

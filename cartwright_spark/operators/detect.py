"""Entity detection over extracted page text — the distributed analog of the
reference's per-column detection, applied per document at corpus scale.

Everything here is JVM-side expressions (regexp_extract_all, broadcast
joins) — the 100 TB hot path contains no Python. Detection targets mirror
the taxonomy: lat/lon pairs (geos.py:172-178 range semantics), ISO2/ISO3
codes (geos.py:100-112 membership), gazetteer city/country mentions
(geos.py:11-88, formalized as broadcast joins per SURVEY.md §2.3 J1-J3),
and dates in reference formats.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartwright_spark.sources import gazetteers as gz

# "12.345678, -98.7654" — decimal degree pair with ',' separator
_COORD_RE = r"(-?\d{1,3}\.\d{3,8}),\s*(-?\d{1,3}\.\d{3,8})"
_ISO3_RE = r"\b([A-Z]{3})\b"
_MONTHS = ("January|February|March|April|May|June|July|August|September"
           "|October|November|December")
_MONTHS_AB = "Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec"
_WD_AB = "Mon|Tue|Wed|Thu|Fri|Sat|Sun"
_WD_FULL = "Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday"

# ---------------------------------------------------------------------------
# free-text date detection at taxonomy scale: 46 of the reference's 47
# formats (dates.py:4-457 / partial_dates.py) — every string format; only
# free-text unix_time is excluded (indistinguishable from plain integers
# without column context — P6 covers the column form). One regex per
# *shape family* (not per format) keeps the scan to ~15 regexes: a family
# match expands into every format candidate it could instantiate (mdy AND
# dmy for an ambiguous 05-06-2021; datetime AND its date prefix when a
# time part is present — uniform for 'T' and space separators, replacing
# the \b-dependent inconsistency flagged in round-1 ADVICE), and
# per-format validity is decided post-explode by try_to_timestamp.
# strptime quirks mirrored exactly: %Y%d = year + day-of-January
# (yyyydd), weekday names and 12-hour %p markers are parsed-and-ignored
# when y-m-d / %H are present (stripped before the Spark parse).
# ---------------------------------------------------------------------------

_SEPS = ["-", "_", "/", "."]
_SEP_CLS = r"[-_/.]"
_TIME_RE = r"(?: \d{2}:\d{2}:\d{2})?"

# excluded from the DEFAULT free-text scan (a precision/throughput knob,
# not a capability gap — pass exclude=() to enable): %Y%d is the
# reference's year+day-of-January oddity, and over web text it matches
# every 6-digit number with a ≤31 tail (~0.6/page on the synthetic
# corpus), adding ~25% to the pipeline's detect stage for rows that are
# almost never dates. The format stays fully supported and
# coverage-tested via the explicit opt-in.
DEFAULT_EXCLUDE_FORMATS: tuple[str, ...] = ("%Y%d",)


def _date_families(exclude: tuple[str, ...] = DEFAULT_EXCLUDE_FORMATS
                   ) -> list[tuple[str, int | None, list[tuple[str, str]]]]:
    """[(regex, sep_group_pos, [(fmt_template, candidate_kind)])].

    Numeric families use ONE regex across all four separators (character
    class + backreference, so mixed-sep strings like 2021-05_06 never
    match); the template's {s} is filled from the matched separator at
    plan-build time (substring of the match), keeping the fused text scan
    at 12 date regexes instead of 38 — regex count IS the detect stage's
    cost model. sep_group_pos = 1-based char index of the separator within
    the match (None for fixed-format families). candidate_kind ∈
    {date, datetime, t_prefix, wd_date, wd_datetime, full} controls value
    extraction. Families whose every candidate is excluded are dropped
    (their regex never runs)."""
    fams = [
        # ymd (+ optional time)
        (rf"\b(\d{{4}}({_SEP_CLS})\d{{2}}\2\d{{2}}{_TIME_RE})\b", 5,
         [("%Y{s}%m{s}%d", "date"), ("%Y{s}%m{s}%d %H:%M:%S", "datetime")]),
        # mdy / dmy, 4-digit year (+ optional time)
        (rf"\b(\d{{2}}({_SEP_CLS})\d{{2}}\2\d{{4}}{_TIME_RE})\b", 3,
         [("%m{s}%d{s}%Y", "date"), ("%d{s}%m{s}%Y", "date"),
          ("%m{s}%d{s}%Y %H:%M:%S", "datetime"),
          ("%d{s}%m{s}%Y %H:%M:%S", "datetime")]),
        # mdy / dmy, 2-digit year
        (rf"\b(\d{{2}}({_SEP_CLS})\d{{2}}\2\d{{2}})\b(?!\2?\d)", 3,
         [("%m{s}%d{s}%y", "date"), ("%d{s}%m{s}%y", "date")]),
        # %Y<sep>%m partial — guarded against being a full date's prefix
        (rf"\b(\d{{4}}({_SEP_CLS})\d{{2}})\b(?!\2\d|:)", 5,
         [("%Y{s}%m", "date")]),
        (r"\b(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})\b", None,
         [("%Y-%m-%dT%H:%M:%S", "datetime"), ("%Y-%m-%d", "t_prefix")]),
        # 8-digit compact; try_to_timestamp rejects non-calendar runs
        (r"\b(\d{8})\b", None, [("%Y%m%d", "date")]),
        # 6-digit year+day-of-January (reference date_Ymd taxonomy oddity;
        # yyyydd parses exactly like strptime %Y%d). Day range is enforced
        # regex-side: day > 31 never validates, and 6-digit runs are common
        # enough in web text that the pre-prune cuts candidate rows 3x
        (r"\b(\d{4}(?:[0-2]\d|3[01]))\b", None, [("%Y%d", "date")]),
        # 12-hour-marker form: strptime parses-and-ignores %p when %H is
        # present; mirrored by stripping the marker before parsing
        (r"\b(\d{2}/\d{2}/\d{2} \d{2}:\d{2}:\d{2} [AP]M)\b", None,
         [("%m/%d/%y %H:%M:%S %p", "full")]),
        (rf"\b(\d{{1,2}} (?:{_MONTHS}) \d{{4}})\b", None,
         [("%d %B %Y", "date")]),
        (rf"\b(\d{{1,2}} (?:{_MONTHS}) \d{{2}})\b(?!\d)", None,
         [("%d %B %y", "date")]),
        (rf"\b(\d{{1,2}} (?:{_MONTHS_AB}) \d{{4}})\b", None,
         [("%d %b %Y", "date")]),
        (rf"\b((?:{_MONTHS}) \d{{1,2}}, \d{{4}})\b", None,
         [("%B %d, %Y", "date")]),
        (rf"\b((?:{_WD_AB}), \d{{1,2}} (?:{_MONTHS_AB}) \d{{4}})\b", None,
         [("%a, %d %b %Y", "wd_date")]),
        (rf"\b((?:{_WD_FULL}), (?:{_MONTHS}) \d{{1,2}}, \d{{4}}"
         rf"(?:, \d{{2}}:\d{{2}}:\d{{2}})?)\b", None,
         [("%A, %B %d, %Y", "wd_date"),
          ("%A, %B %d, %Y, %H:%M:%S", "wd_datetime")]),
    ]
    if not exclude:
        return fams
    out = []
    for rex, sp, cands in fams:
        kept = [(tpl, ck) for tpl, ck in cands if tpl not in exclude]
        if kept:
            out.append((rex, sp, kept))
    return out


#: plan-expression memo. The big dispatch expressions here (12-family
#: match array, candidate when-chain, 47-format try_to_timestamp chain,
#: the first-word IN list) are built column-by-column over py4j — ~9k
#: gateway round-trips ≈ 1.4 s of pure driver latency PER detect_all
#: call (measured, cProfile). The trees depend only on static config, so
#: they're built once per SparkContext and reused; keyed on
#: applicationId + JavaSparkContext identity — NOT the gateway, because
#: PySpark reuses one JavaGateway across stop()/start() in a process and
#: gateway identity would let cached trees (and broadcast dims bound to
#: a stopped session) survive a context restart.
_EXPR_MEMO: dict = {}


def _cached_expr(key: tuple, build, pin=None):
    """Memoized expression/dim builder. ``pin`` keeps a strong reference
    to any id()-keyed object in the cache key alive for the entry's
    lifetime, so a recycled id can never falsely hit (same pattern as
    pip.py's _COVERING_MEMO)."""
    from pyspark import SparkContext
    sc = SparkContext._active_spark_context
    ctx = (sc.applicationId, id(sc._jsc)) if sc is not None else None
    k = (ctx,) + key
    hit = _EXPR_MEMO.get(k)
    if hit is None:
        hit = _EXPR_MEMO[k] = (build(), pin)
    return hit[0]


def _strftime_to_spark(fmt: str) -> str:
    # %d maps to variable-width 'd' for textual-month families: their
    # regexes admit \d{1,2} days (strptime %d accepts unpadded), and
    # Spark's fixed-width 'dd' would reject '5 January 2021'. Numeric
    # families are regex-locked to exactly 2 day digits, so 'dd' there
    # keeps the parse strict. 'd' still parses padded '05'.
    day = "d" if ("%B" in fmt or "%b" in fmt) else "dd"
    return (fmt.replace("%Y", "yyyy").replace("%y", "yy")
            .replace("%m", "MM").replace("%d", day)
            .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
            .replace("%B", "MMMM").replace("%b", "MMM"))


# every detectable format → the Spark parse pattern applied to the value
# AFTER the weekday prefix (if any) is stripped
_SPARK_FMT: dict[str, str] = {}
for _rex, _sep_pos, _cands in _date_families(exclude=()):
    for _tpl, _ck in _cands:
        _insts = ([_tpl.replace("{s}", _s) for _s in _SEPS]
                  if "{s}" in _tpl else [_tpl])
        for _fmt in _insts:
            if _ck.startswith("wd_"):
                _SPARK_FMT[_fmt] = _strftime_to_spark(_fmt.split(", ", 1)[1])
            elif _fmt == "%Y-%m-%dT%H:%M:%S":
                _SPARK_FMT[_fmt] = "yyyy-MM-dd'T'HH:mm:ss"
            elif _fmt.endswith(" %p"):
                _SPARK_FMT[_fmt] = _strftime_to_spark(_fmt[:-3])
            else:
                _SPARK_FMT[_fmt] = _strftime_to_spark(_fmt)

DETECTABLE_DATE_FORMATS = tuple(sorted(_SPARK_FMT))


def _candidate_value(x, kind: str):
    """Per-candidate value expression from a family match `x`."""
    if kind == "full":          # the whole match, unconditionally
        return x
    if kind == "date":          # strip a trailing ' HH:MM:SS' if present
        return F.when(x.contains(":"),
                      F.substring(x, 1, F.length(x) - 9)).otherwise(x)
    if kind == "datetime":      # only when a time part is present
        return F.when(x.contains(":"), x)
    if kind == "t_prefix":      # date prefix of the ISO-T shape
        return F.substring(x, 1, 10)
    if kind == "wd_date":       # strip a trailing ', HH:MM:SS'
        return F.when(x.contains(":"),
                      F.substring(x, 1, F.length(x) - 10)).otherwise(x)
    if kind == "wd_datetime":
        return F.when(x.contains(":"), x)
    raise ValueError(kind)


def _fmt_col(x, tpl: str, sep_pos):
    if "{s}" not in tpl:
        return F.lit(tpl)
    sep = F.substring(x, sep_pos, 1)
    parts = tpl.split("{s}")
    out = [F.lit(parts[0])]
    for p in parts[1:]:
        out += [sep, F.lit(p)]
    return F.concat(*out)


def _date_match_rows(pages: DataFrame, text_col: str,
                     extra_fams: list | None = None,
                     exclude: tuple[str, ...] = DEFAULT_EXCLUDE_FORMATS
                     ) -> DataFrame:
    """(url, fam, m) — one row per (family, raw regex match), via two
    codegen explodes: pages → array<struct<fam, matches>> (ONE regex scan
    per family, all in one projection over the text column) → family rows
    → match rows. No higher-order-function lambdas anywhere: Catalyst
    evaluates transform()/flatten() callbacks interpreted per element,
    which made the previous per-match candidate expansion the detect
    stage's dominant cost (measured ~2 s of the 3 s single scan at 100k
    pages; the 14 raw regex scans are ~0.05 s each).

    extra_fams: [(fam_id, regex, group_idx)] appended families (coord/iso3
    ride the same scan in detect_all)."""
    def build():
        fams = _date_families(exclude)
        structs = [
            F.struct(F.lit(i).alias("fam"),
                     F.regexp_extract_all(F.col(text_col), F.lit(rex), 1)
                     .alias("ms"))
            for i, (rex, _sp, _c) in enumerate(fams)
        ] + [
            F.struct(F.lit(fid).alias("fam"),
                     F.regexp_extract_all(F.col(text_col), F.lit(rex), grp)
                     .alias("ms"))
            for fid, rex, grp in (extra_fams or [])
        ]
        return F.array(*structs)
    fam_arr = _cached_expr(
        ("match_structs", text_col, exclude,
         tuple(extra_fams) if extra_fams else None), build)
    return (pages
            .select("url", F.explode(fam_arr).alias("fm"))
            .select("url", F.col("fm.fam").alias("fam"),
                    F.explode("fm.ms").alias("m")))


def _date_candidate_rows(rows: DataFrame,
                         exclude: tuple[str, ...] = DEFAULT_EXCLUDE_FORMATS
                         ) -> DataFrame:
    """(url, kind, value, format) date candidates from (url, fam, m) match
    rows: a fam-dispatched when-chain builds each family's candidate-struct
    array (all plain codegen exprs — value extraction and separator-derived
    format strings), one explode, null (inapplicable) candidates dropped."""
    fams = _date_families(exclude)

    def build():
        arr = None
        for i, (_rex, sep_pos, cands) in enumerate(fams):
            m = F.col("m")
            a = F.array(*[
                F.struct(F.lit("date").alias("kind"),
                         _candidate_value(m, ck).alias("value"),
                         _fmt_col(m, tpl, sep_pos).alias("format"))
                for tpl, ck in cands])
            arr = F.when(F.col("fam") == i, a) if arr is None \
                else arr.when(F.col("fam") == i, a)
        return arr
    arr = _cached_expr(("candidate_arr", exclude), build)
    return (rows.where(F.col("fam") < len(fams))
            .select("url", F.explode(arr).alias("h"))
            .select("url", F.col("h.kind").alias("kind"),
                    F.col("h.value").alias("value"),
                    F.col("h.format").alias("format"))
            .where(F.col("value").isNotNull()))


def _date_ts_expr(value_col, format_col):
    """format-dispatched try_to_timestamp; weekday prefixes and 12-hour
    markers stripped first (strptime parses-and-ignores both when y-m-d
    and %H are present)."""
    key = ("ts_expr", str(value_col), str(format_col))

    def build():
        parse_src = F.regexp_replace(
            F.regexp_replace(value_col, r"^[A-Za-z]+, ", ""),
            r" [AP]M$", "")
        ts = None
        for fmt, pat in _SPARK_FMT.items():
            cand = F.try_to_timestamp(parse_src, F.lit(pat))
            ts = F.when(format_col == fmt, cand) if ts is None \
                else ts.when(format_col == fmt, cand)
        return ts
    return _cached_expr(key, build)


from functools import lru_cache


@lru_cache(maxsize=1)
def _city_country_dim():
    """cities + country names as ONE gram-scan dim with a kind tag
    (country rows carry null coordinates). lru-cached so the frame has a
    stable identity for the broadcast-DataFrame memo."""
    import pandas as pd
    cities = gz.cities_pdf().copy()
    cities["name_norm"] = cities["city"].str.lower()
    cities = cities.rename(columns={"city": "name"})
    cities["kind"] = "city"
    countries = gz.countries_pdf()[["country_name"]].copy()
    countries["name_norm"] = countries["country_name"].str.lower()
    countries = countries.rename(columns={"country_name": "name"})
    countries["kind"] = "country_name"
    countries["lat"] = float("nan")
    countries["lon"] = float("nan")
    return pd.concat(
        [cities[["name", "name_norm", "kind", "lat", "lon"]],
         countries[["name", "name_norm", "kind", "lat", "lon"]]],
        ignore_index=True)


def detect_all(pages: DataFrame, spark: SparkSession,
               text_col: str = "text") -> DataFrame:
    """Union of all entity detectors, one row per detection:
    (url, kind, value, subcategory, format, lat, lon).

    kind ∈ {coord, city, iso3, date}; lat/lon are null for non-spatial
    detections (dates) and gazetteer-resolved for city mentions — the
    detections table the tiling/join stages consume.

    TWO text scans total: coords + ISO3 + all date formats evaluate their
    regexes in one pass (tagged struct arrays, one explode), cities in a
    second (its posexplode word pipeline has a different generate shape).
    At 100 TB scan count is the detect stage's cost model — the earlier
    per-detector unions read the text column 8×.
    """
    nul = F.lit(None).cast("double")
    nuls = F.lit(None).cast("string")

    combined = _detect_entities_single_scan(pages, spark, text_col)
    mentions = _gazetteer_gram_mentions(
        pages, spark, _city_country_dim(), text_col).select(
        "url", F.col("kind"), F.col("name").alias("value"),
        F.col("kind").alias("subcategory"), nuls.alias("format"),
        F.when(~F.isnan("lat"), F.col("lat")).alias("lat"),
        F.when(~F.isnan("lon"), F.col("lon")).alias("lon"))
    return combined.unionByName(mentions)


def _detect_entities_single_scan(pages: DataFrame, spark: SparkSession,
                                 text_col: str = "text") -> DataFrame:
    """coord + iso3 + date detections from ONE pass over the text column.

    Each detector's regex yields a match array; arrays are tagged into a
    common (kind, value, format) struct (transform runs interpreted but
    only over actual matches, ~1-3/doc), concatenated, exploded once.
    Per-kind validation happens post-explode on narrow rows: coord range
    predicates, broadcast ISO3 membership, format-dispatched
    try_to_timestamp. Output rows are byte-identical to the per-detector
    branches (locked by detect parity tests)."""
    # coord/iso3 ride the same match-row pipeline as the date families
    # (fam ids past the date range), so the whole entity scan is two
    # codegen explodes + one fam-dispatched candidate explode — zero
    # interpreted HOF lambdas
    n_date_fams = len(_date_families())
    FAM_COORD, FAM_ISO3 = n_date_fams, n_date_fams + 1
    rows = _date_match_rows(pages, text_col, extra_fams=[
        (FAM_COORD, _COORD_RE, 0), (FAM_ISO3, _ISO3_RE, 1)])

    def build_arr():
        fams = _date_families()
        m = F.col("m")
        arr = None
        for i, (_rex, sep_pos, cands) in enumerate(fams):
            a = F.array(*[
                F.struct(F.lit("date").alias("kind"),
                         _candidate_value(m, ck).alias("value"),
                         _fmt_col(m, tpl, sep_pos).alias("format"))
                for tpl, ck in cands])
            arr = F.when(F.col("fam") == i, a) if arr is None \
                else arr.when(F.col("fam") == i, a)
        nulf = F.lit(None).cast("string")
        arr = arr.when(F.col("fam") == FAM_COORD,
                       F.array(F.struct(F.lit("coord").alias("kind"),
                                        m.alias("value"),
                                        nulf.alias("format"))))
        return arr.when(F.col("fam") == FAM_ISO3,
                        F.array(F.struct(F.lit("iso3").alias("kind"),
                                         m.alias("value"),
                                         nulf.alias("format"))))
    arr = _cached_expr(("entity_candidate_arr",), build_arr)
    hits = (rows.select("url", F.explode(arr).alias("h"))
            .select("url", F.col("h.kind").alias("kind"),
                    F.col("h.value").alias("value"),
                    F.col("h.format").alias("format"))
            # date candidates inapplicable to their match (e.g. the
            # datetime form of a time-less match) carry null values
            .where(F.col("value").isNotNull()))

    # per-kind validation on narrow rows
    lat = F.split("value", ",\\s*").getItem(0).cast("double")
    lon = F.split("value", ",\\s*").getItem(1).cast("double")
    ts = _date_ts_expr(F.col("value"), F.col("format"))

    iso3 = _cached_expr(
        ("iso3_dim", id(spark)),
        lambda: F.broadcast(spark.createDataFrame(
            gz.countries_pdf()[["iso3"]])),
        pin=spark)
    validated = (
        hits
        .withColumn("lat", F.when(F.col("kind") == "coord", lat))
        .withColumn("lon", F.when(F.col("kind") == "coord", lon))
        .withColumn("__ts_ok", ts.isNotNull())
        .join(iso3, (F.col("kind") == "iso3") & (F.col("value") == F.col("iso3")),
              "left")
        .where(
            ((F.col("kind") == "coord")
             & F.col("lat").between(-90, 90) & F.col("lon").between(-180, 180))
            | ((F.col("kind") == "iso3") & F.col("iso3").isNotNull())
            | ((F.col("kind") == "date") & F.col("__ts_ok"))
        )
    )
    return validated.select(
        "url", "kind",
        F.when(F.col("kind") == "coord",
               F.concat_ws(", ", F.col("lat"), F.col("lon")))
        .otherwise(F.col("value")).alias("value"),
        F.when(F.col("kind") == "coord", F.lit("latlong"))
        .when(F.col("kind") == "iso3", F.lit("ISO3"))
        .otherwise(F.lit("date")).alias("subcategory"),
        "format", "lat", "lon")


def detect_coordinates(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """url → exploded (lat, lon) detections, range-validated like the
    latlong validator (both parts in range ⇒ keep)."""
    pairs = F.regexp_extract_all(F.col(text_col), F.lit(_COORD_RE), 0)
    out = (
        pages.select("url", F.explode(pairs).alias("pair"))
        .withColumn("lat", F.split("pair", ",\\s*").getItem(0).cast("double"))
        .withColumn("lon", F.split("pair", ",\\s*").getItem(1).cast("double"))
        .where(
            F.col("lat").between(-90, 90) & F.col("lon").between(-180, 180)
        )
        .select("url", "lat", "lon")
    )
    return out


def detect_iso3(pages: DataFrame, spark: SparkSession,
                text_col: str = "text") -> DataFrame:
    """url → ISO3 codes present in text (broadcast semi-ish join that keeps
    the matched code — J3 as an equi-join against the tiny dim)."""
    tokens = pages.select(
        "url", F.explode(F.regexp_extract_all(F.col(text_col), F.lit(_ISO3_RE), 1)).alias("tok"))
    iso3 = F.broadcast(
        spark.createDataFrame(gz.countries_pdf()[["iso3", "country_name"]]))
    return tokens.join(iso3, tokens.tok == iso3.iso3, "inner").select(
        "url", "iso3", "country_name")


def _gazetteer_gram_mentions(pages: DataFrame, spark: SparkSession,
                             names_pdf, text_col: str = "text",
                             max_words: int = 3) -> DataFrame:
    """Capitalized word 1..max_words-grams joined against a broadcast name
    dim → (url, gram matches + dim payload columns).

    names_pdf: pandas frame with a `name_norm` (lowercased) column plus any
    payload columns to carry through.

    Design note (measured on the 100k-page corpus): building grams with
    higher-order functions (transform/filter over word indices) runs
    interpreted per element in Catalyst — 8.8 s. posexplode + lead()
    window is codegen but shuffles every word by url — 3.0 s. This
    shape — posexplode keeping the words array, codegen capitalization +
    first-word prefilter, then slice/array_join only at surviving
    positions — is whole-stage codegen with NO shuffle: 1.6 s, and at
    cluster scale it keeps the detection map-side.
    """
    # dim cache key: object identity of the pandas frame (callers build
    # their dims once via lru_cache'd gazetteer loaders or pass a stable
    # module-level frame; a fresh frame each call just misses the memo).
    # The frame is PINNED in the memo value so its id() can never be
    # recycled by a later, different frame and falsely hit. The session
    # id is in the key because the broadcast dim DataFrame is bound to
    # the session that built it.
    dim = _cached_expr(
        ("gram_dim", id(names_pdf), len(names_pdf), id(spark)),
        lambda: F.broadcast(spark.createDataFrame(names_pdf)),
        pin=(names_pdf, spark))
    # any gram matching a multi-word name must start with that name's
    # first word — prefilter word positions on that set so gram
    # construction only runs at plausible start positions. Small sets ride
    # the plan as an isin literal (InSet); at gazetteer scale (24k names,
    # still only ~300 distinct first words after dedup, but guard anyway)
    # a broadcast LEFT SEMI join keeps the plan compact and the filter
    # build-side hashed instead of re-analyzed per query
    first_words = sorted({c.split()[0] for c in names_pdf["name_norm"]})

    words = F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z][\w'&-]*"), 0)
    rows = (pages.select("url", words.alias("ws"))
            .select("url", "ws", F.posexplode("ws").alias("pos", "w"))
            .where(F.substring("w", 1, 1).between("A", "Z")))
    if len(first_words) <= 1000:
        # one parsed SQL string, not Column.isin: isin issues a py4j
        # round-trip per literal (~0.4 s at 300 first words, measured).
        # Backslashes are escaped too — with Spark's default non-ANSI
        # string literals a backslash in a gazetteer name would otherwise
        # be read as an escape and change (or break) the predicate.
        in_list = ", ".join(
            "'" + w.replace("\\", "\\\\").replace("'", "''") + "'"
            for w in first_words)
        rows = rows.where(_cached_expr(
            ("first_words", in_list),
            lambda: F.expr(f"lower(w) IN ({in_list})")))
    else:
        fw = F.broadcast(spark.createDataFrame(
            pd.DataFrame({"__fw": first_words})))
        rows = rows.join(fw, F.lower(rows.w) == fw.__fw, "left_semi")

    def _gram(n):
        # null (skipped) when fewer than n full words remain — preserves
        # the "no short tail grams" multiplicity exactly
        return F.when(F.col("pos") + n <= F.size("ws"),
                      F.array_join(F.slice("ws", F.col("pos") + 1, n), " "))

    grams = (rows.select(
        "url",
        F.explode(F.array(*[_gram(n) for n in range(1, max_words + 1)]))
        .alias("gram"))
        .where(F.col("gram").isNotNull())
        .withColumn("gram_norm", F.lower("gram")))
    return grams.join(dim, grams.gram_norm == dim.name_norm, "inner")


def detect_cities(pages: DataFrame, spark: SparkSession,
                  text_col: str = "text") -> DataFrame:
    """url → gazetteer city mentions with coordinates. Exact-match broadcast
    join on normalized name; at 100 TB the city dim (~25k rows in the
    reference) broadcasts trivially. Multi-word city names are matched by
    joining on extracted capitalized n-grams (n ≤ 3)."""
    cities = gz.cities_pdf().copy()
    cities["name_norm"] = cities["city"].str.lower()
    return _gazetteer_gram_mentions(pages, spark, cities, text_col) \
        .select("url", "city", "lat", "lon")


def detect_countries(pages: DataFrame, spark: SparkSession,
                     text_col: str = "text") -> DataFrame:
    """url → country-name mentions with ISO3 (J2 applied to free text —
    the same capitalized-gram machinery as cities against the country
    dim)."""
    countries = gz.countries_pdf()[["country_name", "iso3"]].copy()
    countries["name_norm"] = countries["country_name"].str.lower()
    return _gazetteer_gram_mentions(pages, spark, countries, text_col) \
        .select("url", "country_name", "iso3")


def detect_dates(pages: DataFrame, text_col: str = "text",
                 exclude: tuple[str, ...] = DEFAULT_EXCLUDE_FORMATS
                 ) -> DataFrame:
    """url → (format, raw, ts) across the len(DETECTABLE_DATE_FORMATS)
    (currently 47, 46 in the default scan) detectable taxonomy formats;
    validity decided by format-dispatched try_to_timestamp.

    ONE scan: every family regex produces a match array in one projection,
    two codegen explodes yield match rows, and a fam-dispatched candidate
    explode expands formats — same machinery as the fused entity scan, so
    detect_all parity holds by construction.

    Note: Spark's 'yy' parse maps 00-99 → 2000-2099 while strptime's %y
    pivots at 69 — detection VALIDITY is identical (both always parse);
    only the materialized `ts` differs for 2-digit years ≥ 69. The column
    validators (P8) keep exact strptime century semantics."""
    hits = _date_candidate_rows(
        _date_match_rows(pages, text_col, exclude=exclude), exclude=exclude) \
        .select("url", "format", F.col("value").alias("raw"))
    ts = _date_ts_expr(F.col("raw"), F.col("format"))
    return (hits.withColumn("ts", ts)
            .where(F.col("ts").isNotNull())
            .select("url", "format", "raw", "ts"))

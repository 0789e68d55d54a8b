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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cartwright_spark.sources import gazetteers as gz

# "12.345678, -98.7654" — decimal degree pair with ',' separator
_COORD_RE = r"(-?\d{1,3}\.\d{3,8}),\s*(-?\d{1,3}\.\d{3,8})"
_ISO3_RE = r"\b([A-Z]{3})\b"
_MONTHS = ("January|February|March|April|May|June|July|August|September"
           "|October|November|December")
_DATE_RES = {
    "%Y-%m-%d": r"\b(\d{4}-\d{2}-\d{2})\b",
    "%m/%d/%Y": r"\b(\d{2}/\d{2}/\d{4})\b",
    "%Y/%m/%d": r"\b(\d{4}/\d{2}/\d{2})\b",
    "%d %B %Y": rf"\b(\d{{1,2}} (?:{_MONTHS}) \d{{4}})\b",
    "%B %d, %Y": rf"\b((?:{_MONTHS}) \d{{1,2}}, \d{{4}})\b",
}


def detect_all(pages: DataFrame, spark: SparkSession,
               text_col: str = "text") -> DataFrame:
    """Union of all entity detectors, one row per detection:
    (url, kind, value, subcategory, format, lat, lon).

    kind ∈ {coord, city, iso3, date}; lat/lon are null for non-spatial
    detections (dates) and gazetteer-resolved for city mentions — the
    detections table the tiling/join stages consume.
    """
    nul = F.lit(None).cast("double")
    nuls = F.lit(None).cast("string")
    coords = detect_coordinates(pages, text_col).select(
        "url", F.lit("coord").alias("kind"),
        F.concat_ws(", ", F.col("lat"), F.col("lon")).alias("value"),
        F.lit("latlong").alias("subcategory"), nuls.alias("format"),
        "lat", "lon")
    cities = detect_cities(pages, spark, text_col).select(
        "url", F.lit("city").alias("kind"), F.col("city").alias("value"),
        F.lit("city").alias("subcategory"), nuls.alias("format"),
        "lat", "lon")
    iso3 = detect_iso3(pages, spark, text_col).select(
        "url", F.lit("iso3").alias("kind"), F.col("iso3").alias("value"),
        F.lit("ISO3").alias("subcategory"), nuls.alias("format"),
        nul.alias("lat"), nul.alias("lon"))
    dates = detect_dates(pages, text_col).select(
        "url", F.lit("date").alias("kind"), F.col("raw").alias("value"),
        F.lit("date").alias("subcategory"), "format",
        nul.alias("lat"), nul.alias("lon"))
    return coords.unionByName(cities).unionByName(iso3).unionByName(dates)


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


def detect_cities(pages: DataFrame, spark: SparkSession,
                  text_col: str = "text") -> DataFrame:
    """url → gazetteer city mentions with coordinates. Exact-match broadcast
    join on normalized name; at 100 TB the city dim (~25k rows in the
    reference) broadcasts trivially. Multi-word city names are matched by
    joining on extracted capitalized n-grams (n ≤ 3)."""
    cities = gz.cities_pdf().copy()
    cities["city_norm"] = cities["city"].str.lower()
    cities_df = F.broadcast(spark.createDataFrame(cities))

    # word 1/2/3-grams starting with a capitalized word — generated with
    # pure array expressions (every sub-span, unlike a greedy regex run)
    words = F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z][\w'&-]*"), 0)
    # NB: single-arg lambdas only — a 2-arg lambda is (element, index) to
    # F.transform, which would shadow the captured gram length
    def _gram_fn(n):
        return lambda i: F.array_join(F.slice(words, i + 1, n), " ")

    gram_arrays = []
    for n in (1, 2, 3):
        gram_arrays.append(F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(-1))),
            _gram_fn(n)))
    grams = pages.select(
        "url",
        F.explode(F.concat(*gram_arrays)).alias("gram"),
    ).where(F.col("gram").rlike("^[A-Z]")) \
     .withColumn("gram_norm", F.lower("gram"))
    return grams.join(cities_df, grams.gram_norm == cities_df.city_norm,
                      "inner").select("url", "city", "lat", "lon")


def detect_dates(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """url → (format, raw, ts) for regex-detectable reference formats;
    validity re-checked with to_timestamp (P8 pushdown-friendly subset)."""
    parts = []
    spark_fmt = {"%Y-%m-%d": "yyyy-MM-dd", "%m/%d/%Y": "MM/dd/yyyy",
                 "%Y/%m/%d": "yyyy/MM/dd", "%d %B %Y": "d MMMM yyyy",
                 "%B %d, %Y": "MMMM d, yyyy"}
    for fmt, rex in _DATE_RES.items():
        p = (
            pages.select(
                "url",
                F.explode(F.regexp_extract_all(F.col(text_col), F.lit(rex), 1)).alias("raw"))
            .withColumn("format", F.lit(fmt))
            .withColumn("ts", F.try_to_timestamp(F.col("raw"), F.lit(spark_fmt[fmt])))
            .where(F.col("ts").isNotNull())
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("url", "format", "raw", "ts")

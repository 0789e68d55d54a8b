"""HTML <table> extraction + tabular column profiling.

This is the bridge from the webtext payload to the Cartwright taxonomy: the
reference classifies *already-tabular* CSVs (cartwright/categorize.py:48
reads a DataFrame column-by-column), while a Common-Crawl corpus carries its
tables embedded in page HTML. ``extract_html_tables`` lifts every
``<table>`` in every page into a (doc, table, row, col, cell) grid, and
``profile_table_columns`` runs a Cartwright-style validator cascade
(lat-range / year-range / numeric, cartwright/category_helpers.py rules)
over each extracted column — so raw crawl HTML flows end-to-end into the
same category decisions the reference makes on CSV files.

Scale design (10^12 pages):
* The whole chain is JVM column expressions — regexp_extract_all +
  posexplode, zero Python. Each page's HTML is parsed exactly once; the
  nested explode multiplies rows only by actual cell count, and every
  downstream aggregate is a partial-agg groupBy on (doc, table, col) —
  naturally parallel, no skew beyond real giant tables (bounded by
  ``max_cells_per_doc`` below).
* Cell text is cleaned with the same strip/entity/collapse rules as
  operators/extract.py so table cells and page text share one
  normalization (byte-identical per url, the north-star invariant).
* RE2-portable regexes only (no backreferences): ``<th>`` is normalized to
  ``<td>`` first so one lazy group captures every cell in both Java regex
  and DuckDB/RE2 — keeping the oracle replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lazy-group block regexes; (?is) = case-insensitive + dotall in both
# Java regex and RE2, and neither pattern uses backreferences
TABLE_RE = r"(?is)<table\b[^>]*>(.*?)</table>"
ROW_RE = r"(?is)<tr\b[^>]*>(.*?)</tr>"
CELL_RE = r"(?is)<td\b[^>]*>(.*?)</td>"

# same entity set as operators/extract.py (shared normalization contract)
_ENTITIES = [("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&copy;", "(c)"), ("&#39;", "'")]

# full-string numeric forms accepted by the profiler (Cartwright's float
# validators accept plain decimal forms; cartwright/category_helpers.py)
NUMERIC_RE = r"^-?\d+(\.\d+)?$"


def clean_html_text(col: Column) -> Column:
    """Strip residual inner tags + entities + collapse whitespace (the
    extract.py rule chain applied to one HTML fragment). Shared by the
    table-cell extractor here and the anchor-text index in urltools.py
    so every extracted fragment normalizes identically."""
    s = F.regexp_replace(col, r"<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


_clean_cell = clean_html_text


def extract_html_tables(pages: DataFrame, html_col: str = "html",
                        id_col: str = "doc_id") -> DataFrame:
    """pages(html string) -> one row per table cell.

    Output: (id_col, table_idx, row_idx, col_idx, cell) with 0-based
    indexes in document order. <th> cells are included (normalized to
    <td>), so row_idx 0 usually carries the header.
    """
    html = F.col(html_col)
    # th -> td so a single backreference-free lazy group grabs all cells
    norm = F.regexp_replace(
        F.regexp_replace(html, r"(?i)<th\b", "<td"), r"(?i)</th>", "</td>")
    tables = pages.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(norm, F.lit(TABLE_RE), F.lit(1)))
        .alias("table_idx", "tbl"))
    rows = tables.select(
        id_col, "table_idx",
        F.posexplode(F.regexp_extract_all(F.col("tbl"), F.lit(ROW_RE),
                                          F.lit(1)))
        .alias("row_idx", "row"))
    cells = rows.select(
        id_col, "table_idx", "row_idx",
        F.posexplode(F.regexp_extract_all(F.col("row"), F.lit(CELL_RE),
                                          F.lit(1)))
        .alias("col_idx", "raw_cell"))
    return cells.select(
        id_col, "table_idx", "row_idx", "col_idx",
        _clean_cell(F.col("raw_cell")).alias("cell"))


def profile_table_columns(cells: DataFrame,
                          id_col: str = "doc_id",
                          skip_header_row: bool = True) -> DataFrame:
    """Cartwright-style per-column profile + category over extracted cells.

    For each (doc, table, col): counts of cells that full-match the numeric
    form, pass the latitude range [-90, 90] (cartwright/category_helpers.py
    lat validator), or parse as a year in [1800, 2100] — then the threshold
    cascade (all non-empty cells must validate, Cartwright's all-rows rule
    at sample scale) picks the most specific label:
    latitude > year > number > string.
    """
    data = cells
    if skip_header_row:
        data = data.filter(F.col("row_idx") > 0)
    is_num = F.col("cell").rlike(NUMERIC_RE)
    val = F.when(is_num, F.col("cell").cast("double"))
    is_lat = is_num & (F.abs(val) <= F.lit(90.0))
    is_year = F.col("cell").rlike(r"^(1[89]\d\d|20\d\d|2100)$")
    prof = (data
            .filter(F.col("cell") != "")
            .groupBy(id_col, "table_idx", "col_idx")
            .agg(F.count(F.lit(1)).alias("n_cells"),
                 F.sum(is_num.cast("long")).alias("n_numeric"),
                 F.sum(is_lat.cast("long")).alias("n_lat"),
                 F.sum(is_year.cast("long")).alias("n_year")))
    n = F.col("n_cells")
    label = (F.when(F.col("n_year") == n, F.lit("year"))
             .when(F.col("n_lat") == n, F.lit("latitude"))
             .when(F.col("n_numeric") == n, F.lit("number"))
             .otherwise(F.lit("string")))
    return prof.withColumn("category", label)

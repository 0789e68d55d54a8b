"""HTML <table> extraction + column profiling (operators/tables.py).

The webtext → Cartwright bridge: the reference classifies already-tabular
CSVs (cartwright/categorize.py:48); a crawl corpus carries its tables
inside page HTML. These tests pin the cell grid (indexes, th/td handling,
entity + nested-tag cleanup) and the validator-cascade column labels
(cartwright/category_helpers.py lat/year rules) on handwritten pages.
"""

import pytest
from pyspark.sql import functions as F

from cartwright_spark.operators.tables import (
    extract_html_tables,
    profile_table_columns,
)

PAGE = """
<html><body>
<h1>ignored</h1>
<table class="grid">
  <tr><th>name</th><th>lat</th><th>year</th></tr>
  <tr><td>alpha &amp; beta</td><td>-45.25</td><td>1950</td></tr>
  <tr><td> <b>gamma</b>  x </td><td>89</td><td>2100</td></tr>
</table>
<p>between tables</p>
<table><tr><td>120.5</td><td>hello</td></tr></table>
</body></html>
"""


@pytest.fixture(scope="module")
def cells(spark):
    pages = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    return extract_html_tables(pages).collect()


def test_cell_grid_indexes_and_cleanup(cells):
    got = {(r.table_idx, r.row_idx, r.col_idx): r.cell for r in cells}
    assert got[(0, 0, 0)] == "name"          # <th> captured as a cell
    assert got[(0, 0, 2)] == "year"
    assert got[(0, 1, 0)] == "alpha & beta"  # entity unescaped
    assert got[(0, 1, 1)] == "-45.25"
    assert got[(0, 2, 0)] == "gamma x"       # inner tag stripped, ws collapsed
    assert got[(1, 0, 0)] == "120.5"         # second table, fresh indexes
    assert got[(1, 0, 1)] == "hello"
    assert len(cells) == 11


def test_profile_categories(spark):
    pages = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    prof = profile_table_columns(extract_html_tables(pages))
    got = {(r.table_idx, r.col_idx): (r.category, r.n_cells)
           for r in prof.collect()}
    # table 0 skips its header row: 2 data cells per column
    assert got[(0, 0)] == ("string", 2)
    assert got[(0, 1)] == ("latitude", 2)    # -45.25 and 89 both in range
    assert got[(0, 2)] == ("year", 2)        # 1950, 2100
    # table 1 has no header to skip... row 0 IS the data row, so with
    # skip_header_row=True the whole table drops out of the profile
    assert (1, 0) not in got


def test_profile_no_header_skip(spark):
    pages = spark.createDataFrame([(1, PAGE)], "doc_id long, html string")
    prof = profile_table_columns(extract_html_tables(pages),
                                 skip_header_row=False)
    got = {(r.table_idx, r.col_idx): r.category for r in prof.collect()}
    # header strings now pollute table 0's columns -> all string
    assert got[(0, 1)] == "string"
    # 120.5 is numeric but out of lat range -> number; 'hello' -> string
    assert got[(1, 0)] == "number"
    assert got[(1, 1)] == "string"


def test_year_boundaries(spark):
    rows = [(i, f"<table><tr><td>{v}</td></tr></table>")
            for i, v in enumerate(["1799", "1800", "2100", "2101"])]
    pages = spark.createDataFrame(rows, "doc_id long, html string")
    prof = profile_table_columns(extract_html_tables(pages),
                                 skip_header_row=False)
    got = {r.doc_id: r.category for r in prof.collect()}
    assert got[0] == "number"   # 1799: numeric but below the year floor
    assert got[1] == "year"
    assert got[2] == "year"
    assert got[3] == "number"   # 2101: past the ceiling


def test_contract_queries_match_oracle(spark, tmp_path):
    """Run both registered queries and their DuckDB oracles at a tiny
    synthesized documents table; compare sorted rows exactly (the
    check_oracles protocol in miniature)."""
    duckdb = pytest.importorskip("duckdb")
    import __spark_entry__ as entry

    docs = spark.range(1, 40).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("s").alias("source"),
        F.lit(1).alias("n_chars"))
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet/*.parquet'")
    for name in ("html_table_cells", "html_table_profile"):
        got = sorted(tuple(r) for r in
                     entry.queries()[name](spark, sf_dir).collect())
        want = sorted(tuple(r) for r in
                      con.execute(entry.oracle_sql()[name]).fetchall())
        assert got == want, f"{name}: spark != duckdb oracle"

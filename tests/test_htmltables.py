"""HTML table extraction: structure, nesting, colspan, unclosed cells."""

from __future__ import annotations

from delphi_pdf_parser_spark.operators.htmltables import (
    _page_tables,
    extract_html_tables,
)


def test_basic_table_with_header():
    html = (
        b"<table><tr><th>Name</th><th>Age</th></tr>"
        b"<tr><td>Ann &amp; Bo</td><td>7</td></tr></table>"
    )
    rows = _page_tables("u", html)
    assert rows == [
        ("u", 0, 0, 0, "Name", True),
        ("u", 0, 0, 1, "Age", True),
        ("u", 0, 1, 0, "Ann & Bo", False),
        ("u", 0, 1, 1, "7", False),
    ]


def test_unclosed_cells_and_inline_markup():
    # real-crawl style: no </td>, inline <b> stripped
    html = b"<table><tr><td>a <b>bold</b><td>b<tr><td>c</table>"
    rows = _page_tables("u", html)
    assert [(r[2], r[3], r[4]) for r in rows] == [
        (0, 0, "a bold"),
        (0, 1, "b"),
        (1, 0, "c"),
    ]


def test_colspan_advances_columns():
    html = (
        b'<table><tr><td colspan="2">wide</td><td>x</td></tr></table>'
    )
    rows = _page_tables("u", html)
    assert [(r[3], r[4]) for r in rows] == [(0, "wide"), (2, "x")]


def test_nested_table_skipped_and_second_table_counted():
    html = (
        b"<table><tr><td>outer"
        b"<table><tr><td>inner</td></tr></table>"
        b"</td></tr></table>"
        b"<table><tr><td>two</td></tr></table>"
    )
    rows = _page_tables("u", html)
    # the outer cell closes at the nested <table> token; inner content
    # is skipped entirely; the second top-level table gets table_id 1
    assert ("u", 0, 0, 0, "outer", False) in rows
    assert ("u", 1, 0, 0, "two", False) in rows
    assert not any("inner" in r[4] for r in rows)


def test_extract_html_tables_dataframe(spark):
    html = b"<table><tr><td>v</td></tr></table>"
    df = spark.createDataFrame(
        [("https://t.example/", bytearray(html)), ("https://n.example/", None)],
        "url string, html binary",
    )
    rows = extract_html_tables(df).collect()
    assert len(rows) == 1 and rows[0].cell == "v"


def test_truncated_page_keeps_open_cell():
    html = b"<table><tr><td>first</td><td>cut off mid senten"
    rows = _page_tables("u", html)
    assert [(r[3], r[4]) for r in rows] == [
        (0, "first"),
        (1, "cut off mid senten"),
    ]


def test_table_profile_classification(spark):
    from delphi_pdf_parser_spark.operators.htmltables import table_profile

    cells = spark.createDataFrame(
        # t0: consistent 2x2 numeric with header -> relational
        [("u", 0, 0, 0, "a", True), ("u", 0, 0, 1, "b", True),
         ("u", 0, 1, 0, "1", False), ("u", 0, 1, 1, "2.5", False)]
        # t1: ragged widths (2,1,1): modal 1 -> consistency 2/3, 1 col
        + [("u", 1, 0, 0, "x", False), ("u", 1, 0, 1, "y", False),
           ("u", 1, 1, 0, "z", False), ("u", 1, 2, 0, "w", False)],
        "url string, table_id int, row_id int, col_id int, "
        "cell string, is_header boolean",
    )
    got = {r.table_id: r for r in table_profile(cells).collect()}
    t0 = got[0]
    assert (t0.n_rows, t0.n_cols, t0.consistency) == (2, 2, 1.0)
    assert t0.numeric_frac == 0.5 and t0.has_header and t0.is_relational
    t1 = got[1]
    assert (t1.n_rows, t1.n_cols) == (3, 1)
    assert t1.consistency == 0.6667 and not t1.is_relational


def test_tables_skip_commented_and_script_embedded():
    """VERDICT r6 #2: ghost tables in comments/script must not shift
    table_id numbering or emit cells."""
    from delphi_pdf_parser_spark.operators.htmltables import _page_tables

    page = (
        b"<!-- <table><tr><td>ghost</td></tr></table> -->"
        b"<script>r('<table><tr><td>g2</td></tr></table>')</script>"
        b"<table><tr><td>real</td></tr></table>"
    )
    rows = _page_tables("u", page)
    assert rows == [("u", 0, 0, 0, "real", False)]


def test_table_cell_with_inline_comment_keeps_text():
    from delphi_pdf_parser_spark.operators.htmltables import _page_tables

    page = b"<table><tr><td>a<!-- hidden -->b</td></tr></table>"
    rows = _page_tables("u", page)
    assert rows[0][4] == "a b"

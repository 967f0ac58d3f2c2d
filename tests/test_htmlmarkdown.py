"""HTML -> Markdown conversion (structure-preserving extraction)."""

from __future__ import annotations

from delphi_pdf_parser_spark.operators.htmlmarkdown import (
    _render_markdown,
    html_to_markdown,
)


def test_markdown_full_page():
    page = b"""<html><head><title>t</title>
<script>var x = '<h1>ghost</h1>';</script>
<style>h1{color:red}</style></head><body>
<!-- <h2>commented</h2> -->
<h1>Main &amp; Title</h1>
<p>Para with <b>bold</b>, <em>ital</em>, <code>x=1</code> and
<a href="/rel">a <b>link</b></a>.</p>
<ul><li>one</li><li>two <a href="https://x.example/">X</a></li>
<ol><li>nested first</li></ol></ul>
<blockquote><p>quoted words</p></blockquote>
<hr>
<pre>  raw   spaces
kept</pre>
<table><tr><th>name</th><th>v|al</th></tr>
<tr><td>a</td><td>1</td></tr></table>
<img src="/i.png" alt="pic">
</body></html>"""
    url, md, n_blocks, n_links = _render_markdown(
        "https://s.example/d/p.html", page
    )
    assert md == (
        "# Main & Title\n\n"
        "Para with **bold**, *ital*, `x=1` and "
        "[a **link**](https://s.example/rel).\n\n"
        "- one\n\n"
        "- two [X](https://x.example/)\n\n"
        "  1. nested first\n\n"
        "> quoted words\n\n"
        "---\n\n"
        "```\n  raw   spaces\nkept\n```\n\n"
        "| name | v\\|al |\n| --- | --- |\n| a | 1 |\n\n"
        "![pic](https://s.example/i.png)"
    )
    assert n_blocks == 10 and n_links == 2


def test_markdown_skips_inert_and_title():
    # title is head metadata; comments/script/style are inert
    url, md, nb, nl = _render_markdown(
        "u",
        b"<title>T</title><script>a('<p>g</p>')</script>"
        b"<!-- <p>c</p> --><p>real</p>",
    )
    assert md == "real" and nb == 1 and nl == 0


def test_markdown_heading_levels_and_nesting():
    _, md, _, _ = _render_markdown(
        "u", b"<h3>Three</h3><h6>Six</h6><p><b><b>x</b></b></p>"
    )
    assert md == "### Three\n\n###### Six\n\n**x**"


def test_markdown_ordered_list_counters():
    _, md, _, _ = _render_markdown(
        "u", b"<ol><li>a</li><li>b</li><li>c</li></ol>"
    )
    assert md == "1. a\n\n2. b\n\n3. c"


def test_markdown_tolerates_truncation():
    _, md, _, _ = _render_markdown("u", b"<p>keep <b>bo")
    assert md == "keep **bo"


def test_markdown_dataframe(spark):
    docs = spark.createDataFrame(
        [
            ("https://a.example/", b"<h1>A</h1><p>x <a href='/y'>y</a></p>"),
            ("https://b.example/", None),
        ],
        "url string, html binary",
    )
    rows = html_to_markdown(docs).collect()
    assert len(rows) == 1
    assert rows[0].markdown == "# A\n\nx [y](https://a.example/y)"
    assert rows[0].n_links == 1

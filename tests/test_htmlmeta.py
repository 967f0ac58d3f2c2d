"""HTML metadata extraction: title/meta/canonical/OpenGraph/noindex."""

from __future__ import annotations

from delphi_pdf_parser_spark.operators.htmlmeta import _page_meta, extract_html_metadata


PAGE = b"""<!DOCTYPE html><html><head>
<title> The  Page &amp; Title </title>
<meta name="description" content="A &quot;useful&quot; page">
<meta property="og:title" content="OG Title">
<meta property="og:image" content="https://img.example/x.png">
<meta property="article:published_time" content="2024-03-05T12:00:00Z">
<meta name="robots" content="index, follow">
<link rel="stylesheet" href="/s.css">
<link rel="canonical" href="/canonical-path">
<link rel="canonical" href="/second-ignored">
</head><body>hi</body></html>"""


def test_page_meta_fields():
    r = _page_meta("https://site.example/a/b", PAGE)
    url, title, desc, canon, ogt, ogi, pub, noindex = r
    assert title == "The Page & Title"
    assert desc == 'A "useful" page'
    assert canon == "https://site.example/canonical-path"  # first wins, resolved
    assert ogt == "OG Title"
    assert ogi == "https://img.example/x.png"
    assert pub == "2024-03-05T12:00:00Z"
    assert noindex is False


def test_page_meta_noindex_and_missing():
    html = b'<html><head><meta name="ROBOTS" content="NOINDEX,nofollow"></head></html>'
    r = _page_meta("https://x.example/", html)
    assert r[7] is True and r[1] is None and r[3] is None


def test_extract_html_metadata_dataframe(spark):
    df = spark.createDataFrame(
        [("https://a.example/", bytearray(PAGE)), ("https://n.example/", None)],
        "url string, html binary",
    )
    rows = extract_html_metadata(df).collect()
    assert len(rows) == 1 and rows[0].title == "The Page & Title"


def test_page_jsonld_filters_script_types():
    from delphi_pdf_parser_spark.operators.htmlmeta import _page_jsonld

    html = (
        b'<script type="text/javascript">var x;</script>'
        b'<script type="application/ld+json">{"@type":"A"}</script>'
        b"<script>plain()</script>"
        b'<script type="APPLICATION/LD+JSON">\n {"@type":"B"} \n</script>'
        b'<script type="application/ld+json">   </script>'
    )
    rows = _page_jsonld("u", html)
    assert rows == [
        ("u", 0, '{"@type":"A"}'),
        ("u", 1, '{"@type":"B"}'),
    ]


def test_extract_jsonld_dataframe(spark):
    from delphi_pdf_parser_spark.operators.htmlmeta import extract_jsonld

    html = (
        b'<script type="application/ld+json">'
        b'{"@type":"Recipe","name":"Pie"}</script>'
    )
    df = spark.createDataFrame(
        [("https://r.example/", bytearray(html))], "url string, html binary"
    )
    r = extract_jsonld(df).collect()[0]
    assert (r.schema_type, r.name, r.blob_id) == ("Recipe", "Pie", 0)


def test_page_headings_outline():
    from delphi_pdf_parser_spark.operators.htmlmeta import _page_headings

    html = (
        b"<h1>Top</h1><h2 id='a'>Mid <b>bold</b></h2>"
        b"<h2>   </h2>"  # empty after strip: dropped, pos stays gap-free
        b"<h3>Deep &amp; down</h3><h1>Again</h1>"
    )
    rows = _page_headings("u", html)
    assert rows == [
        ("u", 0, 1, "Top"),
        ("u", 1, 2, "Mid bold"),
        ("u", 2, 3, "Deep & down"),
        ("u", 3, 1, "Again"),
    ]


# --------------------------------------------- inert-region stripping


def test_meta_skips_commented_and_script_embedded():
    """VERDICT r6 #2: first-match-wins fields must not bind to ghost
    tags inside comments or script string literals."""
    from delphi_pdf_parser_spark.operators.htmlmeta import _page_meta

    page = (
        b"<html><head>"
        b'<!-- <title>Ghost</title><meta name="description"'
        b' content="GHOST"> -->'
        b"<script>render('<meta name=\"robots\" content=\"noindex\">')"
        b"</script>"
        b"<title>Real</title>"
        b'<meta name="description" content="real desc">'
        b"</head></html>"
    )
    row = _page_meta("https://s.example/", page)
    assert row[1] == "Real"
    assert row[2] == "real desc"
    assert row[7] is False  # script-embedded noindex ignored


def test_headings_skip_commented_and_script_embedded():
    from delphi_pdf_parser_spark.operators.htmlmeta import _page_headings

    page = (
        b"<!-- <h1>Phantom</h1> -->"
        b"<script>w('<h2>Ghost</h2>')</script>"
        b"<h1>Real</h1><h2>Sub</h2>"
    )
    rows = _page_headings("u", page)
    # pos stays gap-free and 0-based at the FIRST real heading
    assert [(r[1], r[2], r[3]) for r in rows] == [
        (0, 1, "Real"),
        (1, 2, "Sub"),
    ]


def test_jsonld_still_reads_script_payloads():
    """The inert strip must NOT apply to JSON-LD extraction, whose
    payload lives inside <script type=application/ld+json>."""
    from delphi_pdf_parser_spark.operators.htmlmeta import _page_jsonld

    page = (
        b'<script type="application/ld+json">'
        b'{"@type":"Article","name":"x"}</script>'
    )
    rows = _page_jsonld("u", page)
    assert len(rows) == 1 and "Article" in rows[0][2]

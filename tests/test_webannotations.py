"""Single-scan combined annotations == the four single-purpose passes."""

from __future__ import annotations

from pyspark.sql import functions as F

from delphi_pdf_parser_spark.operators.webannotations import (
    extract_web_annotations,
)

PAGE = (
    b"<html><head><title>T</title>"
    b'<meta name="description" content="D">'
    b'<link rel="canonical" href="/c">'
    b'<script type="application/ld+json">{"@type":"A","name":"N"}</script>'
    b"</head><body>"
    b'<a href="https://x.example/1">one</a>'
    b'<a rel="nofollow" href="/two">two</a>'
    b"<table><tr><th>h</th></tr><tr><td>v</td></tr></table>"
    b"</body></html>"
)


def _pages(spark):
    return spark.createDataFrame(
        [
            ("https://s.example/p", bytearray(PAGE)),
            ("https://empty.example/", bytearray(b"<html>nothing</html>")),
        ],
        "url string, html binary",
    )


def test_combined_equals_single_purpose_passes(spark):
    from delphi_pdf_parser_spark.operators.graphs import extract_links
    from delphi_pdf_parser_spark.operators.htmlmeta import (
        extract_html_metadata,
        extract_jsonld,
    )
    from delphi_pdf_parser_spark.operators.htmltables import (
        extract_html_tables,
    )

    pages = _pages(spark)
    combined = extract_web_annotations(pages)

    got_links = sorted(
        (r.url, r.l.dst, r.l.anchor, r.l.nofollow)
        for r in combined.select(
            "url", F.explode("links").alias("l")
        ).collect()
    )
    want_links = sorted(
        (r.src, r.dst, r.anchor, r.nofollow)
        for r in extract_links(pages).collect()
    )
    assert got_links == want_links

    got_cells = sorted(
        (r.url, r.t.table_id, r.t.row_id, r.t.col_id, r.t.cell, r.t.is_header)
        for r in combined.select(
            "url", F.explode("tables").alias("t")
        ).collect()
    )
    want_cells = sorted(
        tuple(r) for r in extract_html_tables(pages).collect()
    )
    assert got_cells == want_cells

    meta_cols = [
        "url", "title", "description", "canonical", "og_title",
        "og_image", "published_time", "noindex",
    ]
    got_meta = sorted(
        tuple(r) for r in combined.select(*meta_cols).collect()
    )
    want_meta = sorted(
        tuple(r) for r in extract_html_metadata(pages).collect()
    )
    assert got_meta == want_meta

    got_blobs = sorted(
        (r.url, r.j)
        for r in combined.select(
            "url", F.explode("jsonld").alias("j")
        ).collect()
    )
    want_blobs = sorted(
        (r.url, r.json)
        for r in extract_jsonld(pages).select("url", "json").collect()
    )
    assert got_blobs == want_blobs


def test_combined_column_pruning_single_family(spark):
    # consumers reading one family should not pay for the others at
    # the Spark level: the projection narrows the output schema
    out = extract_web_annotations(_pages(spark)).select("url", "links")
    assert out.columns == ["url", "links"]
    assert out.count() == 2


def test_frontier_scores_composition(spark):
    import math

    from delphi_pdf_parser_spark.operators.frontier import frontier_scores

    verdicts = spark.createDataFrame(
        [
            ("https://a.example/x", True),
            ("https://a.example/blocked", False),
            ("https://nohost.example/y", True),
        ],
        "url string, allowed boolean",
    )
    authority = spark.createDataFrame(
        [("a.example", 6)], "host string, in_deg int"
    )
    freshness = spark.createDataFrame(
        [("https://a.example/x", 0.5)], "url string, changed_frac double"
    )
    got = {
        r.url: (r.allowed, r.score)
        for r in frontier_scores(verdicts, authority, freshness).collect()
    }
    assert got["https://a.example/x"] == (
        True,
        round(math.log1p(6) + 2 * 0.5, 6),
    )
    # disallowed pins to exactly 0 regardless of authority
    assert got["https://a.example/blocked"] == (False, 0.0)
    # unknown host/freshness default to 0 contributions
    assert got["https://nohost.example/y"] == (True, 0.0)


def test_streaming_web_annotations_matches_batch(spark, tmp_path):
    """The combined WAT pass is stateless: availableNow stream output
    must equal the batch rows (nested columns included)."""
    import time

    pages = [
        ("https://a.example/1", bytes(PAGE)),
        ("https://b.example/", b"<html><body><a href='/x'>x</a></body></html>"),
    ]
    schema = "url string, html binary"
    src = tmp_path / "wat_in"
    src.mkdir()
    for i, chunk in enumerate([pages[:1], pages[1:]]):
        if i:
            time.sleep(1.1)
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        extract_web_annotations(stream)
        .writeStream.format("memory")
        .queryName("wat_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.url, [tuple(x) for x in r.links], r.title, len(r.tables))
        for r in spark.sql("SELECT * FROM wat_stream").collect()
    )
    want = sorted(
        (r.url, [tuple(x) for x in r.links], r.title, len(r.tables))
        for r in extract_web_annotations(
            spark.createDataFrame(pages, schema)
        ).collect()
    )
    assert got == want and len(got) == 2

"""WARC source: Common-Crawl-style ingestion into the documents table,
then straight through the extraction pipeline."""

from __future__ import annotations

import os

from delphi_pdf_parser_spark.fixtures import bench_pdf, build_warc
from delphi_pdf_parser_spark.sources.warc import parse_warc, read_warc


def _records():
    pdf1 = bench_pdf(seed=31, npages=2)
    pdf2 = bench_pdf(seed=32, npages=1)
    return [
        {
            "rectype": "warcinfo",
            "payload": b"software: fixture\r\n",
            "url": "",
        },
        {
            "url": "https://example.com/a.pdf",
            "date": "2024-03-05T12:00:00Z",
            "payload": pdf1,
            "content_type": "application/pdf",
        },
        {
            "url": "https://example.com/page.html",
            "date": "2024-03-05T12:00:01Z",
            "payload": b"<html><body>hi</body></html>",
        },
        {
            "url": "https://example.com/b.pdf",
            "date": "2024-03-05T12:00:02Z",
            "payload": pdf2,
            "content_type": "application/pdf",
        },
    ], pdf1, pdf2


def test_parse_warc_plain_and_gz():
    recs, pdf1, pdf2 = _records()
    for gz in (False, True):
        data = build_warc(recs, gzip_members=gz)
        parsed = parse_warc(data)
        assert [r["rectype"] for r in parsed] == [
            "warcinfo", "response", "response", "response",
        ]
        assert parsed[1]["payload"] == pdf1
        assert parsed[3]["payload"] == pdf2
        assert parsed[2]["payload"] == b"<html><body>hi</body></html>"
        assert parsed[1]["url"] == "https://example.com/a.pdf"


def test_warc_to_extraction_pipeline(spark, tmp_path):
    """WARC files -> documents table -> extract_documents, end to end;
    PDF responses extract, the HTML response is prefiltered out."""
    from delphi_pdf_parser_spark.operators.extraction import (
        extract_documents,
    )
    from delphi_pdf_parser_spark.pdfcore.extract import extract_text

    recs, pdf1, pdf2 = _records()
    (tmp_path / "seg-00000.warc").write_bytes(build_warc(recs))
    (tmp_path / "seg-00001.warc.gz").write_bytes(
        build_warc(recs[1:2], gzip_members=True)
    )
    docs = read_warc(spark, str(tmp_path))
    rows = docs.collect()
    # 3 responses from the plain file + 1 from the gz file
    assert len(rows) == 4
    by_url = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(r)
    assert len(by_url["https://example.com/a.pdf"]) == 2
    assert bytes(by_url["https://example.com/a.pdf"][0]["html"]) == pdf1
    assert by_url["https://example.com/a.pdf"][0][
        "warc_ts"
    ].isoformat().startswith("2024-03-05T12:00:00")

    out = {
        (r["url"], r["text"])
        for r in extract_documents(docs, salt_partitions=4).collect()
    }
    want_a = extract_text(pdf1).text
    want_b = extract_text(pdf2).text
    assert ("https://example.com/a.pdf", want_a) in out
    assert ("https://example.com/b.pdf", want_b) in out
    assert all(u != "https://example.com/page.html" for u, _ in out)

"""End-to-end test of the spark-submit job incl. kill/resume semantics."""

from __future__ import annotations

import sys


def test_extract_job_with_resume(spark, tmp_path, monkeypatch):
    from delphi_pdf_parser_spark.sources.documents import fixture_documents

    docs_path = str(tmp_path / "docs")
    out_path = str(tmp_path / "out")
    metrics_path = str(tmp_path / "metrics")
    docs = fixture_documents(spark)
    docs.write.parquet(docs_path)
    total = docs.count()

    # simulate an interrupted first run: process only a 15-doc slice
    first = spark.read.parquet(docs_path).limit(15)
    from delphi_pdf_parser_spark.operators.extraction import (
        extract_documents,
        metrics_table,
    )

    part = extract_documents(first, salt_partitions=4).cache()
    part.write.mode("append").parquet(out_path)
    metrics_table(part).write.mode("append").parquet(metrics_path)

    # resume run through the real job entrypoint
    from jobs.extract_job import main

    main(
        [
            "--input", docs_path,
            "--output", out_path,
            "--metrics", metrics_path,
            "--resume",
            "--partitions", "4",
        ]
    )

    out = spark.read.parquet(out_path)
    assert out.count() == total  # nothing reprocessed, nothing missed
    assert out.select("url").distinct().count() == total


def test_extract_job_warc_and_html(spark, tmp_path):
    """Full Common-Crawl shape: WARC input, PDF extraction + HTML
    main-content in one job run."""
    from delphi_pdf_parser_spark.fixtures import bench_pdf, build_warc
    from jobs.extract_job import main

    html_page = (
        b"<html><head><title>T</title></head><body>"
        b"<nav><a href='/'>Home</a></nav>"
        b"<p>A long enough paragraph of real page content that the "
        b"boilerplate stripper will classify as the main body text.</p>"
        b"<footer><a href='/p'>Privacy</a></footer></body></html>"
    )
    recs = [
        {
            "url": "https://cc.example/d.pdf",
            "payload": bench_pdf(seed=77, npages=2),
            "content_type": "application/pdf",
        },
        {"url": "https://cc.example/p.html", "payload": html_page},
    ]
    (tmp_path / "seg.warc.gz").write_bytes(
        build_warc(recs, gzip_members=True)
    )
    out = tmp_path / "out"
    met = tmp_path / "metrics"
    hout = tmp_path / "html"
    main(
        [
            "--warc", str(tmp_path),
            "--output", str(out),
            "--metrics", str(met),
            "--html-output", str(hout),
            "--partitions", "2",
            "--whale-bytes", "0",
        ]
    )
    got = {r["url"]: r for r in spark.read.parquet(str(out)).collect()}
    assert got["https://cc.example/d.pdf"]["status"] == "ok"
    h = {r["url"]: r for r in spark.read.parquet(str(hout)).collect()}
    assert list(h) == ["https://cc.example/p.html"]
    assert "real page content" in h["https://cc.example/p.html"]["text"]
    assert "Privacy" not in h["https://cc.example/p.html"]["text"]


def test_extract_job_catalog_table_and_password_col(spark, tmp_path):
    """--table reads through the session catalog (the Iceberg-shaped
    input path: spark.read.table) and --password-col decrypts
    per-document; the same invocation exercises both."""
    from delphi_pdf_parser_spark.fixtures import _encrypted_doc

    from jobs.extract_job import main

    enc, golden, _ = _encrypted_doc("rc4", user_pw=b"secret")
    docs = spark.createDataFrame(
        [
            ("pdf://cat/right", bytearray(enc), "secret"),
            ("pdf://cat/wrong", bytearray(enc), "nope"),
        ],
        "url string, html binary, pw string",
    )
    docs.write.mode("overwrite").saveAsTable("cat_docs_r7")
    out_path = str(tmp_path / "out_cat")
    metrics_path = str(tmp_path / "metrics_cat")
    main(
        [
            "--table", "cat_docs_r7",
            "--output", out_path,
            "--metrics", metrics_path,
            "--partitions", "2",
            "--password-col", "pw",
            "--whale-bytes", "0",
        ]
    )
    got = {
        r.url: (r.status, r.err, r.text)
        for r in spark.read.parquet(out_path).collect()
    }
    assert got["pdf://cat/right"] == ("ok", "", golden)
    assert got["pdf://cat/wrong"][:2] == ("failed", "needs_password")
    # the failure is visible in the metrics table too
    m = spark.read.parquet(metrics_path)
    assert m.filter("status = 'failed'").count() == 1

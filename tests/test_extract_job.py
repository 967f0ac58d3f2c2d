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

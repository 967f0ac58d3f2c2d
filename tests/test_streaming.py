"""Structured Streaming extraction: availableNow file-source run whose
output matches the batch goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delphi_pdf_parser_spark.sources.documents import fixture_documents
from delphi_pdf_parser_spark.streaming.extract_stream import (
    extract_stream,
    metrics_windowed_rollup,
    read_documents_stream,
    run_to_sink,
)


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs_in"))
    fixture_documents(spark).repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_streaming_extraction_matches_batch(spark, docs_dir, tmp_path):
    stream = read_documents_stream(spark, docs_dir, max_files_per_trigger=2)
    extracted = extract_stream(stream)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_to_sink(extracted, out, ckpt)
    q.awaitTermination(180)

    from delphi_pdf_parser_spark.operators.extraction import (
        verify_against_golden,
    )
    from delphi_pdf_parser_spark.sources.documents import fixture_golden

    result = spark.read.parquet(out)
    verified = verify_against_golden(result, fixture_golden(spark))
    n_golden = fixture_golden(spark).count()
    assert verified.filter("match").count() == n_golden


def test_streaming_metrics_rollup(spark, docs_dir, tmp_path):
    stream = read_documents_stream(spark, docs_dir)
    rollup = metrics_windowed_rollup(stream, window="10 minutes")
    # complete mode: under availableNow the watermark never passes the
    # last window, so append mode would emit nothing for a finite corpus
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT sum(n_docs) AS n FROM rollup").collect()
    assert rows[0]["n"] == fixture_documents(spark).count()

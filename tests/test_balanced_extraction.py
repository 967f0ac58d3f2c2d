"""Balanced (chunked) extraction: whales split into page ranges must be
byte-identical to the unsplit path, and task times must flatten."""

from __future__ import annotations

from pyspark.sql import functions as F

from delphi_pdf_parser_spark.operators.extraction import (
    extract_documents,
    extract_documents_balanced,
)
from delphi_pdf_parser_spark.sources.documents import (
    bench_documents,
    fixture_documents,
)


def test_balanced_matches_plain(spark):
    docs = bench_documents(
        spark, n_docs=24, pages_per_doc=2, skew_docs=3, skew_pages=30, slices=8
    ).cache()
    docs.count()
    plain = {
        r["url"]: (r["text"], r["npages"])
        for r in extract_documents(docs, salt_partitions=4).collect()
    }
    balanced = {
        r["url"]: (r["text"], r["npages"])
        for r in extract_documents_balanced(
            docs, whale_bytes=200_000, pages_per_chunk=8, salt_partitions=4
        ).collect()
    }
    assert set(plain) == set(balanced)
    for url in plain:
        assert plain[url] == balanced[url], url


def test_balanced_fixtures_still_verify(spark):
    from delphi_pdf_parser_spark.operators.extraction import (
        verify_against_golden,
    )
    from delphi_pdf_parser_spark.sources.documents import fixture_golden

    docs = fixture_documents(spark)
    # tiny whale threshold forces several fixtures through the chunk path
    out = extract_documents_balanced(
        docs, whale_bytes=2_000, pages_per_chunk=1, salt_partitions=4
    )
    verified = verify_against_golden(out, fixture_golden(spark))
    n_golden = fixture_golden(spark).count()
    assert verified.filter("match").count() == n_golden


def test_balanced_flattens_task_times(spark):
    docs = bench_documents(
        spark, n_docs=60, pages_per_doc=1, skew_docs=2, skew_pages=60, slices=8
    ).cache()
    docs.count()
    out = extract_documents_balanced(
        docs, whale_bytes=200_000, pages_per_chunk=10, salt_partitions=8
    )
    per_part = (
        out.groupBy("partition_id")
        .agg(F.sum("wall_ms").alias("ms"))
        .collect()
    )
    times = sorted(r["ms"] for r in per_part)
    # the two 60-page whales (~12 chunks) must not pile into one partition
    assert times[-1] < sum(times) * 0.6, times

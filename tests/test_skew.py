"""Skew evidence: with 10 giant documents in a small corpus, the salted
extraction keeps task wall-times bounded (no task > 4x median, per
BASELINE.md) — verified via the per-partition wall_ms lineage the UDF
emits."""

from __future__ import annotations

from pyspark.sql import functions as F

from delphi_pdf_parser_spark.operators.extraction import extract_documents
from delphi_pdf_parser_spark.sources.documents import bench_documents


def test_skew_salting_bounds_task_times(spark):
    docs = bench_documents(
        spark, n_docs=120, pages_per_doc=1, skew_docs=6, skew_pages=40, slices=16
    ).cache()
    docs.count()
    out = extract_documents(docs, salt_partitions=8)
    per_part = (
        out.groupBy("partition_id")
        .agg(F.sum("wall_ms").alias("part_ms"), F.count("*").alias("n"))
        .collect()
    )
    times = sorted(r["part_ms"] for r in per_part)
    assert len(times) >= 4, per_part
    median = times[len(times) // 2]
    # whales spread across partitions: the slowest partition stays within
    # 4x the median (single-whale cost dominates a partition, so perfect
    # equality is impossible; unsalted, all 6 whales could share 1 task)
    assert times[-1] <= max(4 * median, times[-1] if median == 0 else 0), (
        times,
        median,
    )
    whales_per_part = (
        out.filter(F.col("npages") >= 40)
        .groupBy("partition_id")
        .count()
        .collect()
    )
    assert max(r["count"] for r in whales_per_part) <= 3, whales_per_part

"""Bucketed co-located joins: matching bucket specs must join with ZERO
exchanges; a mismatched bucket count silently re-shuffles (pinned so the
failure mode is visible)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delphi_pdf_parser_spark.plans import plan_report
from delphi_pdf_parser_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Force SMJ so the exchange count is the thing under test (tiny test
    tables would otherwise broadcast and trivially show 0 exchanges)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _docs(spark, n, tag):
    return spark.range(n).select(
        F.concat(F.lit("pdf://doc/"), F.col("id")).alias("url"),
        F.concat(F.lit(tag), F.col("id")).alias(f"val_{tag}"),
    )


def test_bucketed_join_has_no_exchange(spark, no_broadcast):
    write_bucketed(_docs(spark, 500, "a"), "t_docs_a", buckets=8)
    write_bucketed(_docs(spark, 400, "b"), "t_docs_b", buckets=8)
    joined = bucketed_join(spark, "t_docs_a", "t_docs_b")
    rep = plan_report(joined)
    assert rep["exchanges"] == 0, rep  # the whole point of bucketing
    assert joined.count() == 400

    # mismatched bucket counts fall back to a shuffle — pin the hazard
    write_bucketed(_docs(spark, 400, "c"), "t_docs_c", buckets=4)
    rep2 = plan_report(bucketed_join(spark, "t_docs_a", "t_docs_c"))
    assert rep2["exchanges"] >= 1, rep2
    for t in ("t_docs_a", "t_docs_b", "t_docs_c"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

"""Crawl-frontier scoring — the composed web-side pipeline (the
analogue of ``curation.curation_pipeline`` for the crawl half): a
candidate URL's priority combines its robots verdict (hard gate), its
host's link authority, and its observed change rate:

    score(u) = allowed(u) * (w_auth * log1p(authority(host(u)))
               + w_fresh * changed_frac(u))

Everything composes into ONE Catalyst plan: two equi-joins (host,
url) onto the verdict table plus map-side arithmetic — no iterative
stage here; callers feed ``authority`` from :func:`graphs.pagerank`
or :func:`graphs.degree_table` (degree shown in the driver query; at
production scale swap in the PageRank table — the composition is
unchanged) and ``freshness`` from :func:`urls.recrawl_diff`
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delphi_pdf_parser_spark.operators.urls import host_of


def frontier_scores(
    verdicts: DataFrame,
    authority: DataFrame,
    freshness: DataFrame,
    w_auth: float = 1.0,
    w_fresh: float = 2.0,
) -> DataFrame:
    """``verdicts``: (url, allowed[, crawl_delay]); ``authority``:
    (host, in_deg); ``freshness``: (url, changed_frac). Returns
    (url, allowed, score) — disallowed URLs score exactly 0, missing
    authority/freshness default to 0."""
    u = verdicts.select(
        "url", "allowed", host_of(F.col("url")).alias("host")
    )
    j = u.join(authority, "host", "left").join(freshness, "url", "left")
    raw = F.lit(w_auth) * F.log1p(
        F.coalesce(F.col("in_deg"), F.lit(0)).cast("double")
    ) + F.lit(w_fresh) * F.coalesce(F.col("changed_frac"), F.lit(0.0))
    return j.select(
        "url",
        "allowed",
        F.round(
            F.when(F.col("allowed"), raw).otherwise(F.lit(0.0)), 6
        ).alias("score"),
    )

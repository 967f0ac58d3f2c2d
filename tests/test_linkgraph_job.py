"""End-to-end test of the spark-submit link-graph job: extract ->
host graph -> PageRank + degrees -> parquet sinks + report; resume
from the materialized links table."""

from __future__ import annotations

import pytest


def _pages(spark):
    # two sites linking to a hub; hub links back to one of them
    def page(*hrefs):
        body = "".join(f'<a href="{h}">to {i}</a>' for i, h in enumerate(hrefs))
        return f"<html><body>{body}</body></html>".encode()

    rows = [
        ("https://a.example/1", page("https://hub.example/", "/2")),
        ("https://a.example/2", page("https://hub.example/")),
        ("https://b.example/1", page("https://hub.example/x")),
        ("https://hub.example/", page("https://a.example/1")),
    ]
    return spark.createDataFrame(rows, "url string, html binary")


def test_linkgraph_job_end_to_end(spark, tmp_path):
    from jobs.linkgraph_job import main

    docs = str(tmp_path / "pages")
    links = str(tmp_path / "links")
    ranks = str(tmp_path / "ranks")
    rep = str(tmp_path / "report")
    anchors = str(tmp_path / "anchors")
    _pages(spark).write.parquet(docs)

    main(
        [
            "--input", docs,
            "--links", links,
            "--ranks", ranks,
            "--report", rep,
            "--anchors", anchors,
            "--iterations", "3",
            "--partitions", "4",
        ]
    )

    lk = spark.read.parquet(links)
    assert lk.count() == 5  # intra-site /2 link counts at URL level
    rk = {r.node: r for r in spark.read.parquet(ranks).collect()}
    # host level: a.example <-> hub.example, b.example -> hub.example
    # (intra-domain a/1 -> a/2 dropped by host_graph)
    assert set(rk) == {"a.example", "b.example", "hub.example"}
    assert rk["hub.example"].rank == max(r.rank for r in rk.values())
    assert rk["hub.example"].in_deg == 2 and rk["hub.example"].out_deg == 1
    assert sum(r.rank for r in rk.values()) == pytest.approx(1.0, abs=1e-9)
    an = spark.read.parquet(anchors)
    assert an.filter("dst = 'https://hub.example/'").count() >= 1
    r0 = spark.read.parquet(rep).collect()[0]
    assert (r0.n_pages, r0.n_links, r0.n_nodes) == (4, 5, 3)

    # resume path: rerun from the materialized links table, idempotent
    main(
        [
            "--links-input", links,
            "--ranks", ranks,
            "--report", rep,
            "--iterations", "3",
            "--partitions", "4",
        ]
    )
    rk2 = {r.node: r.rank for r in spark.read.parquet(ranks).collect()}
    assert rk2 == {k: v.rank for k, v in rk.items()}


def test_linkgraph_job_annotations_mode(spark, tmp_path):
    from jobs.linkgraph_job import main

    docs = str(tmp_path / "pages2")
    links = str(tmp_path / "links2")
    ranks = str(tmp_path / "ranks2")
    rep = str(tmp_path / "report2")
    ann = str(tmp_path / "ann2")
    _pages(spark).write.parquet(docs)

    main(
        [
            "--input", docs,
            "--links", links,
            "--annotations", ann,
            "--ranks", ranks,
            "--report", rep,
            "--iterations", "2",
            "--partitions", "4",
        ]
    )
    a = spark.read.parquet(ann)
    assert {"url", "links", "title", "tables", "jsonld"} <= set(a.columns)
    assert a.count() == 4
    # edge list derived from the annotations table matches direct extraction
    lk = spark.read.parquet(links)
    assert lk.count() == 5
    assert set(lk.columns) == {"src", "dst", "anchor", "nofollow"}

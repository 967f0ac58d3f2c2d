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


@pytest.mark.parametrize("ttl", [None, 60])
def test_streaming_dedup_keep_first(spark, tmp_path, ttl):
    """Stateful keep-first across micro-batches: a fingerprint re-seen in a
    later batch must NOT be re-emitted (state store holds the seen flag).
    With a TTL the ProcessingTimeTimeout is armed per sighting (60 min
    never fires here — semantics must match the no-TTL run)."""
    import time

    from delphi_pdf_parser_spark.streaming.dedup_stream import (
        streaming_dedup_first,
    )

    src = tmp_path / "dedup_in"
    src.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1); file2 re-sees
    # file1's first fingerprint under whitespace/case variation
    spark.createDataFrame(
        [("u1", "hello world"), ("u2", "unique two")], "url string, text string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    time.sleep(1.1)  # distinct file-source timestamps => deterministic order
    spark.createDataFrame(
        [("u3", "  Hello   WORLD "), ("u4", "another doc")],
        "url string, text string",
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("url string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        streaming_dedup_first(stream, state_ttl_minutes=ttl)
        .writeStream.format("memory")
        .queryName(f"dedup_first_{ttl or 0}")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql(
        f"SELECT fingerprint, url FROM dedup_first_{ttl or 0} ORDER BY url"
    ).collect()
    # 4 input docs, 3 distinct fingerprints, each emitted exactly once
    assert len(rows) == 3
    assert len({r["fingerprint"] for r in rows}) == 3
    urls = [r["url"] for r in rows]
    assert "u2" in urls and "u4" in urls
    assert "u1" in urls and "u3" not in urls  # u1's batch ran first


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


def test_streaming_session_windows(spark, tmp_path):
    """session_window over event time: two bursts from one host separated
    by more than the gap must land in two sessions; a second host gets
    its own. Update-mode memory sink, availableNow trigger."""
    import datetime

    from delphi_pdf_parser_spark.sources.documents import DOCUMENTS_SCHEMA
    from delphi_pdf_parser_spark.streaming.extract_stream import (
        read_documents_stream,
        sessionized_crawl_activity,
    )

    t0 = datetime.datetime(2024, 5, 1, 10, 0, 0)

    def row(host, minutes, i):
        return (
            f"https://{host}/p{i}",
            t0 + datetime.timedelta(minutes=minutes),
            bytearray(b"%PDF-x" * 4),
            None,
            "en",
        )

    rows = (
        [row("a.com", m, i) for i, m in enumerate([0, 5, 10])]  # session 1
        + [row("a.com", m, i + 10) for i, m in enumerate([90, 95])]  # session 2
        + [row("b.org", 0, 20)]
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, DOCUMENTS_SCHEMA).coalesce(1).write.parquet(src)
    stream = read_documents_stream(spark, src)
    sessions = sessionized_crawl_activity(stream, gap="30 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("crawl_sessions")
        .outputMode("complete")  # session windows: complete/append only
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["host"], r["session_start"].minute, r["n_docs"])
        for r in spark.sql("select * from crawl_sessions").collect()
    }
    assert ("a.com", 0, 3) in got
    assert ("a.com", 30, 2) in got
    assert ("b.org", 0, 1) in got
    assert len(got) == 3


def test_streaming_curation_matches_batch(spark, tmp_path):
    """VERDICT r4 #8: the streaming quality+dedup curation stages over an
    availableNow file stream (doc_id-ordered batches) must reproduce the
    BATCH curation_pipeline's accounting on the same corpus: identical
    surviving doc_ids and identical per-source n_unique / n_sampled /
    mean_words_sampled."""
    import time

    from delphi_pdf_parser_spark.operators.curation import curation_pipeline
    from delphi_pdf_parser_spark.streaming.curation_stream import (
        streaming_curation,
    )

    # corpus: quality failures (short), cross-batch + cross-source dupes
    long_a = "alpha beta gamma delta " * 10
    long_b = "omega psi chi phi " * 12
    rows = [
        (1, "web", long_a),
        (2, "web", "too short"),                     # fails quality
        (3, "news", long_b),
        (4, "news", " Alpha  BETA gamma delta " * 10),  # ~dup of 1? no:
        # normalization lowercases + collapses whitespace -> dup of 1
        (5, "web", long_b + "tail"),
        (6, "news", long_a),                          # dup of 1, later batch
        (7, "web", long_b),                           # dup of 3, later batch
        (8, "web", "unique closing doc " * 8),
    ]
    schema = "doc_id long, source string, text string"
    src = tmp_path / "cur_in"
    src.mkdir()
    # three doc_id-ordered files -> three micro-batches
    for i, chunk in enumerate([rows[:3], rows[3:6], rows[6:]]):
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
        streaming_curation(stream)
        .writeStream.format("memory")
        .queryName("cur_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM cur_stream").toPandas()

    batch_docs = spark.createDataFrame(rows, schema)
    expect = {
        r["source"]: r
        for r in curation_pipeline(batch_docs).collect()
    }
    # per-source accounting parity
    for source, g in got.groupby("source"):
        e = expect[source]
        assert len(g) == e["n_unique"], (source, len(g), e)
        samp = g[g["sample_pass"]]
        assert len(samp) == e["n_sampled"], source
        if e["n_sampled"]:
            assert round(samp["n_words"].mean(), 4) == e["mean_words_sampled"]
    assert sum(len(g) for _, g in got.groupby("source")) == sum(
        e["n_unique"] for e in expect.values()
    )
    # keep-first parity: the surviving doc_ids are the batch min-doc_id
    # representatives (stream fed in doc_id order)
    from delphi_pdf_parser_spark.operators.curation import curation_base

    base = curation_base(batch_docs).filter("q_pass")
    keep = (
        base.groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    )
    assert sorted(got["doc_id"].tolist()) == sorted(r["doc_id"] for r in keep)


def test_streaming_c4_filter_matches_batch(spark, tmp_path):
    """c4_base is stateless, so the same projection runs unchanged on a
    file stream: availableNow output must equal the batch
    c4_quality_rules row set exactly."""
    import time

    from delphi_pdf_parser_spark.operators.textstats import (
        c4_base,
        c4_quality_rules,
    )

    good = "\n".join(
        f"this is perfectly fine sentence number {i}." for i in range(6)
    )
    rows = [
        (1, good),
        (2, "no terminal punctuation here\nshort line"),
        (3, good + "\ncode has a { brace."),
        (4, "Lorem ipsum dolor sit amet, consectetur adipiscing."),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "c4_in"
    src.mkdir()
    for i, chunk in enumerate([rows[:2], rows[2:]]):
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
        c4_base(stream)
        .writeStream.format("memory")
        .queryName("c4_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM c4_stream")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        c4_quality_rules(spark.createDataFrame(rows, schema))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want), (got, want)


def test_streaming_link_extraction_matches_batch(spark, tmp_path):
    """extract_links is a stateless mapInPandas, so the same pass runs
    on a page stream: availableNow output must equal the batch edge
    list exactly (crawl-frontier feeding as pages arrive)."""
    import time

    from delphi_pdf_parser_spark.operators.graphs import extract_links

    def page(*hrefs):
        body = "".join(f'<a href="{h}">link {i}</a>' for i, h in enumerate(hrefs))
        return f"<html><body>{body}</body></html>".encode()

    rows = [
        ("https://a.example/1", page("https://hub.example/", "/rel")),
        ("https://b.example/", page("https://a.example/1")),
        ("https://c.example/", page()),
    ]
    schema = "url string, html binary"
    src = tmp_path / "links_in"
    src.mkdir()
    for i, chunk in enumerate([rows[:1], rows[1:]]):
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
        extract_links(stream)
        .writeStream.format("memory")
        .queryName("links_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM links_stream")
        .toPandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    want = (
        extract_links(spark.createDataFrame(rows, schema))
        .toPandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert len(got) == 3
    assert got.equals(want), (got, want)


def test_streaming_markdown_matches_batch(spark, tmp_path):
    """html_to_markdown is a stateless mapInPandas: availableNow output
    must equal the batch conversion exactly (markdown-as-pages-arrive)."""
    import time

    from delphi_pdf_parser_spark.operators.htmlmarkdown import (
        html_to_markdown,
    )

    rows = [
        (
            "https://a.example/1",
            b"<h1>A</h1><p>x <b>y</b> <a href='/z'>z</a></p>",
        ),
        ("https://b.example/", b"<ul><li>i</li><li>j</li></ul>"),
        ("https://c.example/", b"<table><tr><td>c</td></tr></table>"),
    ]
    schema = "url string, html binary"
    src = tmp_path / "md_in"
    src.mkdir()
    for i, chunk in enumerate([rows[:1], rows[1:]]):
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
        html_to_markdown(stream)
        .writeStream.format("memory")
        .queryName("md_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM md_stream")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        html_to_markdown(spark.createDataFrame(rows, schema))
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == 3
    assert got.equals(want), (got, want)

"""End-to-end test of the spark-submit curation job: filter -> dedup ->
byte-balanced sharded write + report."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark):
    # gopher-passing prose (>= 50 words, stop words, alphabetic)
    long = (
        "the quick brown fox jumps over that lazy dog and keeps running "
        "through fields with great joy because movement can have meaning "
        "when you least expect it to happen every single day "
    ) * 2
    rows = [(i, "web", long + f"unique closing token t{i}") for i in range(8)]
    rows.append((100, "web", rows[0][2]))  # exact dup of doc 0
    rows.append((101, "web", "too short"))  # fails gopher
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_curate_job_end_to_end(spark, tmp_path):
    from jobs.curate_job import main

    docs_path = str(tmp_path / "docs")
    out_path = str(tmp_path / "curated")
    rep_path = str(tmp_path / "report")
    _corpus(spark).write.parquet(docs_path)

    main(
        [
            "--input", docs_path,
            "--output", out_path,
            "--report", rep_path,
            "--filter", "gopher",
            "--dedup", "exact",
            "--shard-bytes", "2048",
            "--partitions", "4",
        ]
    )

    curated = spark.read.parquet(out_path)
    ids = {r["doc_id"] for r in curated.select("doc_id").collect()}
    assert ids == set(range(8))  # dup 100 and short 101 both gone
    # sharded layout: partition column present, deterministic map
    assert "shard_id" in curated.columns
    rep = spark.read.parquet(rep_path)
    r0 = rep.limit(1).collect()[0]
    assert (r0["n_input"], r0["n_filtered"], r0["n_deduped"]) == (10, 9, 8)
    # shards cover all docs once
    assert rep.agg(F.sum("n_docs")).first()[0] == 8


def test_curate_job_paragraph_rewrite_and_idempotent_rerun(spark, tmp_path):
    """--dedup paragraph REWRITES documents (shared nav paragraph is cut
    from later docs), and rerunning the job with the default overwrite
    mode does not duplicate the corpus."""
    from jobs.curate_job import main

    base = (
        "the quick brown fox jumps over that lazy dog and keeps going "
        "through fields with great joy because movement can have meaning "
        "when you least expect it to happen every single day for sure "
    )
    nav = "shared navigation header paragraph"
    # base x2 clears Gopher's 50-word floor
    rows = [
        (0, "web", nav + "\n" + base * 2 + "alpha ending zero"),
        (1, "web", nav + "\n" + base * 2 + "bravo ending one"),
    ]
    docs_path = str(tmp_path / "docs2")
    out_path = str(tmp_path / "curated2")
    rep_path = str(tmp_path / "report2")
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).write.parquet(docs_path)

    argv = [
        "--input", docs_path,
        "--output", out_path,
        "--report", rep_path,
        "--filter", "gopher",
        "--dedup", "paragraph",
        "--shard-bytes", "4096",
        "--partitions", "4",
    ]
    main(argv)
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out_path).select(
            "doc_id", "text"
        ).collect()
    }
    assert nav in texts[0]       # first occurrence kept
    assert nav not in texts[1]   # later duplicate paragraph CUT
    assert "bravo ending one" in texts[1]

    # rerun: overwrite keeps the corpus identical, not doubled
    main(argv)
    assert spark.read.parquet(out_path).count() == 2
    assert spark.read.parquet(rep_path).count() >= 1

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

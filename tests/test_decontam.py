"""Benchmark decontamination (13-gram overlap): planted-contamination
corpus pins match counts; the driver query is DuckDB-oracled on top."""

from __future__ import annotations


def test_benchmark_overlap_planted(spark):
    from delphi_pdf_parser_spark.operators.decontam import benchmark_overlap

    bench_sentence = "the quick brown fox jumps over the lazy dog near the old mill"
    # 13 tokens -> exactly one 13-gram in the benchmark doc
    assert len(bench_sentence.split()) == 13
    filler = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (0, f"{filler} {bench_sentence} {filler}"),  # contains it
            (1, filler + " " + filler),                   # clean
            (2, bench_sentence),                          # exact copy
            (3, bench_sentence.replace("fox", "cat")),    # 1-token off: clean
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_sentence)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.n_contaminated_ngrams, r.contaminated)
        for r in benchmark_overlap(docs, bench, n=13).collect()
    }
    assert rows == {
        0: (1, True),
        1: (0, False),
        2: (1, True),
        3: (0, False),
    }


def test_benchmark_overlap_counts_distinct(spark):
    from delphi_pdf_parser_spark.operators.decontam import benchmark_overlap

    # doc repeats the benchmark 3-gram twice -> still ONE distinct match;
    # benchmark has two distinct grams, doc contains both -> 2
    docs = spark.createDataFrame(
        [(0, "a b c x a b c"), (1, "a b c d")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "a b c"), (10, "b c d")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r.n_contaminated_ngrams
        for r in benchmark_overlap(docs, bench, n=3).collect()
    }
    assert rows == {0: 1, 1: 2}


def test_short_docs_produce_no_grams(spark):
    from delphi_pdf_parser_spark.operators.decontam import benchmark_overlap

    docs = spark.createDataFrame(
        [(0, "too short"), (1, "a b c")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    rows = {
        r.doc_id: r.contaminated
        for r in benchmark_overlap(docs, bench, n=3).collect()
    }
    assert rows == {0: False, 1: True}

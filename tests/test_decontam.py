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


def test_connected_components_structure(spark):
    """Chain, triangle, and isolated nodes resolve to min-id clusters;
    canonical flags mark exactly one representative per cluster."""
    from delphi_pdf_parser_spark.operators.clusters import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # chain 0-1-2-3 (diameter 3: exercises multi-round propagation),
    # triangle 4-5-6, node 7 isolated
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (4, 5), (5, 6), (6, 4)], "a long, b long"
    )
    rows = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in connected_components(nodes, edges).collect()
    }
    assert rows == {
        0: (0, True), 1: (0, False), 2: (0, False), 3: (0, False),
        4: (4, True), 5: (4, False), 6: (4, False),
        7: (7, True),
    }


def test_dedup_clusters_keep_one(spark):
    from delphi_pdf_parser_spark.operators.clusters import dedup_clusters

    # two near-identical docs + one distinct, same source
    docs = spark.createDataFrame(
        [
            (0, "s", "alpha beta gamma delta epsilon"),
            (1, "s", "alpha beta gamma delta zeta"),
            (2, "s", "totally different words here now"),
        ],
        "doc_id long, source string, text string",
    )
    rows = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup_clusters(docs, threshold=0.5).collect()
    }
    assert rows == {0: (0, True), 1: (0, False), 2: (2, True)}


def test_embedding_decontam_flags_paraphrase_copies(spark):
    """A corpus vector equal (or nearly equal) to a benchmark vector is
    contaminated (cos ~1); an orthogonal vector is clean."""
    from delphi_pdf_parser_spark.operators.decontam import (
        embedding_decontam,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),    # benchmark (id % 5 == 0)
        (5, [0.0, 1.0, 0.0]),    # benchmark
        (1, [1.0, 0.01, 0.0]),   # ~copy of bench 0 -> contaminated
        (2, [0.0, 0.0, 1.0]),    # orthogonal -> clean
        (3, [0.6, 0.8, 0.0]),    # cos 0.8 to bench 5 -> contaminated
    ]
    embs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in embedding_decontam(
            embs, bench_mod=5, threshold=0.75
        ).collect()
    }
    assert sorted(out) == [1, 2, 3]  # benchmark rows are not scored
    assert out[1]["contaminated"] == 1 and out[1]["max_bench_cos"] > 0.99
    assert out[2]["contaminated"] == 0 and out[2]["max_bench_cos"] == 0.0
    assert out[3]["contaminated"] == 1 and out[3]["max_bench_cos"] == 0.8


def test_embedding_decontam_empty_benchmark_marks_all_clean(spark):
    """No benchmark vectors -> every corpus row emits a clean verdict
    (max cos 0), not an empty result."""
    from delphi_pdf_parser_spark.operators.decontam import (
        embedding_decontam,
    )

    embs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = embedding_decontam(embs, bench_mod=100).collect()
    assert len(out) == 3
    assert all(
        r["contaminated"] == 0 and r["max_bench_cos"] == 0.0 for r in out
    )

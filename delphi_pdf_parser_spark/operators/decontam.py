"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation/benchmark set (the classic 13-gram contamination
check used for LLM training-data hygiene).

100 TB shape: the benchmark side is SMALL (eval sets are megabytes) —
its distinct n-grams broadcast; the corpus side explodes n-grams
map-side and inner-joins the broadcast, so only MATCHED grams (a tiny
fraction) reach the per-doc aggregation shuffle. The final counts are
broadcast back onto the corpus ids. No full corpus-wide shuffle of
n-grams ever happens.

The join key is the n-gram STRING so the driver oracle (DuckDB) can
mirror the query exactly; at petabyte scale you'd swap the key for
xxhash64(ngram) (8 bytes vs ~100) and accept a rows-only check — noted
here rather than silently done.

The n-gram construction reuses the arrays_zip-of-shifted-slices form
(codegen-able; the F.transform lambda equivalent measured 70x slower —
see operators/textstats.top_ngrams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _ngram_rows(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, text) -> (doc_id, ngram) with exactly size-n+1 grams per
    doc (docs shorter than n tokens produce none)."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    parts = [
        F.slice(toks, j + 1, F.greatest(F.size(toks) - n + 1, F.lit(0)))
        for j in range(n)
    ]
    zipped = F.arrays_zip(*parts)
    return df.select(F.col("doc_id"), F.explode(zipped).alias("z")).select(
        "doc_id",
        F.concat_ws(" ", *[F.col(f"z.{j}") for j in range(n)]).alias("ngram"),
    )


def benchmark_overlap(
    documents: DataFrame, benchmark: DataFrame, n: int = 13
) -> DataFrame:
    """-> (doc_id, n_contaminated_ngrams, contaminated) per corpus doc:
    how many DISTINCT benchmark n-grams the document contains, and the
    contamination flag (any overlap). Both inputs need (doc_id, text)."""
    bench_grams = _ngram_rows(benchmark, n).select("ngram").distinct()
    doc_grams = _ngram_rows(documents, n)
    matched = doc_grams.join(F.broadcast(bench_grams), "ngram")
    counts = matched.groupBy("doc_id").agg(
        F.count_distinct("ngram").alias("n_contaminated_ngrams")
    )
    return (
        documents.select("doc_id")
        .join(F.broadcast(counts), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.col("n_contaminated_ngrams"), F.lit(0)
            ).alias("n_contaminated_ngrams"),
            (
                F.coalesce(F.col("n_contaminated_ngrams"), F.lit(0)) > 0
            ).alias("contaminated"),
        )
        .orderBy("doc_id")
    )

"""MinHash hash-shingle fast path pinned against the string-shingle
reference: the verified near-dup pairs and their Jaccard values must be
identical (64-bit shingle-hash collisions are the only divergence source
and must not occur on real corpora)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from delphi_pdf_parser_spark.operators.dedup import (
    _shingle_hash_table,
    _shingle_table,
    minhash_lsh_candidates,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_shingle_jaccard_equals_string_jaccard(spark):
    """For every banded candidate pair the hash-set Jaccard must equal
    the string-set Jaccard exactly (collision-free on this corpus) —
    checked over ALL pairs the LSH surfaces, not just the reported ones."""
    docs = _docs(spark)
    pairs = minhash_lsh_candidates(docs, shingle_n=3).select("doc_a", "doc_b")
    strings = _shingle_table(docs, 3)
    j = (
        pairs.join(
            strings.select(
                F.col("doc_id").alias("doc_a"),
                F.col("shingles").alias("str_a"),
            ),
            "doc_a",
        )
        .join(
            strings.select(
                F.col("doc_id").alias("doc_b"),
                F.col("shingles").alias("str_b"),
            ),
            "doc_b",
        )
    )
    hashes = _shingle_hash_table(docs, 3)
    j = (
        j.join(
            hashes.select(
                F.col("doc_id").alias("doc_a"), F.col("shingles").alias("h_a")
            ),
            "doc_a",
        )
        .join(
            hashes.select(
                F.col("doc_id").alias("doc_b"), F.col("shingles").alias("h_b")
            ),
            "doc_b",
        )
    )

    def jac(a, b):
        inter = F.size(F.array_intersect(F.col(a), F.col(b)))
        return inter / (
            F.size(F.col(a)) + F.size(F.col(b)) - inter
        )

    bad = j.select(
        "doc_a",
        "doc_b",
        F.round(jac("str_a", "str_b"), 6).alias("js"),
        F.round(jac("h_a", "h_b"), 6).alias("jh"),
    ).filter("js != jh")
    assert bad.count() == 0, bad.limit(5).collect()
    # distinct-count parity: per-doc hash-set size == string-set size
    sized = strings.select(
        "doc_id", F.size("shingles").alias("ns")
    ).join(
        hashes.select("doc_id", F.size("shingles").alias("nh")), "doc_id"
    )
    assert sized.filter("ns != nh").count() == 0


def test_minhash_pairs_nonempty_and_verified(spark):
    """The sf0.01 corpus has planted near-dups: the pipeline must find
    pairs and every reported pair's Jaccard must clear the threshold."""
    out = minhash_lsh_candidates(_docs(spark)).collect()
    assert len(out) > 0
    assert all(r["jaccard"] >= 0.5 for r in out)

"""ANN-LSH signature vectorization: the Arrow matmul signature must be
bit-identical to the expression-form reference on real embeddings, and
ann_lsh_topk's rows must not drift from the r1 implementation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from delphi_pdf_parser_spark.operators.similarity import (
    _signature_udf,
    ann_lsh_topk,
    lsh_signature,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.01")


def _embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_arrow_signature_matches_expression_form(spark):
    emb = _embeddings(spark).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    for num_planes in (8, 12):
        sig = _signature_udf(spark, num_planes)
        both = emb.select(
            "vec_id",
            sig(F.col("embedding")).alias("fast"),
            lsh_signature(F.col("embedding"), num_planes).alias("ref"),
        )
        bad = both.filter(F.col("fast") != F.col("ref")).count()
        assert bad == 0, f"{bad} signature mismatches at num_planes={num_planes}"


def test_ann_lsh_topk_rows_pinned(spark):
    """Same (query_id, rank, vec_id) rows as the r1 expression-form path
    (the queries are the 5 lowest vec_ids, matching __spark_entry__)."""
    emb = _embeddings(spark)
    queries = emb.orderBy("vec_id").limit(5)
    got = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ann_lsh_topk(emb, queries, k=3).collect()
    }
    # reference rows computed with the expression-form signature
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).withColumn("bucket", lsh_signature(F.col("embedding"), 8))
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("qvec"),
        ).withColumn("bucket", lsh_signature(F.col("qvec"), 8))
    )
    from delphi_pdf_parser_spark.operators.dedup import _cosine
    from pyspark.sql import Window

    joined = e.join(q, on="bucket").filter(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "vec_id",
        F.round(_cosine(F.col("embedding"), F.col("qvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    want = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got == want
    assert got, "empty ANN result"

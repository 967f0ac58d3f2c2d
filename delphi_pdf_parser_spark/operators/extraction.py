"""The extraction operator: documents -> (extracted, metrics).

Spark-side design per SURVEY.md §2.B / §4:

- cheap JVM-side pre-filter (``%PDF-`` magic) BEFORE any Python: Catalyst
  evaluates it in whole-stage codegen, so non-PDF rows never cross the
  Arrow boundary
- column pruning: only (url, html) enter the UDF
- size-bucket salting: UDF cost scales with document size, which AQE
  cannot see (it balances bytes, not Python-seconds). ``repartition`` on
  a composite (size-bucket, random-salt) key spreads giant PDFs across
  executors BEFORE the extraction stage
- one vectorized ``mapInPandas`` UDF does the whole §2.A pipeline per
  Arrow batch; zero per-row Python at the Spark level
- per-partition lineage: each output row carries partition_id +
  input-split tag; the metrics table enables checkpoint-resume via
  left-anti join on url
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("text", StringType()),
        StructField("pages", ArrayType(StringType())),
        StructField("npages", IntegerType()),
        StructField("n_objects", LongType()),
        StructField("status", StringType()),
        StructField("err", StringType()),
        StructField("decode_failures", MapType(StringType(), LongType())),
        StructField("wall_ms", LongType()),
        StructField("partition_id", IntegerType()),
        StructField("title", StringType()),
        StructField("author", StringType()),
        StructField("producer", StringType()),
    ]
)

# number of size buckets for the salting stage; buckets are exponential in
# document size so the 2,000-page whales land alone
SIZE_BUCKET_BOUNDARIES = [0, 16_384, 65_536, 262_144, 1_048_576, 8_388_608]


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The mapInPandas body. Imports stay inside so the function pickles
    cheaply to executors; pdfcore loads once per worker."""
    from pyspark import TaskContext

    from delphi_pdf_parser_spark.pdfcore import extract_text

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1

    for pdf_batch in batches:
        rows = []
        for url, html in zip(pdf_batch["url"], pdf_batch["html"]):
            data = bytes(html) if html is not None else b""
            res = extract_text(data)
            meta = res.metadata or {}
            rows.append(
                (
                    url,
                    res.text if res.status != "failed" else None,
                    res.pages if res.status != "failed" else None,
                    res.npages,
                    res.n_objects,
                    res.status,
                    res.error,
                    {k: int(v) for k, v in res.failures.items()},
                    res.wall_ms,
                    pid,
                    meta.get("Title"),
                    meta.get("Author"),
                    meta.get("Producer"),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[f.name for f in EXTRACTED_SCHEMA.fields],
        )


def size_bucket(col):
    """Exponential size bucket of the raw bytes column (JVM-side)."""
    expr = F.lit(len(SIZE_BUCKET_BOUNDARIES))
    for i, bound in enumerate(reversed(SIZE_BUCKET_BOUNDARIES)):
        expr = F.when(
            F.length(col) <= F.lit(bound), F.lit(len(SIZE_BUCKET_BOUNDARIES) - i)
        ).otherwise(expr)
    return expr.cast("int")


def prefilter_pdfs(documents: DataFrame) -> DataFrame:
    """JVM-side magic-byte filter + projection (pushdown-friendly)."""
    return documents.select("url", "html").filter(
        F.col("html").isNotNull()
        & (F.substring(F.col("html"), 1, 5) == F.lit(b"%PDF-"))
    )


def salt_by_size(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread expensive (big) documents across partitions before the UDF.

    The salt is a deterministic hash of the url (not rand()) so re-runs
    place rows identically — required for checkpoint-resume semantics.
    The salt modulus is 8x the partition count so hash collisions cannot
    leave partitions empty (64 distinct keys into 128 partitions would).
    """
    if not partitions:
        partitions = df.sparkSession.sparkContext.defaultParallelism
    # per-url hash: effectively-unique keys give multinomial balance
    # (coarse bucket+salt%k keys collide and leave partitions uneven);
    # giant documents land randomly, which with tasks ~= cores bounds the
    # whale-per-task count — the bucket column itself feeds the metrics
    # table so skew remains observable
    out = df.repartition(partitions, F.xxhash64("url"))
    return out


def extract_documents(
    documents: DataFrame,
    salt_partitions: int | None = None,
    prefilter: bool = True,
    salt: bool = True,
) -> DataFrame:
    """documents(url, html, ...) -> extracted table (EXTRACTED_SCHEMA).

    salt_partitions defaults to the cluster's default parallelism: the
    Arrow/python-worker round trip has a per-task cost, so tasks ~= cores
    is the sweet spot for uniform corpora; the size-bucketed salt key
    keeps the giant-PDF tail spread across those tasks (and the task-size
    histogram lands in the metrics table to verify it).
    """
    df = prefilter_pdfs(documents) if prefilter else documents.select("url", "html")
    if salt:
        df = salt_by_size(df, salt_partitions)
    return df.mapInPandas(_extract_batches, EXTRACTED_SCHEMA)


def metrics_table(extracted: DataFrame, input_split: str = "") -> DataFrame:
    """Lineage/metrics projection (FIXTURES.md table 3)."""
    return extracted.select(
        F.col("partition_id"),
        F.lit(input_split).alias("input_split"),
        F.col("url"),
        F.col("n_objects"),
        F.col("npages"),
        F.col("status"),
        F.col("decode_failures"),
        F.col("wall_ms"),
    )


def resume_anti_join(documents: DataFrame, done_metrics: DataFrame) -> DataFrame:
    """Checkpoint-resume: keep only documents whose url has no metrics row
    yet (left-anti join — SURVEY §2.B 'Set op (resume)')."""
    return documents.join(
        done_metrics.select("url").distinct(), on="url", how="left_anti"
    )


def verify_against_golden(extracted: DataFrame, golden: DataFrame) -> DataFrame:
    """Byte-identical gate as a DataFrame op: broadcast-join the (small)
    golden set and compare SHA-256 of the text."""
    g = F.broadcast(golden.select("url", F.col("sha256").alias("want_sha256")))
    return (
        extracted.withColumn("got_sha256", F.sha2(F.col("text"), 256))
        .join(g, "url", "inner")
        .withColumn("match", F.col("got_sha256") == F.col("want_sha256"))
    )

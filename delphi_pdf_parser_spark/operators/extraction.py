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
        # the 8 /Info fields openfile1 surfaces (src/digPdfViewer.pas:236-312)
        StructField("title", StringType()),
        StructField("author", StringType()),
        StructField("producer", StringType()),
        StructField("subject", StringType()),
        StructField("creator", StringType()),
        StructField("keywords", StringType()),
        StructField("creation_date", StringType()),
        StructField("mod_date", StringType()),
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
        pws = (
            pdf_batch["password"]
            if "password" in pdf_batch.columns
            else [None] * len(pdf_batch)
        )
        for url, html, pw in zip(pdf_batch["url"], pdf_batch["html"], pws):
            data = bytes(html) if html is not None else b""
            res = extract_text(data, password=pw or b"")
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
                    meta.get("Subject"),
                    meta.get("Creator"),
                    meta.get("Keywords"),
                    meta.get("CreationDate"),
                    meta.get("ModDate"),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[f.name for f in EXTRACTED_SCHEMA.fields],
        )


STAT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("npages", IntegerType()),
        StructField("n_objects", LongType()),
        StructField("status", StringType()),
        StructField("err", StringType()),
        StructField("title", StringType()),
        StructField("author", StringType()),
        StructField("producer", StringType()),
        StructField("subject", StringType()),
        StructField("creator", StringType()),
        StructField("keywords", StringType()),
        StructField("creation_date", StringType()),
        StructField("mod_date", StringType()),
        StructField("wall_ms", LongType()),
    ]
)


def _stat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from delphi_pdf_parser_spark.pdfcore import stat_document

    for pdf_batch in batches:
        rows = []
        for url, html in zip(pdf_batch["url"], pdf_batch["html"]):
            res = stat_document(bytes(html) if html is not None else b"")
            meta = res.metadata or {}
            rows.append(
                (
                    url, res.npages, res.n_objects, res.status, res.error,
                    meta.get("Title"), meta.get("Author"),
                    meta.get("Producer"), meta.get("Subject"),
                    meta.get("Creator"), meta.get("Keywords"),
                    meta.get("CreationDate"), meta.get("ModDate"),
                    res.wall_ms,
                )
            )
        yield pd.DataFrame(
            rows, columns=[f.name for f in STAT_SCHEMA.fields]
        )


def stat_documents(documents: DataFrame, prefilter: bool = True) -> DataFrame:
    """The cheap stat-pass job (openfile1, SURVEY §3.2): metadata + page
    count per url with NO content-stream decode — an order of magnitude
    cheaper than extraction, so no salting stage (its cost is xref-bound,
    roughly uniform in document size)."""
    df = prefilter_pdfs(documents) if prefilter else documents.select("url", "html")
    return df.mapInPandas(_stat_batches, STAT_SCHEMA)


def size_bucket(col):
    """Exponential size bucket of the raw bytes column (JVM-side)."""
    expr = F.lit(len(SIZE_BUCKET_BOUNDARIES))
    for i, bound in enumerate(reversed(SIZE_BUCKET_BOUNDARIES)):
        expr = F.when(
            F.length(col) <= F.lit(bound), F.lit(len(SIZE_BUCKET_BOUNDARIES) - i)
        ).otherwise(expr)
    return expr.cast("int")


def prefilter_pdfs(
    documents: DataFrame, extra_cols: tuple | list = ()
) -> DataFrame:
    """JVM-side magic-byte filter + projection (pushdown-friendly)."""
    return documents.select("url", "html", *extra_cols).filter(
        F.col("html").isNotNull()
        & (F.substring(F.col("html"), 1, 5) == F.lit(b"%PDF-"))
    )


_TARGET_TASK_BYTES = 256 << 20  # ~256 MB of raw documents per task


_MAX_AUTO_PARTITIONS = 1_000_000  # 100 TB / 256 MB ≈ 400k — leave headroom


def _auto_partitions(size_bytes: int, base_parallelism: int) -> int:
    """Scale the extraction-stage task count with DATA size, floored at
    the cluster's parallelism: at 100 TB a cores-only default would pull
    multi-GB Arrow batches through each python worker (OOM); at bench
    scale the floor keeps every core busy. Catalyst reports Long.MaxValue
    when statistics are unknown — treat anything absurd as unknown."""
    if size_bytes >= 1 << 60:
        size_bytes = 0
    by_size = (size_bytes + _TARGET_TASK_BYTES - 1) // _TARGET_TASK_BYTES
    return int(min(max(base_parallelism, by_size), _MAX_AUTO_PARTITIONS))


def salt_by_size(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread expensive (big) documents across partitions before the UDF.

    The salt is a deterministic hash of the url (not rand()) so re-runs
    place rows identically — required for checkpoint-resume semantics.
    The salt modulus is 8x the partition count so hash collisions cannot
    leave partitions empty (64 distinct keys into 128 partitions would).
    """
    if not partitions:
        base = df.sparkSession.sparkContext.defaultParallelism
        try:
            # Catalyst's plan statistics: for parquet/Iceberg scans this is
            # the (filter-pruned) input size in bytes
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:  # stats unavailable: fall back to parallelism
            size = 0
        partitions = _auto_partitions(size, base)
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
    password_col: str | None = None,
) -> DataFrame:
    """documents(url, html, ...) -> extracted table (EXTRACTED_SCHEMA).

    salt_partitions defaults to the cluster's default parallelism: the
    Arrow/python-worker round trip has a per-task cost, so tasks ~= cores
    is the sweet spot for uniform corpora; the size-bucketed salt key
    keeps the giant-PDF tail spread across those tasks (and the task-size
    histogram lands in the metrics table to verify it).

    ``password_col`` names an optional per-document password column
    (string; null/empty = unencrypted or empty-user-password docs) —
    the batch-engine equivalent of the reference GUI's password prompt
    (src/digPdfViewer.pas): join your url->password side table onto the
    corpus first, then point this at the column. Wrong/missing
    passwords degrade to status='failed', error='needs_password' rows
    in the metrics table, never a job failure.
    """
    cols = ["url", "html"]
    if password_col is not None:
        documents = documents.withColumn(
            "password", F.col(password_col).cast("string")
        )
        cols.append("password")
    df = (
        prefilter_pdfs(documents, extra_cols=cols[2:])
        if prefilter
        else documents.select(*cols)
    )
    if salt:
        df = salt_by_size(df, salt_partitions)
    return df.mapInPandas(_extract_batches, EXTRACTED_SCHEMA)


CHUNK_SCHEMA = StructType(
    EXTRACTED_SCHEMA.fields
    + [
        StructField("chunk_idx", IntegerType()),
        StructField("n_chunks", IntegerType()),
    ]
)


def _count_pages_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def page_count(html: pd.Series, pw: pd.Series) -> pd.Series:
        from delphi_pdf_parser_spark.pdfcore.extract import count_pages_only

        out = []
        for data, p in zip(html, pw):
            try:
                out.append(count_pages_only(bytes(data), password=p or b""))
            except Exception:
                out.append(0)
        return pd.Series(out)

    return page_count


def _chunk_extract_batches(pages_per_chunk: int):
    """One input row = one (url, html, chunk_idx) unit of work."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        from delphi_pdf_parser_spark.pdfcore.extract import (
            extract_text,
            extract_text_pages,
        )

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        cols = [f.name for f in CHUNK_SCHEMA.fields]
        for b in batches:
            rows = []
            pws = (
                b["password"]
                if "password" in b.columns
                else [None] * len(b)
            )
            for url, html, c, n_chunks, pw in zip(
                b["url"], b["html"], b["chunk_idx"], b["n_chunks"], pws
            ):
                data = bytes(html)
                c = int(c)
                lo = c * pages_per_chunk
                hi = lo + pages_per_chunk
                res = (
                    extract_text_pages(
                        data,
                        lo,
                        hi,
                        want_metadata=(c == 0),
                        password=pw or b"",
                    )
                    if n_chunks > 1 or c > 0
                    else extract_text(data, password=pw or b"")
                )
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
                        meta.get("Subject"),
                        meta.get("Creator"),
                        meta.get("Keywords"),
                        meta.get("CreationDate"),
                        meta.get("ModDate"),
                        c,
                        int(n_chunks),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return fn


def _merge_chunks(key, g):  # (no type hints: pyspark infers the
    # grouped-map eval type from arity; partial hints only trigger a warning)
    """applyInPandas merge of per-chunk rows back into one document row
    (chunks concatenate in index order; metrics sum/merge). Arity-2
    grouped map: receives ONE group DataFrame per url and must RETURN a
    DataFrame (not yield)."""
    import pandas as pd  # noqa: F811 - executor-side import

    g = g.sort_values("chunk_idx")
    failures: dict = {}
    for m in g["decode_failures"]:
        if m:
            for k, v in m.items():
                failures[k] = failures.get(k, 0) + int(v)
    ok = all(s != "failed" for s in g["status"])
    pages: list = []
    for p in g["pages"]:
        if p is not None:
            pages.extend(p)
    return pd.DataFrame(
        [
            (
                g["url"].iloc[0],
                "".join(t for t in g["text"] if t is not None) if ok else None,
                pages if ok else None,
                int(g["npages"].max()),
                int(g["n_objects"].max()),
                ("repaired" if (g["status"] == "repaired").any() else "ok")
                if ok
                else "failed",
                next((e for e in g["err"] if e), ""),
                failures,
                int(g["wall_ms"].sum()),
                int(g["partition_id"].iloc[0]),
                g["title"].iloc[0],
                g["author"].iloc[0],
                g["producer"].iloc[0],
                g["subject"].iloc[0],
                g["creator"].iloc[0],
                g["keywords"].iloc[0],
                g["creation_date"].iloc[0],
                g["mod_date"].iloc[0],
            )
        ],
        columns=[f.name for f in EXTRACTED_SCHEMA.fields],
    )


def extract_documents_balanced(
    documents: DataFrame,
    whale_bytes: int = 1 << 20,
    pages_per_chunk: int = 100,
    salt_partitions: int | None = None,
    salt: bool = True,
    password_col: str | None = None,
) -> DataFrame:
    """Skew-proof extraction: giant documents are split into page-range
    chunks that parallelize across tasks, then reassembled (page texts
    concatenate exactly — each page gets a fresh text device, so the
    per-range outputs are byte-identical to the unsplit run).

    Cost model: a whale is parsed once per chunk (xref + fonts re-read),
    trading ~15% redundant parse for document-level parallelism. With
    pages_per_chunk=100, a 2,000-page whale becomes 20 tasks instead of
    one 5-second straggler — this is what bounds max-task/median-task at
    the 100 TB scale where the corpus has heavy page-count tails.
    """
    if password_col is not None:
        documents = documents.withColumn(
            "password", F.col(password_col).cast("string")
        )
    base = prefilter_pdfs(
        documents,
        extra_cols=("password",) if password_col is not None else (),
    )
    small = base.filter(F.length("html") < whale_bytes)
    big = base.filter(F.length("html") >= whale_bytes)

    # salt=False is the bucketed-at-ingest production shape: the scan is
    # already balanced by url-hash, so the salting exchange is pure cost
    # (whale chunks below still repartition — they must, to spread one
    # document's chunks across tasks)
    small_out = extract_documents(
        small,
        salt_partitions=salt_partitions,
        prefilter=False,
        salt=salt,
        password_col="password" if password_col is not None else None,
    )

    chunks = extract_whale_chunks(
        big, pages_per_chunk=pages_per_chunk, partitions=salt_partitions
    )
    big_out = chunks.groupBy("url").applyInPandas(
        _merge_chunks, EXTRACTED_SCHEMA
    )
    return small_out.unionByName(big_out)


def extract_whale_chunks(
    big: DataFrame,
    pages_per_chunk: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """The chunk stage of balanced extraction, exposed separately so the
    CHUNK-LEVEL lineage (per-chunk partition_id + wall_ms) can feed the
    metrics table / skew evidence — after _merge_chunks a whale's summed
    wall_ms is attributed to one partition_id, which would misread as
    skew that the chunk spreading actually eliminated."""
    parts = (
        partitions or big.sparkSession.sparkContext.defaultParallelism
    )
    has_pw = "password" in big.columns
    pw_col = (
        F.col("password") if has_pw else F.lit(None).cast("string")
    )
    keep = ["url", "html", "chunk_idx", "n_chunks"] + (
        ["password"] if has_pw else []
    )
    planned = (
        big.withColumn(
            "_npages", _count_pages_udf()(F.col("html"), pw_col)
        )
        .withColumn(
            "n_chunks",
            F.greatest(
                F.lit(1), F.ceil(F.col("_npages") / F.lit(pages_per_chunk))
            ).cast("int"),
        )
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)),
        )
        .select(*keep)
        # chunk-level repartition: a 2,000-page whale becomes 20 units of
        # work spread across the cluster (the whale bytes are duplicated
        # per chunk through this one exchange — whales are the tail, so
        # the duplication is small relative to the corpus)
        .repartition(parts, F.xxhash64("url", "chunk_idx"))
    )
    return planned.mapInPandas(
        _chunk_extract_batches(pages_per_chunk), CHUNK_SCHEMA
    )


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


def write_extracted_partitioned(
    extracted: DataFrame, path: str, partition_by: tuple[str, ...] = ("status",)
) -> None:
    """Hive-partitioned parquet sink: downstream consumers that read one
    slice (status='ok' for training data, status='failed' for triage)
    scan ONLY that slice — partition pruning happens at planning time,
    before any file is opened. At corpus scale the ok/failed split is the
    most common read pattern for the extracted table."""
    extracted.write.mode("append").partitionBy(*partition_by).parquet(path)

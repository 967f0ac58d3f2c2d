"""Spark operator for HTML main-content extraction (boilerplate strip).

Same pipeline shape as PDF extraction: prefilter -> (optional salt) ->
one Arrow mapInPandas pass over html bytes -> (url, title, text,
n_blocks, n_content_blocks, status). Composes with the PDF path into a
full Common-Crawl main-content job: route application/pdf payloads to
extract_documents, text/html payloads here, union the text columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

HTML_EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("n_blocks", IntegerType()),
        StructField("n_content_blocks", IntegerType()),
        StructField("status", StringType()),
    ]
)


def _html_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from delphi_pdf_parser_spark.htmlcore import extract_main_content

    cols = [f.name for f in HTML_EXTRACTED_SCHEMA.fields]
    for b in batches:
        rows = []
        for url, html in zip(b["url"], b["html"]):
            try:
                r = extract_main_content(bytes(html))
                rows.append(
                    (
                        url,
                        r["title"],
                        r["text"],
                        r["n_blocks"],
                        r["n_content_blocks"],
                        "ok",
                    )
                )
            except Exception as e:  # tolerant, like the PDF path
                rows.append((url, None, None, 0, 0, f"failed:{e}"))
        yield pd.DataFrame(rows, columns=cols)


def prefilter_html(documents: DataFrame) -> DataFrame:
    """Keep rows whose payload looks like markup (cheap JVM-side byte
    probe: '<' within the first bytes after optional whitespace/BOM) and
    is NOT a PDF. Pushes down to the scan like the %PDF- prefilter."""
    head = F.substring(F.col("html"), 1, 256).cast("string")
    return documents.select("url", "html").filter(
        F.col("html").isNotNull()
        & (F.substring(F.col("html"), 1, 5) != F.lit(b"%PDF-"))
        & (F.lower(head).rlike(r"^\s*(<!doctype|<html|<head|<body|<)"))
    )


def extract_html_documents(
    documents: DataFrame, prefilter: bool = True
) -> DataFrame:
    from .parallelize import ensure_min_parallelism

    df = prefilter_html(documents) if prefilter else documents.select(
        "url", "html"
    )
    # under-split inputs fan out before the Python stage (no-op on
    # properly-split tables — operators/parallelize.py)
    return ensure_min_parallelism(df, min_bytes=2 << 20).mapInPandas(
        _html_batches, HTML_EXTRACTED_SCHEMA
    )

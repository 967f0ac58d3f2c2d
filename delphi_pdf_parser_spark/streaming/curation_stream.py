"""Streaming curation: the batch pipeline's quality + keep-first-dedup
stages over a document stream (VERDICT r4 #8).

The stateless stage is literally the batch projection
(operators.curation.curation_base — same expressions, so quality
verdicts, fingerprints and sample hashes are identical by construction);
the dedup stage extends dedup_stream's applyInPandasWithState keep-first
to carry the curation columns and resolve ties by MIN doc_id within the
first micro-batch a fingerprint appears in. When the stream delivers
documents in doc_id order (a backfill reading dated WARC dumps — the
availableNow test feeds files that way), the surviving rows equal the
batch pipeline's min-doc_id keep-first exactly; under arbitrary arrival
order the contract degrades to first-SEEN (the only causal option a
stream has), with ties inside a batch still min-doc_id.

Sampling is a stateless predicate on the emitted rows (sample_pass), so
downstream per-source accounting over this stream reproduces the batch
pipeline's n_unique / n_sampled / mean_words_sampled numbers — pinned in
tests/test_streaming.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from delphi_pdf_parser_spark.operators.curation import curation_base

CURATION_OUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_words", IntegerType()),
        StructField("sample_pass", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _keep_first_curated(sample_hex: str, ttl_ms: int | None):
    def fn(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return iter(())
        best = None
        total = 0
        for pdf in pdfs:
            total += len(pdf)
            if len(pdf):
                i = pdf["doc_id"].idxmin()
                row = pdf.loc[i]
                if best is None or row["doc_id"] < best["doc_id"]:
                    best = row
        already = state.exists
        if already:
            (seen,) = state.get
            state.update((seen + total,))
        else:
            state.update((total,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if already or best is None:
            return iter(())
        return iter(
            [
                pd.DataFrame(
                    [
                        (
                            key[0],
                            int(best["doc_id"]),
                            best["source"],
                            int(best["n_words"]),
                            bool(best["sample_h"] < sample_hex),
                        )
                    ],
                    columns=[f.name for f in CURATION_OUT_SCHEMA.fields],
                )
            ]
        )

    return fn


def streaming_curation(
    documents: DataFrame,
    min_words: int = 30,
    min_alpha_frac: float = 0.8,
    sample_hex: str = "8000",
    salt: str = "cur1",
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """documents stream -> one row per surviving (quality-passing,
    first-seen-fingerprint) document, with its deterministic sampling
    verdict. State is one seen-counter per fingerprint, TTL-boundable
    exactly like streaming_dedup_first."""
    base = curation_base(
        documents.filter(F.col("text").isNotNull()),
        min_words=min_words,
        min_alpha_frac=min_alpha_frac,
        salt=salt,
    ).filter("q_pass")
    ttl_ms = state_ttl_minutes * 60_000 if state_ttl_minutes else None
    return base.groupBy("fingerprint").applyInPandasWithState(
        _keep_first_curated(sample_hex, ttl_ms),
        outputStructType=CURATION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )

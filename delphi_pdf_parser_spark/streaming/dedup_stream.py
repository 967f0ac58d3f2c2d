"""Stateful streaming dedup: keep-first across micro-batches.

The training-pipeline use: a continuously-ingesting crawl re-sees the
same document (same normalized-text fingerprint) across WARC dumps; this
operator emits each fingerprint's first arrival only, holding a
seen-flag in the state store (applyInPandasWithState — the custom
stateful operator path the engine uses when built-in dropDuplicates
state semantics don't fit, e.g. when the emitted row must carry
first-arrival metadata).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("fingerprint", StringType()),
        StructField("url", StringType()),
        StructField("n_dupes_in_batch", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _keep_first_fn(ttl_ms: int | None):
    def _keep_first(key, pdfs, state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            # TTL expired with no re-occurrence: drop the seen-flag. The
            # fingerprint may re-emit later — the operator's contract with
            # a TTL is "first seen within any ttl window", which is what
            # bounds the state store at 10^12-document scale
            state.remove()
            return iter(())
        total = 0
        first_url = None
        for pdf in pdfs:
            total += len(pdf)
            if first_url is None and len(pdf):
                first_url = pdf["url"].iloc[0]
        already = state.exists
        if already:
            (seen,) = state.get
            state.update((seen + total,))
        else:
            state.update((total,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)  # re-arm on every sighting
        if already:
            return iter(())  # already emitted in an earlier batch
        return iter(
            [
                pd.DataFrame(
                    [(key[0], first_url, total)],
                    columns=["fingerprint", "url", "n_dupes_in_batch"],
                )
            ]
        )

    return _keep_first


def streaming_dedup_first(
    documents: DataFrame, state_ttl_minutes: int | None = None
) -> DataFrame:
    """documents stream -> first-seen (fingerprint, url) rows.

    state_ttl_minutes bounds the state store: a fingerprint unseen for the
    TTL is evicted (processing-time timeout) and would re-emit on its next
    arrival. Without it the seen-set grows with the distinct-fingerprint
    count — fine for bounded backfills, not for an endless crawl."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # null text => md5 NULL => every null-text doc would collapse into one
    # state-store group and all but the first silently vanish; a doc with
    # no content has nothing to dedup on, so drop it before the state op
    fps = documents.filter(F.col("text").isNotNull()).select(
        F.md5(norm).alias("fingerprint"), "url"
    )
    ttl_ms = state_ttl_minutes * 60_000 if state_ttl_minutes else None
    return fps.groupBy("fingerprint").applyInPandasWithState(
        _keep_first_fn(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms
            else GroupStateTimeout.NoTimeout
        ),
    )

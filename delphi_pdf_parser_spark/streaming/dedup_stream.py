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


def _keep_first(key, pdfs, state: GroupState):
    total = 0
    first_url = None
    for pdf in pdfs:
        total += len(pdf)
        if first_url is None and len(pdf):
            first_url = pdf["url"].iloc[0]
    if state.exists:
        (seen,) = state.get
        state.update((seen + total,))
        return iter(())  # already emitted in an earlier batch
    state.update((total,))
    return iter(
        [
            pd.DataFrame(
                [(key[0], first_url, total)],
                columns=["fingerprint", "url", "n_dupes_in_batch"],
            )
        ]
    )


def streaming_dedup_first(documents: DataFrame) -> DataFrame:
    """documents stream -> first-seen (fingerprint, url) rows."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    # null text => md5 NULL => every null-text doc would collapse into one
    # state-store group and all but the first silently vanish; a doc with
    # no content has nothing to dedup on, so drop it before the state op
    fps = documents.filter(F.col("text").isNotNull()).select(
        F.md5(norm).alias("fingerprint"), "url"
    )
    return fps.groupBy("fingerprint").applyInPandasWithState(
        _keep_first,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

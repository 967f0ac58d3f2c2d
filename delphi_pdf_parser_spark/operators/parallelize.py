"""Split-count defense for compute-heavy map stages.

At 100 TB an input table arrives in thousands of splits and every
map-only stage parallelizes for free.  But a small table written as one
parquet row group (a dimension snapshot, a re-ingested sample, bench
corpora) yields ONE scan partition, and any expensive map work behind it
— Arrow UDF decode, shingle/hash explode — serializes onto a single
core no matter how many the cluster has.  ``ensure_min_parallelism``
repartitions ONLY when the upstream split count is below the cluster's
default parallelism, so on a properly-split production table it is a
no-op branch (zero added shuffle) while small inputs fan out to every
core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    """Round-robin repartition iff the plan's current partition count is
    below ``defaultParallelism * min_factor``.  The partition-count probe
    reads the physical plan only (no job is triggered)."""
    sc = df.sparkSession.sparkContext
    target = max(1, int(sc.defaultParallelism * min_factor))
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

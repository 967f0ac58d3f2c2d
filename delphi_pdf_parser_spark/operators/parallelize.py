"""Split-count defense for compute-heavy map stages.

At 100 TB an input table arrives in thousands of splits and every
map-only stage parallelizes for free.  But a small table written as one
parquet row group (a dimension snapshot, a re-ingested sample, bench
corpora) yields ONE scan partition, and any expensive map work behind it
— Arrow UDF decode, shingle/hash explode — serializes onto a single
core no matter how many the cluster has.

``ensure_min_parallelism`` fans such inputs out with a bounded
round-robin repartition.  The decision reads ONLY Catalyst's size
estimate (``optimizedPlan().stats().sizeInBytes`` — no job, no RDD
conversion; a ``df.rdd.getNumPartitions()`` probe was measured at
~1.4 s of plan-compilation overhead per query and is deliberately
avoided):

- est < ``min_bytes``  -> leave serial: for cheap map work (HTML strip,
  zlib ratio, shingling) the shuffle + stage barrier costs more than
  the serial work it would parallelize.  Codec-heavy stages
  (image/audio/video decode — hundreds of Python cycles per byte) pass
  ``min_bytes=0`` to always fan out.
- est >= ``max_bytes`` -> leave alone: a table this size arrives in
  many splits on any real layout, so the guard is a no-op branch at
  production scale (zero added shuffle at 100 TB).
- otherwise            -> repartition to cluster parallelism; the
  shuffle is bounded by ``max_bytes`` (default 1 GB), i.e. trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(
    df: DataFrame,
    min_factor: float = 1.0,
    min_bytes: int = 0,
    max_bytes: int = 1 << 30,
) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = max(1, int(sc.defaultParallelism * min_factor))
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return df  # estimate unavailable: don't add a blind shuffle
    if est < min_bytes or est >= max_bytes:
        return df
    return df.repartition(target)

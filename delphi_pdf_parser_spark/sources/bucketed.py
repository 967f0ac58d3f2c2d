"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant recurring cost of url-keyed work (resume
anti-joins, golden verification, incremental re-crawls joining old and
new snapshots) is re-shuffling both sides on url every run. Bucketing
pays that shuffle ONCE at write time: both tables are hash-partitioned
into the same bucket count on the join key, so every later equi-join is
a zero-exchange zip of co-located buckets (Spark keeps bucket info in
the catalog; `spark.sql.sources.bucketing.enabled` is on by default).

This module is the thin, explicit wrapper so jobs and tests share one
definition of "the documents bucketing" (bucket count + key + sort) —
mismatched bucket counts silently fall back to a full shuffle, which is
exactly the regression the plan test pins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted catalog table. Sorting within buckets
    additionally enables sort-merge-join without the per-task sort."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "url",
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucketed tables: with matching bucket specs the
    physical plan contains NO Exchange on either side."""
    left = spark.read.table(left_table)
    right = spark.read.table(right_table)
    return left.join(right, on=key, how=how)

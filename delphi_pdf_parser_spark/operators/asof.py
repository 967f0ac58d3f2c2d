"""As-of join — a custom operator Spark lacks natively.

Implemented as a composition of built-in DataFrame ops (the task brief's
preferred strategy (a)): tag both streams, union, and carry the most
recent right-side row forward with last(ignorenulls) over a
partition-by-key event-time window. This avoids the quadratic
key-fanout of join-then-filter: one shuffle on (key), one sort — the
same cost profile as a windowed aggregation, scale-safe for
billion-row streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
) -> DataFrame:
    """For each left row, attach `right_values` from the latest right row
    with right_ts <= left_ts within the same `on` key (backward as-of).

    Ties on the instant: right rows sort BEFORE left rows at the same
    timestamp, so an exactly-simultaneous right row matches.
    """
    lcols = left.columns
    # carry ONE struct of all right_values with a single
    # last(ignorenulls=True): the matched right row stays atomic even
    # when individual value columns are NULL (carrying each column
    # independently would stitch fields from different right rows)
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*lcols).alias("_lrow"),
        F.lit(None)
        .cast(
            "struct<" +
            ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in right_values
            )
            + ">"
        )
        .alias("_rrow"),
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in right_values]).alias("_rrow"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_is_left",
        "_lrow",
        F.last("_rrow", ignorenulls=True).over(w).alias("_rv"),
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_rv.{c}").alias(f"asof_{c}") for c in right_values],
    )
    return out

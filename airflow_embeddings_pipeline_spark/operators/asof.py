"""As-of and range joins — operators Spark lacks natively (SURVEY §2.3
"not present" list; pyspark guide 'Common OLAP patterns').

``asof_join`` uses the union + window composition, not a join at all:
tag both sides, union, and per key take the last right-side value at or
before each left timestamp (``last(ignorenulls)`` over an ordered
window).  One shuffle on the key, no range predicate, no nested-loop —
at 100 TB this is the only formulation that doesn't explode: a naive
``l.ts >= r.ts`` theta-join is O(n·m) per key, while the union-window
is O((n+m) log) within each key partition via one sort.

``range_join_small_dim`` broadcasts an interval dimension and lets the
non-equi predicate run as a BroadcastNestedLoopJoin — correct choice
when the dim is small (tiers, buckets, calendars); for large interval
tables the scale path is bucketize-then-equi-join (bucket id = range
prefix), which turns the range predicate into a shuffle key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row at or before
    (``backward``) / earliest at or after (``forward``) its timestamp,
    per key.  Right side should be unique per (key, ts)."""
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    tagged_right = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(tagged_left.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(right_ts).alias("__r_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    if direction == "backward":
        # right rows sort before left rows at equal ts ⇒ 'at or before'
        w = (
            Window.partitionBy("__k")
            .orderBy(F.asc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.desc("__ts"), F.asc("__is_left"))
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    filled = unioned.select(
        "__is_left",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__rv_{c}")
            for c in value_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__rv_ts"),
    )
    return filled.filter(F.col("__is_left") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rv_{c}").alias(f"asof_{c}") for c in value_cols],
        F.col("__rv_ts").alias("asof_ts"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Event-time interval join: pair each left row with every right
    row of the same key whose timestamp falls in
    ``[left_ts, left_ts + window_seconds]`` (both ends inclusive — the
    batch equivalent of the stream-stream time-bound join in
    ``tests/test_streaming.py``).

    Scale shape: instead of an equi-join on key with a range residual
    (state per key unbounded — one hot key holds its whole history),
    both sides bucketize event time into ``window_seconds`` buckets and
    equi-join on (key, bucket); each left row probes exactly two
    buckets (its own and the next), so the join key includes time and
    state per (key, bucket) is bounded by the window — the same bound
    a streaming watermark enforces.  The exact range predicate runs as
    a cheap post-join filter."""
    bucket = lambda c: F.floor(F.unix_timestamp(c) / window_seconds)  # noqa: E731
    l = left.withColumn(
        "__bucket", F.explode(F.array(bucket(F.col(left_ts)), bucket(F.col(left_ts)) + 1))
    )
    r = right.withColumn("__bucket", bucket(F.col(right_ts)))
    joined = l.join(r, [key, "__bucket"]).filter(
        (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
        )
    )
    return joined.drop("__bucket")


def range_join_small_dim(
    fact: DataFrame,
    dim: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    lo_inclusive: bool = True,
    hi_inclusive: bool = False,
) -> DataFrame:
    """fact ⨝ dim on ``dim.lo ≤/< fact.value ≤/< dim.hi``; dim is
    broadcast (BroadcastNestedLoopJoin — right for small interval
    dims; bucketize for big ones)."""
    v = fact[value_col]
    lo = (v >= dim[lo_col]) if lo_inclusive else (v > dim[lo_col])
    hi = (v <= dim[hi_col]) if hi_inclusive else (v < dim[hi_col])
    return fact.join(F.broadcast(dim), lo & hi, "inner")

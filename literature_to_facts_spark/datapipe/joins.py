"""Temporal join operators Spark lacks natively.

:func:`asof_join` — for each left row, attach the LATEST right row with
``right_ts <= left_ts`` in the same key group (the backward as-of join of
kdb/pandas/DuckDB).  Spark has no ASOF JOIN; the naive formulations are a
range join (quadratic blow-up per key) or a per-key subquery.  This
implementation is the scale-sound union trick:

    tag left rows side=1 and right rows side=0 with a common event time,
    union them, ONE shuffle on the key, and sweep each key partition in
    time order carrying ``last(right_payload, ignorenulls=True)`` over an
    unbounded-preceding running window — an O(n log n) sort-based plan with
    no row multiplication, the same shape a merge-join-based ASOF executes.

Hot keys land on one reducer (a sort, not a buffer — rank/last are streaming
window functions); for a single pathological key, pre-split by coarse time
bucket and stitch the boundary (not needed for key cardinality in the
millions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: every left row, plus the right row with the
    greatest ``right_ts <= left_ts`` in the same ``on`` group (NULLs when no
    prior right row exists — left-outer semantics, like DuckDB ``ASOF LEFT
    JOIN`` / pandas ``merge_asof``).

    A right row AT exactly ``left_ts`` matches (<= semantics).  Ties among
    multiple right rows sharing (key, right_ts) resolve deterministically to
    the greatest payload struct (field order = ``right_cols``); pre-dedup the
    right side if different tie semantics are needed.

    Output: all left columns + ``right_cols`` (each renamed with ``suffix``)
    + ``right_ts + suffix``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    rp = F.struct(
        *[F.col(c).alias(c) for c in right_cols],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    )
    r = right.select(
        *keys,
        F.col(right_ts).cast("timestamp").alias("_ats"),
        F.lit(0).alias("_side"),
        rp.alias("_rp"),
    )
    lp = F.struct(*[F.col(c).alias(c) for c in left.columns])
    l = left.select(
        *keys,
        F.col(left_ts).cast("timestamp").alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        lp.alias("_lp"),
    )
    r = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType))
    u = l.unionByName(r.select(*l.columns))
    # right rows sort BEFORE left rows at equal time (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row; among equal
    # (key, time) right rows the greatest _rp struct sweeps last (determinism)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc(), F.col("_rp").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(c + suffix) for c in right_cols]
    out_cols.append(F.col("_m._rts").alias(right_ts + suffix))
    return matched.where(F.col("_side") == 1).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: str | list | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range join: every (point, interval) pair with ``start <= ts < end``
    (half-open) and matching ``on`` keys — Spark plans a bare BETWEEN join
    as BroadcastNestedLoopJoin / cartesian (quadratic per key).

    Scale path: explode each interval into the coarse time buckets it spans,
    bucket each point, EQUI-join on (keys, bucket), then apply the exact
    range predicate as a post-filter.  The shuffle is a plain hash join;
    work is linear in points + interval-bucket spans.  Choose
    ``bucket_seconds`` near the median interval length: too small multiplies
    interval rows (span/bucket copies), too large widens the per-bucket
    candidate set.  Empty/inverted intervals (end <= start) are dropped (a
    descending sequence() would otherwise throw under ANSI).

    Output: all point columns + all interval columns (caller aliases
    collisions away beforehand).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    b_us = int(bucket_seconds) * 1_000_000
    ivals = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / F.lit(b_us)),
                F.floor(
                    (F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / F.lit(b_us)
                ),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(b_us))
    )
    joined = pts.join(ivals, on=keys + ["_bucket"], how="inner").where(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_bucket")

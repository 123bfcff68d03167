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
window functions); for a single pathological key, ``split_seconds`` pre-splits
each key's timeline into coarse buckets, sweeps each (key, bucket) partition
independently, and stitches bucket boundaries by carrying each bucket's last
right row forward along a tiny per-key bucket spine (not needed for key
cardinality in the millions).
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
    split_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row, plus the right row with the
    greatest ``right_ts <= left_ts`` in the same ``on`` group (NULLs when no
    prior right row exists — left-outer semantics, like DuckDB ``ASOF LEFT
    JOIN`` / pandas ``merge_asof``).

    A right row AT exactly ``left_ts`` matches (<= semantics).  Ties among
    multiple right rows sharing (key, right_ts) resolve deterministically to
    the greatest payload struct (field order = ``right_cols``); pre-dedup the
    right side if different tie semantics are needed.

    ``split_seconds`` (hot-key mitigation, identical results): by default one
    key's whole timeline sweeps on one reducer — a sort, not a buffer, but
    still single-threaded for a pathological key holding a large share of the
    data.  With ``split_seconds`` set, the sweep partitions by (key, coarse
    time bucket) so a hot key parallelizes across its buckets; boundaries are
    stitched by carrying each bucket's last right row forward along the
    per-key bucket spine (distinct buckets — tiny, span/width rows per key).
    Pick a width so a bucket holds ~10^5-10^6 rows of the hottest key.

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
    sweep_order = [F.col("_ats").asc(), F.col("_side").asc(), F.col("_rp").asc()]
    if split_seconds is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*sweep_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    else:
        b_us = int(split_seconds) * 1_000_000
        u = u.withColumn("_bkt", F.floor(F.unix_micros(F.col("_ats")) / F.lit(b_us)))
        # per-(key, bucket) last right row: max struct(_ats, _rp) == the row
        # the running sweep would carry at bucket end (same tie-break)
        rb = (
            u.where(F.col("_side") == 0)
            .groupBy(*keys, "_bkt")
            .agg(F.max(F.struct(F.col("_ats"), F.col("_rp"))).alias("_mx"))
            .select(*keys, "_bkt", F.col("_mx._rp").alias("_last_rp"))
        )
        # bucket spine (distinct buckets per key — tiny): carry = last right
        # row from any EARLIER bucket, swept along the spine, then joined
        # back so every (key, bucket) partition starts with its carry-in
        spine = u.select(*keys, "_bkt").distinct()
        w_c = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_bkt").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            spine.join(rb, on=keys + ["_bkt"], how="left")
            .withColumn("_carry", F.last("_last_rp", ignorenulls=True).over(w_c))
            .select(*keys, "_bkt", "_carry")
        )
        w_b = (
            Window.partitionBy(*keys, "_bkt")
            .orderBy(*sweep_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.join(carry, on=keys + ["_bkt"], how="left").withColumn(
            "_m",
            F.coalesce(F.last("_rp", ignorenulls=True).over(w_b), F.col("_carry")),
        )
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
    max_span_buckets: int | None = 256,
    max_long_rows: int | None = 1_000_000,
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

    Long-interval guard: an interval spanning more than ``max_span_buckets``
    buckets (a year at hourly buckets = 8,760 copies) is NOT exploded —
    such outliers route through a separate branch that BROADCASTs them and
    applies the exact range predicate directly.  The guard assumes long
    spans are OUTLIERS: if most of your intervals are long (multi-year spans
    at hourly buckets), the long branch would broadcast the bulk of the
    table — so a bounded probe (``limit(n+1)`` + count) checks the long
    side against ``max_long_rows`` and fails with a message naming the fix
    (a ``bucket_seconds`` near your median interval length, which
    reclassifies those spans as short) instead of letting Spark's broadcast
    limit produce an opaque executor OOM.  The probe is LAZY — it rides the
    returned plan as a one-row broadcast whose ``assert_true`` raises at
    EXECUTION time (as a Spark runtime error), so this function never
    schedules a job itself; pass ``max_long_rows=None`` to drop the guard
    and broadcast unconditionally.  The long branch costs a second pass over
    ``points`` when long intervals exist; with AQE on, an empty long side
    collapses the branch to an empty relation and the second scan never
    runs.  Set ``max_span_buckets=None`` to restore unguarded
    explode-everything (pre-round-4 behavior).

    Output: all point columns + all interval columns (caller aliases
    collisions away beforehand).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    b_us = int(bucket_seconds) * 1_000_000
    first_b = F.floor(F.unix_micros(F.col(start_col).cast("timestamp")) / F.lit(b_us))
    last_b = F.floor(
        (F.unix_micros(F.col(end_col).cast("timestamp")) - 1) / F.lit(b_us)
    )
    valid = intervals.where(F.col(end_col) > F.col(start_col))
    short = valid if max_span_buckets is None else valid.where(
        last_b - first_b < max_span_buckets
    )
    ivals = short.withColumn("_bucket", F.explode(F.sequence(first_b, last_b)))
    pts = points.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(b_us))
    )
    in_range = (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    joined = pts.join(ivals, on=keys + ["_bucket"], how="inner").where(in_range).drop(
        "_bucket"
    )
    if max_span_buckets is None:
        return joined
    long = valid.where(last_b - first_b >= max_span_buckets)
    if max_long_rows is not None:
        # LAZY in-plan guard (the function itself schedules no job): a
        # bounded limit(n+1) count of the long side rides the long branch
        # as a one-row broadcast whose assert_true raises AT EXECUTION if
        # the cap is exceeded — callers embedding interval_join in fully
        # lazy plans stay lazy, and an oversized long side still fails
        # with an actionable message instead of a broadcast OOM
        msg = (
            f"interval_join: more than {max_long_rows} intervals span "
            f">= {max_span_buckets} buckets of {bucket_seconds}s — the "
            "long-outlier branch would broadcast the bulk of the "
            "intervals table.  Long spans are not outliers in this "
            "corpus: raise bucket_seconds toward the median interval "
            "length (reclassifying them as short), or raise "
            "max_long_rows if the broadcast genuinely fits."
        )
        guard = (
            long.select(F.lit(1).alias("_one"))
            .limit(max_long_rows + 1)
            .agg(F.count("*").alias("_n_long"))
            .select(
                F.assert_true(
                    F.col("_n_long") <= max_long_rows, F.lit(msg)
                ).alias("_guard")
            )
        )
        # the assert must be LOAD-BEARING or column pruning deletes it with
        # the dropped column: route start_col through the (always-NULL on
        # success) guard value so the range predicate depends on it
        long = (
            long.crossJoin(F.broadcast(guard))
            .withColumn(
                start_col, F.when(F.col("_guard").isNull(), F.col(start_col))
            )
            .drop("_guard")
        )
    if keys:
        long_joined = points.join(F.broadcast(long), on=keys, how="inner")
    else:
        long_joined = points.crossJoin(F.broadcast(long))
    return joined.unionByName(long_joined.where(in_range))

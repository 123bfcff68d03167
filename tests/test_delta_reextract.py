"""Tests for engine/delta.delta_reextract — incremental KG maintenance."""

import pytest
from pyspark.sql import functions as F

MENTION_RE = "(spark|window|merge|batch)"


def _extract(d):
    return (
        d.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(MENTION_RE), F.lit(1))
            ).alias("mention"),
        )
        .groupBy("doc_id", "mention")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_times"))
    )


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [
            (1, "spark and window here"),
            (2, "merge merge batch"),
            (3, "window only doc to be removed"),
            (4, "spark doc that will change"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, "spark and window here"),  # unchanged
            (2, "merge merge batch"),  # unchanged
            (4, "batch doc after the change"),  # changed: spark -> batch
            (5, "window window spark added"),  # added
        ],
        ["doc_id", "text"],
    )
    return old, new


def test_delta_equals_full_reextraction(spark, snapshots):
    from literature_to_facts_spark.datapipe.storage import snapshot_diff
    from literature_to_facts_spark.engine.delta import delta_reextract

    old, new = snapshots
    for bcast in (True, False):
        got = delta_reextract(
            _extract(old), snapshot_diff(old, new), new, _extract,
            broadcast_diff=bcast,
        )
        want = _extract(new)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


def test_delta_does_not_reextract_unchanged_docs(spark, snapshots):
    """Negative-space proof: poison the stored triples of an UNCHANGED doc —
    the poison must survive verbatim (the operator provably never re-derives
    outside the delta), while changed/removed docs' stale triples vanish."""
    from literature_to_facts_spark.datapipe.storage import snapshot_diff
    from literature_to_facts_spark.engine.delta import delta_reextract

    old, new = snapshots
    poisoned = _extract(old).withColumn(
        "n_times",
        F.when(F.col("doc_id") == 1, F.lit(999).cast("bigint")).otherwise(
            F.col("n_times")
        ),
    )
    out = delta_reextract(poisoned, snapshot_diff(old, new), new, _extract)
    rows = {(r["doc_id"], r["mention"]): r["n_times"] for r in out.collect()}
    assert rows[(1, "spark")] == 999  # stored value kept: not re-extracted
    assert rows[(4, "batch")] == 1  # changed doc re-extracted fresh
    assert (3, "window") not in rows  # removed doc's triples dropped
    assert rows[(5, "window")] == 2  # added doc extracted


def test_delta_store_side_is_broadcast_filtered(spark, snapshots):
    """With broadcast_diff (the daily-delta mode) the triple store is
    filtered via broadcast joins — no Exchange hashpartitioning on the
    store's anti-join side beyond what extraction itself needs."""
    from literature_to_facts_spark.datapipe.storage import snapshot_diff
    from literature_to_facts_spark.engine.delta import delta_reextract

    old, new = snapshots
    store = _extract(old)
    diff = snapshot_diff(old, new)
    stale = diff.where(F.col("status").isin("removed", "changed")).select("doc_id")
    kept = store.join(F.broadcast(stale), on="doc_id", how="left_anti")
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    # the anti join itself adds no shuffle of the store: every Exchange in
    # the fragment belongs to the store's own aggregation or the broadcast
    # subtree, none between the store aggregate and the join
    final = plan.split("== Initial Plan ==")[0]
    assert "left_anti, BuildRight" in final.replace("LeftAnti", "left_anti")

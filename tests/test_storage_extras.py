"""Tests for the storage-layer ship/versioning extras: write_sharded and
snapshot_diff."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F


def _shard(doc_id: int, n: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16) % n


def test_write_sharded_balanced_and_deterministic(spark, tmp_path):
    from literature_to_facts_spark.datapipe.storage import write_sharded

    docs = spark.range(0, 4000).selectExpr(
        "id AS doc_id", "concat('text ', cast(id as string)) AS text"
    )
    path = str(tmp_path / "shards")
    write_sharded(docs, path, n_shards=8)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={k}" for k in range(8)]
    back = spark.read.parquet(path)
    assert back.count() == 4000
    sizes = []
    for d in dirs:
        full = os.path.join(path, d)
        # exactly ONE parquet file per shard directory
        files = [f for f in os.listdir(full) if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
        k = int(d.split("=")[1])
        ids = [
            r["doc_id"]
            for r in spark.read.parquet(full).select("doc_id").collect()
        ]
        # every row landed in the shard its portable hash dictates ->
        # re-exports are file-stable
        assert all(_shard(i, 8) == k for i in ids)
        sizes.append(len(ids))
    # binomial balance: at 4000 rows / 8 shards, all within +-25% of mean
    mean = 4000 / 8
    assert all(0.75 * mean < s < 1.25 * mean for s in sizes), sizes
    with pytest.raises(ValueError, match="n_shards"):
        write_sharded(docs, path, n_shards=0)


def test_snapshot_diff_semantics(spark):
    from literature_to_facts_spark.datapipe.storage import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "same text"),
            (2, "will change"),
            (3, "will be removed"),
            (4, None),
            (5, None),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, "same text"),
            (2, "has changed"),
            (4, None),  # NULL -> NULL: unchanged
            (5, "null to text"),  # NULL -> text: changed
            (6, "brand new"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    # unchanged docs (1 and the NULL->NULL 4) are not emitted
    assert set(out) == {2, 3, 5, 6}
    assert out[2]["status"] == "changed"
    assert out[3]["status"] == "removed" and out[3]["new_hash"] is None
    assert out[5]["status"] == "changed" and out[5]["old_hash"] is None
    assert out[6]["status"] == "added" and out[6]["old_hash"] is None


def test_snapshot_diff_never_carries_text(spark):
    """Only id + hash cross the shuffle: md5 is computed map-side (below
    the Exchange) and the join condition/outputs reference ids and hashes
    only — at 100 TB the diff must not shuffle document text."""
    from literature_to_facts_spark.datapipe.storage import snapshot_diff

    old = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    new = spark.createDataFrame([(1, "b")], ["doc_id", "text"])
    plan = (
        snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    )
    join_line = next(l for l in plan.splitlines() if "FullOuter" in l)
    assert "text" not in join_line, plan
    # the shuffles partition on the id alias, never on/with text
    for l in plan.splitlines():
        if "Exchange hashpartitioning" in l:
            assert "_id#" in l and "text" not in l, l
    # md5 appears below the exchanges (map-side), i.e. the plan prints the
    # join/exchange nodes before the md5-computing projects
    assert plan.index("md5") > plan.index("Exchange hashpartitioning"), plan

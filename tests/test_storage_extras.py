"""Tests for the storage-layer ship/versioning extras: write_sharded and
snapshot_diff."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F


def _shard(doc_id: int, n: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16) % n


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()


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


def test_compact_index_minhash_daily_loop(spark, documents, tmp_path):
    """Daily loop with a COMPACTION between batches: append day-0/day-1
    index rows, purge some docs, compact into a v2 table, then the day-2
    incremental over v2 is bit-equal to the same batch over the logically
    filtered uncompacted index — compaction changes layout, never results.
    Also pins the compaction's scale shape: one file per bucket out, and a
    zero-Exchange plan (broadcast anti-join over the bucketed scan)."""
    from literature_to_facts_spark.datapipe.dedup import (
        build_lsh_band_index,
        minhash_lsh_pairs_incremental,
    )
    from literature_to_facts_spark.datapipe.storage import (
        compact_index,
        write_bucketed,
    )

    dup = documents.limit(9).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    docs = documents.unionByName(dup).select("doc_id", "text")
    batches = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    params = dict(n_gram=3, n_hashes=16, bands=4, threshold=0.5)
    idx_params = {k: v for k, v in params.items() if k != "threshold"}
    try:
        write_bucketed(
            build_lsh_band_index(batches[0], **idx_params),
            "t_cmp_v1", "key", 4, path=str(tmp_path / "v1"),
        )
        write_bucketed(
            build_lsh_band_index(batches[1], **idx_params),
            "t_cmp_v1", "key", 4, path=str(tmp_path / "v1"), mode="append",
        )
        # purge every 7th doc (simulating deduplicate_corpus losers)
        seen = batches[0].unionByName(batches[1])
        tombs = seen.where(F.col("doc_id") % 7 == 0).select("doc_id")
        compacted = compact_index(
            spark, "t_cmp_v1", "t_cmp_v2", "key", 4,
            tombstone_ids=tombs, path=str(tmp_path / "v2"),
        )
        # layout: exactly one parquet file per bucket
        files = [
            f for f in os.listdir(str(tmp_path / "v2")) if f.endswith(".parquet")
        ]
        assert len(files) == 4, files
        # contents == logical filter of the uncompacted table
        want = {
            tuple(r)
            for r in spark.table("t_cmp_v1")
            .join(F.broadcast(tombs), on="doc_id", how="left_anti")
            .collect()
        }
        assert {tuple(r) for r in compacted.collect()} == want and len(want) > 0
        # plan: the compaction source fragment keeps the history stream
        # exchange-free (the only Exchange allowed is inside the broadcast
        # subtree building the tombstone set)
        frag = spark.table("t_cmp_v1").join(
            F.broadcast(tombs), on="doc_id", how="left_anti"
        )
        auto_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        spark.conf.set(auto_key, "false")  # compact_index pins this for its write
        try:
            plan = frag._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(auto_key, "true")
        streamed = plan.split("BroadcastExchange")[0]
        assert "Exchange" not in streamed, plan
        assert "Bucketed: true" in plan
        # day-2 incremental over the compacted index == over the filtered
        # uncompacted one (bit-equal pairs)
        survivors = seen.join(F.broadcast(tombs), on="doc_id", how="left_anti")
        reg = []
        got_v2 = minhash_lsh_pairs_incremental(
            batches[2], survivors, spark.table("t_cmp_v2"), **params,
            cache_registry=reg,
        ).collect()
        got_v1f = minhash_lsh_pairs_incremental(
            batches[2], survivors,
            spark.table("t_cmp_v1").join(
                F.broadcast(tombs), on="doc_id", how="left_anti"
            ),
            **params,
            cache_registry=reg,
        ).collect()
        for df_ in reg:
            df_.unpersist()
        key = lambda rows: sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rows)
        assert key(got_v2) == key(got_v1f) and len(got_v2) > 0
        with pytest.raises(ValueError, match="must differ"):
            compact_index(spark, "t_cmp_v2", "t_cmp_v2", "key", 4)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cmp_v1")
        spark.sql("DROP TABLE IF EXISTS t_cmp_v2")


def test_compact_index_line_frequency_merges_partials(spark, documents, tmp_path):
    """Line-frequency compaction merges per-batch partial counts into one
    row per line (sum_cols), keeps the builder's parameter stamp through
    the rewrite, and leaves line_dedup_incremental's output unchanged."""
    from literature_to_facts_spark.datapipe.storage import (
        compact_index,
        write_bucketed,
    )
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup_incremental,
    )

    docs = documents.select("doc_id", "text").where(F.col("text").isNotNull())
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    b2 = docs.where(F.col("doc_id") % 3 == 2)
    try:
        write_bucketed(
            build_line_frequency_index(b0, min_line_chars=5),
            "t_lf_v1", "line_key", 4, path=str(tmp_path / "lf1"),
        )
        write_bucketed(
            build_line_frequency_index(b1, min_line_chars=5),
            "t_lf_v1", "line_key", 4, path=str(tmp_path / "lf1"), mode="append",
        )
        compacted = compact_index(
            spark, "t_lf_v1", "t_lf_v2", "line_key", 4,
            sum_cols=("df",), path=str(tmp_path / "lf2"),
        )
        # merged: one row per line_key, totals preserved
        assert compacted.groupBy("line_key").count().where("count > 1").count() == 0
        tot = lambda t: {
            r["line_key"]: r["s"]
            for r in spark.table(t).groupBy("line_key")
            .agg(F.sum("df").alias("s")).collect()
        }
        assert tot("t_lf_v2") == tot("t_lf_v1")
        # parameter stamp survived the rewrite
        meta = spark.table("t_lf_v2").schema["line_key"].metadata
        assert meta.get("l2f_min_line_chars") == 5
        # and still guards a mismatched probe
        with pytest.raises(ValueError, match="min_line_chars"):
            line_dedup_incremental(
                b2, spark.table("t_lf_v2"), min_df=2, min_line_chars=9
            ).collect()
        k = lambda rows: sorted((r["doc_id"], r["clean_text"]) for r in rows)
        reg1, reg2 = [], []
        out_v2 = line_dedup_incremental(
            b2, spark.table("t_lf_v2"), min_df=2, min_line_chars=5,
            cache_registry=reg2,
        ).select("doc_id", "clean_text").collect()
        out_v1 = line_dedup_incremental(
            b2, spark.table("t_lf_v1"), min_df=2, min_line_chars=5,
            cache_registry=reg1,
        ).select("doc_id", "clean_text").collect()
        for df_ in reg1 + reg2:
            df_.unpersist()
        assert k(out_v2) == k(out_v1) and len(out_v2) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lf_v1")
        spark.sql("DROP TABLE IF EXISTS t_lf_v2")


def test_compact_index_window_frequency_merges_partials(spark, documents, tmp_path):
    """Window-frequency (span dedup) compaction: per-batch occurrence
    counts merge to one row per window, the window-size stamp survives,
    and span_dedup_incremental over the compacted index is bit-equal."""
    from literature_to_facts_spark.datapipe.storage import (
        compact_index,
        write_bucketed,
    )
    from literature_to_facts_spark.datapipe.textclean import (
        build_window_frequency_index,
        span_dedup_incremental,
    )

    docs = documents.select("doc_id", "text").where(F.col("text").isNotNull())
    b0 = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    b2 = docs.where(F.col("doc_id") % 3 == 2)
    try:
        write_bucketed(
            build_window_frequency_index(b0, window=4),
            "t_wf_v1", "win_key", 4, path=str(tmp_path / "wf1"),
        )
        write_bucketed(
            build_window_frequency_index(b1, window=4),
            "t_wf_v1", "win_key", 4, path=str(tmp_path / "wf1"), mode="append",
        )
        compacted = compact_index(
            spark, "t_wf_v1", "t_wf_v2", "win_key", 4,
            sum_cols=("cnt",), path=str(tmp_path / "wf2"),
        )
        assert compacted.groupBy("win_key").count().where("count > 1").count() == 0
        tot = lambda t: {
            r["win_key"]: r["s"]
            for r in spark.table(t).groupBy("win_key")
            .agg(F.sum("cnt").alias("s")).collect()
        }
        assert tot("t_wf_v2") == tot("t_wf_v1")
        assert spark.table("t_wf_v2").schema["win_key"].metadata.get(
            "l2f_span_window"
        ) == 4
        with pytest.raises(ValueError, match="window=4"):
            span_dedup_incremental(b2, spark.table("t_wf_v2"), window=5).collect()
        k = lambda rows: sorted(map(tuple, rows))
        reg1, reg2 = [], []
        out_v2 = span_dedup_incremental(
            b2, spark.table("t_wf_v2"), window=4, cache_registry=reg2
        ).collect()
        out_v1 = span_dedup_incremental(
            b2, spark.table("t_wf_v1"), window=4, cache_registry=reg1
        ).collect()
        for df_ in reg1 + reg2:
            df_.unpersist()
        assert k(out_v2) == k(out_v1) and len(out_v2) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_wf_v1")
        spark.sql("DROP TABLE IF EXISTS t_wf_v2")

"""Table layout for the 100 TB deployment: bucketed and partitioned writes.

Two storage decisions dominate join/scan cost at corpus scale, and both are
declared at WRITE time so every later query gets them for free:

* **Bucketing** (`write_bucketed`): pre-hash-partition (and optionally sort)
  a table on its join key.  Two tables bucketed on the same key with the
  same bucket count join with ZERO Exchange — the single most expensive
  operator in a repeated big-big join (doc joins, signature-index joins)
  disappears from every downstream plan.  Spark persists the bucket spec in
  the catalog; `spark.table()` reads recover it (a bare `spark.read.parquet`
  of the same files does NOT — always read bucketed tables through the
  catalog).
* **Partitioning** (`write_partitioned`): directory-partition on a
  low-cardinality predicate column (ingest date, source).  Filters on the
  partition column prune entire directories at planning time
  (`PartitionFilters` in the scan, zero I/O for pruned partitions) — the
  difference between scanning a day and scanning a decade.

Both are thin wrappers over the DataFrameWriter; their value is the pinned
contract: tests assert the exchange-free join plan and the partition-pruned
scan, so a layout regression fails CI instead of silently costing a shuffle
per query at deploy scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_cols: list | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within each bucket file: a join between
    two tables bucketed AND sorted on the key needs neither Exchange nor
    Sort — the SortMergeJoin streams the pre-sorted buckets directly.
    ``path`` makes it an external table (data at ``path``, metadata in the
    catalog); omit for a managed table under the warehouse dir.

    Pick ``n_buckets`` so one bucket is a few hundred MB at target scale,
    and use the SAME count for every table sharing the join key — mismatched
    counts fall back to shuffling one side.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` directory-partitioned by ``partition_cols`` (low
    cardinality — dates, sources; never ids).  Readers filtering on these
    columns prune whole directories at planning time."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list
) -> DataFrame:
    """Join two CATALOG tables (so their bucket specs are visible to the
    planner).  When both are bucketed on the join key with equal bucket
    counts, the plan contains no Exchange — pinned by
    tests/test_datapipe.py::test_bucketed_join_is_exchange_free."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=keys)


def write_sharded(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """SIZE-BALANCED export: the ship step of a curated corpus.

    A curated corpus is consumed by a trainer that wants uniform shards;
    writing whatever partitioning the last shuffle left behind produces a
    long tail of tiny files plus a few giants (the purge's anti-join and
    the samplers skew partition sizes badly).  This assigns each row a
    ``shard`` column — the portable md5-derived hash of ``id_col`` mod
    ``n_shards``, uniform regardless of id or key skew and deterministic
    per row (the same doc always lands in the same shard for a given
    ``n_shards``, so re-exports are file-stable) — and writes one
    ``shard=k/`` directory with exactly ONE parquet file each: the
    pre-write ``repartition`` on the shard column puts every row of a
    shard value in a single task (a bare ``repartition(n, expr)`` hashes
    the expression VALUE to pick a partition, so shard k does not land in
    partition k — but it does put all of shard k in ONE partition, which
    is exactly the one-file-per-directory property partitionBy needs).

    Scale: one full Exchange of the output — unavoidable for balanced
    shards, and the output of a curation chain is the SAMPLED corpus
    (typically a small fraction of the input), so this is the cheapest
    shuffle in the pipeline.  Balance is binomial: shard sizes concentrate
    within ~1 % of mean for shards of 10^6+ rows.
    """
    from pyspark.sql import functions as F

    from literature_to_facts_spark.datapipe.dedup import _h52

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F.expr(f"pmod({_h52(f'cast({id_col} as string)')}, {int(n_shards)})")
    (
        df.withColumn("shard", shard)
        .repartition(int(n_shards), F.col("shard"))
        .write.mode(mode)
        # a re-export is a FULL export: pin static overwrite so an
        # externally-configured partitionOverwriteMode=dynamic session
        # cannot leave stale shard=k/ dirs behind when n_shards shrinks
        # between exports (the repo's own incremental-state machinery sets
        # dynamic per-write via .option(), which never leaks here)
        .option("partitionOverwriteMode", "static")
        .partitionBy("shard")
        .parquet(path)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus versioning: what changed between two snapshots.

    Returns ``(id_col, status, old_hash, new_hash)`` for every document
    that was ``added`` (id only in ``new``), ``removed`` (only in ``old``)
    or ``changed`` (both, different ``md5(text)``; NULL text hashes as
    NULL — a NULL->NULL document is unchanged, a NULL->text transition is
    a change).  Unchanged documents are NOT emitted — the diff artifact is
    what an auditor or an incremental re-train actually reads, and at
    100 TB emitting the unchanged majority would make the diff as big as
    the corpus.

    Scale: one full outer join on ``id_col`` (both sides shuffle by id —
    inherent for an id-keyed diff); only the id and the 32-byte text hash
    flow through it, never the text.
    """
    from pyspark.sql import functions as F

    o = old.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("old_hash")
    ).withColumn("_in_old", F.lit(1))
    n = new.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("new_hash")
    ).withColumn("_in_new", F.lit(1))
    return (
        o.join(n, on="_id", how="full_outer")
        .withColumn(
            "status",
            F.when(F.col("_in_old").isNull(), F.lit("added"))
            .when(F.col("_in_new").isNull(), F.lit("removed"))
            .when(
                ~(
                    F.col("old_hash").eqNullSafe(F.col("new_hash"))
                ),
                F.lit("changed"),
            ),
        )
        .where(F.col("status").isNotNull())
        .select(F.col("_id").alias(id_col), "status", "old_hash", "new_hash")
    )

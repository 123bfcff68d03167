"""Streaming near-duplicate detection: MinHash-LSH delta dedup as a
Structured Streaming ``foreachBatch`` pipeline.

Each micro-batch of documents emits the near-dup pairs TOUCHING that batch
(new×new + new×batch-history, via ``datapipe.dedup.minhash_lsh_pairs_incremental``)
and appends the batch's band-index + document rows to the persisted state —
so an unbounded ingest stream pays per-batch cost, never a corpus re-pair.
This is the streaming face of the same contract the batch daily loop
(tests/test_datapipe.py::test_minhash_incremental_daily_loop) pins: the
union of per-batch pair outputs over any batch split equals the full-corpus
pair set exactly-once.

Durability/replay design — ``foreachBatch`` is at-least-once, so EVERY write
is keyed by ``batch_id`` and idempotent:

    <state_dir>/pairs/_batch=<id>/        overwritten on replay
    <state_dir>/band_index/_batch=<id>/   overwritten on replay
    <state_dir>/docs/_batch=<id>/         overwritten on replay

and the state reads EXCLUDE the current batch id (a replayed batch whose
state write already succeeded must not pair against itself — new and old
ids are contractually disjoint).  The ``_batch=`` directories double as a
partition column, so the exclusion is a planning-time partition prune, not
a scan.

Exactly-once contract, precisely: the union of per-batch pair outputs is
the full-corpus pair set with each TRUE duplicate pair emitted once, and —
in one edge case — a superset of the full one-shot run's output: an
exact-duplicate cluster larger than ``max_bucket`` (signature bands capped,
so it pairs only via the exact band's canonical star) whose global minimum
id arrives in a LATE batch re-roots the star, and earlier batches' star
edges rooted at the then-minimum survive in the union while a fresh full
run would root every edge at the final minimum.  Every such extra edge is
still a true byte-identical duplicate pair, and ``connected_components``
absorbs alternative roots into the same cluster — downstream purge output
is identical.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from literature_to_facts_spark.datapipe.dedup import (
    build_lsh_band_index,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
)


def _is_missing_state(e: AnalysisException) -> bool:
    """True iff the read failure means "nothing committed here yet":

    * ``PATH_NOT_FOUND`` — the directory does not exist (first batch);
    * ``UNABLE_TO_INFER_SCHEMA`` — the directory exists but holds no
      readable parquet footers, i.e. a crash left only an uncommitted
      ``_temporary`` dir behind.  A committed parquet write always leaves
      footers, so this state is equivalent to "no state"; re-raising it
      would turn a first-batch crash into a permanent replay crash-loop.

    Everything else (permissions, FS listing errors, corrupt committed
    files) is NOT missing state and must propagate to fail the batch —
    swallowing those would silently downgrade the batch to standalone
    full-mode pairing, permanently losing its new×old pairs: the
    overwritten ``_batch`` pairs dir would look committed, so a replay
    never repairs it."""
    cond = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: ""))()
    for marker in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
        if (cond or "").startswith(marker) or marker in str(e):
            return True
    return False


def _read_state(spark, root: str, before_batch: int) -> DataFrame | None:
    """All `_batch=*` partitions of ``root`` strictly before ``before_batch``
    (None when no state exists yet — see :func:`_is_missing_state`).
    basePath keeps `_batch` visible as a partition column so the < filter
    prunes directories at planning time."""
    try:
        df = (
            spark.read.option("basePath", root)
            .parquet(os.path.join(root, "_batch=*"))
        )
    except AnalysisException as e:
        if _is_missing_state(e):
            return None
        raise
    return df.where(F.col("_batch") < before_batch).drop("_batch")


def make_delta_dedup_batch_fn(
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket: int = 1000,
    maintain_clusters: bool = False,
    cluster_partitions: int = 64,
):
    """The ``foreachBatch`` function.  Kept separate from the writeStream
    wiring so batch jobs (or tests) can drive it directly.

    ``maintain_clusters=True`` additionally folds each batch's pairs into a
    partitioned cluster-state table at ``<state_dir>/clusters`` via the
    incremental closure (``connected_components_incremental`` +
    ``update_cluster_state_partitioned``) — the state always equals the
    full-corpus connected components over every pair emitted so far, at
    per-batch cost.  Unlike the three ``_batch=``-keyed stores, the cluster
    state is updated in place; replay safety comes from determinism instead
    of keying: re-applying a batch's pairs to a state that already absorbed
    them is a closure no-op, and a half-written update self-heals because
    stale representatives still route their partitions into the affected
    set (see ``update_cluster_state_partitioned``)."""
    pairs_root = os.path.join(state_dir, "pairs")
    index_root = os.path.join(state_dir, "band_index")
    docs_root = os.path.join(state_dir, "docs")
    clusters_root = os.path.join(state_dir, "clusters")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col)
        old_index = _read_state(spark, index_root, batch_id)
        old_docs = _read_state(spark, docs_root, batch_id)
        cached: list = []
        if old_index is None or old_docs is None:
            pairs = minhash_lsh_pairs(
                batch, id_col, text_col, n_gram, n_hashes, bands, threshold,
                max_bucket,
            )
        else:
            pairs = minhash_lsh_pairs_incremental(
                batch, old_docs, old_index, id_col, text_col, n_gram,
                n_hashes, bands, threshold, max_bucket,
                cache_registry=cached,
            )
        try:
            # pairs first: if we crash after this write but before the state
            # writes, the replay overwrites the same _batch dirs (idempotent)
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_root, f"_batch={batch_id}")
            )
            build_lsh_band_index(
                batch, id_col, text_col, n_gram, n_hashes, bands
            ).write.mode("overwrite").parquet(
                os.path.join(index_root, f"_batch={batch_id}")
            )
            batch.write.mode("overwrite").parquet(
                os.path.join(docs_root, f"_batch={batch_id}")
            )
        finally:
            # release the per-batch candidate cache: an unbounded stream
            # would otherwise accumulate one persisted DataFrame per
            # micro-batch for the life of the query
            for df in cached:
                df.unpersist()
        if maintain_clusters:
            from literature_to_facts_spark.datapipe.dedup import (
                connected_components,
                connected_components_incremental,
                update_cluster_state_partitioned,
                write_cluster_state,
            )

            # read the just-written batch pairs back instead of re-running
            # the (lazy) pair pipeline a second time
            batch_pairs = spark.read.parquet(
                os.path.join(pairs_root, f"_batch={batch_id}")
            )
            try:
                cur = spark.read.parquet(clusters_root).select(
                    "doc_id", "cluster_rep"
                )
                cur.schema  # force resolution inside the try
                have_state = True
            except AnalysisException as e:
                if _is_missing_state(e):
                    have_state = False
                else:
                    raise
            if have_state:
                delta = connected_components_incremental(batch_pairs, cur)
                update_cluster_state_partitioned(
                    spark, clusters_root, delta, cluster_partitions
                )
            else:
                cc = connected_components(batch_pairs)
                # an empty parquet dir cannot be re-read (no schema): only
                # create the state once there is at least one clustered row
                if cc.count() > 0:
                    write_cluster_state(cc, clusters_root, cluster_partitions)

    return process


def _list_batch_ids(spark, root: str) -> list:
    """Sorted ``_batch=<id>`` ids present under ``root``, listed via the
    JVM Hadoop FileSystem (works for any supported scheme, sees EMPTY
    directories).  Same Spark Connect limitation as
    ``dedup._delete_partition_dirs`` — no py4j bridge there."""
    try:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
    except AttributeError as e:  # Spark Connect session
        raise NotImplementedError(
            "state-dir listing needs the py4j JVM bridge, absent under "
            "Spark Connect; list/compact the _batch dirs out-of-band"
        ) from e
    hpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = hpath.getFileSystem(hconf)
    if not fs.exists(hpath):
        return []
    ids = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("_batch="):
            try:
                ids.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(ids)


def compact_stream_state(
    spark,
    state_dir: str,
    upto_batch: int,
    stores: tuple = ("band_index", "docs"),
) -> dict:
    """Merge the per-batch ``_batch=<id>`` state dirs into one compacted
    dir per store — the streaming face of ``storage.compact_index``.

    At daily/streaming cadence the band-index and docs stores accumulate
    one directory (with several small parquet files) per micro-batch
    forever; every later batch's history read then lists and opens all of
    them.  This rewrites everything with ``0 <= _batch <= upto_batch``
    (plus any previous compaction output) as a single directory.

    Correctness under the replay contract:

    * The compacted dir uses a NEGATIVE ``_batch`` id (one below the most
      negative existing id, starting at -1).  ``_read_state`` filters
      ``_batch < current``, so negative ids are visible to every future
      batch — and can never collide with a real batch id, which only grows.
    * Only run at a stream-quiesce point with ``upto_batch`` strictly below
      any batch that could still replay (foreachBatch replays only the
      in-flight batch, so ``last_committed - 1`` is always safe; the
      in-flight batch's own dir is excluded by ``<= upto_batch``).
    * Idempotent/crash-healing: the merge applies a full-row ``distinct()``,
      so if a crash lands between the compacted write and the source-dir
      deletes (state temporarily holds duplicate rows), RE-RUNNING the
      compaction converges to the exact pre-compaction row set.  Re-run it
      after any interrupted attempt before restarting the stream.

    The ``pairs`` store is output, never probed by later batches, so it is
    not compacted by default.  Returns {store: n_dirs_merged}.
    """
    out = {}
    for store in stores:
        root = os.path.join(state_dir, store)
        # enumerate dirs from the FILESYSTEM, not from row data: a zero-row
        # micro-batch still writes an (empty) _batch dir, which a
        # data-derived listing would never merge or delete
        batch_ids = _list_batch_ids(spark, root)
        if not batch_ids:
            out[store] = 0
            continue
        src = [i for i in batch_ids if i < 0 or i <= upto_batch]
        if len(src) <= 1:
            out[store] = 0
            continue
        target = min(min(src), 0) - 1
        try:
            df = (
                spark.read.option("basePath", root)
                .parquet(os.path.join(root, "_batch=*"))
            )
        except AnalysisException as e:
            if _is_missing_state(e):  # only empty dirs exist: nothing to merge
                _delete_empty = [os.path.join(root, f"_batch={i}") for i in src]
                from literature_to_facts_spark.datapipe.dedup import (
                    _delete_partition_dirs,
                )

                _delete_partition_dirs(spark, _delete_empty)
                out[store] = len(src)
                continue
            raise
        merged = (
            df.where(F.col("_batch").isin(src)).drop("_batch").distinct()
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(root, f"_batch={target}")
        )
        # source dirs only disappear after the compacted write committed;
        # the distinct() above makes a re-run correct if we die mid-delete
        from literature_to_facts_spark.datapipe.dedup import (
            _delete_partition_dirs,
        )

        _delete_partition_dirs(
            spark, [os.path.join(root, f"_batch={i}") for i in src]
        )
        out[store] = len(src)
    return out


def stream_near_dup_pairs(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    available_now: bool = True,
    **dedup_params,
):
    """Wire a streaming documents source into the delta-dedup batch fn.
    Returns the started StreamingQuery (caller awaits/stops).  Read the
    accumulated pairs with ``spark.read.parquet(state_dir + "/pairs")``."""
    writer = (
        docs_stream.writeStream.foreachBatch(
            make_delta_dedup_batch_fn(state_dir, **dedup_params)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_span_clean_batch_fn(
    state_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_df: int = 2,
):
    """``foreachBatch`` function for STREAMING duplicated-substring cleaning
    (the span-dedup delta family as a micro-batch pipeline): each batch's
    documents are scored against the accumulated window-frequency state
    (``datapipe.textclean.span_dedup_incremental``), the per-doc coverage
    rows land in ``<state_dir>/clean/_batch=<id>`` and the batch's own
    window counts append to ``<state_dir>/win_index/_batch=<id>`` — the
    same idempotent ``_batch=``-keyed replay contract as the MinHash
    stream.

    The index rows carry a ``src_batch`` column: per-batch counts for the
    SAME window are separate rows that a full-row ``distinct()`` must not
    collapse (cnt=1 rows for one window across two batches are otherwise
    identical), which is exactly what makes :func:`compact_stream_state`'s
    distinct-merge — crash-healing by idempotence — valid for this store
    too: ``compact_stream_state(spark, state_dir, upto,
    stores=("win_index",))``.  Probes SUM counts, so the extra column and
    the row layout are transparent to them."""
    win_root = os.path.join(state_dir, "win_index")
    clean_root = os.path.join(state_dir, "clean")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from literature_to_facts_spark.datapipe.textclean import (
            build_window_frequency_index,
            span_dedup_incremental,
        )

        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col)
        old_index = _read_state(spark, win_root, batch_id)
        cached: list = []
        cleaned = span_dedup_incremental(
            batch, old_index, id_col, text_col, window, min_df,
            cache_registry=cached,
        )
        try:
            # clean output first: a crash before the index write replays
            # the batch and overwrites both dirs (idempotent)
            cleaned.write.mode("overwrite").parquet(
                os.path.join(clean_root, f"_batch={batch_id}")
            )
            build_window_frequency_index(
                batch, id_col, text_col, window
            ).withColumn(
                "src_batch", F.lit(int(batch_id)).cast("bigint")
            ).write.mode("overwrite").parquet(
                os.path.join(win_root, f"_batch={batch_id}")
            )
        finally:
            for df in cached:
                df.unpersist()

    return process

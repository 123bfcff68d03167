"""Streaming maintenance of KG predicate statistics.

The micro-batch face of the ninth delta family
(:func:`~literature_to_facts_spark.engine.kgquery.predicate_stats_incremental`):
a triple stream keeps the ``(pred, n_triples, n_subj, n_obj)`` table exact
at every batch boundary without ever rescanning historical triples — the
store-side statistics an RDF store keeps for join ordering, maintained at
crawl-ingest cadence (reference analog: the rdflib graph the reference
re-learns per run, /root/reference/facts/learn.py:49-70).

State layout under ``state_dir`` (the delta_dedup conventions):

* ``pair_index/_batch=<id>`` — APPEND-keyed per-batch
  :func:`build_predicate_pair_index` partials; replay of batch N
  overwrites its own dir (idempotent), and reads prune ``_batch >= N`` so
  a replay never sees its own half-written past.
* ``stats/_batch=<id>`` — SNAPSHOT-keyed: the full (pred-sized) stats
  table AFTER batch N.  Unlike the append stores, a reader wants only the
  LATEST snapshot strictly before the current batch; old snapshots are
  replay insurance and can be purged like any ``_batch`` store with
  :func:`~literature_to_facts_spark.streaming.delta_dedup.compact_stream_state`
  (``keep_latest_only`` semantics apply — see the module docstring there).

Crash/replay safety: both writes are ``_batch=<id>``-keyed overwrites, and
batch N's outputs are pure functions of state strictly before N, so
re-running a half-written batch heals it bit-exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .delta_dedup import _list_batch_ids, _read_state


def _read_latest_snapshot(spark, root: str, before_batch: int):
    """The single newest ``_batch=<id>`` snapshot with ``id < before_batch``
    (None when no committed snapshot exists yet)."""
    ids = [b for b in _list_batch_ids(spark, root) if b < before_batch]
    if not ids:
        return None
    return spark.read.parquet(os.path.join(root, f"_batch={max(ids)}"))


def make_kg_stats_batch_fn(
    state_dir: str,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
):
    """Build the ``foreachBatch`` function maintaining exact predicate
    statistics over a triple stream.  Kept separate from the writeStream
    wiring so batch jobs and tests can drive it directly (the
    delta_dedup convention).

    Per batch: probe the append-only pair index (zero history Exchange
    over a bucketed layout — the engine-side operator's shape), merge
    pred-sized deltas into the latest stats snapshot, write the new
    snapshot and the batch's index partial, both ``_batch``-keyed.
    """
    index_root = os.path.join(state_dir, "pair_index")
    stats_root = os.path.join(state_dir, "stats")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from literature_to_facts_spark.engine.kgquery import (
            build_predicate_pair_index,
            predicate_stats_incremental,
        )

        spark = batch_df.sparkSession
        batch = batch_df.select(subj_col, pred_col, obj_col)
        old_index = _read_state(spark, index_root, batch_id)
        old_stats = _read_latest_snapshot(spark, stats_root, batch_id)
        reg: list = []
        new_stats = predicate_stats_incremental(
            batch,
            old_index,
            old_stats,
            subj_col=subj_col,
            pred_col=pred_col,
            obj_col=obj_col,
            cache_registry=reg,
        )
        try:
            # snapshot first: if we crash between the two writes, a replay
            # of this batch recomputes from state < batch_id and overwrites
            # both dirs — no torn state is ever read (reads prune >= id)
            new_stats.write.mode("overwrite").parquet(
                os.path.join(stats_root, f"_batch={batch_id}")
            )
            build_predicate_pair_index(
                batch, subj_col=subj_col, pred_col=pred_col, obj_col=obj_col
            ).write.mode("overwrite").parquet(
                os.path.join(index_root, f"_batch={batch_id}")
            )
        finally:
            for df in reg:
                df.unpersist()

    return process


def read_current_stats(spark, state_dir: str) -> DataFrame | None:
    """The latest committed stats snapshot (None before the first batch)."""
    return _read_latest_snapshot(
        spark, os.path.join(state_dir, "stats"), before_batch=1 << 62
    )

"""Streaming maintenance of the inlink anchor-text naming profile.

The micro-batch face of the eleventh delta family
(:func:`~literature_to_facts_spark.datapipe.html.anchor_text_profile_incremental`):
a crawl's anchor-edge stream keeps per-target naming profiles current at
ingest cadence without ever rescanning historical links.  Unlike the
predicate-stats face (``streaming/kg_stats.py``), the maintained object is
TARGET-keyed (web-scale: one row per linked page), so the stream does NOT
snapshot the full profile per batch — it emits the CHANGED profiles
(every target the batch links to, recomputed exactly against history) and
appends the batch's evidence partials; the full profile stays derivable
from the index alone via
:func:`~literature_to_facts_spark.datapipe.html.profile_from_index`
(the audit path, one bucketed-scan regroup).

State layout under ``state_dir`` (the delta_dedup conventions):

* ``anchor_index/_batch=<id>`` — APPEND-keyed per-batch
  :func:`build_anchor_index` partials; replay of batch N overwrites its
  own dir (idempotent) and reads prune ``_batch >= N`` so a replay never
  sees its own half-written past.
* ``profiles/_batch=<id>`` — batch N's changed-target profiles (the
  downstream notification feed: which pages' names/evidence moved).

Crash/replay safety: both writes are ``_batch=<id>``-keyed overwrites and
batch N's outputs are pure functions of state strictly before N, so
re-running a half-written batch heals it bit-exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .delta_dedup import _read_state


def make_anchor_profile_batch_fn(
    state_dir: str,
    target_col: str = "link_url",
    anchor_col: str = "anchor_text",
    src_host_col: str | None = None,
    k: int = 3,
):
    """Build the ``foreachBatch`` function maintaining anchor-text profiles
    over an anchor-edge stream (``html_extract_anchors`` output or any
    (target, anchor[, source host]) frame).  Kept separate from the
    writeStream wiring so batch jobs and tests can drive it directly (the
    delta_dedup convention).

    Per batch: probe the append-only evidence index (zero history Exchange
    over a bucketed layout — the engine-side operator's shape), write the
    batch's changed-target profiles and its index partial, both
    ``_batch``-keyed.
    """
    index_root = os.path.join(state_dir, "anchor_index")
    prof_root = os.path.join(state_dir, "profiles")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from literature_to_facts_spark.datapipe.html import (
            anchor_text_profile_incremental,
            build_anchor_index,
        )

        spark = batch_df.sparkSession
        cols = [target_col, anchor_col]
        if src_host_col is not None:
            cols.append(src_host_col)
        batch = batch_df.select(*cols)
        old_index = _read_state(spark, index_root, batch_id)
        if old_index is not None:
            # the probe unions history with the batch partials — the state
            # reader's _batch partition column must not reach the union
            old_index = old_index.drop("_batch")
        reg: list = []
        changed = anchor_text_profile_incremental(
            batch,
            old_index,
            target_col=target_col,
            anchor_col=anchor_col,
            src_host_col=src_host_col,
            k=k,
            cache_registry=reg,
        )
        try:
            changed.write.mode("overwrite").parquet(
                os.path.join(prof_root, f"_batch={batch_id}")
            )
            build_anchor_index(
                batch,
                target_col=target_col,
                anchor_col=anchor_col,
                src_host_col=src_host_col,
            ).write.mode("overwrite").parquet(
                os.path.join(index_root, f"_batch={batch_id}")
            )
        finally:
            for df in reg:
                df.unpersist()

    return process


def read_current_profile(
    spark,
    state_dir: str,
    target_col: str = "link_url",
    with_hosts: bool = False,
    k: int = 3,
) -> DataFrame | None:
    """The full profile over everything the stream has ingested, recomputed
    from the evidence index alone (None before the first batch) — the
    audit path; per-target currency normally comes from the per-batch
    ``profiles/_batch=<id>`` feeds."""
    from literature_to_facts_spark.datapipe.html import profile_from_index

    idx = _read_state(
        spark, os.path.join(state_dir, "anchor_index"), before_batch=1 << 62
    )
    if idx is None:
        return None
    return profile_from_index(
        idx.drop("_batch"), target_col=target_col, with_hosts=with_hosts, k=k
    )

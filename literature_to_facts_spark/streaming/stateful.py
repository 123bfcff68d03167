"""Stateful / watermarked Structured Streaming operators.

Two stream-native operators on top of the documents stream (the batch
pipeline stays in streaming/stream.py's foreachBatch — extraction itself is
stateless per document; these cover the semantics that genuinely need
streaming state):

* :func:`windowed_doc_counts` — event-time windowed aggregation with a
  watermark, so late-arriving pages (crawl replays, out-of-order WARC
  timestamps) update the right window and state is dropped once the
  watermark passes (bounded state at 100 TB/day ingest).

* :func:`dedup_stream_first_seen` — cross-batch exact dedup via
  ``applyInPandasWithState``: the first document per text hash ever seen is
  emitted, every later duplicate (same batch, later batch, later RESTART —
  state lives in the checkpoint) is dropped.  This is the streaming
  counterpart of datapipe.dedup.exact_duplicate_clusters, keyed the same way
  (md5(text)); state per key is one boolean-sized marker, partitioned by the
  shuffle on the group key, so it scales horizontally with executors.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = "url string, warc_ts timestamp, text string, text_hash string"
DEDUP_STATE_SCHEMA = "seen byte"


def windowed_doc_counts(
    docs: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
    key_col: str = "lang",
) -> DataFrame:
    """Rows per (event-time window, key) with late-data handling.

    The watermark bounds both lateness tolerated and state retained; rows
    later than the watermark are dropped (documented, standard semantics).
    Works on a streaming OR batch DataFrame (batch ignores the watermark),
    so the same definition serves the oracle test and the stream.
    """
    return (
        docs.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "key",
            "n_docs",
        )
    )


def _dedup_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the first row for this text_hash unless state says it was already
    seen in an earlier batch/run; then mark seen."""
    emitted = state.exists
    for pdf in pdfs:
        if not emitted and len(pdf):
            yield pdf.iloc[[0]]
            emitted = True
    if emitted and not state.exists:
        state.update((1,))


def dedup_stream_first_seen(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup: first occurrence per md5(text) passes, all
    later duplicates are dropped — across batches and restarts (state is
    checkpointed).  Input: streaming documents (url, warc_ts, text, ...)."""
    keyed = docs.select(
        "url", "warc_ts", "text", F.md5("text").alias("text_hash")
    ).groupBy("text_hash")
    return keyed.applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Structured Streaming wrapper: stream new documents into the graph.

The reference's closest analogue is the ``daily`` poll loop
(facts/tools.py:17-53).  The Spark mapping is incremental batch; this module
provides it as a Structured Streaming job (``Trigger.AvailableNow``) so that
new files landing in the documents directory are extracted exactly once with
checkpointed progress:

    readStream(documents dir)
      -> foreachBatch(extract_triples -> append to graph table)
      -> checkpointLocation = <out>/_checkpoint

``foreachBatch`` is the right operator here: extraction is stateless per
document, so there is no watermark/stateful-operator requirement, and the
batch function reuses the exact batch pipeline (same code path as the
one-shot and incremental drivers).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession

from literature_to_facts_spark.extractors.base import Sides
from literature_to_facts_spark.engine.pipeline import extract_triples, make_sides

DOCUMENTS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_documents_to_graph(
    spark: SparkSession,
    documents_dir: str,
    output_dir: str,
    sides: Optional[Sides] = None,
    available_now: bool = True,
    max_files_per_trigger: int = 64,
):
    """Start the streaming extraction; returns the StreamingQuery.

    With ``available_now=True`` the query drains everything currently in the
    directory and stops (incremental batch); with False it keeps running and
    picks up new files per microbatch.
    """
    sides = sides or make_sides()

    reader = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(documents_dir)
    )

    triples_path = os.path.join(output_dir, "triples_stream")
    checkpoint = os.path.join(output_dir, "_checkpoint")

    def process_batch(batch_df, batch_id: int):
        # per-microbatch dedup; cross-batch duplicates are handled by the
        # downstream graph compaction (dropDuplicates at read/compact time)
        triples = extract_triples(spark, batch_df, sides, dedup=True)
        triples.write.mode("append").parquet(triples_path)

    writer = reader.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_triples(spark: SparkSession, output_dir: str):
    df = spark.read.parquet(os.path.join(output_dir, "triples_stream"))
    return df.dropDuplicates(["subj", "pred", "obj_n3"])

"""Per-partition lineage + extraction metrics (north-rule requirement).

``extract_triples_with_lineage`` runs the same single-pass extraction as
engine/pipeline.py but appends one lineage row per *input partition* to the
output stream (pred='__lineage__'), carrying JSON metrics:

    {partition_id, docs_in, docs_by_kind, identity_failures,
     docs_valuable, triples_out}

``split_lineage`` separates the streams.  This keeps lineage emission
single-pass (no second scan of 100 TB) and exactly aligned with the data it
describes; the incremental driver (streaming/incremental.py) persists these
rows next to the triples as the resume ledger.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from literature_to_facts_spark.extractors.base import Sides
from literature_to_facts_spark.engine.pipeline import (
    TRIPLE_COLS,
    TRIPLE_SCHEMA,
    apply_valuable_filter,
    extract_kind_batch,
    make_sides,
    relevant_docs,
    snapshot_batteries,
    snapshot_preparers,
)

LINEAGE_PRED = "__lineage__"


def extract_triples_with_lineage(
    spark: SparkSession,
    docs: DataFrame,
    sides: Optional[Sides] = None,
    run_id: str = "run",
    dedup: bool = True,
) -> DataFrame:
    sides = sides or make_sides()
    bc = spark.sparkContext.broadcast(sides)
    # snapshot built-in AND plugin kinds (batteries + preparers) so the
    # resumable spark-submit path honors driver-side registry plugins exactly
    # like extract_triples does — built-ins first, keeping emission order
    batteries = snapshot_batteries()
    preparers = snapshot_preparers()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_sides = bc.value
        m = {
            "docs_in": 0,
            "docs_by_kind": {},
            "identity_failures": 0,
            "docs_valuable": 0,
            "triples_out": 0,
        }
        for pdf in batches:
            m["docs_in"] += len(pdf)
            parts = []
            for kind in batteries:
                sub = pdf[pdf["kind"] == kind]
                if len(sub) == 0:
                    continue
                m["docs_by_kind"][kind] = m["docs_by_kind"].get(kind, 0) + len(sub)
                triples, n_bad = extract_kind_batch(
                    kind, sub, local_sides, batteries.get(kind), preparers.get(kind)
                )
                m["identity_failures"] += n_bad
                parts.append(apply_valuable_filter(triples))
            if parts:
                out = pd.concat(parts, ignore_index=True)[TRIPLE_COLS]
                m["docs_valuable"] += out["subj"].nunique()
                m["triples_out"] += len(out)
                if len(out):
                    yield out
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        m["partition_id"] = pid
        yield pd.DataFrame(
            [(f"partition:{pid}", run_id, LINEAGE_PRED, json.dumps(m, sort_keys=True), "json", "")],
            columns=TRIPLE_COLS,
        )

    out = relevant_docs(docs).mapInPandas(run, schema=TRIPLE_SCHEMA)
    if dedup:
        data = out.where(F.col("pred") != LINEAGE_PRED).dropDuplicates(
            ["subj", "pred", "obj_n3"]
        )
        lineage = out.where(F.col("pred") == LINEAGE_PRED)
        return data.unionByName(lineage)
    return out


def split_lineage(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """-> (triples, lineage_metrics) where lineage_metrics has one row per
    input partition with parsed metric columns."""
    triples = combined.where(F.col("pred") != LINEAGE_PRED)
    metrics_schema = (
        "docs_in long, identity_failures long, docs_valuable long, "
        "triples_out long, partition_id long"
    )
    lineage = (
        combined.where(F.col("pred") == LINEAGE_PRED)
        .select(
            F.col("subj").alias("run_id"),
            F.from_json(F.col("obj"), metrics_schema).alias("m"),
            F.col("obj").alias("metrics_json"),
        )
        .select("run_id", "m.*", "metrics_json")
    )
    return triples, lineage

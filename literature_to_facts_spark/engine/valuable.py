"""Declarative variant of the "valuable" filter (facts/core.py:121-123).

The production pipeline applies this filter batch-locally inside
``mapInPandas`` (zero shuffle — see engine/pipeline.py).  This module gives
the same semantics as composable DataFrame operators, used by the oracle
checks and by consumers filtering an already-materialized triples table:

* :func:`valuable_filter_window` — ``max(flag) over (partition by subj)``;
* :func:`valuable_filter_semijoin` — LEFT SEMI join against flagged subjects
  (usually the better plan: the build side is only the distinct flagged
  subjects, and AQE can pick a broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _flag():
    return F.col("pred").contains("mentions") | F.col("obj_n3").contains("mentions")


def valuable_filter_window(triples: DataFrame) -> DataFrame:
    """Grouped by url: the reference filters per *document*, and two crawl
    duplicates sharing a subject must be filtered independently."""
    w = Window.partitionBy("url")
    return (
        triples.withColumn("_valuable", F.max(_flag().cast("int")).over(w))
        .where(F.col("_valuable") == 1)
        .drop("_valuable")
    )


def valuable_filter_semijoin(triples: DataFrame) -> DataFrame:
    flagged = triples.where(_flag()).select("url").distinct()
    return triples.join(flagged, on="url", how="left_semi")

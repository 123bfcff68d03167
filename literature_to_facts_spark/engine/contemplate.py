"""Analytic joins over the graph (``l2f learn contemplate``,
facts/learn.py:95-157) as DataFrame queries on the triples table.

Both queries are predicate-filtered scans (partition pruning on the
pred-partitioned graph table) followed by equi joins.  The per-predicate
slices are tiny relative to the graph, so the report side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pred_slice(triples: DataFrame, pred: str, value_alias: str) -> DataFrame:
    return triples.where(F.col("pred") == pred).select(
        F.col("subj"), F.col("obj").alias(value_alias)
    )


def counterpart_matches(triples: DataFrame) -> DataFrame:
    """facts/learn.py:105-125: for each event-reporting doc (lvc_event_report
    or reports_icecube_event), find counterpart-search docs related to the
    same event name by ANY predicate, with their DATE, T0 and instrument(s);
    keep pairs whose DATEs differ.

    One output row per SPARQL solution (duplicates across matching
    predicates preserved, as in the non-DISTINCT reference query).
    """
    dates = _pred_slice(triples, "DATE", "date")
    t0s = _pred_slice(triples, "original_event_utc", "event_t0")
    instruments = _pred_slice(triples, "instrument", "instrument")

    # counterpart candidates: every triple object can bind ?c
    cand = triples.select(F.col("subj").alias("ct_g"), F.col("obj").alias("event"))
    ct = (
        cand.join(dates.withColumnRenamed("subj", "ct_g"), on="ct_g")
        .withColumnRenamed("date", "counterpart_gcn_time")
        .join(t0s.withColumnRenamed("subj", "ct_g"), on="ct_g")
        .join(instruments.withColumnRenamed("subj", "ct_g"), on="ct_g")
    )

    out = None
    for rep_pred in ("lvc_event_report", "reports_icecube_event"):
        reports = (
            _pred_slice(triples, rep_pred, "event")
            .withColumnRenamed("subj", "ic_g")
            .join(dates.withColumnRenamed("subj", "ic_g"), on="ic_g")
            .withColumnRenamed("date", "event_gcn_time")
        )
        j = (
            ct.join(F.broadcast(reports), on="event")
            .where(F.col("event_gcn_time") != F.col("counterpart_gcn_time"))
            .select(
                "event", "event_gcn_time", "counterpart_gcn_time",
                "event_t0", "instrument",
            )
        )
        out = j if out is None else out.unionByName(j)
    return out


def counterpart_summary(matches: DataFrame) -> DataFrame:
    """facts/learn.py:127-137: merge rows by event — first row's scalars,
    instruments collected.  Deterministic ordering (by counterpart time,
    then instrument) replaces the reference's dict-insertion order."""
    w_first = F.struct(
        F.col("counterpart_gcn_time"), F.col("event_t0"), F.col("event_gcn_time")
    )
    return matches.groupBy("event").agg(
        F.min(w_first).alias("_first"),
        F.sort_array(F.collect_list("instrument")).alias("instrument"),
    ).select(
        "event",
        F.col("_first.event_gcn_time").alias("event_gcn_time"),
        F.col("_first.counterpart_gcn_time").alias("counterpart_gcn_time"),
        F.col("_first.event_t0").alias("event_t0"),
        "instrument",
    )


def grb_reaction_summary(triples: DataFrame) -> DataFrame:
    """facts/learn.py:142-156: same-subject 3-pattern join
    (integral_grb_report x DATE x event_t0), keep rows where t0 != DATE."""
    reports = _pred_slice(triples, "integral_grb_report", "event")
    dates = _pred_slice(triples, "DATE", "event_gcn_time")
    t0s = _pred_slice(triples, "event_t0", "event_t0")
    return (
        reports.join(dates, on="subj")
        .join(t0s, on="subj")
        .where(F.col("event_t0") != F.col("event_gcn_time"))
        .select("event", "event_t0", "event_gcn_time")
    )

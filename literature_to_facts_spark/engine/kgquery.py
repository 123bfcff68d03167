"""Graph-side query operators over materialized (subj, pred, obj) triples.

The reference stores its facts in an rdflib graph and answers questions by
SPARQL over it (``/root/reference/facts/learn.py:95-157`` — the contemplate
joins are hand-written two-triple-pattern queries).  At 10^12-document scale
the triple store is a partitioned table, and the classic store-side query
operators become DataFrame plans:

* :func:`predicate_stats` — per-predicate cardinalities (triples, distinct
  subjects, distinct objects), the statistics an RDF store keeps for join
  ordering.
* :func:`characteristic_sets` — the Neumann & Moerkotte (ICDE 2011)
  cardinality-estimation structure: histogram of the distinct predicate-SET
  each subject carries.  Doubles as a schema summary of a melted KG.
* :func:`entity_cooccurrence` — co-mention edge building: entity pairs that
  appear in the same document, the standard first step from mention
  detection to a KG edge list.
* :func:`two_hop` — two-triple-pattern path join (the SPARQL
  ``?a p1 ?b . ?b p2 ?c`` shape the reference's counterpart join is an
  instance of), aggregated to distinct endpoints with path counts.

All outputs are deterministic and integer/string-typed so a DuckDB oracle
recomputes them bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predicate_stats(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-predicate cardinality statistics: ``(pred, n_triples, n_subj,
    n_obj)`` with exact distinct counts.

    Scale shape: one ``pred``-keyed aggregation.  The two exact distincts
    make Spark plan an Expand (3x the input rows map-side) feeding a
    partial aggregate, so the shuffle carries only per-(pred, grouping-id)
    partials; the final state is predicate-sized (KGs have 10s-1000s of
    predicates, never 10^12).  Hot predicates (every doc has ``lang``) are
    absorbed by the map-side partials, not a hot reducer.
    """
    return (
        triples.groupBy(F.col(pred_col).alias("pred"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_triples"),
            F.countDistinct(subj_col).cast("bigint").alias("n_subj"),
            F.countDistinct(obj_col).cast("bigint").alias("n_obj"),
        )
    )


def characteristic_sets(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
) -> DataFrame:
    """Characteristic-set histogram: for each subject, its sorted distinct
    predicate set (rendered as a comma-joined string — the portable array
    convention); then one row per distinct set with the number of subjects
    carrying it: ``(pred_set, n_subj, n_preds)``.

    This is the RDF-store cardinality-estimation structure of Neumann &
    Moerkotte (ICDE 2011, "Characteristic sets: Accurate cardinality
    estimation for RDF queries") and a one-glance schema summary of a
    melted KG ("97% of pages carry {lang, n_chars, source}; 3% also carry
    mentions_*").

    Scale shape: two shuffles, both partial-agg'd — a ``subj``-keyed
    ``collect_set`` (per-subject predicate sets are small and bounded by
    the schema, so state per key is O(|preds|)), then a set-keyed count
    whose key space is the number of DISTINCT schema shapes (small by
    construction — that is the point of the statistic).
    """
    per_subj = (
        triples.groupBy(F.col(subj_col).alias("subj"))
        .agg(F.sort_array(F.collect_set(pred_col)).alias("_preds"))
        .select(
            F.concat_ws(",", F.col("_preds")).alias("pred_set"),
            F.size("_preds").alias("_n_preds"),
        )
    )
    return (
        per_subj.groupBy("pred_set")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_subj"),
            F.first("_n_preds").cast("bigint").alias("n_preds"),
        )
    )


def entity_cooccurrence(
    mentions: DataFrame,
    doc_col: str = "doc_id",
    entity_col: str = "entity",
    max_entities_per_doc: int | None = 64,
) -> DataFrame:
    """Co-mention edges: unordered entity pairs mentioned in the same
    document — ``(entity_a, entity_b, n_docs)`` with ``entity_a <
    entity_b`` and ``n_docs`` the number of distinct documents containing
    both.

    ``max_entities_per_doc`` guards the quadratic blowup: a document
    mentioning k entities contributes k*(k-1)/2 pairs, so a single
    pathological page (an index listing 10^5 entities) would emit 5*10^9
    rows.  Documents above the cap are DROPPED from pair building (the
    standard co-occurrence practice — such pages carry no real association
    signal anyway).  Pass ``None`` to disable.

    Scale shape: distinct (doc, entity) first (one shuffle, partial-agg'd),
    per-doc cardinality via a ``doc``-keyed count joined back (same key →
    same shuffle partitioning reused), then the pair self-join keyed on
    ``doc`` — each task joins only within its doc partitions and per-doc
    output is capped at ~k^2/2 ≤ 2016 rows by the guard.  The final
    pair-keyed count is partial-agg'd, so hot pairs (two entities
    co-mentioned everywhere) cost map-side combine, not a hot reducer.
    """
    de = (
        mentions.select(
            F.col(doc_col).alias("_doc"), F.col(entity_col).alias("_ent")
        )
        .distinct()
    )
    if max_entities_per_doc is not None:
        per_doc = de.groupBy("_doc").agg(F.count(F.lit(1)).alias("_k"))
        de = (
            de.join(per_doc.where(F.col("_k") <= int(max_entities_per_doc)),
                    on="_doc", how="left_semi")
        )
    a = de.select(F.col("_doc"), F.col("_ent").alias("entity_a"))
    b = de.select(F.col("_doc"), F.col("_ent").alias("entity_b"))
    pairs = a.join(b, on="_doc").where(F.col("entity_a") < F.col("entity_b"))
    return (
        pairs.groupBy("entity_a", "entity_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


def two_hop(
    edges_ab: DataFrame,
    edges_bc: DataFrame,
    a_col: str = "src",
    b_col: str = "dst",
    b2_col: str = "src",
    c_col: str = "dst",
) -> DataFrame:
    """Two-triple-pattern path join (SPARQL ``?a p1 ?b . ?b p2 ?c``):
    endpoints with the number of DISTINCT middle nodes connecting them —
    ``(a, c, n_mid)``.

    Deduplicates each edge set first so parallel edges do not multiply
    path counts, and counts distinct middles (not raw paths), which is the
    question a KG user asks ("how many documents connect this source to
    this entity?").

    Scale shape: the join keys on the middle node ``b`` — both sides
    shuffle on ``b`` once (or zero times if both are bucketed by their
    join column in the catalog).  Skewed middles (one doc linking
    everything) are the co-occurrence problem again — cap upstream with
    :func:`entity_cooccurrence`'s guard pattern if ``b`` fan-outs are
    unbounded.  The final (a, c)-keyed distinct-count is planned with
    map-side partial aggregation.
    """
    ab = edges_ab.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("_b")
    ).distinct()
    bc = edges_bc.select(
        F.col(b2_col).alias("_b"), F.col(c_col).alias("c")
    ).distinct()
    return (
        ab.join(bc, on="_b")
        .groupBy("a", "c")
        .agg(F.countDistinct("_b").cast("bigint").alias("n_mid"))
    )

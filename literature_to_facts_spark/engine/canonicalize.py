"""Salted-key canonicalization of duplicate entities (north-rule stage 3).

Hot entities (a popular GRB can appear in >20% of mention-bearing docs)
concentrate a plain ``groupBy(canonical_uri)`` onto single reducers.  AQE
skew handling splits skewed JOIN partitions but does not rebalance a hot
``collect_set`` aggregation key, so canonicalization uses an explicit
two-phase salted aggregation:

    phase 1: groupBy(canonical_uri, salt)   -- salt = hash(subj) % n_salts,
             partial counts + partial distinct sets (bounded)
    phase 2: groupBy(canonical_uri)         -- merge partials

Because the salt is derived from ``subj``, a given document lands in exactly
one salt bucket, so per-salt distinct-doc counts sum to the exact global
distinct count.  Collected sets are capped (``max_forms``) — at 10^12-doc
scale an unbounded collect_set is a driver/executor OOM, so the cap is a
documented contract, not an optimization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_entities(
    links: DataFrame, n_salts: int = 64, max_forms: int = 100
) -> DataFrame:
    """entity_links -> one row per canonical entity.

    Columns: canonical_uri, entity_type, n_mentions (total mention triples),
    n_docs (exact distinct documents), mention_forms (sorted, capped).
    """
    salted = links.withColumn(
        "salt", F.pmod(F.xxhash64("subj"), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy("canonical_uri", "salt").agg(
        F.first("entity_type").alias("entity_type"),
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("subj").alias("docs_partial"),
        F.slice(F.sort_array(F.collect_set("mention")), 1, max_forms).alias(
            "forms_partial"
        ),
    )
    return partial.groupBy("canonical_uri").agg(
        F.first("entity_type").alias("entity_type"),
        F.sum("cnt").alias("n_mentions"),
        F.sum("docs_partial").alias("n_docs"),
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("forms_partial")))),
            1,
            max_forms,
        ).alias("mention_forms"),
    )


def canonical_entities_unsalted(links: DataFrame, max_forms: int = 100) -> DataFrame:
    """Single-phase reference implementation (correctness oracle for the
    salted version; DO NOT use on skewed production data)."""
    return links.groupBy("canonical_uri").agg(
        F.first("entity_type").alias("entity_type"),
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("subj").alias("n_docs"),
        F.slice(F.sort_array(F.collect_set("mention")), 1, max_forms).alias(
            "mention_forms"
        ),
    )

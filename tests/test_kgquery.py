"""Store-side KG query operators (engine/kgquery.py).

Small hand-computable fixtures pin the semantics the DuckDB oracles then
re-verify at scale: distinct-predicate sets, pair ordering + the quadratic
cap, distinct-middle path counting.
"""

import pytest
from pyspark.sql import functions as F

from literature_to_facts_spark.engine.kgquery import (
    characteristic_sets,
    entity_cooccurrence,
    predicate_stats,
    two_hop,
)


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        (1, "lang", "en"),
        (1, "lang", "en"),  # duplicate triple: counted in n_triples, once in distincts
        (1, "source", "a.com"),
        (2, "lang", "fr"),
        (2, "source", "a.com"),
        (2, "mentions_x", "3"),
        (3, "lang", "en"),
    ]
    return spark.createDataFrame(rows, "subj bigint, pred string, obj string")


def test_predicate_stats(triples):
    got = {r["pred"]: r for r in predicate_stats(triples).collect()}
    assert got["lang"]["n_triples"] == 4
    assert got["lang"]["n_subj"] == 3
    assert got["lang"]["n_obj"] == 2  # en, fr
    assert got["source"]["n_subj"] == 2 and got["source"]["n_obj"] == 1
    assert got["mentions_x"]["n_triples"] == 1


def test_characteristic_sets(triples):
    got = {r["pred_set"]: r for r in characteristic_sets(triples).collect()}
    # subj 1 and 3 both carry {lang, source}? no — subj 3 carries only {lang}
    assert got["lang,source"]["n_subj"] == 1 and got["lang,source"]["n_preds"] == 2
    assert got["lang,mentions_x,source"]["n_subj"] == 1
    assert got["lang,mentions_x,source"]["n_preds"] == 3
    assert got["lang"]["n_subj"] == 1 and got["lang"]["n_preds"] == 1


def test_entity_cooccurrence_pairs_and_dedup(spark):
    mentions = spark.createDataFrame(
        [
            (1, "a"), (1, "b"), (1, "b"),  # duplicate mention, one pair
            (2, "a"), (2, "b"),
            (3, "b"), (3, "a"), (3, "c"),
        ],
        "doc_id bigint, entity string",
    )
    got = {
        (r["entity_a"], r["entity_b"]): r["n_docs"]
        for r in entity_cooccurrence(mentions).collect()
    }
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}


def test_entity_cooccurrence_cap_drops_fat_docs(spark):
    rows = [(1, f"e{i}") for i in range(5)] + [(2, "e0"), (2, "e1")]
    mentions = spark.createDataFrame(rows, "doc_id bigint, entity string")
    got = entity_cooccurrence(mentions, max_entities_per_doc=4).collect()
    # doc 1 (5 entities) dropped entirely; only doc 2's single pair remains
    assert [(r["entity_a"], r["entity_b"], r["n_docs"]) for r in got] == [
        ("e0", "e1", 1)
    ]
    uncapped = entity_cooccurrence(mentions, max_entities_per_doc=None).count()
    assert uncapped == 10  # C(5,2) + 1 pair, ("e0","e1") merged across docs


def test_two_hop_distinct_middles(spark):
    ab = spark.createDataFrame(
        [("s1", 10), ("s1", 11), ("s1", 10), ("s2", 11)], "src string, dst bigint"
    )
    bc = spark.createDataFrame(
        [(10, "x"), (11, "x"), (11, "y"), (11, "y")], "src bigint, dst string"
    )
    got = {(r["a"], r["c"]): r["n_mid"] for r in two_hop(ab, bc).collect()}
    # s1 reaches x via docs 10 AND 11 (parallel edges deduped), y via 11 only
    assert got == {("s1", "x"): 2, ("s1", "y"): 1, ("s2", "x"): 1, ("s2", "y"): 1}


def test_cooccurrence_self_join_plans_single_scan_key(spark):
    """The pair join keys on the doc column (no cartesian, no broadcast of
    the full mention table) and the final count is partial-agg'd."""
    mentions = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], "doc_id bigint, entity string"
    )
    plan = entity_cooccurrence(mentions)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan

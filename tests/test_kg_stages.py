"""North-rule KG stages: entity linking, salted canonicalization, graph
materialization + N3 export, contemplate joins, publish chunking."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def gazetteer_df(spark, corpus):
    return spark.createDataFrame(corpus.gazetteer)


@pytest.fixture(scope="module")
def links_df(spark, triples_df, gazetteer_df):
    from literature_to_facts_spark.engine.linking import link_entities

    return link_entities(triples_df, gazetteer_df).cache()


def test_linking_alias_resolution(links_df):
    """IC211125A and IceCube-211125A both resolve to the same canonical URI."""
    rows = links_df.where(
        F.col("mention").isin("IC211125A", "IceCube-211125A")
    ).collect()
    uris = {r["canonical_uri"] for r in rows}
    assert uris == {"http://odahub.io/ontology/event#IceCube-211125A"}
    mentions = {r["mention"] for r in rows}
    assert mentions == {"IC211125A", "IceCube-211125A"}


def test_linking_is_broadcast(links_df):
    plan = links_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_link_triples_shape(links_df):
    from literature_to_facts_spark.engine.linking import link_triples

    lt = link_triples(links_df)
    r = lt.first()
    assert r["pred"] == "links_to_entity"
    assert r["obj_n3"].startswith("<http://odahub.io/ontology/event#")
    assert lt.count() == lt.select("subj", "obj").distinct().count()


def test_salted_canonicalization_matches_unsalted(links_df):
    from literature_to_facts_spark.engine.canonicalize import (
        canonical_entities,
        canonical_entities_unsalted,
    )

    salted = {
        r["canonical_uri"]: (r["n_mentions"], r["n_docs"], tuple(r["mention_forms"]))
        for r in canonical_entities(links_df, n_salts=16).collect()
    }
    plain = {
        r["canonical_uri"]: (r["n_mentions"], r["n_docs"], tuple(r["mention_forms"]))
        for r in canonical_entities_unsalted(links_df).collect()
    }
    assert salted == plain
    assert len(salted) > 5


def test_hot_entity_skew_present(links_df):
    """The corpus skew knob: the hot GRB dominates mention-bearing docs."""
    from literature_to_facts_spark.engine.canonicalize import canonical_entities

    ents = canonical_entities(links_df).collect()
    top = max(ents, key=lambda r: r["n_docs"])
    assert top["canonical_uri"].endswith("GRB220101A")
    total_docs = sum(r["n_docs"] for r in ents)
    assert top["n_docs"] / total_docs > 0.1


def test_counterpart_and_reaction_queries(spark, triples_df):
    from literature_to_facts_spark.engine.contemplate import (
        counterpart_matches,
        counterpart_summary,
        grb_reaction_summary,
    )

    m = counterpart_matches(triples_df)
    rows = m.collect()
    assert len(rows) >= 1
    # the golden LVC pair: 26221 reports S191109d, 26222 is the counterpart
    ev = [r for r in rows if r["event"] == "LIGO/Virgo S191109d"]
    assert ev, rows[:5]
    assert all(r["event_gcn_time"] != r["counterpart_gcn_time"] for r in rows)
    assert {r["instrument"] for r in ev} == {"acs", "ibis"}
    assert all(r["event_t0"] == "2019-11-09 01:07:17.22" for r in ev)

    s = {r["event"]: r for r in counterpart_summary(m).collect()}
    # SPARQL cross-product semantics: 2 predicate bindings (original_event,
    # lvc_event) x 2 instruments -> duplicates preserved, as in the
    # reference's non-DISTINCT query + per-row append (facts/learn.py:127-137)
    assert sorted(s["LIGO/Virgo S191109d"]["instrument"]) == [
        "acs", "acs", "ibis", "ibis",
    ]

    g = grb_reaction_summary(triples_df).collect()
    events = {r["event"] for r in g}
    assert {"GRB 190829A", "GRB 190829B", "GRB 190829C"} <= events
    assert all(r["event_t0"] != r["event_gcn_time"] for r in g)


def test_graph_write_partitioned_and_pruned(spark, triples_df, tmp_path):
    from literature_to_facts_spark.engine.graph import read_triples, write_triples

    path = str(tmp_path / "graph")
    write_triples(triples_df, path)
    back = read_triples(spark, path)
    assert back.count() == triples_df.count()
    # predicate filter must prune partitions at scan time
    q = back.where(F.col("pred") == "integral_ul")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert q.count() == triples_df.where(F.col("pred") == "integral_ul").count()
    assert "PartitionFilters" in plan and "pred" in plan.split("PartitionFilters")[1][:200]


def test_compact_graph(spark, docs_df, sides, tmp_path):
    from literature_to_facts_spark.engine.graph import compact_graph
    from literature_to_facts_spark.engine.pipeline import extract_triples
    from literature_to_facts_spark.streaming.incremental import run_incremental

    out = str(tmp_path / "inc2")
    run_incremental(spark, docs_df, out, sides, n_buckets=3, run_id="c1")
    n = compact_graph(spark, f"{out}/triples/bucket=*", str(tmp_path / "compact"))
    direct = extract_triples(spark, docs_df, sides).count()
    assert n == direct
    # compacted table stays pred-partitioned (pruning works)
    back = spark.read.parquet(str(tmp_path / "compact"))
    assert back.where("pred = 'integral_ul'").count() > 0


def test_n3_export_round_trip(spark, triples_df):
    from literature_to_facts_spark.engine.graph import export_n3
    from literature_to_facts_spark.functions.literals import from_n3

    text = export_n3(triples_df.limit(50))
    lines = [l for l in text.splitlines() if l and not l.startswith("@prefix")]
    assert len(lines) == 50
    for line in lines[:10]:
        assert line.endswith(" .")
        subj_tok, pred_tok, rest = line.split(" ", 2)
        assert subj_tok.startswith("<http://odahub.io/ontology/paper#")
        assert pred_tok.startswith("<http://odahub.io/ontology/paper#")
        from_n3(rest[: -2].strip())  # object parses back


def test_publish_chunking(spark, triples_df):
    from literature_to_facts_spark.engine.graph import publish_batches

    # chunk sizes: every chunk <= 1000 and everything is delivered once
    n = triples_df.count()
    acc = spark.sparkContext.accumulator(0)
    maxed = spark.sparkContext.accumulator(0)

    def sink(lines):
        acc.add(len(lines))
        if len(lines) > 1000:
            maxed.add(1)

    publish_batches(triples_df, chunk_size=1000)(sink)
    assert acc.value == n
    assert maxed.value == 0


def test_turtle_shorthand_export(spark):
    """rdflib-style Turtle shorthand: `;` between predicates, `,` between
    repeated-predicate objects, paper: qnames, deterministic ordering."""
    from literature_to_facts_spark.engine.graph import export_turtle
    from literature_to_facts_spark.functions.literals import PAPER_NS

    rows = [
        (f"{PAPER_NS}#gcn1", "instrument", '"fermi-gbm"'),
        (f"{PAPER_NS}#gcn1", "instrument", '"integral"'),
        (f"{PAPER_NS}#gcn1", "mentions_grb", '"body"'),
        (f"{PAPER_NS}#gcn2", "NUMBER", '"2"^^<http://www.w3.org/2001/XMLSchema#integer>'),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj_n3 string")
    got = export_turtle(t)
    expected = (
        f"@prefix paper: <{PAPER_NS}#> .\n"
        "\n"
        'paper:gcn1 paper:instrument "fermi-gbm",\n'
        '        "integral" ;\n'
        '    paper:mentions_grb "body" .\n'
        "\n"
        'paper:gcn2 paper:NUMBER "2"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
    )
    assert got == expected


def test_qname_rejects_turtle_illegal_locals():
    """Turtle PN_LOCAL must not start with '-'/'.' nor end with '.' —
    such locals fall back to <uri> instead of emitting unparseable
    'paper:foo.' tokens."""
    from literature_to_facts_spark.engine.graph import _qname
    from literature_to_facts_spark.functions.literals import PAPER_NS

    assert _qname(PAPER_NS + "#good_local-1.x") == "paper:good_local-1.x"
    assert _qname(PAPER_NS + "#foo.") == f"<{PAPER_NS}#foo.>"
    assert _qname(PAPER_NS + "#.foo") == f"<{PAPER_NS}#.foo>"
    assert _qname(PAPER_NS + "#-foo") == f"<{PAPER_NS}#-foo>"
    assert _qname(PAPER_NS + "#_ok") == "paper:_ok"
    assert _qname("https://other.example/x") == "<https://other.example/x>"

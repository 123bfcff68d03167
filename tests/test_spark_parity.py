"""Spark pipeline vs shim oracle: triple-level P/R and dict-view goldens.

The BASELINE.json gate is P/R >= 0.95 vs the reference on the fixture
corpus; the suite asserts the stronger P = R = 1.0.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from literature_to_facts_spark.engine.dictview import dict_view, rows_to_python
from literature_to_facts_spark.engine.kinds import classify_url
from literature_to_facts_spark.engine.valuable import (
    valuable_filter_semijoin,
    valuable_filter_window,
)
from literature_to_facts_spark.shim import reference_shim as rs


def shim_triple_set(corpus, shim_sides):
    out = set()
    docs = corpus.documents
    for _, row in docs.iterrows():
        kind = classify_url(row["url"])
        if kind == "other":
            continue
        try:
            doc = rs.decode_doc(kind, row["text"])
            _, triples = rs.extract_doc_facts(kind, doc, shim_sides)
        except Exception:
            continue
        for s, p, o in triples:
            out.add((s.strip("<>"), p.strip("<>").split("#")[-1], o))
    return out


@pytest.fixture(scope="module")
def spark_triple_set(triples_df):
    rows = triples_df.select("subj", "pred", "obj_n3").collect()
    return {(r["subj"], r["pred"], r["obj_n3"]) for r in rows}


def test_triple_precision_recall(spark_triple_set, corpus, shim_sides):
    golden = shim_triple_set(corpus, shim_sides)
    tp = len(spark_triple_set & golden)
    precision = tp / max(len(spark_triple_set), 1)
    recall = tp / max(len(golden), 1)
    assert precision == 1.0, sorted(spark_triple_set - golden)[:10]
    assert recall == 1.0, sorted(golden - spark_triple_set)[:10]
    assert len(golden) > 1000  # corpus actually exercises the batteries


def test_dedup_is_set_semantics(triples_df):
    n = triples_df.count()
    assert triples_df.select("subj", "pred", "obj_n3").distinct().count() == n


def test_dict_view_goldens(spark, triples_raw_df):
    """Spark dict view reproduces the reference test assertions end-to-end."""
    dv = dict_view(triples_raw_df)
    by_subj = {}
    for r in dv.collect():
        by_subj.setdefault(r["subj"], []).append(r)

    g = rows_to_python(by_subj["http://odahub.io/ontology/paper#gcn31106"])
    assert g["paper:grb_isot"] == "2021-11-23T03:52:23.500000"
    assert g["paper:mentions_named_hawc"] == ["HAWC-211123A"]
    assert g["paper:hawc_ra"] == 34.12
    assert g["paper:hawc_dec"] == -8.05

    g = rows_to_python(by_subj["http://odahub.io/ontology/paper#gcn31373"])
    assert g["paper:cites"] == [
        f"http://odahub.io/ontology/paper#gcn{i}"
        for i in (31347, 31350, 31351, 31354, 31360, 31372)
    ]
    assert g["paper:mentions_named_grb"] == ["GRB220101A"]

    g = rows_to_python(by_subj["http://odahub.io/ontology/paper#gcn31126"])
    assert g["paper:event_ra"] == 43.59
    assert g["paper:event_isot"] == "2021-11-25T06:22:21.550000"

    g = rows_to_python(by_subj["http://odahub.io/ontology/paper#atel15100"])
    assert g["paper:mentions_named_event"] == [
        "IceCube-170922A", "IceCube-211208A", "IceCube-2112108A", "PKS0735+17",
    ]
    assert g["paper:cites_atel_id"] == "15099"

    g = rows_to_python(by_subj["http://odahub.io/ontology/paper#gcn31182"])
    assert g["paper:swift_trigger_id"] == 1088376

    g = rows_to_python(by_subj["http://odahub.io/ontology/paper#gcn20249"])
    assert g["paper:integral_ul"] == 4.6e-7


def test_valuable_filter_variants_agree(spark, docs_df, sides):
    """Batch-local filter (pipeline) == window variant == semi-join variant."""
    from literature_to_facts_spark.engine import pipeline as pl

    sides_bc = sides
    bc = spark.sparkContext.broadcast(sides_bc)

    def run_unfiltered(batches):
        for pdf in batches:
            parts = []
            for kind in ("gcn", "atel", "arxiv"):
                sub = pdf[pdf["kind"] == kind]
                if len(sub) == 0:
                    continue
                t, _ = pl.extract_kind_batch(kind, sub, bc.value)
                parts.append(t)
            if parts:
                out = pd.concat(parts, ignore_index=True)[pl.TRIPLE_COLS]
                if len(out):
                    yield out

    raw = pl.relevant_docs(docs_df).mapInPandas(run_unfiltered, schema=pl.TRIPLE_SCHEMA)
    raw = raw.cache()
    w = valuable_filter_window(raw)
    s = valuable_filter_semijoin(raw)
    batch_local = pl.extract_triples(spark, docs_df, sides_bc, dedup=False)

    def key_set(df):
        return {
            (r["subj"], r["pred"], r["obj_n3"])
            for r in df.select("subj", "pred", "obj_n3").collect()
        }

    kw, ks, kb = key_set(w), key_set(s), key_set(batch_local)
    assert kw == ks == kb
    assert len(kw) < len(key_set(raw))  # the filter actually drops docs
    raw.unpersist()


def test_column_pruning_reads_only_url_text(spark, corpus, sides, tmp_path):
    """html must never be read: check ReadSchema on a parquet-backed run."""
    from literature_to_facts_spark.engine.pipeline import extract_triples

    path = str(tmp_path / "documents.parquet")
    df = spark.createDataFrame(corpus.documents)
    df.write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)
    plan = extract_triples(spark, docs, sides)._jdf.queryExecution().executedPlan().toString()
    assert "html" not in plan
    assert "PushedFilters" in plan or "StartsWith" in plan


def test_extraction_metrics_and_lineage(spark, docs_df, sides):
    from literature_to_facts_spark.engine.lineage import (
        extract_triples_with_lineage,
        split_lineage,
    )

    combined = extract_triples_with_lineage(spark, docs_df, sides, run_id="t1")
    triples, lineage = split_lineage(combined)
    lrows = lineage.collect()
    assert len(lrows) >= 1
    assert sum(r["docs_in"] for r in lrows) == docs_df.where(
        ~F.col("url").startswith("https://example.org/")
    ).count()
    assert sum(r["triples_out"] for r in lrows) >= triples.count()  # pre-dedup count
    assert all(r["run_id"] == "t1" for r in lrows)


def test_incremental_resume(spark, docs_df, sides, tmp_path):
    from literature_to_facts_spark.streaming.incremental import (
        read_all_triples,
        run_incremental,
    )

    out = str(tmp_path / "inc")
    r1 = run_incremental(spark, docs_df, out, sides, n_buckets=4, run_id="r1")
    assert r1["buckets_processed"] == 4 and r1["buckets_skipped"] == 0
    n1 = read_all_triples(spark, out).count()
    # resume: same run_id -> committed buckets are skipped
    r2 = run_incremental(spark, docs_df, out, sides, n_buckets=4, run_id="r1")
    assert r2["buckets_processed"] == 0 and r2["buckets_skipped"] == 4
    assert read_all_triples(spark, out).count() == n1
    # a NEW run_id (fresh snapshot / daily tick) reprocesses, idempotently
    r3 = run_incremental(spark, docs_df, out, sides, n_buckets=4, run_id="r3")
    assert r3["buckets_processed"] == 4 and r3["buckets_skipped"] == 0
    assert read_all_triples(spark, out).count() == n1
    # and the union of buckets equals the one-shot pipeline
    from literature_to_facts_spark.engine.pipeline import extract_triples

    direct = extract_triples(spark, docs_df, sides).count()
    assert n1 == direct


@pytest.mark.parametrize("seed", [7, 1234])
def test_heldout_seed_parity(seed):
    """P = R = 1.0 on corpora seeded differently from the committed fixture
    (guards against fixture-overfitting in the gated/vectorized extractors;
    pure pandas path, covers the full battery without a Spark session)."""
    from literature_to_facts_spark.engine.pipeline import extract_batch, make_sides
    from literature_to_facts_spark.sources.corpus import build_corpus

    c = build_corpus(n_docs=150, seed=seed)
    sides_v = make_sides(c.balrog, c.amon_notices, c.ads_authors)
    sides_s = rs.SideTables(
        balrog={r["url_json"]: r for _, r in c.balrog.iterrows()},
        amon_notices={r["url"]: r["notice_text"] for _, r in c.amon_notices.iterrows()},
        ads_authors={r["subject"]: r["gcn_authors"] for _, r in c.ads_authors.iterrows()},
    )
    docs = c.documents[["url", "text"]].copy()
    docs["kind"] = docs["url"].map(classify_url)
    out = extract_batch(docs, sides_v)
    got = set(zip(out["subj"], out["pred"], out["obj_n3"]))
    golden = set()
    for _, row in c.documents.iterrows():
        kind = classify_url(row["url"])
        if kind == "other":
            continue
        try:
            doc = rs.decode_doc(kind, row["text"])
            _, triples = rs.extract_doc_facts(kind, doc, sides_s)
        except Exception:
            continue
        for s, p, o in triples:
            golden.add((s.strip("<>"), p.strip("<>").split("#")[-1], o))
    assert len(golden) > 500
    assert got == golden, (sorted(got - golden)[:5], sorted(golden - got)[:5])

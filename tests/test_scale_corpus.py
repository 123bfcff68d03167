"""Spark-side scale generators (sources/corpus.build_scale_documents /
build_scale_embeddings) — the fixtures the >=100x delta-dedup A/B runs on.

They must be (a) deterministic in their seeds (the A/B compares probe vs
union runs over the SAME corpus), (b) schema-identical to the driver's
documents/embeddings parquet tables (so every datapipe operator runs on
them unchanged), and (c) carry real near-dup structure (exact dups, one
appended-token near dups, embedding clusters) at the configured rate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from literature_to_facts_spark.sources.corpus import (
    build_scale_documents,
    build_scale_embeddings,
)


@pytest.fixture(scope="module")
def scale_docs(spark):
    return build_scale_documents(spark, 2000, seed=42, dup_rate=10).cache()


def test_scale_documents_schema_matches_testdata(spark, scale_docs):
    ref = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert [(f.name, f.dataType) for f in scale_docs.schema.fields] == [
        (f.name, f.dataType) for f in ref.schema.fields
    ]


def test_scale_documents_deterministic_and_structured(spark, scale_docs):
    again = build_scale_documents(spark, 2000, seed=42, dup_rate=10)
    assert scale_docs.exceptAll(again).count() == 0
    assert again.exceptAll(scale_docs).count() == 0
    assert scale_docs.count() == 2000
    assert scale_docs.select("doc_id").distinct().count() == 2000

    # dup structure: ~dup_rate% of docs share content with another doc —
    # split between byte-exact copies and one-mutation near-dups
    n_exact_dup_docs = (
        scale_docs.groupBy("text").count().where("count >= 2")
        .agg(F.sum("count")).collect()[0][0]
    )
    assert n_exact_dup_docs and n_exact_dup_docs >= 20
    n_near = scale_docs.where("text rlike ' mut[0-9]$'").count()
    assert n_near >= 20
    # a different seed produces a different corpus
    other = build_scale_documents(spark, 2000, seed=43, dup_rate=10)
    assert scale_docs.exceptAll(other).count() > 0


def test_scale_documents_token_structure(scale_docs):
    toks = scale_docs.selectExpr(
        "size(split(text, ' ')) AS n_toks"
    ).agg(F.min("n_toks"), F.max("n_toks")).collect()[0]
    # 30-120 pool tokens, +1 possible mutation token
    assert 30 <= toks[0] and toks[1] <= 121


def test_scale_embeddings_schema_and_clusters(spark):
    emb = build_scale_embeddings(spark, 1000, dim=16, seed=7, dup_rate=20).cache()
    ref = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert [(f.name, f.dataType) for f in emb.schema.fields] == [
        (f.name, f.dataType) for f in ref.schema.fields
    ]
    assert emb.count() == 1000
    assert emb.selectExpr("size(embedding)").distinct().collect() == [(16,)]
    # near-copy cluster members have cosine ~1 to their center; verify at
    # least one pair of distinct vectors with cosine > 0.99 exists and that
    # independent vectors are near-orthogonal on average
    again = build_scale_embeddings(spark, 1000, dim=16, seed=7, dup_rate=20)
    assert emb.exceptAll(again).count() == 0
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.label") == F.col("b.label"))
        .where("a.vec_id < b.vec_id")
        .selectExpr(
            "aggregate(zip_with(a.embedding, b.embedding, (x,y)->CAST(x*y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc,v)->acc+v)"
            " / (sqrt(aggregate(a.embedding, CAST(0.0 AS DOUBLE), (acc,v)->acc+CAST(v*v AS DOUBLE)))"
            " * sqrt(aggregate(b.embedding, CAST(0.0 AS DOUBLE), (acc,v)->acc+CAST(v*v AS DOUBLE)))) AS cos"
        )
    )
    assert pairs.where("cos > 0.99").count() >= 5
    emb.unpersist()

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship KG-construction query on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §2 (+ the training-data-pipeline extras), each Spark query paired
with an ANSI-SQL oracle that DuckDB runs on the same parquet views.

Engine-portability conventions used throughout (so value hashes match):
* money aggregates in integer cents via FLOOR(x*100 + 0.5) (per-row double
  ops are IEEE-deterministic; FLOOR semantics agree across engines, unlike
  double->int casts or SUM(double) orderings);
* floats rounded AFTER exact integer/decimal aggregation;
* arrays rendered as comma-joined sorted strings;
* timestamps compared as epoch microseconds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Spread a local fixture scan across cores.

    The driver-generated test parquet files are single-row-group, so Spark
    reads each as ONE task no matter what maxPartitionBytes says — fine for
    cheap scans, serial death for compute-heavy operators (hashing, n-gram
    explosion, dot products).  Production tables have row-group-sized splits
    and parallelize at scan time; this repartition exists only to give the
    local fixtures the same property.  Semantics-neutral (row order never
    reaches results: every query aggregates, ranks, or sorts)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def _us(col: str) -> F.Column:
    """Epoch microseconds from a (naive) parquet timestamp; the session TZ is
    pinned UTC so TIMESTAMP_NTZ -> TIMESTAMP preserves the wall-clock epoch,
    matching DuckDB's epoch_us."""
    return F.unix_micros(F.col(col).cast("timestamp"))


# ---------------------------------------------------------------------------
# flagship: KG melt -> mention detection -> valuable filter -> dict view
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: treat `documents` as web
    pages, melt typed fields to (subj, pred, obj) triples, run keyword
    mention detection, keep only mention-bearing docs (valuable filter), and
    aggregate the dict view — the reference pipeline's shape end-to-end."""
    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")

    mentions = docs.select(
        F.col("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("(spark|window|merge|batch)"), F.lit(1))
        ).alias("kw"),
    )
    triples = (
        docs.selectExpr(
            "doc_id",
            "stack(3, 'source', source, 'lang', lang, 'n_chars', CAST(n_chars AS STRING)) AS (pred, obj)",
        )
        .unionByName(
            mentions.groupBy("doc_id", "kw")
            .count()
            .select(
                "doc_id",
                F.concat(F.lit("mentions_"), F.col("kw")).alias("pred"),
                F.col("count").cast("string").alias("obj"),
            )
        )
    )
    valuable = triples.join(
        triples.where(F.col("pred").startswith("mentions_")).select("doc_id").distinct(),
        on="doc_id",
        how="left_semi",
    )
    return (
        valuable.groupBy("doc_id", "pred")
        .agg(F.concat_ws(",", F.sort_array(F.collect_set("obj"))).alias("values"))
        .orderBy("doc_id", "pred")
    )


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------

_CENTS = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
_DISC_PCT = "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)"
_TAX_PCT = "CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)"


def q_kg_triples_melt(spark, sf_dir):
    """Fact explode: wide row -> long (subj, pred, obj) — facts/core.py:96-112."""
    return _t(spark, sf_dir, "documents").selectExpr(
        "CAST(doc_id AS BIGINT) AS subj",
        "stack(3, 'source', source, 'lang', lang, 'n_chars', CAST(n_chars AS STRING)) AS (pred, obj)",
    )


def q_kg_dict_view(spark, sf_dir):
    """Dict-view aggregation: sorted-distinct value list per key
    (facts/core.py:128-133)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias("event_types"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )


def q_kg_valuable_filter(spark, sf_dir):
    """Valuable semi-join: keep docs whose text mentions a keyword
    (facts/core.py:121-123 shape)."""
    docs = _t(spark, sf_dir, "documents")
    triples = docs.selectExpr(
        "CAST(doc_id AS BIGINT) AS subj",
        "stack(2, 'text', text, 'lang', lang) AS (pred, obj)",
    )
    flagged = triples.where(
        (F.col("pred") == "text") & F.col("obj").contains("spark")
    ).select("subj").distinct()
    return (
        triples.join(flagged, on="subj", how="left_semi")
        .groupBy("subj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triples"))
    )


def q_kg_mention_detection(spark, sf_dir):
    """Batched mention detection: regexp findall + explode + count."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.explode(
                F.regexp_extract_all(
                    F.col("text"), F.lit("(spark|window|merge|batch)"), F.lit(1)
                )
            ).alias("mention"),
        )
        .groupBy("doc_id", "mention")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_times"))
    )


def q_kg_entity_link(spark, sf_dir):
    """Entity linking: mentions joined to a broadcast gazetteer."""
    docs = _t(spark, sf_dir, "documents")
    gaz = spark.createDataFrame(
        [
            ("spark", "entity:engine/spark", "engine"),
            ("window", "entity:op/window", "operator"),
            ("merge", "entity:op/merge", "operator"),
        ],
        "mention string, canonical_uri string, entity_type string",
    )
    mentions = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("(spark|window|merge)"), F.lit(1))
        ).alias("mention"),
    ).distinct()
    return mentions.join(F.broadcast(gaz), on="mention").select(
        "doc_id", "mention", "canonical_uri", "entity_type"
    )


def q_kg_canonicalize_salted(spark, sf_dir):
    """Two-phase salted canonicalization == plain GROUP BY (oracle)."""
    docs = _t(spark, sf_dir, "documents")
    mentions = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit("(spark|window|merge|batch)"), F.lit(1))
        ).alias("mention"),
    )
    salted = mentions.withColumn("salt", F.pmod(F.col("doc_id"), F.lit(16)))
    partial = salted.groupBy("mention", "salt").agg(
        F.count(F.lit(1)).alias("cnt"), F.countDistinct("doc_id").alias("docs_partial")
    )
    return partial.groupBy("mention").agg(
        F.sum("cnt").cast("bigint").alias("n_mentions"),
        F.sum("docs_partial").cast("bigint").alias("n_docs"),
    )


def q_kg_counterpart_join(spark, sf_dir):
    """Counterpart-match shape (facts/learn.py:105-125): event-reporting rows
    joined to counterpart rows on the shared key with a difference filter."""
    ev = _t(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("err_ts")
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("clk_ts")
    )
    return (
        err.join(clk, on="user_id")
        .where(F.col("err_ts") < F.col("clk_ts"))
        .groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


def q_kg_reaction_pivot(spark, sf_dir):
    """GRB-reaction shape (facts/learn.py:142-156): same-subject multi-
    predicate pivot with a t0 != date filter."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy(F.col("user_id").cast("bigint").alias("user_id")).agg(
        F.min(F.when(F.col("event_type") == "error", F.col("ts"))).alias("first_error"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
    )
    return agg.where(
        F.col("first_error").isNotNull()
        & F.col("first_click").isNotNull()
        & (F.col("first_error") != F.col("first_click"))
    ).select(
        "user_id",
        _us("first_error").alias("first_error_us"),
        _us("first_click").alias("first_click_us"),
    )


def q_json_extract(spark, sf_dir):
    """JSON side-payload navigation (facts/gcn.py:167-172 shape)."""
    return _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


def q_sessionize_window(spark, sf_dir):
    """Window functions: per-user session counting via lag gaps > 5 min."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        (
            F.col("prev_ts").isNull()
            | ((_us("ts") - _us("prev_ts")) > 300_000_000)
        ).cast("int"),
    )
    return gaps.groupBy(F.col("user_id").cast("bigint").alias("user_id")).agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


def q_tpch_q1_pricing(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    li = li.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "CAST(l_quantity AS BIGINT) AS qty",
        f"{_CENTS} AS cents",
        f"{_DISC_PCT} AS dpct",
        f"{_TAX_PCT} AS tpct",
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").cast("bigint").alias("sum_qty"),
            F.sum("cents").cast("bigint").alias("sum_base_cents"),
            F.sum(F.col("cents") * (100 - F.col("dpct"))).cast("bigint").alias("sum_disc_c4"),
            F.sum(F.col("cents") * (100 - F.col("dpct")) * (100 + F.col("tpct")))
            .cast("bigint")
            .alias("sum_charge_c6"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
    )


def q_tpch_q3_shipping(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1997-01-01"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1997-01-01"))
    li = li.selectExpr("l_orderkey", f"{_CENTS} AS cents", f"{_DISC_PCT} AS dpct")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
        )
        .agg(F.sum(F.col("cents") * (100 - F.col("dpct"))).cast("bigint").alias("revenue_c4"))
    )
    return j.orderBy(F.desc("revenue_c4"), F.asc("l_orderkey")).limit(10)


def q_tpch_q5_local_supplier(spark, sf_dir):
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_suppkey", f"{_CENTS} AS cents", f"{_DISC_PCT} AS dpct"
    )
    supp = _t(spark, sf_dir, "supplier")
    j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy(F.col("n_name").alias("n_name")).agg(
        F.sum(F.col("cents") * (100 - F.col("dpct"))).cast("bigint").alias("revenue_c4")
    )


def q_top_parts_by_qty(spark, sf_dir):
    """Sort/limit/top-k with joins (broadcast dim)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    top = (
        li.groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            F.col("p_name"),
            F.col("total_qty"),
        )
    )
    return top.orderBy(F.desc("total_qty"), F.asc("p_partkey")).limit(10)


def q_tpch_q6_forecast(spark, sf_dir):
    """TPC-H Q6 shape: single-table filtered aggregate, integer-cents."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).selectExpr(f"{_CENTS} AS cents", f"{_DISC_PCT} AS dpct")
    return f.agg(
        F.sum(F.col("cents") * F.col("dpct")).cast("bigint").alias("revenue_c4"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


def q_rollup_orders(spark, sf_dir):
    """Grouping sets: ROLLUP(status, priority) with subtotal rows."""
    orders = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus",
        "o_orderpriority",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
    )
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


def q_anti_join_inactive_customers(spark, sf_dir):
    """Anti join: customers with no orders, counted per market segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey"))
    inactive = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return inactive.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_inactive")
    )


def q_topk_orders_per_priority(spark, sf_dir):
    """Window top-k per group (row_number with deterministic tie-break)."""
    orders = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_orderpriority",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("cents"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            "cents",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def q_percentiles_by_flag(spark, sf_dir):
    """Exact percentiles (linear interpolation — Spark percentile() and
    DuckDB quantile_cont agree bit-exactly on the same doubles)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("qty_p50"),
    )


def q_set_ops_union_distinct(spark, sf_dir):
    """Set operators: union + distinct over key spaces."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    a = orders.select(F.col("o_custkey").cast("bigint").alias("key"))
    b = cust.select(F.col("c_custkey").cast("bigint").alias("key"))
    return a.union(b).distinct().groupBy((F.col("key") % 10).alias("key_mod")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )


def q_dedup_exact(spark, sf_dir):
    from literature_to_facts_spark.datapipe.dedup import exact_duplicate_clusters

    docs = _t(spark, sf_dir, "documents")
    clusters = (
        docs.select(F.col("doc_id").cast("bigint").alias("doc_id"), F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
            F.min("doc_id").cast("bigint").alias("canonical_id"),
        )
    )
    _ = exact_duplicate_clusters  # same operator, >=2 filter variant in datapipe
    return clusters


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard over the FULL table (the round-1 doc_id<60 fence
    is gone — the hot-shingle df_cap now bounds the shared-shingle join)."""
    from literature_to_facts_spark.datapipe.dedup import ngram_jaccard_pairs

    docs = _spread(_t(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(docs, n_gram=2, threshold=0.08, df_cap=100)
    return pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup pairs.  Full SQL oracle: the md5-derived hash
    family is computed identically by DuckDB, so candidate generation,
    banding, the oversize fallback and Jaccard verification are all checked
    end-to-end (rows+schema+hash), not just 'ran'."""
    from literature_to_facts_spark.datapipe.dedup import minhash_lsh_pairs

    docs = _spread(_t(spark, sf_dir, "documents"))
    # 16 hashes x 4 bands (band width 4 == the classic 32x8 setup, so the
    # same candidate S-curve per band; half the hash/aggregate volume)
    pairs = minhash_lsh_pairs(docs, threshold=0.5, n_hashes=16, bands=4)
    return pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )


def q_dedup_minhash_incremental(spark, sf_dir):
    """Delta dedup (datapipe/dedup.minhash_lsh_pairs_incremental): the new
    batch (doc_id % 5 == 0, a ~20% daily delta) pairs against the persisted
    band index of the rest of the corpus — new×new + new×old only, never
    re-pairing old×old.  Full SQL oracle: DuckDB recomputes the FULL-corpus
    pair set with the identical md5 hash family and restricts it to pairs
    touching a new doc, which is exactly the incremental contract."""
    from literature_to_facts_spark.datapipe.dedup import (
        build_lsh_band_index,
        minhash_lsh_pairs_incremental,
    )

    docs = _spread(_t(spark, sf_dir, "documents"))
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    # NOTE (round 7): a shared one-build band index (build over ALL docs,
    # persist, filter the halves — the q_dedup_simhash_incremental shape)
    # was tried here and REVERTED: for this operator the two half-pipelines
    # overlap under AQE and share JIT with the preceding dedup_minhash_lsh
    # plan, so the persist's serialization cost exceeded the saved compute
    # (one-shot +0.5 s, warm -0.1 s over interleaved probe runs).  The
    # operator still accepts new_index= for deployments with a persisted
    # catalog index.
    idx = build_lsh_band_index(old, n_gram=3, n_hashes=16, bands=4)
    reg = []
    pairs = minhash_lsh_pairs_incremental(
        new, old, idx, n_gram=3, n_hashes=16, bands=4, threshold=0.5,
        cache_registry=reg,
    )
    out = pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )
    out._l2f_cache_registry = reg
    return out


def q_dedup_simhash(spark, sf_dir):
    """SimHash fingerprints (md5 bit votes — full SQL oracle)."""
    from literature_to_facts_spark.datapipe.dedup import with_simhash

    return with_simhash(_spread(_t(spark, sf_dir, "documents"))).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("simhash").cast("bigint").alias("simhash"),
    )


def q_dedup_simhash_pairs(spark, sf_dir):
    """Banded SimHash near-dup pairs (full SQL oracle)."""
    from literature_to_facts_spark.datapipe.dedup import simhash_near_dups

    pairs = simhash_near_dups(_spread(_t(spark, sf_dir, "documents")), max_hamming=8)
    return pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("bigint").alias("hamming"),
    )


def q_dedup_simhash_incremental(spark, sf_dir):
    """Delta SimHash dedup (datapipe/dedup.simhash_near_dups_incremental):
    the new batch (doc_id % 5 == 0) pairs against the persisted fingerprint
    index — hamming comes straight from indexed fingerprints, zero text
    access for the history.  Full SQL oracle: DuckDB recomputes the
    full-corpus banded pair set and restricts to pairs touching a new doc."""
    from literature_to_facts_spark.datapipe.dedup import (
        build_simhash_band_index,
        simhash_near_dups_incremental,
    )

    docs = _spread(_t(spark, sf_dir, "documents"))
    new = docs.where(F.col("doc_id") % 5 == 0)
    # ONE simhash-flag pipeline over the whole corpus, filtered into the
    # history and batch indexes (per-doc deterministic — same shared-build
    # shape as q_dedup_minhash_incremental; persist stands in for the
    # operational catalog table)
    full_idx = build_simhash_band_index(docs).persist()
    idx = full_idx.where(F.col("doc_id") % 5 != 0)
    nidx = full_idx.where(F.col("doc_id") % 5 == 0)
    reg = [full_idx]
    pairs = simhash_near_dups_incremental(
        new, old_index=idx, max_hamming=8, cache_registry=reg, new_index=nidx
    )
    out = pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("hamming").cast("bigint").alias("hamming"),
    )
    out._l2f_cache_registry = reg
    return out


def q_emb_cosine_topk(spark, sf_dir):
    from literature_to_facts_spark.datapipe.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = cosine_topk_bruteforce(emb, queries, k=5)
    return out.select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.round("cosine", 4).cast("double").alias("cosine_r4"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def q_emb_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN.  Full SQL oracle: the hyperplane constants are
    inlined into the generated oracle SQL, so bucketing + scoring + ranking
    are checked end-to-end."""
    from literature_to_facts_spark.datapipe.similarity import cosine_topk_lsh

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = cosine_topk_lsh(spark, emb, queries, k=5, n_planes=6)
    return out.select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.round("cosine", 4).cast("double").alias("cosine_r4"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def q_emb_ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe LSH ANN: 8 planes (tighter buckets — the corpus-scale
    setting) + 2 margin-ordered Hamming-1 probes per query recovering the
    recall the extra planes cost.  Full SQL oracle: plane constants AND the
    margin-ordered flip computation are inlined/regenerated in DuckDB."""
    from literature_to_facts_spark.datapipe.similarity import cosine_topk_lsh

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = cosine_topk_lsh(spark, emb, queries, k=5, n_planes=8, multiprobe=2)
    return out.select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.round("cosine", 4).cast("double").alias("cosine_r4"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def _ann_lsh_multiprobe_oracle(
    k: int = 5, n_planes: int = 8, multiprobe: int = 2, dim: int = 64, seed: int = 7
) -> str:
    from literature_to_facts_spark.datapipe.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    lits = ["[" + ", ".join(str(x) for x in p) + "]::DOUBLE[]" for p in planes]
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product({lit}, e) > 0 THEN {1 << i} ELSE 0 END)"
        for i, lit in enumerate(lits)
    )
    margins = ", ".join(
        f"{{'m': round(abs(list_dot_product({lit}, e)), 6), 'i': {i}}}"
        for i, lit in enumerate(lits)
    )
    return f"""
            WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                              embedding::DOUBLE[] AS e,
                              {bucket} AS bucket
                       FROM embeddings),
            q AS (SELECT vec_id AS q_id, e AS qe, bucket,
                         list_transform(
                           list_sort([{margins}])[1:{multiprobe}],
                           s -> xor(bucket, 1::BIGINT << s.i)) AS flips
                  FROM v WHERE vec_id < 3),
            probes AS (SELECT q_id, qe,
                              UNNEST(list_prepend(bucket, flips)) AS bucket
                       FROM q),
            scored AS (
              SELECT p.q_id, v.vec_id,
                     ROUND(list_dot_product(p.qe, v.e) /
                       (sqrt(list_dot_product(p.qe, p.qe)) *
                        sqrt(list_dot_product(v.e, v.e))), 6) AS c6
              FROM v JOIN probes p USING (bucket)
            )
            SELECT q_id, vec_id, ROUND(c6, 4) AS cosine_r4, CAST(rnk AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                               ORDER BY c6 DESC, vec_id ASC) AS rnk
                  FROM scored)
            WHERE rnk <= {k}
        """


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs (hyperplane-bucketed candidates +
    exact cosine verify).  Full SQL oracle with inlined plane constants —
    LSH recall does not weaken the check because the oracle replicates the
    bucketing itself."""
    from literature_to_facts_spark.datapipe.similarity import embedding_near_dup_pairs

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    pairs = embedding_near_dup_pairs(emb, threshold=0.4, n_planes=4)
    return pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.round("cosine", 4).cast("double").alias("cosine_r4"),
    )


def q_dedup_embedding_incremental(spark, sf_dir):
    """Delta embedding near-dup (datapipe/similarity.
    embedding_near_dup_pairs_incremental): the new batch (vec_id % 5 == 0)
    pairs against the persisted hyperplane-bucket index — the fourth
    probe-shaped delta family.  Full SQL oracle: DuckDB recomputes the
    full-corpus bucketed pair set (inlined plane constants) and restricts
    to pairs touching a new vector."""
    from literature_to_facts_spark.datapipe.similarity import (
        build_embedding_bucket_index,
        embedding_near_dup_pairs_incremental,
    )

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    new = emb.where(F.col("vec_id") % 5 == 0)
    old = emb.where(F.col("vec_id") % 5 != 0)
    # shared bucket-index build over the whole corpus, filtered into the
    # two halves (per-row deterministic — same shape as the other two
    # incremental wrappers)
    full_idx = build_embedding_bucket_index(emb, n_planes=4).persist()
    idx = full_idx.where(F.col("vec_id") % 5 != 0)
    nidx = full_idx.where(F.col("vec_id") % 5 == 0)
    reg = [full_idx]
    pairs = embedding_near_dup_pairs_incremental(
        new, old, idx, threshold=0.4, n_planes=4,
        cache_registry=reg, new_index=nidx,
    )
    out = pairs.select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.round("cosine", 4).cast("double").alias("cosine_r4"),
    )
    out._l2f_cache_registry = reg
    return out


def q_stream_windowed_counts(spark, sf_dir):
    """The streaming watermarked windowed-agg operator (streaming/stateful)
    run in batch mode: tumbling 1h event-time windows over warc_ts.  The
    exact same definition serves readStream (watermark active) and this
    oracle check (batch ignores the watermark)."""
    from literature_to_facts_spark.streaming.stateful import windowed_doc_counts

    out = windowed_doc_counts(
        _t(spark, sf_dir, "events"), "1 hour", "2 hours",
        ts_col="ts", key_col="event_type",
    )
    return out.select(
        F.unix_micros(F.col("win_start").cast("timestamp")).alias("win_start_us"),
        F.col("key").alias("event_type"),
        F.col("n_docs").cast("bigint").alias("n_events"),
    )


def q_emb_ann_ivf(spark, sf_dir):
    """IVF-flat ANN: deterministic hash-sampled seed centroids + one Lloyd
    refinement pass (full SQL oracle — centroid choice, the refinement's
    fixed-point per-dimension means, assignment, probing and ranking all
    mirrored)."""
    from literature_to_facts_spark.datapipe.similarity import cosine_topk_ivf

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = cosine_topk_ivf(emb, queries, k=5, n_centroids=8, nprobe=3, refine_iters=1)
    return out.select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.round("cosine", 4).cast("double").alias("cosine_r4"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def q_emb_ann_ivf_incremental(spark, sf_dir):
    """Incremental IVF (datapipe/similarity.build_ivf_index /
    ivf_index_append / cosine_topk_ivf_from_index — the sixth delta
    family): centroids train on HISTORY only (vec_id % 5 != 0) and freeze;
    the batch quantizes against them map-side (history never re-read);
    queries probe the combined inverted lists.  Full SQL oracle via
    _ann_ivf_oracle(train_restrict=...) — training, append-assignment,
    probing and ranking all recomputed."""
    from literature_to_facts_spark.datapipe.similarity import (
        build_ivf_index,
        cosine_topk_ivf_from_index,
        ivf_index_append,
    )

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    hist = emb.where(F.col("vec_id") % 5 != 0)
    batch = emb.where(F.col("vec_id") % 5 == 0)
    centroids, hist_idx = build_ivf_index(hist, n_centroids=8)
    idx = hist_idx.unionByName(ivf_index_append(batch, centroids))
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = cosine_topk_ivf_from_index(idx, centroids, queries, k=5, nprobe=3)
    return out.select(
        F.col("q_id").cast("bigint").alias("q_id"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.round("cosine", 4).cast("double").alias("cosine_r4"),
        F.col("rank").cast("bigint").alias("rank"),
    )


def q_dedup_clusters_cc(spark, sf_dir):
    """Near-dup PAIRS merged into duplicate CLUSTERS via connected
    components (min-label propagation + pointer jumping, O(log diameter)
    iterations — datapipe/dedup.connected_components).  Pairs alone
    under-delete: {a,b},{b,c} must collapse to {a,b,c} with one canonical
    representative.  Full SQL oracle: DuckDB recomputes the identical
    MinHash-LSH pair set AND the reachability closure (recursive CTE), so
    the whole pairs->clusters chain is checked end-to-end.

    NOTE: unlike the other (lazy) contract queries, calling this executes
    the closure eagerly — iterative fixpoints need per-round actions (same
    contract as GraphFrames CC); the returned DataFrame selects over the
    final checkpointed labels."""
    from literature_to_facts_spark.datapipe.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    docs = _spread(_t(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(docs, threshold=0.5, n_hashes=16, bands=4)
    cc = connected_components(pairs)
    return cc.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_rep").cast("bigint").alias("cluster_rep"),
    )


def q_dedup_clusters_cc_incremental(spark, sf_dir):
    """Delta closure (datapipe/dedup.connected_components_incremental): the
    pairs touching the new batch (doc_id % 5 == 0) fold into the persisted
    (doc_id, cluster_rep) map — only components touched by the batch are
    re-labeled; the ever-growing pair archive is never re-closed.  Full SQL
    oracle: DuckDB recomputes the recursive-CTE closure over ALL pairs and
    restricts it to components containing a new-pair endpoint — exactly the
    delta contract.  EAGER (two CC fixpoints: the seeded state + the delta)."""
    from literature_to_facts_spark.datapipe.dedup import (
        connected_components,
        connected_components_incremental,
        minhash_lsh_pairs,
    )

    docs = _spread(_t(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(docs, threshold=0.5, n_hashes=16, bands=4).persist()
    touching = (F.col("id_a") % 5 == 0) | (F.col("id_b") % 5 == 0)
    state = connected_components(pairs.where(~touching))
    out = connected_components_incremental(pairs.where(touching), state)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_rep").cast("bigint").alias("cluster_rep"),
    )


def q_dedup_exact_incremental(spark, sf_dir):
    """Delta exact dedup (datapipe/dedup.exact_duplicate_clusters_incremental):
    clusters of old+new restricted to clusters containing a new doc AND of
    size >= 2 (full-mode contract — fresh unique docs emit nothing), computed
    against the persisted (doc_id, text_hash) index — historical text never
    read.  The testdata has no byte-identical texts, so the corpus is the
    documents table plus a deterministic shifted-id copy of every 7th doc
    (the oracle injects the identical copies), making the output non-vacuous
    at every scale."""
    from literature_to_facts_spark.datapipe.dedup import (
        build_exact_hash_index,
        exact_duplicate_clusters_incremental,
    )

    base = _t(spark, sf_dir, "documents").select("doc_id", "text")
    docs = base.unionByName(
        base.where(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    out = exact_duplicate_clusters_incremental(new, build_exact_hash_index(old))
    return out.select(
        F.col("text_hash"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.col("canonical_id").cast("bigint").alias("canonical_id"),
        F.array_join(F.col("members"), ",").alias("members"),
    )


def q_dedup_corpus_purge(spark, sf_dir):
    """The shipped artifact of the whole dedup chain: the corpus with
    near-duplicates PURGED (datapipe/dedup.deduplicate_corpus) — MinHash-LSH
    pairs closed into clusters (connected components), each cluster keeps
    its minimum-id representative, unclustered docs all survive.  Full SQL
    oracle: DuckDB recomputes pairs + recursive-CTE closure and anti-selects
    the non-representative members.  EAGER (embeds the CC fixpoint)."""
    from literature_to_facts_spark.datapipe.dedup import (
        deduplicate_corpus,
        minhash_lsh_pairs,
    )

    docs = _spread(_t(spark, sf_dir, "documents"))
    pairs = minhash_lsh_pairs(docs, threshold=0.5, n_hashes=16, bands=4)
    kept = deduplicate_corpus(docs, pairs)
    return kept.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_dedup_corpus_keep_best(spark, sf_dir):
    """Quality-aware purge (datapipe/dedup.deduplicate_corpus_keep_best —
    the RefinedWeb-style policy): same MinHash-LSH pairs + CC closure as
    dedup_corpus_purge, but each cluster keeps its highest-quality member
    (exact (quality DESC, id ASC) argmax as a min-of-struct aggregate, no
    window).  Quality fixture: n_chars % 997 (integer-exact in both
    engines, with real ties exercising the id tie-break)."""
    from literature_to_facts_spark.datapipe.dedup import (
        deduplicate_corpus_keep_best,
        minhash_lsh_pairs,
    )

    docs = _spread(_t(spark, sf_dir, "documents")).withColumn(
        "quality", F.expr("cast(n_chars % 997 as double)")
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.5, n_hashes=16, bands=4)
    kept = deduplicate_corpus_keep_best(docs, pairs, quality_col="quality")
    return kept.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("lang").alias("lang"),
    )


def q_dedup_lsh_bucket_stats(spark, sf_dir):
    """The dedup-monitoring report that makes the LSH bucket cap a measured
    quantity instead of silent recall loss (datapipe/dedup.lsh_bucket_stats):
    bucket populations over the SAME banded union the pair job aggregates.
    Full SQL oracle — DuckDB recomputes the signatures, banding and counts.
    max_bucket is set low here so the oversize columns are exercised
    (non-zero) at test scale."""
    from literature_to_facts_spark.datapipe.dedup import lsh_bucket_stats

    docs = _spread(_t(spark, sf_dir, "documents"))
    out = lsh_bucket_stats(docs, n_hashes=16, bands=4, max_bucket=20)
    return out.select(
        F.col("n_buckets").cast("bigint").alias("n_buckets"),
        F.col("n_multi_buckets").cast("bigint").alias("n_multi_buckets"),
        F.col("n_oversize_buckets").cast("bigint").alias("n_oversize_buckets"),
        F.col("n_docs_in_oversize").cast("bigint").alias("n_docs_in_oversize"),
    )


def q_sample_token_budget(spark, sf_dir):
    """Token-budget mixture sampling (datapipe/sampling.
    sample_to_token_budget): per group, the deterministic hash-ordered
    document prefix whose cumulative whitespace-token count stays under the
    group's budget — the recipe form training mixtures are specified in.
    Bucketed boundary search (no per-group single-reducer window over the
    corpus); full SQL oracle computes the naive window prefix, which the
    implementation must equal row-for-row."""
    from literature_to_facts_spark.datapipe.sampling import sample_to_token_budget
    from literature_to_facts_spark.datapipe.textstats import with_token_counts

    docs = with_token_counts(
        _spread(_t(spark, sf_dir, "documents")).select("doc_id", "lang", "text")
    )
    out = sample_to_token_budget(
        docs, {"en": 5000, "de": 2000}, weight_col="n_ws_tokens"
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_curation_pipeline(spark, sf_dir):
    """The COMPOSED curation contract (datapipe/curation.curate_corpus):
    quality gate -> MinHash near-dup purge -> deterministic mixture sample,
    as one operator.  Full SQL oracle: the gated CTE, the pair generation
    (parametrized over the gated survivors), the recursive closure and the
    hash-threshold sample compose into a single DuckDB statement — exactly
    where column/contract drift between stages would surface.  EAGER
    (embeds the CC fixpoint)."""
    from literature_to_facts_spark.datapipe.curation import curate_corpus

    docs = _spread(_t(spark, sf_dir, "documents"))
    out = curate_corpus(
        docs,
        fractions={"en": 0.5, "de": 0.2},
        default_fraction=0.05,
        minhash_params=dict(n_gram=3, n_hashes=16, bands=4, threshold=0.5),
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_curation_pipeline_full(spark, sf_dir):
    """The COMPLETE curation chain (datapipe/curation.curate_corpus with
    every stage enabled): quality gate -> eval-set decontamination ->
    MinHash near-dup purge -> token-budget mixture — the end-to-end recipe
    a training corpus actually ships through, as ONE operator with ONE
    composed DuckDB oracle (gated CTE + broadcast-gram decontam + pair
    generation over the survivors + recursive closure + window-prefix
    budget, nested into a single statement).  EAGER (embeds the CC
    fixpoint)."""
    from literature_to_facts_spark.datapipe.curation import curate_corpus
    from literature_to_facts_spark.datapipe.textstats import with_token_counts

    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "lang", "text")
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = with_token_counts(docs.where(F.col("doc_id") % 17 != 0))
    out = curate_corpus(
        tr,
        minhash_params=dict(n_gram=3, n_hashes=16, bands=4, threshold=0.5),
        eval_docs=ev,
        decontam_params=dict(n_gram=4, min_overlap=1),
        token_budgets={"en": 3000, "de": 1200},
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_curation_pipeline_cleaned(spark, sf_dir):
    """The cleaned curation chain (round 5): sentence-per-line synthesis with
    planted PII -> cross-document line dedup -> PII masking -> quality gate
    -> MinHash closure purge -> hash-fraction mixture sample, all inside
    datapipe/curation.curate_corpus (line_dedup_params + pii=True) — and all
    recomputed by ONE composed DuckDB oracle.  Boilerplate removal precedes
    the gate and the signatures (it changes both), masking precedes the
    gate so the shipped sample is redacted.  EAGER (embeds the CC
    fixpoint)."""
    from literature_to_facts_spark.datapipe.curation import curate_corpus

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        "lang",
        "concat(replace(text, '. ', concat('.', chr(10))),"
        f" {_PII_SUFFIX_SPARK}) AS text",
    )
    out = curate_corpus(
        docs,
        fractions={"en": 0.5, "de": 0.2},
        default_fraction=0.05,
        minhash_params=dict(n_gram=3, n_hashes=16, bands=4, threshold=0.5),
        line_dedup_params=dict(
            min_df=_LINE_DEDUP_MIN_DF, min_line_chars=_LINE_DEDUP_MIN_CHARS
        ),
        pii=True,
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_sample_hash_fraction(spark, sf_dir):
    """Zero-shuffle deterministic mixture sampling: per-group keep fractions
    via a portable hash filter (datapipe/sampling.sample_fraction_by_group).
    Full SQL oracle — DuckDB recomputes the identical hash buckets."""
    from literature_to_facts_spark.datapipe.sampling import sample_fraction_by_group

    docs = _t(spark, sf_dir, "documents")
    out = sample_fraction_by_group(
        docs, {"en": 0.5, "de": 0.2}, group_col="lang", default_fraction=0.05
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_sample_stratified_topn(spark, sf_dir):
    """Exact-n-per-group deterministic sampling (hash-order window rank).
    Full SQL oracle."""
    from literature_to_facts_spark.datapipe.sampling import sample_topn_per_group

    docs = _t(spark, sf_dir, "documents")
    out = sample_topn_per_group(docs, n=7, group_col="lang")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_events_asof_join(spark, sf_dir):
    """Backward as-of join (datapipe/joins.asof_join): each purchase event
    attaches the user's most recent click at-or-before it — the temporal
    join Spark lacks natively, re-expressed as one union + one key shuffle +
    a running last() sweep (no row multiplication).  Full SQL oracle via
    DuckDB's native ASOF LEFT JOIN.  The right side is pre-deduped to one
    row per (user, ts) — max event_id — so tie semantics are engine-defined
    on both sides."""
    from literature_to_facts_spark.datapipe.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["click_event_id"], suffix="_r",
    )
    # inner-ASOF for the contract query: the compare harness sorts row
    # tuples, and NULLs from unmatched left rows are not orderable there
    out = out.where(F.col("click_event_id_r").isNotNull())
    return out.select(
        F.col("event_id").cast("bigint").alias("event_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("click_event_id_r").cast("bigint").alias("click_event_id"),
        F.unix_micros(F.col("ts_r")).alias("click_ts_us"),
    )


def q_events_interval_join(spark, sf_dir):
    """Range join (datapipe/joins.interval_join): clicks attributed to the
    [purchase - 1 hour, purchase) window of the same user — bucketed
    equi-join + exact residual predicate instead of the quadratic
    BroadcastNestedLoopJoin Spark plans for a bare BETWEEN join.  Full SQL
    oracle (plain range-predicate join — DuckDB plans IEJoin for it)."""
    from literature_to_facts_spark.datapipe.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("win_start"),
        F.col("ts").alias("win_end"),
    )
    out = interval_join(
        clicks, windows, ts_col="ts", start_col="win_start", end_col="win_end",
        on="user_id", bucket_seconds=3600,
    )
    return out.select(
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        F.col("click_id").cast("bigint").alias("click_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("click_ts_us"),
    )


def q_text_token_counts(spark, sf_dir):
    from literature_to_facts_spark.datapipe.textstats import with_token_counts

    return with_token_counts(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_ws_tokens").cast("bigint").alias("n_ws_tokens"),
        F.col("n_bpeish_tokens").cast("bigint").alias("n_bpeish_tokens"),
    )


def q_text_quality(spark, sf_dir):
    from literature_to_facts_spark.datapipe.textstats import with_quality

    return with_quality(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round("mean_word_len", 6).cast("double").alias("mean_word_len"),
        F.round("stopword_ratio", 6).cast("double").alias("stopword_ratio"),
        F.col("quality_score").cast("double").alias("quality_score"),
    )


def q_text_quality_filter(spark, sf_dir):
    """Gopher-style quality gate: keep/drop with an auditable first-failing-
    rule reason code (datapipe/textstats.quality_filter).  Narrow plan, no
    shuffle.  Full SQL oracle (thresholds compare rounded ratios on both
    engines, so the decision is bit-portable)."""
    from literature_to_facts_spark.datapipe.textstats import quality_filter

    out = quality_filter(_t(spark, sf_dir, "documents"))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("keep").cast("boolean").alias("keep"),
        F.col("drop_reason").alias("drop_reason"),
    )


def q_text_quality_report(spark, sf_dir):
    """Per-reason drop-count report over the quality gate — the operational
    artifact corpus curation actually reviews (COVERAGE.md sells "per-reason
    drop counts"; this makes the report itself contract-tested).  Kept docs
    group under 'kept' (the compare harness cannot sort NULL tuples).  One
    narrow scan + one tiny aggregate."""
    from literature_to_facts_spark.datapipe.textstats import quality_filter

    out = quality_filter(_t(spark, sf_dir, "documents"))
    return out.groupBy(
        F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("reason")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))


def q_text_lang_id(spark, sf_dir):
    from literature_to_facts_spark.datapipe.textstats import with_lang_id

    return with_lang_id(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang_guess")
    )


def q_text_lang_trigram(spark, sf_dir):
    """Char-trigram language ID (datapipe/textstats.lang_id_trigram_scores):
    explode trigrams map-side, broadcast join the 175-row disjoint model
    table, one partial-aggregated groupBy per doc (the only Exchange is one
    row per document).  Integer weight sums — bit-portable; the oracle
    recomputes the full pipeline from the same model literals."""
    from literature_to_facts_spark.datapipe.textstats import (
        TRIGRAM_LANGS,
        lang_id_trigram_scores,
    )

    out = lang_id_trigram_scores(_spread(_t(spark, sf_dir, "documents")))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tri",
        *[f"score_{lg}" for lg in TRIGRAM_LANGS],
        "lang_trigram",
    )


def _lang_trigram_oracle_sql() -> str:
    """DuckDB oracle for q_text_lang_trigram, generated from the SAME
    LANG_TRIGRAMS literals the operator uses (model drift breaks the round,
    not silently)."""
    from literature_to_facts_spark.datapipe.textstats import (
        LANG_TRIGRAMS,
        TRIGRAM_LANGS,
    )

    vals = ", ".join(
        f"('{t}', '{lg}', {w})"
        for lg, d in LANG_TRIGRAMS.items()
        for t, w in d.items()
    )
    score_cols = ",\n                 ".join(
        f"CAST(coalesce(sum(CASE WHEN lang = '{lg}' THEN w END), 0) AS BIGINT)"
        f" AS score_{lg}"
        for lg in TRIGRAM_LANGS
    )
    out_scores = ",\n               ".join(
        f"coalesce(s.score_{lg}, 0) AS score_{lg}" for lg in TRIGRAM_LANGS
    )
    # argmax with earlier-language tie wins (same chain as the operator)
    branches = []
    for i, lg in enumerate(TRIGRAM_LANGS):
        conds = [
            f"coalesce(s.score_{lg}, 0) >= coalesce(s.score_{other}, 0)"
            for other in TRIGRAM_LANGS[i + 1:]
        ] + [f"coalesce(s.score_{lg}, 0) > 0"]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lg}'")
    case = "CASE " + " ".join(branches) + " ELSE 'und' END"
    return rf"""
        WITH m(tri, lang, w) AS (VALUES {vals}),
        n AS (SELECT doc_id,
                     regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g') AS t
              FROM documents),
        tr AS (SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS tri
               FROM n, UNNEST(range(1, len(t) - 1)) AS u(i)
               WHERE t IS NOT NULL AND len(t) >= 3),
        j AS (SELECT tr.doc_id, m.lang, m.w FROM tr LEFT JOIN m ON tr.tri = m.tri),
        s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
                 {score_cols}
              FROM j GROUP BY doc_id)
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               coalesce(s.n_tri, 0) AS n_tri,
               {out_scores},
               {case} AS lang_trigram
        FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """


def q_decontam_pairs(spark, sf_dir):
    """Eval-set decontamination report (datapipe/decontam.
    contamination_pairs): training docs (doc_id % 17 != 0) sharing word
    4-grams with the eval split (doc_id % 17 == 0), with the shared-gram
    count per (train, eval) pair.  The eval gram set is broadcast — one
    pass over the training corpus, zero shuffle of it.  Full SQL oracle."""
    from literature_to_facts_spark.datapipe.decontam import contamination_pairs

    docs = _spread(_t(spark, sf_dir, "documents"))
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = docs.where(F.col("doc_id") % 17 != 0)
    out = contamination_pairs(tr, ev, n_gram=4, min_overlap=1)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("eval_id").cast("bigint").alias("eval_id"),
        F.col("n_shared_grams").cast("bigint").alias("n_shared_grams"),
    )


_BLOOM_PARAMS = dict(m_bits=1 << 16, k_hashes=5, n_gram=4)


def q_decontam_bloom(spark, sf_dir):
    """Constant-memory decontamination (datapipe/decontam.
    build_bloom_filter + bloom_contaminated): the eval split's 4-gram set
    folds into a 2^16-bit Bloom table (<= 1,041 bigint words — executor
    state independent of eval-corpus size); training grams probe it
    through k=5 reused BroadcastHashJoins with NO gram-level shuffle.
    The portable md5 hash family makes the filter — false positives
    included — bit-identical in DuckDB, so the oracle is exact."""
    from literature_to_facts_spark.datapipe.decontam import (
        bloom_contaminated,
        build_bloom_filter,
    )
    from literature_to_facts_spark.datapipe.dedup import _shingle_frame

    docs = _spread(_t(spark, sf_dir, "documents"))
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = docs.where(F.col("doc_id") % 17 != 0)
    ev_grams = _shingle_frame(
        ev.where(F.col("text").isNotNull()), "doc_id", "text",
        _BLOOM_PARAMS["n_gram"], explode=True,
    )
    bloom = build_bloom_filter(
        ev_grams, key_col="sh",
        m_bits=_BLOOM_PARAMS["m_bits"], k_hashes=_BLOOM_PARAMS["k_hashes"],
    )
    out = bloom_contaminated(tr, bloom, **_BLOOM_PARAMS)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_flagged_grams",
        "contaminated",
    )


def _decontam_bloom_oracle() -> str:
    """DuckDB replay of the Bloom build + probe: identical md5-derived
    positions, 63-bit words, bit_or aggregation, k-way hit conjunction."""
    from literature_to_facts_spark.datapipe.decontam import (
        BLOOM_WORD_BITS as WB,
    )

    m = _BLOOM_PARAMS["m_bits"]
    k = _BLOOM_PARAMS["k_hashes"]
    n = _BLOOM_PARAMS["n_gram"]

    def pos(key: str, i: int) -> str:
        return (
            f"(CAST('0x' || substr(md5('{i}:' || {key}), 1, 13) AS BIGINT)"
            f" % {m})"
        )

    gram_cte = f"""
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 unnest({_duck_shingles(n)}) AS sh
          FROM documents WHERE text IS NOT NULL"""
    ev_pos = " UNION ALL ".join(
        f"SELECT {pos('sh', i)} AS p FROM evg" for i in range(k)
    )
    probe_cols = ", ".join(
        f"{pos('sh', i)} // {WB} AS w{i}, "
        f"(CAST(1 AS BIGINT) << CAST({pos('sh', i)} % {WB} AS INTEGER))"
        f" AS mk{i}"
        for i in range(k)
    )
    joins = " ".join(
        f"LEFT JOIN bloom b{i} ON g.w{i} = b{i}.word_idx" for i in range(k)
    )
    hit = " AND ".join(f"(coalesce(b{i}.bits, 0) & g.mk{i}) <> 0" for i in range(k))
    return f"""
        WITH evg AS (
          SELECT doc_id, sh FROM ({gram_cte}) WHERE doc_id % 17 = 0
        ),
        positions AS ({ev_pos}),
        bloom AS (
          SELECT p // {WB} AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(p % {WB} AS INTEGER)) AS bits
          FROM positions GROUP BY 1
        ),
        trg AS (
          SELECT doc_id, sh FROM ({gram_cte}) WHERE doc_id % 17 <> 0
        ),
        g AS (SELECT doc_id, {probe_cols} FROM trg),
        flags AS (
          SELECT g.doc_id,
                 CAST(sum(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT)
                   AS nf
          FROM g {joins}
          GROUP BY g.doc_id
        )
        SELECT doc_id, nf AS n_flagged_grams, nf >= 1 AS contaminated
        FROM flags
    """


def q_decontam_purge(spark, sf_dir):
    """The shipped decontamination artifact (datapipe/decontam.
    decontaminate): the training split minus every flagged doc.  Full SQL
    oracle (anti-select against the recomputed pair set)."""
    from literature_to_facts_spark.datapipe.decontam import decontaminate

    docs = _spread(_t(spark, sf_dir, "documents"))
    ev = docs.where(F.col("doc_id") % 17 == 0)
    tr = docs.where(F.col("doc_id") % 17 != 0)
    out = decontaminate(tr, ev, n_gram=4, min_overlap=1)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_text_repetition(spark, sf_dir):
    """Gopher-style intra-document repetition signals (datapipe/textstats.
    with_repetition): duplicate-word fraction, duplicate-bigram fraction,
    top-word dominance — the boilerplate/degenerate-text filters
    cross-document dedup cannot see.  Pure per-row expressions; full SQL
    oracle."""
    from literature_to_facts_spark.datapipe.textstats import with_repetition

    out = with_repetition(_spread(_t(spark, sf_dir, "documents")), n_gram=2)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("dup_word_frac").cast("double").alias("dup_word_frac"),
        F.col("dup_ngram_frac").cast("double").alias("dup_ngram_frac"),
        F.col("top_word_frac").cast("double").alias("top_word_frac"),
    )


def q_text_fingerprint(spark, sf_dir):
    """Both fingerprint columns are independently oracled: fp_md5 (canonical
    content hash) AND fp_rolling (order-sensitive md5-family polynomial —
    round 5 swapped its xxhash64 for the portable hash family so DuckDB
    recomputes it too)."""
    from literature_to_facts_spark.datapipe.textstats import with_fingerprint

    return with_fingerprint(_t(spark, sf_dir, "documents")).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("fp_md5"),
        F.col("fp_rolling").cast("bigint").alias("fp_rolling"),
    )


# -- shared parameters for the round-5 text-cleaning / mixture queries: the
# -- generated oracles interpolate THESE SAME constants, so operator params
# -- and oracle SQL cannot drift (the CLAUDE.md sync invariant).
_LINE_DEDUP_MIN_DF = 2
_LINE_DEDUP_MIN_CHARS = 10
_MIXTURE_TOKEN_BUDGET = 200_000

# Deterministic PII synthesis: the corpus text carries no real PII, so the
# query plants one email + phone + IPv4 on every third document (engine-
# portable string ops only).  {c1}..{c4} are the engine's string-cast exprs.
_PII_SUFFIX = (
    "CASE WHEN doc_id % 3 = 0 THEN concat(' contact user', {c1}, "
    "'@example.com or +12 345-678-', lpad({c2}, 4, '0'), "
    "' ip 10.0.', {c3}, '.', {c4}) ELSE '' END"
)
_PII_SUFFIX_SPARK = _PII_SUFFIX.format(
    c1="cast(doc_id as string)",
    c2="cast(doc_id % 10000 as string)",
    c3="cast(doc_id % 256 as string)",
    c4="cast(doc_id % 250 as string)",
)
_PII_SUFFIX_DUCK = _PII_SUFFIX.format(
    c1="CAST(doc_id AS VARCHAR)",
    c2="CAST(doc_id % 10000 AS VARCHAR)",
    c3="CAST(doc_id % 256 AS VARCHAR)",
    c4="CAST(doc_id % 250 AS VARCHAR)",
)


def q_text_line_dedup(spark, sf_dir):
    """CCNet-style cross-document line dedup (datapipe/textclean.line_dedup):
    every line occurring in >= 2 distinct documents is removed from ALL of
    them; short lines (< 10 trimmed chars) never participate.  The corpus
    text is single-line, so the query first splits sentences onto lines
    (replace '. ' -> '.\\n' — engine-portable), giving the operator a real
    multi-line corpus with genuinely shared boilerplate sentences.  Full SQL
    oracle recomputes the md5-keyed frequency table end-to-end."""
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id", "replace(text, '. ', concat('.', chr(10))) AS text"
    )
    out = line_dedup(
        docs, min_df=_LINE_DEDUP_MIN_DF, min_line_chars=_LINE_DEDUP_MIN_CHARS
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "clean_text",
        "n_lines",
        "n_dropped",
    )


def q_text_line_dedup_grouped(spark, sf_dir):
    """Group-scoped (per-host) line dedup (datapipe/textclean.line_dedup
    with group_col): the site-template removal mode — a line frequent
    within ONE host's pages is boilerplate there, the same sentence on two
    unrelated hosts is content and survives.  Implemented by salting the
    md5 line key with the host (plan shape identical to global mode); the
    oracle recomputes the salted-key frequency table end-to-end."""
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        "concat('h', cast(doc_id % 4 as string)) AS host",
        "replace(text, '. ', concat('.', chr(10))) AS text",
    )
    out = line_dedup(
        docs,
        min_df=_LINE_DEDUP_MIN_DF,
        min_line_chars=_LINE_DEDUP_MIN_CHARS,
        group_col="host",
        carry_cols=("host",),
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "host",
        "clean_text",
        "n_lines",
        "n_dropped",
    )


def q_text_pii_redact(spark, sf_dir):
    """PII detection + masking (datapipe/textclean.pii_redact): emails, IPv4
    addresses and phone numbers counted on the original text and masked
    sequentially.  RE2-compatible ASCII regexes so Spark's java.util.regex
    and DuckDB's RE2 agree match-for-match; the PII itself is synthesized
    deterministically (every third doc).  Pure per-row expressions — zero
    shuffle."""
    from literature_to_facts_spark.datapipe.textclean import pii_redact

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"concat(text, {_PII_SUFFIX_SPARK}) AS text"
    )
    out = pii_redact(docs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_email",
        "n_ipv4",
        "n_phone",
        "has_pii",
        "clean_text",
    )


def q_text_line_dedup_incremental(spark, sf_dir):
    """Delta line dedup (datapipe/textclean.line_dedup_incremental — the
    fifth probe-shaped incremental family): the new batch (doc_id % 5 == 0)
    cleaned against COMBINED old+new line frequencies using only the
    persisted (line_key, df) index — history text never re-split.  Oracle =
    the full-corpus line dedup restricted to the new batch's ids."""
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup_incremental,
    )

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id", "replace(text, '. ', concat('.', chr(10))) AS text"
    )
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    idx = build_line_frequency_index(old, min_line_chars=_LINE_DEDUP_MIN_CHARS)
    out = line_dedup_incremental(
        new, idx, min_df=_LINE_DEDUP_MIN_DF, min_line_chars=_LINE_DEDUP_MIN_CHARS
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "clean_text",
        "n_lines",
        "n_dropped",
    )


_SPAN_DEDUP_WINDOW = 8
_SPAN_DEDUP_MIN_DF = 2

# corpus-vocabulary demo model for the quality-classifier contract query —
# ONE source of truth interpolated into both the Spark model DataFrame and
# the DuckDB VALUES clause (integer weights: bit-portable sums)
_QUALITY_CLF_MODEL = [
    ("the", 1), ("a", 1), ("data", 1), ("spark", 1), ("query", 1),
    ("slow", -2), ("dup", -2), ("batch", -1),
]


def q_text_span_dedup_incremental(spark, sf_dir):
    """Delta span dedup (datapipe/textclean.span_dedup_incremental — the
    seventh probe-shaped incremental family): the new batch (doc_id % 5 ==
    0) checked against COMBINED old+new window-occurrence counts using only
    the persisted (win_key, cnt) index — history text never re-windowed.
    Oracle = the full-corpus span dedup restricted to the new batch's
    ids."""
    from literature_to_facts_spark.datapipe.textclean import (
        build_window_frequency_index,
        span_dedup_incremental,
    )

    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 5 == 0)
    old = docs.where(F.col("doc_id") % 5 != 0)
    idx = build_window_frequency_index(old, window=_SPAN_DEDUP_WINDOW)
    out = span_dedup_incremental(
        new, idx, window=_SPAN_DEDUP_WINDOW, min_df=_SPAN_DEDUP_MIN_DF
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "n_windows",
        "n_dup_windows",
        "dup_tokens",
        "dup_frac",
    )


def q_sample_pack_sequences(spark, sf_dir):
    """Sequence packing (datapipe/sampling.pack_sequences — the GPT-style
    concat-and-split pretraining layout): each document's exclusive token
    prefix-sum in the canonical hash order, mapped to fixed-length training
    sequences.  The distributed two-phase cumsum (per-bucket windows over
    contiguous hash ranges + an n_buckets-row base-offset window) replaces
    the serialize-everything global window; the oracle recomputes with a
    plain global window — equality proves the decomposition exact."""
    from literature_to_facts_spark.datapipe.sampling import pack_sequences

    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    out = pack_sequences(docs, seq_len=512, n_buckets=8)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_toks",
        "global_start",
        F.col("seq_id").cast("bigint").alias("seq_id"),
        F.col("seq_end").cast("bigint").alias("seq_end"),
        "seq_offset",
    )


def q_source_quality_stats(spark, sf_dir):
    """Host/source-level curation (datapipe/textstats.source_stats — the
    RefinedWeb/Dolma domain-filter stage): per-source doc counts, corpus
    share and FIXED-POINT mean quality score with a keep decision (drop
    whole low-quality or over-represented sources).  The fixed-point mean
    (integer micro-unit sums) makes the per-source mean bit-portable, so
    the DuckDB oracle recomputes it exactly."""
    from literature_to_facts_spark.datapipe.textstats import source_stats

    docs = _spread(_t(spark, sf_dir, "documents")).select(
        "doc_id", "source", "text"
    )
    out = source_stats(docs, min_mean_quality=0.78, max_doc_share=0.5)
    return out.select(
        "source",
        "n_docs",
        "doc_share",
        F.col("mean_quality").cast("double").alias("mean_quality"),
        "keep",
    )


def q_text_quality_clf(spark, sf_dir):
    """Linear bag-of-tokens quality classifier
    (datapipe/textstats.quality_classifier — the fastText-linear shape of
    CCNet/LLaMA-style model-based quality filters): per-doc mean token
    weight under a broadcast (token, w) model table, keep-decision on the
    rounded score.  The model here is a corpus-vocabulary demo; the
    operator contract takes any learned model as a DataFrame."""
    from literature_to_facts_spark.datapipe.textstats import quality_classifier

    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    model = spark.createDataFrame(_QUALITY_CLF_MODEL, "token string, w int")
    out = quality_classifier(docs, model=model, threshold=0.0)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_toks",
        "w_sum",
        "clf_score",
        "clf_keep",
    )


def q_text_span_dedup(spark, sf_dir):
    """Duplicated-substring detection (datapipe/textclean.span_dedup —
    ExactSubstr dedup, Lee et al. 2021): every 8-token window occurring
    >= 2 times across the corpus is flagged; per-document output is the
    interval-union token coverage of the duplicated windows plus window
    counts.  Window keys use the portable md5 52-bit family, so the DuckDB
    oracle recomputes frequency AND coverage end-to-end bit-exactly."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup

    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    out = span_dedup(
        docs, window=_SPAN_DEDUP_WINDOW, min_df=_SPAN_DEDUP_MIN_DF
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_tokens",
        "n_windows",
        "n_dup_windows",
        "dup_tokens",
        "dup_frac",
    )


def q_corpus_snapshot_diff(spark, sf_dir):
    """Dataset versioning (datapipe/storage.snapshot_diff): added / removed /
    changed documents between two corpus snapshots, comparing only id + text
    hash (the text itself never flows through the join).  Snapshots are
    synthesized deterministically: old = doc_id % 11 != 0, new = doc_id %
    13 != 0 with every 7th doc's text perturbed.  Full SQL oracle (DuckDB
    FULL OUTER JOIN recomputes the same md5 hashes)."""
    from literature_to_facts_spark.datapipe.storage import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 11 != 0).select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 13 != 0)
        .selectExpr(
            "doc_id",
            "CASE WHEN doc_id % 7 = 0 THEN concat(text, ' v2') ELSE text END AS text",
        )
    )
    out = snapshot_diff(old, new)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "status",
        "old_hash",
        "new_hash",
    )


def q_kg_triples_delta(spark, sf_dir):
    """Incremental KG maintenance (engine/delta.delta_reextract): the new
    snapshot's mention triples from the OLD triple store + a snapshot diff
    + re-extraction of ONLY added/changed documents (changed docs gain a
    ' updated batch v2' suffix — which adds a 'batch' mention, so both
    failure modes are oracle-visible: keeping stale triples AND failing to
    re-extract).  The diff id sets broadcast, so the triple store is
    filtered at its scan with zero shuffle.  Oracle = full extraction over
    the new corpus (the from-scratch result the delta must equal)."""
    from literature_to_facts_spark.datapipe.storage import snapshot_diff
    from literature_to_facts_spark.engine.delta import delta_reextract

    docs = _spread(_t(spark, sf_dir, "documents"))
    old = docs.where(F.col("doc_id") % 11 != 0).select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 13 != 0).selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 7 = 0 THEN concat(text, ' updated batch v2')"
        " ELSE text END AS text",
    )

    def extract(d):
        return (
            d.select(
                F.col("doc_id").cast("bigint").alias("doc_id"),
                F.explode(
                    F.regexp_extract_all(
                        F.col("text"), F.lit("(spark|window|merge|batch)"), F.lit(1)
                    )
                ).alias("mention"),
            )
            .groupBy("doc_id", "mention")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_times"))
        )

    return delta_reextract(extract(old), snapshot_diff(old, new), new, extract)


def q_text_token_topk(spark, sf_dir):
    """Corpus heavy hitters (datapipe/textstats.token_topk): top-20 tokens
    by occurrence with document counts.  The Zipf-skewed token distribution
    is handled by map-side partial aggregation (the shuffle carries
    vocab-sized partials, not token instances) + TakeOrderedAndProject —
    no salting, no global sort.  Full SQL oracle; deterministic token
    tie-break."""
    from literature_to_facts_spark.datapipe.textstats import token_topk

    return token_topk(_spread(_t(spark, sf_dir, "documents")), k=20)


_ENCODE_VOCAB_K = 64


def q_text_tokenize_encode(spark, sf_dir):
    """Vocabulary encoding (datapipe/textstats.tokenize_encode, the
    broadcast_map strategy): the corpus' own top-64 tokens become the
    vocab (ids 1..64 by frequency, deterministic tie-break), documents
    encode to position-ordered id streams with OOV=0 — one Arrow-batched
    mapInPandas pass over a broadcast dict, ZERO shuffle (the join-method
    variant is regroup-tested equal in tests).  token_ids emit comma-
    joined (the array-hash parity convention)."""
    from pyspark.sql import Window

    from literature_to_facts_spark.datapipe.textstats import (
        token_topk,
        tokenize_encode,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = token_topk(docs, k=_ENCODE_VOCAB_K).withColumn(
        "token_id",
        F.row_number().over(
            Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
        ),
    )
    out = tokenize_encode(docs, vocab, oov_id=0)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.expr(
            "array_join(transform(token_ids, x -> cast(x as string)), ',')"
        ).alias("token_ids_csv"),
        "n_oov",
    )


def _tokenize_encode_oracle() -> str:
    k = _ENCODE_VOCAB_K
    return f"""
        WITH tk AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), s -> s <> '')
                   AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT token, count(*) AS n_occ
          FROM (SELECT unnest(toks) AS token FROM tk) GROUP BY 1
        ),
        vocab AS (
          SELECT token,
                 row_number() OVER (ORDER BY n_occ DESC, token ASC) AS tid
          FROM (SELECT token, n_occ FROM c
                ORDER BY n_occ DESC, token ASC LIMIT {k})
        ),
        p0 AS (
          SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM tk
        ),
        p AS (SELECT doc_id, i, toks[i] AS tok FROM p0),
        e AS (
          SELECT p.doc_id,
                 string_agg(CAST(coalesce(v.tid, 0) AS VARCHAR), ','
                            ORDER BY p.i) AS csv,
                 CAST(sum(CASE WHEN v.tid IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_oov
          FROM p LEFT JOIN vocab v ON p.tok = v.token
          GROUP BY p.doc_id
        )
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE coalesce(e.csv, '') END AS token_ids_csv,
               CASE WHEN d.text IS NULL THEN NULL
                    ELSE coalesce(e.n_oov, 0) END AS n_oov
        FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
    """


_BLOCKLIST_TERMS = ["merge", "batch"]


def q_text_blocklist_filter(spark, sf_dir):
    """C4-style token blocklist (datapipe/textstats.blocklist_filter):
    distinct blocked terms per doc + flag, exact-token case-insensitive
    matching (substring hits deliberately excluded).  Pure per-row
    expressions — zero shuffle; full SQL oracle (DuckDB list_intersect
    dedups exactly like Spark's array_intersect)."""
    from literature_to_facts_spark.datapipe.textstats import blocklist_filter

    out = blocklist_filter(_t(spark, sf_dir, "documents"), _BLOCKLIST_TERMS)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_blocked_terms",
        "blocked",
    )


def q_sample_mixture_weights(spark, sf_dir):
    """Temperature mixture reweighting (datapipe/sampling.mixture_weights,
    alpha=0.5): per-language token mass -> sqrt-temperature weight -> keep
    fraction under a total token budget.  IEEE-exact arithmetic only
    (sqrt + integer micro-units), so DuckDB recomputes the identical
    fractions."""
    from literature_to_facts_spark.datapipe.sampling import mixture_weights

    return mixture_weights(
        _t(spark, sf_dir, "documents"),
        token_budget=_MIXTURE_TOKEN_BUDGET,
        group_col="lang",
        weight_col="n_chars",
        alpha=0.5,
    ).select("lang", "n_docs", "n_tokens", "weight_micro", "sample_fraction")


def q_sample_mixture_temperature(spark, sf_dir):
    """The applied form of mixture_weights (datapipe/sampling.
    sample_by_temperature): the per-group fractions broadcast-join back onto
    the corpus as a deterministic hash filter — the corpus is never
    shuffled, and the recipe is one lazy plan (no driver collect)."""
    from literature_to_facts_spark.datapipe.sampling import sample_by_temperature

    out = sample_by_temperature(
        _t(spark, sf_dir, "documents"),
        token_budget=_MIXTURE_TOKEN_BUDGET,
        group_col="lang",
        id_col="doc_id",
        weight_col="n_chars",
        alpha=0.5,
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("lang").alias("lang")
    )


def q_multimodal_features(spark, sf_dir):
    """Multimodal decode lane (datapipe/multimodal.extract_media_features):
    a deterministic binary-column fixture (real BMP/PPM/WAV payloads plus
    truncated and compressed-magic rows) decoded to fixed-dim features via
    mapInPandas.  Features are fixed-pointed (1e5) for bit-portable
    comparison; the oracle regenerates the same payloads and decodes them
    row-at-a-time outside Spark — what the check pins is the distributed
    plumbing: Arrow batching, schema, per-row error degradation, payload
    hash integrity.  sf_dir is unused (the fixture is the contract)."""
    from literature_to_facts_spark.datapipe.multimodal import (
        build_media_fixture,
        extract_media_features,
    )

    media = spark.createDataFrame(
        [(m, k, bytearray(p)) for m, k, p in build_media_fixture()],
        schema="media_id long, kind string, payload binary",
    ).repartition(8)
    fx = [
        f"CAST(CASE WHEN feature IS NULL THEN NULL ELSE "
        f"floor(CAST(element_at(feature, {i + 1}) AS DOUBLE) * 100000 + 0.5) "
        f"END AS BIGINT) AS f{i}"
        for i in range(8)
    ]
    return extract_media_features(media).selectExpr(
        "media_id", "kind", "n_bytes", "sha1", "decoder", *fx
    )


def _multimodal_oracle_sql() -> str:
    """Row-at-a-time oracle for q_multimodal_features: regenerate the
    fixture, decode each payload in plain Python (same honest decoders, no
    Spark), fixed-point the features identically, and emit a VALUES table
    DuckDB selects from."""
    import hashlib as _hl
    import math as _m

    from literature_to_facts_spark.datapipe.multimodal import (
        build_media_fixture,
        decode_media,
    )

    rows = []
    for mid, kind, payload in build_media_fixture():
        try:
            feat = decode_media(payload, kind)
            dec = "real"
        except NotImplementedError:
            feat, dec = None, "unsupported"
        except Exception:  # noqa: BLE001 — mirrors the operator's per-row net
            feat, dec = None, "error"
        fs = (
            ["CAST(NULL AS BIGINT)"] * 8
            if feat is None
            else [str(int(_m.floor(float(f) * 100000 + 0.5))) for f in feat]
        )
        rows.append(
            f"({mid}, '{kind}', {len(payload)}, "
            f"'{_hl.sha1(payload).hexdigest()}', '{dec}', {', '.join(fs)})"
        )
    cols = "media_id, kind, n_bytes, sha1, decoder, " + ", ".join(
        f"f{i}" for i in range(8)
    )
    return f"SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols})"


# ---------------------------------------------------------------------------
# URL canonicalization lane (datapipe/urls.py) — the crawl-pipeline stage
# that precedes every text-level operator.  The fixture synthesizes URLs
# deterministically from (doc_id, source, lang) with ONE `||`-concatenation
# template both engines evaluate identically (NULL-propagating concat on
# both sides per the repo's oracle-NULL-parity rule); {id}/{blk} are the
# engine-specific string casts of doc_id and its 7-block start.  The seven
# branches cover: ccSLD host + default https port + tracking params +
# fragment (0); default http port with a block-keyed id param (1) that
# NORMALIZES EQUAL to its portless twin (3) — the url_dedup collision pair;
# userinfo + non-default port + empty-valued and uppercase-UTM params (2);
# empty path (4); an invalid non-URL (5); NULL (6).
# ---------------------------------------------------------------------------

_URL_FIXTURE_TMPL = (
    "CASE doc_id % 7"
    " WHEN 0 THEN 'HTTPS://WWW.' || upper(source)"
    "   || '.Example.CO.UK:443/News/' || lang"
    "   || '/item?utm_source=feed&b=2&a=1&fbclid=xyz#top'"
    " WHEN 1 THEN 'http://b' || {blk} || '.example.com:80/a/b/c?id=' || {blk}"
    " WHEN 2 THEN 'https://user:pw@' || source"
    "   || '.example.org:8443/dl%20x/?z=9&y=&UTM_CAMPAIGN=q'"
    " WHEN 3 THEN 'http://b' || {blk} || '.example.com/a/b/c?id=' || {blk}"
    " WHEN 4 THEN 'ftp://files.' || source || '.net'"
    " WHEN 5 THEN 'not-a-url-' || {id}"
    " ELSE NULL END"
)
_URL_FIXTURE_SPARK = _URL_FIXTURE_TMPL.format(
    id="cast(doc_id as string)", blk="cast(doc_id - doc_id % 7 as string)"
)
_URL_FIXTURE_DUCK = _URL_FIXTURE_TMPL.format(
    id="cast(doc_id as varchar)", blk="cast(doc_id - doc_id % 7 as varchar)"
)


def _url_docs(spark, sf_dir):
    return _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_URL_FIXTURE_SPARK} AS url"
    )


def q_url_parts(spark, sf_dir):
    """URL decomposition (datapipe/urls.with_url_parts): scheme/host/port/
    path/query/registered_domain/path_depth over the synthesized crawl-URL
    fixture — pure per-row regex battery, zero shuffle.  The reference keys
    documents per url (facts/core.py:121); this is the typed-parts stage a
    web-scale corpus needs before host-level curation."""
    from literature_to_facts_spark.datapipe.urls import with_url_parts

    out = with_url_parts(_url_docs(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "url",
        "scheme",
        "host",
        "port",
        "path",
        F.col("query").alias("url_query"),
        "registered_domain",
        "path_depth",
        "is_valid_url",
    )


def q_url_normalize(spark, sf_dir):
    """URL canonicalization (datapipe/urls.url_normalize): lowercase
    scheme+host, strip default ports and fragments, drop tracking params,
    sort the survivors — the page-identity key for crawl-level dedup."""
    from literature_to_facts_spark.datapipe.urls import url_normalize

    out = url_normalize(_url_docs(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "url", "url_norm"
    )


def q_url_dedup(spark, sf_dir):
    """Exact URL-level dedup (datapipe/urls.url_dedup): one row per
    normalized url with representative id + member count.  The fixture's
    branch-1/branch-3 pairs (same 7-block) differ only by an explicit
    default port, so every block contributes one n_docs=2 group — the
    tracking-variant collapse this stage exists for.  One partial-agg'd
    groupBy Exchange."""
    from literature_to_facts_spark.datapipe.urls import url_dedup

    return url_dedup(_url_docs(spark, sf_dir)).select(
        "url_norm",
        F.col("rep_id").cast("bigint").alias("rep_id"),
        "n_docs",
    )


_SEMDEDUP_PARAMS = dict(n_clusters=8, refine_iters=1, threshold=0.4, max_cluster=400)


def q_semantic_dedup(spark, sf_dir):
    """Semantic dedup (datapipe/similarity.semantic_dedup — SemDeDup):
    fixed-point k-means clustering + intra-cluster exact-cosine pruning
    with the min-id-representative rule; clusters above max_cluster are
    excluded from pair generation and flagged.  Full SQL oracle — DuckDB
    recomputes seeds, the Lloyd pass, assignment, sizes and the pruning
    join end-to-end."""
    from literature_to_facts_spark.datapipe.similarity import semantic_dedup

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    reg = []
    out = semantic_dedup(emb, cache_registry=reg, **_SEMDEDUP_PARAMS)
    out = out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        "n_cluster",
        "capped",
        # row-tuple sort safety (the gate sorts rows; None < int raises):
        # NULL dup_of -> -1, is_dup still derives from the raw column
        F.coalesce(F.col("dup_of").cast("bigint"), F.lit(-1)).alias("dup_of"),
        "is_dup",
    )
    out._l2f_cache_registry = reg  # released by callers that materialize
    return out


def _semantic_dedup_oracle(
    n_clusters: int = 8,
    threshold: float = 0.4,
    max_cluster: int = 400,
    dim: int = 64,
    train_restrict: str | None = None,
    out_restrict: str | None = None,
) -> str:
    """Mirrors semantic_dedup end-to-end: the _ann_ivf_oracle head (seed +
    one fixed-point Lloyd pass + assignment), then cluster sizes, the cap
    flag and the min-lower-id pruning join.  ``train_restrict`` freezes
    centroid training to a corpus subset and ``out_restrict`` keeps only
    those rows (and their dup groups' b-side) — together they are the
    incremental query's frozen-quantizer contract."""
    h = _H1.format(x="CAST(vec_id AS VARCHAR)")
    train_where = f"WHERE {train_restrict}" if train_restrict else ""
    out_and = f"AND ({out_restrict.replace('vec_id', 'b.vec_id')})" if out_restrict else ""
    out_where = f"WHERE {out_restrict.replace('vec_id', 's.vec_id')}" if out_restrict else ""
    avgs = ", ".join(
        f"FLOOR(SUM(CAST(FLOOR(e[{i + 1}] * 1000000.0 + 0.5) AS BIGINT))"
        f" / COUNT(*) + 0.5) / 1000000.0 AS a{i}"
        for i in range(dim)
    )
    relist = "[" + ", ".join(f"a{i}" for i in range(dim)) + "]"
    return f"""
            WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                              embedding::DOUBLE[] AS e
                       FROM embeddings),
            vt AS (SELECT * FROM v {train_where}),
            seed AS (SELECT vec_id AS centroid_id, e AS ce FROM vt
                     ORDER BY {h} ASC, vec_id ASC LIMIT {n_clusters}),
            assign0 AS (
              SELECT vec_id, e, centroid_id FROM (
                SELECT v.vec_id, v.e, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY list_dot_product(v.e, c.ce) DESC,
                                  c.centroid_id ASC) AS rn
                FROM vt v, seed c) WHERE rn = 1),
            lmeans AS (SELECT centroid_id, {avgs}
                       FROM assign0 GROUP BY centroid_id),
            cent AS (SELECT centroid_id, {relist}::DOUBLE[] AS ce FROM lmeans),
            assign AS (
              SELECT vec_id, e, centroid_id FROM (
                SELECT v.vec_id, v.e, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY list_dot_product(v.e, c.ce) DESC,
                                  c.centroid_id ASC) AS rn
                FROM v, cent c) WHERE rn = 1),
            sizes AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_cluster
                      FROM assign GROUP BY centroid_id),
            spine AS (SELECT a.vec_id, a.e, a.centroid_id, s.n_cluster,
                             s.n_cluster > {max_cluster} AS capped
                      FROM assign a JOIN sizes s USING (centroid_id)),
            dups AS (
              SELECT b.vec_id, MIN(a.vec_id) AS dup_of
              FROM spine a JOIN spine b USING (centroid_id)
              WHERE NOT a.capped AND a.vec_id < b.vec_id {out_and}
                AND ROUND(list_dot_product(a.e, b.e) /
                      (sqrt(list_dot_product(a.e, a.e)) *
                       sqrt(list_dot_product(b.e, b.e))), 6) >= {threshold}
              GROUP BY b.vec_id)
            SELECT s.vec_id, CAST(s.centroid_id AS BIGINT) AS centroid_id,
                   s.n_cluster, s.capped,
                   coalesce(CAST(d.dup_of AS BIGINT), -1) AS dup_of,
                   d.dup_of IS NOT NULL AS is_dup
            FROM spine s LEFT JOIN dups d USING (vec_id)
            {out_where}
        """


def q_semantic_dedup_incremental(spark, sf_dir):
    """Delta SemDeDup (datapipe/similarity.semantic_dedup_incremental — the
    eighth probe-shaped incremental family): the new batch (vec_id % 5 ==
    0) quantized against centroids trained on HISTORY ONLY (frozen-quantizer
    contract shared with emb_ann_ivf_incremental), scored only against
    history members of its touched clusters.  Oracle = the frozen-quantizer
    full semantic dedup restricted to the batch ids."""
    from literature_to_facts_spark.datapipe.similarity import (
        build_ivf_index,
        semantic_dedup_incremental,
    )

    emb = _spread(_t(spark, sf_dir, "embeddings"))
    new = emb.where(F.col("vec_id") % 5 == 0)
    old = emb.where(F.col("vec_id") % 5 != 0)
    reg = []
    cents, assigns = build_ivf_index(
        old, n_centroids=_SEMDEDUP_PARAMS["n_clusters"],
        refine_iters=_SEMDEDUP_PARAMS["refine_iters"], cache_registry=reg,
    )
    # operationally `assigns` is a persisted catalog table; recomputing it
    # here per consumer would charge the whole IVF assign pipeline twice
    # (the operator's two history passes are scans of stored state, not
    # recomputes) — persist emulates the stored index, results unchanged
    assigns = assigns.persist()
    reg.append(assigns)
    out = semantic_dedup_incremental(
        new, assigns, cents,
        threshold=_SEMDEDUP_PARAMS["threshold"],
        max_cluster=_SEMDEDUP_PARAMS["max_cluster"],
        cache_registry=reg,
    )
    out = out.select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("centroid_id").cast("bigint").alias("centroid_id"),
        "n_cluster",
        "capped",
        F.coalesce(F.col("dup_of").cast("bigint"), F.lit(-1)).alias("dup_of"),
        "is_dup",
    )
    out._l2f_cache_registry = reg
    return out


def q_text_span_dedup_clean(spark, sf_dir):
    """ExactSubstr removal (datapipe/textclean.span_dedup_clean — the
    cut-the-duplicates-out half of Lee et al. 2021): tokens covered by a
    duplicated window are removed, survivors re-joined; untouched documents
    pass through verbatim.  One id-keyed join over span_dedup's coverage
    stats; full SQL oracle recomputes the rewrite end-to-end."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup_clean

    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    out = span_dedup_clean(
        docs, window=_SPAN_DEDUP_WINDOW, min_df=_SPAN_DEDUP_MIN_DF
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        # 'span_clean_text' (not clean_text): the gate sorts row tuples by
        # alphabetical column order and a NULL (NULL-text doc) must not
        # lead the tuple
        F.col("clean_text").alias("span_clean_text"),
    )


# corpus-vocabulary demo bigram LM for the perplexity contract query — ONE
# source of truth interpolated into both the Spark model DataFrame and the
# DuckDB VALUES clause (integer micro-unit log10 probs: bit-portable sums)
_LM_PPL_MODEL = [
    ("the row", -1_300_000), ("a row", -1_500_000), ("data query", -1_700_000),
    ("batch window", -2_100_000), ("value table", -2_300_000),
    ("slow fast", -2_500_000), ("join batch", -2_700_000),
    ("the part", -1_900_000),
]
_LM_PPL_PARAMS = dict(
    n_gram=2, oov_lp_micro=-14_000_000, head_max=8.0, middle_max=13.9
)


def q_text_lm_perplexity(spark, sf_dir):
    """CCNet-style LM perplexity scoring + head/middle/tail bucketing
    (datapipe/textstats.lm_perplexity — Wenzek et al. 2020's model-based
    quality stage): per-doc mean negative log10 prob under a broadcast
    (gram, lp_micro) bigram table with a fixed OOV penalty, bucket decided
    on the rounded value.  The model here is a corpus-vocabulary demo; the
    operator contract takes any exported KenLM-style table as a
    DataFrame."""
    from literature_to_facts_spark.datapipe.textstats import lm_perplexity

    docs = _spread(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    model = spark.createDataFrame(_LM_PPL_MODEL, "gram string, lp_micro long")
    out = lm_perplexity(docs, model, **_LM_PPL_PARAMS)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_grams",
        "lp_sum_micro",
        F.col("log_ppl").cast("double").alias("log_ppl"),
        "ppl_bucket",
    )


def _lm_perplexity_oracle() -> str:
    """DuckDB recomputation of lm_perplexity under the shared _LM_PPL_MODEL:
    same lowercased bigrams, integer micro-unit sums with the OOV penalty
    (zero-gram documents score it once via the spine coalesce), rounded
    log-perplexity and tercile bucket."""
    g = _LM_PPL_PARAMS["n_gram"]
    oov = _LM_PPL_PARAMS["oov_lp_micro"]
    values = ", ".join(f"('{t}', {w})" for t, w in _LM_PPL_MODEL)
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x != '')
                   AS toks
          FROM documents
        ),
        gr AS (
          SELECT doc_id,
                 CASE WHEN toks IS NULL THEN []
                      WHEN len(toks) >= {g} THEN
                        list_transform(range(1, len(toks) - {g} + 2),
                          i -> array_to_string(toks[i:i+{g - 1}], ' '))
                      ELSE [] END AS grams
          FROM t
        ),
        inst AS (SELECT doc_id, u AS gram FROM gr, UNNEST(grams) AS s(u)),
        m(gram, lp) AS (VALUES {values}),
        agg AS (
          SELECT i.doc_id,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(coalesce(m.lp, {oov})) AS BIGINT) AS s
          FROM inst i LEFT JOIN m ON i.gram = m.gram
          GROUP BY i.doc_id
        ),
        sp AS (
          SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                 coalesce(a.n, 0) AS n_grams,
                 coalesce(a.s, {oov}) AS lp_sum_micro
          FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        )
        SELECT doc_id, n_grams, lp_sum_micro,
               ROUND(-lp_sum_micro / 1000000.0
                     / greatest(n_grams, 1), 6) AS log_ppl,
               CASE WHEN ROUND(-lp_sum_micro / 1000000.0
                         / greatest(n_grams, 1), 6)
                         <= {_LM_PPL_PARAMS["head_max"]} THEN 'head'
                    WHEN ROUND(-lp_sum_micro / 1000000.0
                         / greatest(n_grams, 1), 6)
                         <= {_LM_PPL_PARAMS["middle_max"]} THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM sp
    """


_PAGERANK_PARAMS = dict(iters=3, damping_micro=850_000)
_PAGERANK_MOD = 97  # fixture graph: nodes are doc_id mod 97


def q_graph_pagerank(spark, sf_dir):
    """Link-graph centrality (datapipe/graphs.pagerank — the Common-Crawl
    host-ranking signal): 3 exact fixed-point power iterations over a
    deterministic synthetic hyperlink graph (src = doc_id mod 97, dst =
    (31*doc_id + 7) mod 97, deduplicated) — integer micro-unit ranks, so
    the DuckDB oracle recomputes every iteration bit-exactly."""
    from literature_to_facts_spark.datapipe.graphs import pagerank

    m = _PAGERANK_MOD
    edges = (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            f"cast(doc_id % {m} as bigint) AS src",
            f"cast((31 * doc_id + 7) % {m} as bigint) AS dst",
        )
        .distinct()
    )
    reg = []
    out = pagerank(edges, cache_registry=reg, **_PAGERANK_PARAMS)
    out = out.select(
        F.col("node").cast("bigint").alias("node"),
        "rank_micro",
        F.col("rank").cast("double").alias("rank"),
    )
    out._l2f_cache_registry = reg
    return out


def _duck_pagerank_ctes(iters: int, damping_micro: int) -> tuple[str, str]:
    """(ctes, final_relation): the fixed-point PageRank unrolled as chained
    CTEs over an ALREADY-DEFINED relation ``e(src, dst)`` (aggregates over
    a recursive reference are not allowed in recursive CTEs, and with fixed
    iters the unroll IS the contract).  Shared by the pagerank and composed
    web-link-rank oracles."""
    d = int(damping_micro)
    base = 1_000_000 - d
    ctes = [
        """nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*) AS dg FROM e GROUP BY src),
        w AS (SELECT e.src, e.dst, d.dg FROM e JOIN deg d ON e.src = d.src),
        pr0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"""
    ]
    for k in range(1, int(iters) + 1):
        ctes.append(
            f"""c{k} AS (
          SELECT w.dst AS node, SUM(p.r // w.dg) AS s
          FROM w JOIN pr{k - 1} p ON w.src = p.node
          GROUP BY w.dst
        ),
        pr{k} AS (
          SELECT n.node,
                 CAST({base} + ({d} * coalesce(c.s, 0)) // 1000000 AS BIGINT)
                   AS r
          FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
        )"""
        )
    return ", ".join(ctes), f"pr{int(iters)}"


def _pagerank_oracle() -> str:
    """DuckDB recomputation of the fixed-point PageRank: the same fixture
    edges, out-degrees joined once, each power iteration an unrolled CTE."""
    m = _PAGERANK_MOD
    ctes, final = _duck_pagerank_ctes(
        _PAGERANK_PARAMS["iters"], _PAGERANK_PARAMS["damping_micro"]
    )
    return f"""
        WITH e AS (
          SELECT DISTINCT CAST(doc_id % {m} AS BIGINT) AS src,
                 CAST((31 * doc_id + 7) % {m} AS BIGINT) AS dst
          FROM documents
        ),
        {ctes}
        SELECT node, r AS rank_micro,
               ROUND(r / 1000000.0, 6) AS rank
        FROM {final}
    """


# the html fixture wraps each document's text in a page skeleton exercising
# every strip stage: script + style blocks, a comment, tags, the six
# entities, and messy whitespace — ONE template both engines evaluate
# (||-concat, NULL-propagating)
_HTML_FIXTURE = (
    "'<html><head><STYLE type=\"x\">p{color:red}</STYLE>"
    "<script>var a=1&&2;</script></head>' || "
    "'<body><!-- c --><h1>T&amp;amp;A</h1><p class=\"z\">' || text || "
    "'</p>&lt;tag&gt;&nbsp;&quot;q&#39;</body></html>'"
)


def q_html_extract_text(spark, sf_dir):
    """HTML -> text extraction (datapipe/html.html_extract_text — the strip
    stage between the input table's html and text columns): script/style/
    comment removal, tag strip, entity decode, whitespace collapse, as a
    pure scan-fused regexp chain.  Patterns interpolate from the module
    into the DuckDB oracle (the PII_PATTERNS contract)."""
    from literature_to_facts_spark.datapipe.html import html_extract_text

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_HTML_FIXTURE} AS html"
    )
    out = html_extract_text(docs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "extracted_text",
    )


def _html_extract_oracle() -> str:
    from literature_to_facts_spark.datapipe.html import (
        HTML_ENTITIES,
        HTML_STRIP_PATTERNS,
        _WS_CLASS,
    )

    col = "html"
    for pat, repl in HTML_STRIP_PATTERNS:
        col = f"regexp_replace({col}, '{pat}', '{repl}', 'g')"
    for ent, ch in HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        col = f"replace({col}, '{ent}', '{ch_sql}')"
    col = f"trim(regexp_replace({col}, '{_WS_CLASS}', ' ', 'g'))"
    return f"""
        WITH h AS (
          SELECT doc_id, {_HTML_FIXTURE} AS html FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, {col} AS extracted_text
        FROM h
    """


# link fixture: one page skeleton exercising every href shape — absolute
# (double-quoted, with fragment), root-relative (single-quoted), dir-relative
# (unquoted), protocol-relative, and two dropped forms (mailto:, fragment-only)
# — over the SAME crawl-URL fixture as the url_* queries, so invalid /
# non-http / NULL page urls exercise the resolution guards.
_LINKS_HTML_TMPL = (
    "'<html><body>"
    '<A HREF="https://cdn' + "' || {mod} || '" + '.example.com/lib.html#top">x</a>'
    "<a id=''n'' href=''/r/' || {id} || '.html''>y</a>"
    "<a href=rel' || {mod} || '.html>z</a>"
    '<a href="//m' + "' || {mod} || '" + '.example.net/mm">w</a>'
    '<a href="mailto:a@b.c">m</a><a href="#s">s</a>'
    "</body></html>'"
)
_LINKS_HTML_SPARK = _LINKS_HTML_TMPL.format(
    id="cast(doc_id as string)", mod="cast(doc_id % 5 as string)"
)
_LINKS_HTML_DUCK = _LINKS_HTML_TMPL.format(
    id="cast(doc_id as varchar)", mod="cast(doc_id % 5 as varchar)"
)


def q_html_extract_links(spark, sf_dir):
    """Anchor extraction + URL resolution (datapipe/html.
    html_extract_links — the crawl-table -> link-graph edge-list stage
    feeding graphs.pagerank): three-quote-style href battery, fragment
    strip, scheme filter, protocol/root/dir-relative resolution against
    the page URL — all scan-fused per-row expressions, zero shuffle."""
    from literature_to_facts_spark.datapipe.html import html_extract_links

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"{_LINKS_HTML_SPARK} AS html",
    )
    out = html_extract_links(docs)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "link_url",
        "link_host",
    )


def _duck_links_ctes(html_expr: str | None = None, pairs: bool = False) -> str:
    """The html_extract_links replay as a CTE chain ending at
    ``links(doc_id, src_host, link_url, link_host)`` — shared by the
    html_extract_links and web_link_rank oracles.  Href patterns, scheme
    regexes and the URL group regex interpolate from datapipe.html /
    datapipe.urls (operator edits propagate); concat uses ||
    (NULL-propagating) per the DuckDB-concat-skips-NULLs invariant.

    ``pairs=True`` replays html_extract_anchors instead: the
    ANCHOR_PAIR_PATTERNS battery's group-1/group-2 arrays are zipped
    before the unnest and ``links`` carries ``anchor_raw`` — SAME
    resolution CASE, one definition for both operators' oracles.
    ``html_expr`` overrides the html fixture expression."""
    from literature_to_facts_spark.datapipe.html import (
        ANCHOR_PAIR_PATTERNS,
        HREF_PATTERNS,
        HTTP_LINK_PATTERN,
        LINK_SCHEME_PATTERN,
    )

    def q(pat: str) -> str:
        return pat.replace("'", "''")

    g = _duck_url_group
    # DuckDB list_concat is binary — fold the extract arrays pairwise
    if pairs:
        arrays = [
            f"list_zip(regexp_extract_all(html, '{q(p)}', 1), "
            f"regexp_extract_all(html, '{q(p)}', 2))"
            for p in ANCHOR_PAIR_PATTERNS
        ]
    else:
        arrays = [
            f"regexp_extract_all(html, '{q(p)}', 1)" for p in HREF_PATTERNS
        ]
    extracts = arrays[0]
    for a in arrays[1:]:
        extracts = f"list_concat({extracts}, {a})"
    html_expr = html_expr or _LINKS_HTML_DUCK
    if pairs:
        hr_cols = f"unnest({extracts}) AS z"
        h2_href = "split_part(trim(z[1]), '#', 1) AS h, z[2] AS anchor_raw"
        carry = ", anchor_raw"
    else:
        hr_cols = f"unnest({extracts}) AS href_raw"
        h2_href = "split_part(trim(href_raw), '#', 1) AS h"
        carry = ""
    return f"""
        d AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url,
                 {html_expr} AS html
          FROM documents
        ),
        pg AS (
          SELECT doc_id, html,
                 (url IS NOT NULL AND {g(2)} <> '') AS ok,
                 lower({g(1)}) AS sch, lower({g(2)}) AS hostl,
                 {g(3)} AS prt, {g(4)} AS pth
          FROM d
        ),
        pg2 AS (
          SELECT doc_id, html, ok, hostl,
                 CASE WHEN ok THEN sch END AS pg_scheme,
                 CASE WHEN ok THEN sch || '://' || hostl ||
                      CASE WHEN prt = '' THEN '' ELSE ':' || prt END
                 END AS pg_base,
                 CASE WHEN ok THEN
                      CASE WHEN pth = '' THEN '/'
                           ELSE regexp_extract(pth, '(?s)^(.*/)', 1) END
                 END AS pg_dir
          FROM pg
        ),
        hr AS (
          SELECT doc_id, ok, hostl, pg_scheme, pg_base, pg_dir,
                 {hr_cols}
          FROM pg2
        ),
        h2 AS (
          SELECT doc_id, ok, hostl, pg_scheme, pg_base, pg_dir,
                 {h2_href}
          FROM hr
        ),
        r AS (
          SELECT doc_id, hostl{carry},
                 CASE WHEN h = '' THEN NULL
                      WHEN regexp_matches(h, '{LINK_SCHEME_PATTERN}')
                           AND regexp_matches(h, '{HTTP_LINK_PATTERN}')
                        THEN h
                      WHEN regexp_matches(h, '{LINK_SCHEME_PATTERN}')
                        THEN NULL
                      WHEN NOT ok THEN NULL
                      WHEN h LIKE '//%' THEN pg_scheme || ':' || h
                      WHEN h LIKE '/%' THEN pg_base || h
                      ELSE pg_base || pg_dir || h END AS link_url
          FROM h2
        ),
        links AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, hostl AS src_host,
                 link_url, lower({g(2, "link_url")}) AS link_host{carry}
          FROM r
          WHERE link_url IS NOT NULL
            AND regexp_matches(link_url, '{HTTP_LINK_PATTERN}')
        )
    """


def _html_links_oracle() -> str:
    return f"""
        WITH {_duck_links_ctes()}
        SELECT doc_id, link_url, link_host FROM links
    """


def _web_link_rank_oracle() -> str:
    """Composed chain: the shared links CTE -> distinct host-level edges
    -> the shared unrolled fixed-point PageRank CTEs."""
    ctes, final = _duck_pagerank_ctes(
        _PAGERANK_PARAMS["iters"], _PAGERANK_PARAMS["damping_micro"]
    )
    return f"""
        WITH {_duck_links_ctes()},
        e AS (
          SELECT DISTINCT src_host AS src, link_host AS dst
          FROM links
          WHERE src_host IS NOT NULL AND src_host <> ''
        ),
        {ctes}
        SELECT node, r AS rank_micro,
               ROUND(r / 1000000.0, 6) AS rank
        FROM {final}
    """


def q_web_link_rank(spark, sf_dir):
    """The composed crawl -> graph chain (the Common-Crawl host-ranking
    recipe end-to-end): raw page html -> html_extract_links (scan-fused)
    -> distinct host-level edges -> graphs.pagerank (fixed-point, 3
    iterations).  One operator's output is the next one's input with no
    materialization between them; the whole chain is oracled bit-exactly
    through both the link-resolution and the unrolled power iterations."""
    from literature_to_facts_spark.datapipe.graphs import pagerank
    from literature_to_facts_spark.datapipe.html import html_extract_links
    from literature_to_facts_spark.datapipe.urls import URL_PATTERN

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"{_LINKS_HTML_SPARK} AS html",
    )
    links = html_extract_links(docs)
    src = F.lower(F.regexp_extract(F.col("url"), URL_PATTERN, 2))
    edges = (
        links.select(src.alias("src"), F.col("link_host").alias("dst"))
        .where(F.col("src").isNotNull() & (F.col("src") != ""))
        .distinct()
    )
    reg = []
    out = pagerank(edges, cache_registry=reg, **_PAGERANK_PARAMS)
    out = out.select(
        "node",
        "rank_micro",
        F.col("rank").cast("double").alias("rank"),
    )
    out._l2f_cache_registry = reg
    return out


_SHUFFLE_SEED, _SHUFFLE_SHARDS = 42, 8


def q_sample_shuffle_shards(spark, sf_dir):
    """Seeded global training shuffle (datapipe/sampling.
    shuffle_deterministic): reproducible (shard, pos) permutation layout
    keyed by the portable md5 family — one hash Exchange + per-shard sort
    window, the physical work of a sharded training export."""
    from literature_to_facts_spark.datapipe.sampling import shuffle_deterministic

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    out = shuffle_deterministic(
        docs, seed=_SHUFFLE_SEED, n_shards=_SHUFFLE_SHARDS
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("shard").cast("bigint").alias("shard"),
        "pos",
    )


_CHUNK_PARAMS = dict(chunk_size=12, overlap=4)


def q_text_chunk_sliding(spark, sf_dir):
    """Sliding-window token chunking (datapipe/sampling.chunk_documents —
    the long-document context-length stage): whitespace tokens, stride
    chunk_size - overlap, exact integer chunk math, zero shuffle (explode
    + slice fused into the scan).  Small chunk_size so multi-chunk docs
    and the short-last-chunk edge are exercised at test scale."""
    from literature_to_facts_spark.datapipe.sampling import chunk_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_documents(docs, **_CHUNK_PARAMS)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "chunk_id",
        "chunk_start",
        "n_chunk_tokens",
        "chunk_text",
    )


def _chunk_sliding_oracle() -> str:
    cs = _CHUNK_PARAMS["chunk_size"]
    step = cs - _CHUNK_PARAMS["overlap"]
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), s -> s <> '') AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        n AS (
          SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
        ),
        c AS (
          SELECT doc_id, toks,
                 unnest(range(0, 1 + (greatest(n - {cs}, 0) + {step} - 1)
                        // {step})) AS chunk_id
          FROM n
        ),
        s AS (
          SELECT doc_id, chunk_id,
                 list_slice(toks, chunk_id * {step} + 1,
                            chunk_id * {step} + {cs}) AS chunk
          FROM c
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(chunk_id * {step} AS BIGINT) AS chunk_start,
               CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
               array_to_string(chunk, ' ') AS chunk_text
        FROM s
    """


def _shuffle_shards_oracle() -> str:
    key = _H1.format(
        x=f"'{_SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR)"
    )
    return f"""
        WITH k AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, {key} AS key
          FROM documents WHERE doc_id IS NOT NULL
        )
        SELECT doc_id, CAST(key % {_SHUFFLE_SHARDS} AS BIGINT) AS shard,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY key % {_SHUFFLE_SHARDS}
                 ORDER BY key ASC, doc_id ASC) - 1 AS BIGINT) AS pos
        FROM k
    """


def _duck_url_group(i: int, src: str = "url") -> str:
    from literature_to_facts_spark.datapipe.urls import URL_PATTERN

    return f"regexp_extract({src}, '{URL_PATTERN}', {i})"


def _url_parts_oracle() -> str:
    """DuckDB recomputation of with_url_parts over the same fixture —
    regex and second-level-TLD set interpolated from datapipe.urls, so
    operator edits propagate."""
    from literature_to_facts_spark.datapipe.urls import SECOND_LEVEL_TLDS

    slds = ", ".join(f"'{s}'" for s in SECOND_LEVEL_TLDS)
    g = _duck_url_group
    return f"""
        WITH u AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url FROM documents
        ),
        p AS (
          SELECT doc_id, url,
                 (url IS NOT NULL AND {g(2)} <> '') AS ok,
                 {g(1)} AS g1, {g(2)} AS g2, {g(3)} AS g3,
                 {g(4)} AS g4, {g(5)} AS g5
          FROM u
        ),
        h AS (
          SELECT *, CASE WHEN ok THEN lower(g2) END AS host,
                 CASE WHEN ok THEN string_split(lower(g2), '.') END AS labs
          FROM p
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, url,
               CASE WHEN ok THEN lower(g1) END AS scheme,
               host,
               CASE WHEN ok AND g3 <> '' THEN TRY_CAST(g3 AS BIGINT) END AS port,
               CASE WHEN ok THEN g4 END AS path,
               CASE WHEN ok THEN g5 END AS url_query,
               CASE WHEN NOT ok THEN NULL
                    WHEN len(labs) <= 2 THEN host
                    WHEN (labs[-2] || '.' || labs[-1]) IN ({slds})
                      THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]
                    ELSE labs[-2] || '.' || labs[-1] END AS registered_domain,
               CASE WHEN ok THEN CAST(len(list_filter(
                    string_split(g4, '/'), s -> s <> '')) AS BIGINT)
                    END AS path_depth,
               CASE WHEN url IS NULL THEN NULL ELSE ok END AS is_valid_url
        FROM h
    """


def _duck_url_norm(src: str = "url") -> str:
    """DuckDB expression block computing url_norm from ``src`` — shared by
    the normalize and dedup oracles; tracking-param set interpolated from
    datapipe.urls."""
    from literature_to_facts_spark.datapipe.urls import (
        TRACKING_PARAM_PREFIX,
        TRACKING_PARAMS,
    )

    g = lambda i: _duck_url_group(i, src)  # noqa: E731
    names = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    pref = TRACKING_PARAM_PREFIX
    params = (
        f"list_sort(list_filter(string_split({g(5)}, '&'), p -> p <> '' "
        f"AND NOT (substr(lower(split_part(p, '=', 1)), 1, {len(pref)}) = '{pref}' "
        f"OR lower(split_part(p, '=', 1)) IN ({names}))))"
    )
    return f"""
        CASE WHEN {src} IS NULL OR {g(2)} = '' THEN NULL ELSE
          lower({g(1)}) || '://' || lower({g(2)})
          || CASE WHEN {g(3)} = ''
                    OR (lower({g(1)}) = 'http' AND {g(3)} = '80')
                    OR (lower({g(1)}) = 'https' AND {g(3)} = '443')
               THEN '' ELSE ':' || {g(3)} END
          || CASE WHEN {g(4)} = '' THEN '/' ELSE {g(4)} END
          || CASE WHEN len({params}) > 0
               THEN '?' || array_to_string({params}, '&') ELSE '' END
        END
    """


def _url_normalize_oracle() -> str:
    return f"""
        WITH u AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url FROM documents
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, url,
               {_duck_url_norm()} AS url_norm
        FROM u
    """


_BLOCKED_DOMAINS = ["example.com", "news.net"]


def q_url_blocklist(spark, sf_dir):
    """Registered-domain blocklist gate (datapipe/urls.
    url_domain_blocklist — the UT1-list stage): docs whose registered
    domain is blocked are dropped via ONE broadcast left-anti join; the
    domain extraction (incl. second-level-TLD handling) fuses into the
    scan.  Fixture blocks example.com (cases 1/3) so subdomain variants
    b<k>.example.com prove the registered-domain matching."""
    from literature_to_facts_spark.datapipe.urls import url_domain_blocklist

    docs = _url_docs(spark, sf_dir)
    blocked = spark.createDataFrame(
        [(d,) for d in _BLOCKED_DOMAINS], "domain string"
    )
    out = url_domain_blocklist(docs, blocked)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), "url")


def _url_blocklist_oracle() -> str:
    from literature_to_facts_spark.datapipe.urls import SECOND_LEVEL_TLDS

    slds = ", ".join(f"'{s}'" for s in SECOND_LEVEL_TLDS)
    blocked = ", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)
    g = _duck_url_group
    return f"""
        WITH u AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url FROM documents
        ),
        p AS (
          SELECT doc_id, url,
                 (url IS NOT NULL AND {g(2)} <> '') AS ok,
                 lower({g(2)}) AS host
          FROM u
        ),
        h AS (
          SELECT doc_id, url, ok, host, string_split(host, '.') AS labs
          FROM p
        ),
        rd AS (
          SELECT doc_id, url, ok,
                 CASE WHEN NOT ok THEN NULL
                      WHEN len(labs) <= 2 THEN host
                      WHEN (labs[-2] || '.' || labs[-1]) IN ({slds})
                        THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]
                      ELSE labs[-2] || '.' || labs[-1] END AS dom
          FROM h
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, url
        FROM rd WHERE ok AND dom NOT IN ({blocked})
    """


_SNAP_TS_BASE_US = 1_500_000_000_000_000  # 2017-07-14 UTC, arbitrary fixed


def q_url_latest_snapshot(spark, sf_dir):
    """Crawl-snapshot dedup (datapipe/urls.url_latest_snapshot): one row
    per normalized URL keeping the latest warc_ts (ties -> min id) — the
    re-crawl-collapse stage over the input table's (url, warc_ts) columns.
    warc_ts fixture: timestamp_micros of a deterministic doc_id expression
    with deliberate collisions (mod 11) so the id tie-break is exercised;
    emitted as epoch micros (the timestamp-parity convention).  Exact
    argmax as max(struct(micros, -id)) — a plain partial-agg'd aggregate,
    no window."""
    from literature_to_facts_spark.datapipe.urls import url_latest_snapshot

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"timestamp_micros(cast(doc_id % 11 as bigint) * 3600000000"
        f" + {_SNAP_TS_BASE_US}) AS warc_ts",
    )
    out = url_latest_snapshot(docs)
    return out.select(
        "url_norm",
        "rep_id",
        F.unix_micros(F.col("latest_ts")).alias("latest_ts_us"),
        "n_crawls",
    )


def _url_latest_snapshot_oracle() -> str:
    return f"""
        WITH u AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url,
                 CAST(doc_id % 11 AS BIGINT) * 3600000000
                   + {_SNAP_TS_BASE_US} AS ts_us
          FROM documents
        ),
        n AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, ts_us,
                 {_duck_url_norm()} AS url_norm
          FROM u
        ),
        r AS (
          SELECT url_norm, doc_id, ts_us,
                 row_number() OVER (PARTITION BY url_norm
                   ORDER BY ts_us DESC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY url_norm) AS n_crawls
          FROM n WHERE url_norm IS NOT NULL
        )
        SELECT url_norm, doc_id AS rep_id, ts_us AS latest_ts_us,
               CAST(n_crawls AS BIGINT) AS n_crawls
        FROM r WHERE rn = 1
    """


def q_url_domain_quality(spark, sf_dir):
    """Composed crawl-curation chain: URL fixture -> registered-domain
    extraction (datapipe/urls.with_url_parts) -> host-level quality stats
    (datapipe/textstats.source_stats keyed on the registered domain — the
    RefinedWeb whole-domain drop on URL-derived domains instead of a given
    source column).  Invalid/NULL urls form the '<invalid>' group (coalesced
    post-group so the NULL group stays visible and row-sortable)."""
    from literature_to_facts_spark.datapipe.textstats import source_stats
    from literature_to_facts_spark.datapipe.urls import with_url_parts

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "text", f"{_URL_FIXTURE_SPARK} AS url"
    )
    out = source_stats(
        with_url_parts(docs), source_col="registered_domain",
        min_mean_quality=0.78, max_doc_share=0.3,
    )
    return out.select(
        F.coalesce(F.col("source"), F.lit("<invalid>")).alias(
            "registered_domain"
        ),
        "n_docs",
        "doc_share",
        F.col("mean_quality").cast("double").alias("mean_quality"),
        "keep",
    )


def _url_domain_quality_oracle() -> str:
    """The composed chain in one statement: fixture urls -> DuckDB
    registered-domain extraction (same regex/TLD interpolation as
    _url_parts_oracle) -> the generalized source_stats oracle over the
    derived (source, text) relation."""
    from literature_to_facts_spark.datapipe.urls import SECOND_LEVEL_TLDS

    slds = ", ".join(f"'{t}'" for t in SECOND_LEVEL_TLDS)
    g2 = _duck_url_group(2)
    prelude = f"""u AS (
          SELECT text, {_URL_FIXTURE_DUCK} AS url FROM documents
        ),
        hh AS (
          SELECT text, (url IS NOT NULL AND {g2} <> '') AS ok,
                 lower({g2}) AS host
          FROM u
        ),
        ll AS (
          SELECT text, ok, host, string_split(host, '.') AS labs FROM hh
        ),
        srcrel AS (
          SELECT CASE WHEN NOT ok THEN NULL
                      WHEN len(labs) <= 2 THEN host
                      WHEN (labs[-2] || '.' || labs[-1]) IN ({slds})
                        THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]
                      ELSE labs[-2] || '.' || labs[-1] END AS source,
                 text
          FROM ll
        ),
        """
    inner = _source_stats_oracle(
        min_mean_quality=0.78, max_doc_share=0.3,
        src="srcrel", prelude=prelude,
    )
    return f"""
        SELECT coalesce(source, '<invalid>') AS registered_domain,
               n_docs, doc_share, mean_quality, keep
        FROM ({inner})
    """


def _url_dedup_oracle() -> str:
    return f"""
        WITH u AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url FROM documents
        ),
        n AS (
          SELECT doc_id, {_duck_url_norm()} AS url_norm FROM u
        )
        SELECT url_norm, CAST(min(doc_id) AS BIGINT) AS rep_id,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM n WHERE url_norm IS NOT NULL
        GROUP BY url_norm
    """


# ---------------------------------------------------------------------------
# KG store-side query lane (engine/kgquery.py): statistics + path joins over
# the materialized triple table
# ---------------------------------------------------------------------------

_KG_MENTION_RE = "(spark|window|merge|batch)"


def _kg_rich_triples(spark, sf_dir):
    """Melted doc triples + per-doc mention-count triples — the entry()
    flagship's triple table, reused by the store-side query lane so the
    characteristic sets actually vary across subjects.  `_spread` because
    the mention leg regex-scans every document's text (compute-heavy over
    the single-row-group local fixtures)."""
    docs = _spread(_t(spark, sf_dir, "documents"))
    base = docs.selectExpr(
        "CAST(doc_id AS BIGINT) AS subj",
        "stack(3, 'source', source, 'lang', lang, 'n_chars', CAST(n_chars AS STRING)) AS (pred, obj)",
    )
    # Per-keyword mention counts computed IN-ROW over the fixed 4-word
    # vocabulary (round 7): size(filter(matches, = kw)) per keyword replaces
    # the explode -> groupBy(subj, kw) -> count leg, removing that Exchange
    # from every _kg_rich_triples consumer (the whole triple fixture is now
    # map-side; the union persist materializes with zero shuffle).  Row set
    # identical: a (subj, mentions_kw, count) row iff count >= 1, count
    # rendered via the same int->string text; NULL-text docs drop out of
    # both shapes (NULL array -> NULL n -> filter false).
    kws = ", ".join(f"'{k}'" for k in ("spark", "window", "merge", "batch"))
    mentions = (
        docs.selectExpr(
            "CAST(doc_id AS BIGINT) AS subj",
            f"regexp_extract_all(text, '{_KG_MENTION_RE}', 1) AS _kws",
        )
        .selectExpr(
            "subj",
            f"explode(filter(transform(array({kws}), "
            "kw -> named_struct('kw', kw, 'n', size(filter(_kws, x -> x = kw)))), "
            "c -> c.n > 0)) AS c",
        )
        .selectExpr(
            "subj",
            "concat('mentions_', c.kw) AS pred",
            "CAST(c.n AS STRING) AS obj",
        )
    )
    return base.unionByName(mentions)


_KG_RICH_TRIPLES_DUCK = f"""
          SELECT CAST(doc_id AS BIGINT) AS subj, 'source' AS pred, source AS obj FROM documents
          UNION ALL
          SELECT CAST(doc_id AS BIGINT), 'lang', lang FROM documents
          UNION ALL
          SELECT CAST(doc_id AS BIGINT), 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
          UNION ALL
          SELECT subj, 'mentions_' || kw, CAST(COUNT(*) AS VARCHAR)
          FROM (
            SELECT CAST(doc_id AS BIGINT) AS subj,
                   unnest(regexp_extract_all(text, '{_KG_MENTION_RE}', 1)) AS kw
            FROM documents
          ) GROUP BY subj, kw
"""


def q_kg_predicate_stats(spark, sf_dir):
    """RDF-store predicate cardinality statistics (engine/kgquery.py) over
    the flagship triple table — the stats a store keeps for join ordering
    (reference analog: rdflib graph introspection, facts/learn.py:95)."""
    from literature_to_facts_spark.engine.kgquery import predicate_stats

    return predicate_stats(_kg_rich_triples(spark, sf_dir))


def q_kg_characteristic_sets(spark, sf_dir):
    """Characteristic-set histogram (Neumann & Moerkotte ICDE'11) of the
    flagship triple table: one row per distinct per-subject predicate set."""
    from literature_to_facts_spark.engine.kgquery import characteristic_sets

    return characteristic_sets(_kg_rich_triples(spark, sf_dir))


def q_kg_entity_cooccurrence(spark, sf_dir):
    """Co-mention edge building: unordered keyword-entity pairs sharing a
    document, with distinct-doc counts and the quadratic-blowup cap."""
    from literature_to_facts_spark.engine.kgquery import entity_cooccurrence

    docs = _t(spark, sf_dir, "documents")
    mentions = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_KG_MENTION_RE), F.lit(1))
        ).alias("entity"),
    )
    return entity_cooccurrence(mentions, max_entities_per_doc=64)


def q_kg_two_hop(spark, sf_dir):
    """Two-triple-pattern path join (SPARQL ``?src p1 ?doc . ?doc p2 ?ent``):
    which entities each source co-occurs with, via how many distinct docs."""
    from literature_to_facts_spark.engine.kgquery import two_hop

    docs = _t(spark, sf_dir, "documents")
    ab = docs.select(
        F.col("source").alias("src"), F.col("doc_id").cast("bigint").alias("dst")
    )
    bc = docs.select(
        F.col("doc_id").cast("bigint").alias("src"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_KG_MENTION_RE), F.lit(1))
        ).alias("dst"),
    )
    return two_hop(ab, bc)


def q_kg_predicate_stats_incremental(spark, sf_dir):
    """Delta maintenance of the predicate-cardinality statistics
    (engine/kgquery.predicate_stats_incremental, ninth probe-shaped delta
    family): the new batch's triples (subj % 5 == 0, a ~20% daily delta)
    update the persisted stats via an existence probe against the
    (pred, role, value) pair index — the history triple store is never
    rescanned.  Full SQL oracle: the result must be bit-equal to the
    from-scratch ``predicate_stats`` over the ENTIRE corpus, so DuckDB
    recomputes exactly that."""
    from literature_to_facts_spark.engine.kgquery import (
        build_predicate_pair_index,
        predicate_stats,
        predicate_stats_incremental,
    )

    # the triple table feeds THREE consumers here (batch, history index,
    # history stats) — persist it once or the regex-mention subtree runs
    # three times (operationally it is a materialized table anyway)
    triples = _kg_rich_triples(spark, sf_dir).persist()
    new = triples.where(F.col("subj") % 5 == 0)
    old = triples.where(F.col("subj") % 5 != 0)
    return predicate_stats_incremental(
        new, build_predicate_pair_index(old), predicate_stats(old)
    )


# robots/canonical fixture: each page carries one of four robots-meta shapes
# (name-first double-quoted / content-first single-quoted uppercase / none
# directive / absent) and one of three canonical shapes (rel-first with
# fragment / href-first relative / absent) — ONE template both engines build
_META_HTML_TMPL = (
    "'<html><head>' || "
    "CASE CAST({id} % 4 AS INT) "
    "WHEN 0 THEN '<meta name=\"robots\" content=\"noindex, follow\">' "
    "WHEN 1 THEN '<META CONTENT=''nofollow'' NAME=''robots''>' "
    "WHEN 2 THEN '<meta name=\"robots\" content=\"NONE\">' "
    "ELSE '<p>open</p>' END || "
    "CASE CAST({id} % 3 AS INT) "
    "WHEN 0 THEN '<link rel=\"canonical\" href=\"https://ex.com/c/' || {ids} || '#f\">' "
    "WHEN 1 THEN '<link href=''/c/' || {ids} || '.html'' rel=''canonical''>' "
    "ELSE '' END || "
    "'</head><body>' || text || '</body></html>'"
)
_META_HTML_SPARK = _META_HTML_TMPL.format(
    id="doc_id", ids="cast(doc_id as string)"
)
_META_HTML_DUCK = _META_HTML_TMPL.format(
    id="doc_id", ids="cast(doc_id as varchar)"
)


def q_html_meta_robots(spark, sf_dir):
    """Robots-meta + rel=canonical gate (datapipe/html.
    html_meta_directives): the pre-index/pre-training page directive check
    every crawl pipeline runs — noindex/nofollow token matching over all
    four attribute-ordering/quote-style tag shapes, first-canonical
    extraction with fragment strip.  Scan-fused regexes, zero shuffle;
    patterns interpolate into the DuckDB oracle verbatim."""
    from literature_to_facts_spark.datapipe.html import html_meta_directives

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_META_HTML_SPARK} AS html"
    )
    out = html_meta_directives(docs)
    # NULL-free contract output (the oracle-NULL-parity convention):
    # absent canonical -> '' on both engines
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "robots_noindex",
        "robots_nofollow",
        F.coalesce("canonical_href", F.lit("")).alias("canonical_href"),
    )


def _html_meta_oracle() -> str:
    from literature_to_facts_spark.datapipe.html import (
        _A_WS,
        CANONICAL_PATTERNS,
        META_ROBOTS_PATTERNS,
    )

    def q(pat: str) -> str:
        return pat.replace("'", "''")

    def fold(pats):
        arrays = [f"regexp_extract_all(html, '{q(p)}', 1)" for p in pats]
        out = arrays[0]
        for a in arrays[1:]:
            out = f"list_concat({out}, {a})"
        return out

    return f"""
        WITH h AS (
          SELECT doc_id, {_META_HTML_DUCK} AS html FROM documents
        ),
        x AS (
          SELECT doc_id,
                 ',' || regexp_replace(
                     lower(coalesce(
                         array_to_string({fold(META_ROBOTS_PATTERNS)}, ','),
                         '')),
                     '{_A_WS}+', '', 'g') || ',' AS rn,
                 {fold(CANONICAL_PATTERNS)} AS ca
          FROM h
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               (contains(rn, ',noindex,') OR contains(rn, ',none,'))
                 AS robots_noindex,
               (contains(rn, ',nofollow,') OR contains(rn, ',none,'))
                 AS robots_nofollow,
               coalesce(CASE WHEN len(ca) > 0
                    THEN split_part(trim(ca[1]), '#', 1) END, '')
                 AS canonical_href
        FROM x
    """


def q_kg_charsets_incremental(spark, sf_dir):
    """Delta maintenance of the characteristic-set histogram
    (engine/kgquery.characteristic_sets_incremental, tenth probe-shaped
    delta family): the new batch's triples (subj % 5 == 0) can MOVE
    subjects between histogram shapes, so the update transfers counts
    (decrement old shape, increment new) for touched subjects only — the
    history triple store is never rescanned.  Full SQL oracle: bit-equal
    to the from-scratch histogram over the ENTIRE corpus."""
    from literature_to_facts_spark.engine.kgquery import (
        build_subject_pred_index,
        characteristic_sets,
        characteristic_sets_incremental,
    )

    triples = _kg_rich_triples(spark, sf_dir).persist()
    new = triples.where(F.col("subj") % 5 == 0)
    old = triples.where(F.col("subj") % 5 != 0)
    return characteristic_sets_incremental(
        new, build_subject_pred_index(old), characteristic_sets(old)
    )


# canonical-collision variant of the meta fixture: absolute canonicals key on
# doc_id % 7, so crawl variants genuinely MERGE under their declared target
_META_HTML_CANON_SPARK = _META_HTML_TMPL.format(
    id="doc_id", ids="cast(doc_id % 7 as string)"
)
_META_HTML_CANON_DUCK = _META_HTML_TMPL.format(
    id="doc_id", ids="cast(doc_id % 7 as varchar)"
)


def q_url_canonical_dedup(spark, sf_dir):
    """Canonical-aware crawl-snapshot dedup (datapipe/urls.
    url_canonical_dedup): the snapshot argmax keyed on the EFFECTIVE url —
    the page's declared rel=canonical when absolute http(s), else the page
    url — so mirror fetch-urls declaring one canonical collapse into one
    group (doc_id%7 canonical targets force real merges; relative
    canonicals fall back).  Same single-Exchange argmax as
    url_latest_snapshot; canonical extraction fuses into the scan."""
    from literature_to_facts_spark.datapipe.urls import url_canonical_dedup

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"timestamp_micros(cast(doc_id % 11 as bigint) * 3600000000"
        f" + {_SNAP_TS_BASE_US}) AS warc_ts",
        f"{_META_HTML_CANON_SPARK} AS html",
    )
    out = url_canonical_dedup(docs)
    return out.select(
        "url_norm",
        "rep_id",
        F.unix_micros(F.col("latest_ts")).alias("latest_ts_us"),
        "n_crawls",
        "n_canonicalized",
    )


def _url_canonical_dedup_oracle() -> str:
    from literature_to_facts_spark.datapipe.html import (
        CANONICAL_PATTERNS,
        HTTP_LINK_PATTERN,
    )

    def q(pat: str) -> str:
        return pat.replace("'", "''")

    arrays = [f"regexp_extract_all(html, '{q(p)}', 1)" for p in CANONICAL_PATTERNS]
    fold = arrays[0]
    for a in arrays[1:]:
        fold = f"list_concat({fold}, {a})"
    http = q(HTTP_LINK_PATTERN)
    return f"""
        WITH h AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url,
                 CAST(doc_id % 11 AS BIGINT) * 3600000000
                   + {_SNAP_TS_BASE_US} AS ts_us,
                 {_META_HTML_CANON_DUCK} AS html
          FROM documents
        ),
        cx AS (
          SELECT doc_id, url, ts_us, {fold} AS ca FROM h
        ),
        cz AS (
          SELECT doc_id, url, ts_us,
                 CASE WHEN len(ca) > 0
                      THEN split_part(trim(ca[1]), '#', 1) END AS canon
          FROM cx
        ),
        e AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, ts_us,
                 CASE WHEN canon IS NOT NULL AND canon <> ''
                           AND regexp_matches(canon, '{http}')
                      THEN canon ELSE url END AS url,
                 CASE WHEN canon IS NOT NULL AND canon <> ''
                           AND regexp_matches(canon, '{http}')
                      THEN 1 ELSE 0 END AS is_cz
          FROM cz
        ),
        n AS (
          SELECT doc_id, ts_us, is_cz, {_duck_url_norm()} AS url_norm FROM e
        ),
        r AS (
          SELECT url_norm, doc_id, ts_us, is_cz,
                 row_number() OVER (PARTITION BY url_norm
                   ORDER BY ts_us DESC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY url_norm) AS n_crawls,
                 sum(is_cz) OVER (PARTITION BY url_norm) AS n_canonicalized
          FROM n WHERE url_norm IS NOT NULL
        )
        SELECT url_norm, doc_id AS rep_id, ts_us AS latest_ts_us,
               CAST(n_crawls AS BIGINT) AS n_crawls,
               CAST(n_canonicalized AS BIGINT) AS n_canonicalized
        FROM r WHERE rn = 1
    """


def q_kg_pattern_join(spark, sf_dir):
    """Statistics-driven two-pattern join (engine/kgquery.
    pattern_join_ordered): the maintained predicate-stats table picks the
    selective pattern (mentions_spark) as the BROADCAST side against the
    dense one (lang) — the join-ordering decision an RDF store keeps its
    statistics for; both patterns are filters over ONE triple table, so
    Spark's own size estimates cannot make this call.  Output is
    plan-independent (oracle = the naive self-join)."""
    from literature_to_facts_spark.engine.kgquery import (
        pattern_join_ordered,
        predicate_stats,
    )

    triples = _kg_rich_triples(spark, sf_dir).persist()
    stats = predicate_stats(triples)
    return pattern_join_ordered(triples, "mentions_spark", "lang", stats)


def q_crawl_ingest_gate(spark, sf_dir):
    """The composed web-ingest gate end-to-end (the pre-pipeline every
    crawl corpus runs before any text-level stage): raw pages ->
    canonical-aware snapshot dedup (urls.url_canonical_dedup — mirror
    fetch-urls merge under their declared rel=canonical, latest crawl
    wins) -> robots-meta gate on the surviving representative
    (html.html_meta_directives — noindex reps drop) -> registered-domain
    blocklist on the canonical group key (urls.url_domain_blocklist, one
    broadcast anti join).  One operator's output feeds the next with no
    materialization; the whole chain is oracled bit-exactly through the
    canonical battery, the argmax window, the robots tokens and the
    second-level-TLD domain extraction."""
    from literature_to_facts_spark.datapipe.html import html_meta_directives
    from literature_to_facts_spark.datapipe.urls import (
        url_canonical_dedup,
        url_domain_blocklist,
    )

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"timestamp_micros(cast(doc_id % 11 as bigint) * 3600000000"
        f" + {_SNAP_TS_BASE_US}) AS warc_ts",
        f"{_META_HTML_CANON_SPARK} AS html",
    )
    groups = url_canonical_dedup(docs)
    flags = html_meta_directives(docs.select("doc_id", "html")).select(
        F.col("doc_id").alias("rep_id"), "robots_noindex"
    )
    reps = groups.join(flags, on="rep_id").where(~F.col("robots_noindex"))
    blocked = spark.createDataFrame(
        [(d,) for d in _BLOCKED_DOMAINS], "domain string"
    )
    kept = url_domain_blocklist(
        reps.drop("robots_noindex"), blocked, url_col="url_norm"
    )
    return kept.select(
        "url_norm",
        F.col("rep_id").cast("bigint").alias("rep_id"),
        F.unix_micros(F.col("latest_ts")).alias("latest_ts_us"),
        "n_crawls",
        "n_canonicalized",
    )


def _crawl_ingest_gate_oracle() -> str:
    from literature_to_facts_spark.datapipe.html import (
        _A_WS,
        CANONICAL_PATTERNS,
        HTTP_LINK_PATTERN,
        META_ROBOTS_PATTERNS,
    )
    from literature_to_facts_spark.datapipe.urls import SECOND_LEVEL_TLDS

    def q(pat: str) -> str:
        return pat.replace("'", "''")

    def fold(pats):
        arrays = [
            f"regexp_extract_all(html, '{q(p)}', 1)" for p in pats
        ]
        out = arrays[0]
        for a in arrays[1:]:
            out = f"list_concat({out}, {a})"
        return out

    http = q(HTTP_LINK_PATTERN)
    slds = ", ".join(f"'{s}'" for s in SECOND_LEVEL_TLDS)
    blocked = ", ".join(f"'{d}'" for d in _BLOCKED_DOMAINS)
    return f"""
        WITH h AS (
          SELECT doc_id, {_URL_FIXTURE_DUCK} AS url,
                 CAST(doc_id % 11 AS BIGINT) * 3600000000
                   + {_SNAP_TS_BASE_US} AS ts_us,
                 {_META_HTML_CANON_DUCK} AS html
          FROM documents
        ),
        cz AS (
          SELECT doc_id, url, ts_us, html,
                 CASE WHEN len({fold(CANONICAL_PATTERNS)}) > 0
                      THEN split_part(trim(({fold(CANONICAL_PATTERNS)})[1]),
                                      '#', 1) END AS canon,
                 ',' || regexp_replace(
                     lower(coalesce(array_to_string(
                         {fold(META_ROBOTS_PATTERNS)}, ','), '')),
                     '{_A_WS}+', '', 'g') || ',' AS rn_toks
          FROM h
        ),
        e AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id, ts_us,
                 (contains(rn_toks, ',noindex,')
                  OR contains(rn_toks, ',none,')) AS noindex,
                 CASE WHEN canon IS NOT NULL AND canon <> ''
                           AND regexp_matches(canon, '{http}')
                      THEN canon ELSE url END AS url,
                 CASE WHEN canon IS NOT NULL AND canon <> ''
                           AND regexp_matches(canon, '{http}')
                      THEN 1 ELSE 0 END AS is_cz
          FROM cz
        ),
        n AS (
          SELECT doc_id, ts_us, is_cz, noindex,
                 {_duck_url_norm()} AS url_norm
          FROM e
        ),
        r AS (
          SELECT url_norm, doc_id, ts_us, noindex,
                 row_number() OVER (PARTITION BY url_norm
                   ORDER BY ts_us DESC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY url_norm) AS n_crawls,
                 sum(is_cz) OVER (PARTITION BY url_norm) AS n_canonicalized
          FROM n WHERE url_norm IS NOT NULL
        ),
        reps AS (
          SELECT url_norm, doc_id AS rep_id, ts_us AS latest_ts_us,
                 CAST(n_crawls AS BIGINT) AS n_crawls,
                 CAST(n_canonicalized AS BIGINT) AS n_canonicalized
          FROM r WHERE rn = 1 AND NOT noindex
        ),
        dom AS (
          SELECT reps.*,
                 string_split(lower(regexp_extract(url_norm,
                     '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/:?#]*)', 1)), '.')
                   AS labs
          FROM reps
        )
        SELECT url_norm, rep_id, latest_ts_us, n_crawls, n_canonicalized
        FROM dom
        WHERE (CASE WHEN len(labs) <= 2 THEN array_to_string(labs, '.')
                    WHEN (labs[-2] || '.' || labs[-1]) IN ({slds})
                      THEN labs[-3] || '.' || labs[-2] || '.' || labs[-1]
                    ELSE labs[-2] || '.' || labs[-1] END)
              NOT IN ({blocked})
    """


def q_kg_cooccurrence_pmi(spark, sf_dir):
    """PMI-weighted co-mention edges (engine/kgquery.cooccurrence_pmi):
    association scores over the same keyword-entity mention frame as
    kg_entity_cooccurrence, document frequencies broadcast-joined."""
    from literature_to_facts_spark.engine.kgquery import cooccurrence_pmi

    docs = _spread(_t(spark, sf_dir, "documents"))
    mentions = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_KG_MENTION_RE), F.lit(1))
        ).alias("entity"),
    )
    return cooccurrence_pmi(mentions, max_entities_per_doc=64)



# anchor-text fixture: every page names target t{m5}.example.com/p twice
# ("Read <b>More</b>" and "story {m3}" — a real frequency ranking), links a
# per-doc root-relative page with messy whitespace, an unquoted dir-relative
# href, an EMPTY anchor (profile-excluded) and a mailto (scheme-dropped).
# ONE template, both engines.
_ANCHOR_HTML_TMPL = (
    "'<html><body>"
    '<a href="https://t' + "' || {m5} || '" + '.example.com/p">Read <b>More</b></a>'
    "<a id=''x'' href=''/r/' || {id} || '.html''>  deep   page </a>"
    '<a href="https://t' + "' || {m5} || '" + '.example.com/p">story ' + "' || {m3} || '" + '</a>'
    "<a href=rel' || {m3} || '.html>rel  anchor</a>"
    '<a href="https://t' + "' || {m5} || '" + '.example.com/q"></a>'
    '<a href="mailto:a@b.c">mail me</a>'
    "</body></html>'"
)
_ANCHOR_HTML_SPARK = _ANCHOR_HTML_TMPL.format(
    id="cast(doc_id as string)",
    m3="cast(doc_id % 3 as string)",
    m5="cast(doc_id % 5 as string)",
)
_ANCHOR_HTML_DUCK = _ANCHOR_HTML_TMPL.format(
    id="cast(doc_id as varchar)",
    m3="cast(doc_id % 3 as varchar)",
    m5="cast(doc_id % 5 as varchar)",
)


def q_web_anchor_text(spark, sf_dir):
    """Inlink anchor-text profile (datapipe/html.html_extract_anchors ->
    anchor_text_profile): the web-KG entity-naming table — per link
    target, its top-3 casefolded anchor texts by (count desc, anchor asc)
    plus anchored-inlink / distinct-anchor / distinct-source-host evidence
    counts.  Extraction and resolution share one definition with
    html_extract_links (pair battery zips group-1/group-2 arrays of the
    SAME pattern); the profile's window runs only over the aggregated
    (target, anchor) rows."""
    from literature_to_facts_spark.datapipe.html import (
        anchor_text_profile,
        html_extract_anchors,
    )
    from literature_to_facts_spark.datapipe.urls import URL_PATTERN

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"{_ANCHOR_HTML_SPARK} AS html",
    )
    anchors = html_extract_anchors(docs).withColumns(
        {
            "src_host": F.nullif(
                F.lower(F.regexp_extract(F.col("url"), URL_PATTERN, 2)),
                F.lit(""),
            )
        }
    )
    return anchor_text_profile(anchors, src_host_col="src_host")


def _web_anchor_text_oracle(restrict: str = "") -> str:
    """Full anchor-profile replay; ``restrict`` is an optional SQL
    predicate over ``nz`` (which carries ``doc_id``) whose matching rows'
    targets select WHICH profiles are emitted — the incremental oracle is
    the full profile restricted to batch-touched targets."""
    from literature_to_facts_spark.datapipe.html import _WS_CLASS

    g = _duck_url_group
    keep = (
        f", keep AS (SELECT DISTINCT link_url FROM nz WHERE {restrict})"
        if restrict
        else ""
    )
    keep_join = " JOIN keep USING (link_url)" if restrict else ""
    return f"""
        WITH {_duck_links_ctes(html_expr=_ANCHOR_HTML_DUCK, pairs=True)},
        base AS (
          SELECT doc_id, link_url,
                 lower(trim(regexp_replace(regexp_replace(anchor_raw,
                       '<[^>]+>', ' ', 'g'), '{_WS_CLASS}', ' ', 'g'))) AS a,
                 NULLIF(src_host, '') AS src_host
          FROM links
        ),
        nz AS (SELECT * FROM base WHERE a <> ''){keep},
        pa AS (
          SELECT link_url, a, COUNT(*) AS n FROM nz GROUP BY link_url, a
        ),
        tk AS (
          SELECT link_url, string_agg(a, ',' ORDER BY n DESC, a ASC) AS top_anchors
          FROM (
            SELECT link_url, a, n,
                   ROW_NUMBER() OVER (PARTITION BY link_url
                                      ORDER BY n DESC, a ASC) AS rn
            FROM pa
          ) WHERE rn <= 3 GROUP BY link_url
        ),
        st AS (
          SELECT link_url,
                 CAST(COUNT(*) AS BIGINT) AS n_anchored_inlinks,
                 CAST(COUNT(DISTINCT a) AS BIGINT) AS n_anchors,
                 CAST(COUNT(DISTINCT src_host) AS BIGINT) AS n_src_hosts
          FROM nz GROUP BY link_url
        )
        SELECT st.link_url, n_anchored_inlinks, n_anchors, n_src_hosts,
               top_anchors
        FROM st JOIN tk USING (link_url){keep_join}
    """


def q_web_anchor_text_incremental(spark, sf_dir):
    """Delta maintenance of the anchor-text naming profile (datapipe/html.
    build_anchor_index -> anchor_text_profile_incremental, the ELEVENTH
    probe-shaped family): history = pages with doc_id % 10 != 0, batch =
    the rest; the batch's targets broadcast and semi-filter the persisted
    (tav_key, target, kind, val, n) evidence index at its scan, per-anchor
    counts merge by SUM and the distinct-anchor/-host evidence by counting
    merged rows (existence).  Oracle = the FULL profile over all pages
    restricted to batch-touched targets — stale-count and missed-merge
    failures are both oracle-visible."""
    from literature_to_facts_spark.datapipe.html import (
        anchor_text_profile_incremental,
        build_anchor_index,
        html_extract_anchors,
    )
    from literature_to_facts_spark.datapipe.urls import URL_PATTERN

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"{_ANCHOR_HTML_SPARK} AS html",
    )
    reg = []
    # the anchor-extraction battery feeds both the history and the batch
    # index builds (disjoint doc_id filters of the same frame) — persist
    # runs it once instead of once per half; results-neutral
    anchors = html_extract_anchors(docs).withColumns(
        {
            "src_host": F.nullif(
                F.lower(F.regexp_extract(F.col("url"), URL_PATTERN, 2)),
                F.lit(""),
            )
        }
    ).persist()
    reg.append(anchors)
    hist = anchors.where(F.col("doc_id") % 10 != 0)
    batch = anchors.where(F.col("doc_id") % 10 == 0)
    old_index = build_anchor_index(hist, src_host_col="src_host")
    out = anchor_text_profile_incremental(
        batch, old_index, src_host_col="src_host", cache_registry=reg
    )
    out._l2f_cache_registry = reg
    return out


def q_kg_star_join(spark, sf_dir):
    """Statistics-driven N-pattern star join (engine/kgquery.
    star_join_ordered): three same-subject patterns over ONE triple table
    — the maintained predicate stats anchor the densest pattern (lang /
    source tie) and BROADCAST the selective ones, most-selective pruning
    first; Spark's own estimates see the whole table on every side and
    cannot order this.  Output is plan-independent (oracle = the naive
    chained self-join)."""
    from literature_to_facts_spark.engine.kgquery import (
        predicate_stats,
        star_join_ordered,
    )

    triples = _kg_rich_triples(spark, sf_dir).persist()
    stats = predicate_stats(triples)
    return star_join_ordered(
        triples,
        ["mentions_spark", "source", "mentions_merge"],
        stats,
        aliases=["n_spark", "src", "n_merge"],
    )


def q_kg_triple_provenance(spark, sf_dir):
    """Per-fact provenance aggregation (engine/kgquery.triple_provenance):
    raw co-mention assertions — one row per keyword-pair INSTANCE per
    document (occurrence-count multiplicity, not per-doc dedup) with a
    per-doc crawl stamp — collapse to set semantics WITHOUT losing the
    evidence: distinct asserting docs, raw assertion count, first/last
    seen (epoch micros).  The reference's graph build drops this on the
    floor (facts/core.py:197-226); a web KG gates and re-crawls by it."""
    from literature_to_facts_spark.engine.kgquery import triple_provenance

    docs = _spread(_t(spark, sf_dir, "documents"))
    m = docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_KG_MENTION_RE), F.lit(1))
        ).alias("kw"),
    )
    # every occurrence pairs with every occurrence of a later keyword in
    # the same doc: n_a * n_b assertion rows per (doc, pair) — real
    # multiplicity (entity_cooccurrence's cap guards the unbounded case;
    # the fixture mention counts are prose-bounded)
    a = m.select("doc_id", F.col("kw").alias("subj"))
    b = m.select("doc_id", F.col("kw").alias("obj"))
    assertions = (
        a.join(b, on="doc_id")
        .where(F.col("subj") < F.col("obj"))
        .select(
            "subj",
            F.lit("comentions").alias("pred"),
            "obj",
            "doc_id",
            (F.col("doc_id") * 3600000000 + F.lit(1500000000000000)).alias(
                "ts_us"
            ),
        )
    )
    return triple_provenance(assertions, doc_col="doc_id", ts_col="ts_us")


# deterministic 37-node host graph with cycles and branching (two functional
# edge maps per doc) — the property-path fixture; identical in both engines
_PATH_EDGES_EXPRS = [
    ("concat('h', cast(doc_id % 37 as string))",
     "concat('h', cast((doc_id * 7 + 3) % 37 as string))"),
    ("concat('h', cast(doc_id % 37 as string))",
     "concat('h', cast((doc_id * 5 + 11) % 37 as string))"),
]
_PATH_MAX_DEPTH = 4


def q_kg_path_closure(spark, sf_dir):
    """Bounded-depth property-path closure (engine/kgquery.path_closure):
    SPARQL ``?a link{1,4} ?b`` over a cyclic host graph — every reachable
    (src, dst) pair with its MIN-hop depth.  Frontier-pruned BFS: round d
    joins only pairs first reached at d-1 (persisted, anti-joined against
    the accumulated closure), so cycles terminate and each output pair is
    expanded exactly once.  Oracle = DuckDB recursive CTE (min depth per
    pair), bit-exact including the cycle/self-loop rows."""
    from literature_to_facts_spark.engine.kgquery import path_closure

    docs = _t(spark, sf_dir, "documents")
    parts = [
        docs.selectExpr(f"{s} AS src", f"{d} AS dst")
        for s, d in _PATH_EDGES_EXPRS
    ]
    edges = parts[0].unionByName(parts[1])
    reg = []
    # early_exit=False: the fixture graph does not converge before
    # max_depth, so the per-round eager head(1) probes only serialized 3
    # extra driver round-trips into the timed build; the lazy finite chain
    # computes the identical closure (beyond-convergence rounds are empty
    # joins AQE collapses)
    out = path_closure(
        edges, _PATH_MAX_DEPTH, cache_registry=reg, early_exit=False
    )
    out._l2f_cache_registry = reg
    return out


def _kg_path_closure_oracle() -> str:
    dup = " UNION ALL ".join(
        f"SELECT {s.replace('as string', 'as varchar')} AS src, "
        f"{d.replace('as string', 'as varchar')} AS dst FROM documents"
        for s, d in _PATH_EDGES_EXPRS
    )
    return f"""
        WITH RECURSIVE e AS (
          SELECT DISTINCT src, dst FROM ({dup})
        ),
        r AS (
          SELECT src, dst, 1 AS depth FROM e
          UNION
          SELECT r.src, e2.dst, r.depth + 1
          FROM r JOIN e e2 ON r.dst = e2.src
          WHERE r.depth < {_PATH_MAX_DEPTH}
        )
        SELECT src, dst, CAST(MIN(depth) AS INTEGER) AS depth
        FROM r GROUP BY src, dst
    """


# main-content fixture: nav (link-saturated), short heading, two long
# article paragraphs (one with an inline link and entities — kept), a
# sub-threshold block and a link-only footer.  ONE template, both engines.
_MAIN_HTML_TMPL = (
    "'<html><body>"
    '<div><a href="/">Home</a> <a href="/n">News</a> '
    '<a href="/t' + "' || {m5} || '" + '">Tab</a></div>'
    "<h2>Story ' || {m3} || '</h2>"
    "<p>Article ' || {id} || ' body text with plenty of prose about topic "
    "' || {m7} || ' and an "
    '<a href="/rel' + "' || {m3} || '" + '.html">inline link</a>'
    " plus more words to clear the bar.</p>"
    "<p>Numbers &amp; facts: the quick brown fox ' || {m5} || ' jumped over "
    "' || {m7} || ' lazy dogs repeatedly.</p>"
    "<p>short</p>"
    '<div><a href="/tos">Terms</a><a href="/p">Privacy</a></div>'
    "</body></html>'"
)
_MAIN_HTML_SPARK = _MAIN_HTML_TMPL.format(
    id="cast(doc_id as string)",
    m3="cast(doc_id % 3 as string)",
    m5="cast(doc_id % 5 as string)",
    m7="cast(doc_id % 7 as string)",
)
_MAIN_HTML_DUCK = _MAIN_HTML_TMPL.format(
    id="cast(doc_id as varchar)",
    m3="cast(doc_id % 3 as varchar)",
    m5="cast(doc_id % 5 as varchar)",
    m7="cast(doc_id % 7 as varchar)",
)
_MAIN_MIN_CHARS, _MAIN_MAX_LINK_PCT = 30, 33


def q_html_main_content(spark, sf_dir):
    """Boilerpipe-style main-content extraction (datapipe/html.
    html_main_content): block splitting at block-tag boundaries + per-block
    link-density scoring, entirely per-row (zero shuffle) — nav/footer
    blocks drop, article prose survives.  The oracle replays the whole
    chain in DuckDB (block pattern, anchor-inner battery, entity decode
    and the integer density rule interpolate from the module)."""
    from literature_to_facts_spark.datapipe.html import html_main_content

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id", f"{_MAIN_HTML_SPARK} AS html"
    )
    out = html_main_content(
        docs,
        min_block_chars=_MAIN_MIN_CHARS,
        max_link_density_pct=_MAIN_MAX_LINK_PCT,
    )
    return out.select(
        "doc_id",
        "n_blocks",
        "n_kept",
        F.coalesce("main_text", F.lit("")).alias("main_text"),
    )


def _main_content_ctes(html_expr: str | None = None,
                       src_rel: str = "documents") -> str:
    """The html_main_content replay as a CTE chain ending at
    ``mc(doc_id, n_blocks, n_kept, main_text)`` — shared by the
    html_main_content / web_extract_gate / crawl_warc_chain oracles.
    Block / anchor-inner / inline patterns, the entity table and both
    thresholds interpolate from datapipe.html (operator edits propagate).
    ``html_expr``/``src_rel`` override the html fixture expression and the
    relation it reads (must expose ``doc_id``)."""
    from literature_to_facts_spark.datapipe.html import (
        ANCHOR_INNER_PATTERN,
        BLOCK_TAG_PATTERN,
        HTML_ENTITIES,
        HTML_STRIP_PATTERNS,
        INLINE_TAG_PATTERN,
        _WS_CLASS,
    )

    def q(pat: str) -> str:
        return pat.replace("'", "''")

    h = html_expr or _MAIN_HTML_DUCK
    for pat, repl in HTML_STRIP_PATTERNS[:3]:
        h = f"regexp_replace({h}, '{q(pat)}', '{repl}', 'g')"
    inline = (
        f"trim(regexp_replace(regexp_replace({{x}}, '{q(INLINE_TAG_PATTERN)}',"
        f" ' ', 'g'), '{q(_WS_CLASS)}', ' ', 'g'))"
    )
    dec = f"regexp_replace({{x}}, '{q(INLINE_TAG_PATTERN)}', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        dec = f"replace({dec}, '{q(ent)}', '{q(ch)}')"
    dec = f"trim(regexp_replace({dec}, '{q(_WS_CLASS)}', ' ', 'g'))"
    return f"""
        b AS (
          SELECT doc_id,
                 string_split(regexp_replace({h}, '{q(BLOCK_TAG_PATTERN)}',
                              chr(30), 'g'), chr(30)) AS blocks
          FROM {src_rel}
        ),
        st AS (
          SELECT doc_id, list_transform(blocks, x -> struct_pack(
                   txt := {dec.format(x="x")},
                   n_raw := length({inline.format(x="x")}),
                   link_chars := coalesce(list_sum(list_transform(
                     regexp_extract_all(x, '{q(ANCHOR_INNER_PATTERN)}', 1),
                     y -> length({inline.format(x="y")}))), 0)
                 )) AS stats
          FROM b
        ),
        k AS (
          SELECT doc_id, stats,
                 list_filter(stats, s -> s.n_raw >= {_MAIN_MIN_CHARS}
                   AND s.link_chars * 100 <= {_MAIN_MAX_LINK_PCT} * s.n_raw
                   AND s.txt <> '') AS kept
          FROM st
        ),
        mc AS (
          SELECT doc_id,
                 CAST(len(list_filter(stats, s -> s.n_raw > 0)) AS INTEGER)
                   AS n_blocks,
                 CAST(len(kept) AS INTEGER) AS n_kept,
                 coalesce(array_to_string(list_transform(kept, s -> s.txt),
                          chr(10)), '') AS main_text
          FROM k
        )"""


def _html_main_content_oracle() -> str:
    return f"""
        WITH {_main_content_ctes()}
        SELECT doc_id, n_blocks, n_kept, main_text FROM mc
    """


def q_web_extract_gate(spark, sf_dir):
    """Composed extract-then-gate chain (the production page -> training-doc
    path): raw html -> html_main_content (block split + link-density keep)
    -> textstats.quality_filter over the EXTRACTED text — the gate decision
    changes when boilerplate is stripped first, which is why the stages
    compose.  One plan, no materialization between stages: the per-row
    main-content battery fuses into the scan and the gate adds only
    per-row expressions (zero shuffle end-to-end).  Oracle replays the
    whole chain (main-content CTEs -> the shared quality-gate CTE over the
    extracted text)."""
    from literature_to_facts_spark.datapipe.html import html_main_content
    from literature_to_facts_spark.datapipe.textstats import quality_filter

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id", f"{_MAIN_HTML_SPARK} AS html"
    )
    mc = html_main_content(
        docs,
        min_block_chars=_MAIN_MIN_CHARS,
        max_link_density_pct=_MAIN_MAX_LINK_PCT,
    )
    gated = quality_filter(mc, text_col="main_text")
    return gated.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "n_kept",
        F.col("keep").cast("boolean").alias("keep"),
        F.coalesce("drop_reason", F.lit("kept")).alias("reason"),
    )


def _web_extract_gate_oracle() -> str:
    return f"""
        WITH {_main_content_ctes()},
        mct AS (SELECT doc_id, main_text AS text, n_kept FROM mc),
        {_quality_gated_cte(src="mct")}
        SELECT g.doc_id, mct.n_kept, (g.drop_reason IS NULL) AS keep,
               COALESCE(g.drop_reason, 'kept') AS reason
        FROM gated g JOIN mct USING (doc_id)
    """


def q_web_frontier_rank(spark, sf_dir):
    """Crawl-frontier prioritization (the loop a production crawler closes):
    extracted links -> candidates not yet crawled (anti-join against the
    corpus' own urls) -> scored by host authority over crawl depth —
    score = host pagerank (integer micro-units) div (1 + path depth), the
    classic frontier heuristic (authoritative hosts first, shallow pages
    before deep archives).  Composes html_extract_links + graphs.pagerank
    + the URL part regex with no materialization; all-integer scoring so
    the oracle is bit-exact through the whole chain."""
    from literature_to_facts_spark.datapipe.graphs import pagerank
    from literature_to_facts_spark.datapipe.html import html_extract_links
    from literature_to_facts_spark.datapipe.urls import URL_PATTERN

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{_URL_FIXTURE_SPARK} AS url",
        f"{_LINKS_HTML_SPARK} AS html",
    )
    reg = []
    # links feeds BOTH the pagerank edge list and the frontier candidates;
    # without the persist the scan-fused link-extraction battery executes
    # once per consumer (exchange reuse does not cross the pagerank cache
    # materialization) — persist is results-neutral
    links = html_extract_links(docs).persist()
    reg.append(links)
    src = F.lower(F.regexp_extract(F.col("url"), URL_PATTERN, 2))
    edges = (
        links.select(src.alias("src"), F.col("link_host").alias("dst"))
        .where(F.col("src").isNotNull() & (F.col("src") != ""))
        .distinct()
    )
    ranks = pagerank(edges, cache_registry=reg, **_PAGERANK_PARAMS).select(
        F.col("node"), F.col("rank_micro")
    )
    seen = docs.select(F.col("url")).distinct()
    cand = (
        links.select("link_url", "link_host").distinct()
        .join(seen, F.col("link_url") == F.col("url"), "left_anti")
        .withColumns(
            {
                "depth": F.size(
                    F.filter(
                        F.split(
                            F.regexp_extract(F.col("link_url"), URL_PATTERN, 4),
                            "/",
                        ),
                        lambda s: s != F.lit(""),
                    )
                ).cast("int")
            }
        )
    )
    out = (
        cand.join(ranks, cand["link_host"] == ranks["node"], "left")
        .select(
            "link_url",
            F.col("link_host").alias("host"),
            "depth",
            F.coalesce("rank_micro", F.lit(0).cast("bigint")).alias(
                "rank_micro"
            ),
            F.expr("coalesce(rank_micro, 0L) div (1 + depth)")
            .cast("bigint")
            .alias("score_micro"),
        )
    )
    out._l2f_cache_registry = reg
    return out


def _web_frontier_rank_oracle() -> str:
    ctes, final = _duck_pagerank_ctes(
        _PAGERANK_PARAMS["iters"], _PAGERANK_PARAMS["damping_micro"]
    )
    g = _duck_url_group
    return f"""
        WITH {_duck_links_ctes()},
        e AS (
          SELECT DISTINCT src_host AS src, link_host AS dst
          FROM links
          WHERE src_host IS NOT NULL AND src_host <> ''
        ),
        {ctes},
        seen AS (
          SELECT DISTINCT {_URL_FIXTURE_DUCK} AS url FROM documents
          WHERE {_URL_FIXTURE_DUCK} IS NOT NULL  -- NOT IN over a NULL set
        ),                                       -- filters EVERY row
        cand AS (
          SELECT DISTINCT link_url, link_host,
                 CAST(len(list_filter(string_split({g(4, "link_url")}, '/'),
                      x -> x <> '')) AS INTEGER) AS depth
          FROM links
          WHERE link_url NOT IN (SELECT url FROM seen)
        )
        SELECT cand.link_url, cand.link_host AS host, cand.depth,
               coalesce(r.r, CAST(0 AS BIGINT)) AS rank_micro,
               CAST(coalesce(r.r, 0) // (1 + cand.depth) AS BIGINT)
                 AS score_micro
        FROM cand LEFT JOIN {final} r ON cand.link_host = r.node
    """


# robots fixture: per host a body with a googlebot-only group (must be
# ignored), a star group (Disallow /p<hid> + Allow /p<hid>/ok + inline
# comment + empty Disallow + Crawl-delay noise); every 3rd host has NO star
# group.  ONE template, both engines ({h} = the host-id cast).
_ROBOTS_BODY_TMPL = (
    "CASE WHEN hid % 3 = 0 THEN concat('User-agent: googlebot', chr(10),"
    " 'Disallow: /')"
    " ELSE concat('# crawl rules', chr(10),"
    " 'User-agent: googlebot', chr(10), 'Disallow: /', chr(10),"
    " 'User-agent: *', chr(10),"
    " 'Disallow: /p', {h}, '   # private', chr(10),"
    " 'Allow: /p', {h}, '/ok', chr(10),"
    " 'Crawl-delay: 5', chr(10), 'Disallow:') END"
)
_ROBOTS_URL_TMPL = (
    "concat('http://h', {h7}, '.example.com',"
    " CASE {m4} WHEN 0 THEN concat('/p', {h7}, '/x')"
    " WHEN 1 THEN concat('/p', {h7}, '/ok/y')"
    " WHEN 2 THEN '/open/z' ELSE concat('/p', {h7}, '/oklahoma') END)"
)


def q_web_robots_gate(spark, sf_dir):
    """robots.txt parsing + frontier gating (datapipe/robots.parse_robots ->
    apply_robots): per-host rule extraction from the raw file format
    (comment strip, multi-agent group headers, star-group selection,
    empty-Disallow skip) and longest-prefix-match URL gating with the
    Allow tiebreak.  The '/oklahoma' candidate pins prefix (not segment)
    semantics: it matches Disallow /p<h> but NOT Allow /p<h>/ok.  Rules
    are hosts-sized and BROADCAST — the frontier is never shuffled; the
    oracle replays the group-window parse and the ranked match."""
    from literature_to_facts_spark.datapipe.robots import (
        apply_robots,
        parse_robots,
    )

    docs = _t(spark, sf_dir, "documents")
    h = "cast(hid as string)"
    robots = docs.selectExpr("doc_id % 7 AS hid").distinct().selectExpr(
        f"concat('h', {h}, '.example.com') AS host",
        _ROBOTS_BODY_TMPL.format(h=h) + " AS robots_txt",
    )
    urls = docs.selectExpr(
        _ROBOTS_URL_TMPL.format(
            h7="cast(doc_id % 7 as string)", m4="cast(doc_id % 4 as int)"
        )
        + " AS url"
    )
    return apply_robots(urls, parse_robots(robots))


def _web_robots_gate_oracle() -> str:
    g = _duck_url_group
    h = "CAST(hid AS VARCHAR)"
    body = _ROBOTS_BODY_TMPL.format(h=h)
    url = _ROBOTS_URL_TMPL.format(
        h7="CAST(doc_id % 7 AS VARCHAR)", m4="CAST(doc_id % 4 AS INTEGER)"
    )
    return f"""
        WITH hosts AS (SELECT DISTINCT doc_id % 7 AS hid FROM documents),
        rb AS (
          SELECT 'h' || {h} || '.example.com' AS host, {body} AS body
          FROM hosts
        ),
        rlines AS (
          SELECT host, u.pos AS pos, u.line AS line
          FROM (SELECT host, string_split(body, chr(10)) AS parts FROM rb),
               UNNEST(list_transform(range(1, len(parts) + 1),
                      i -> {{'pos': i, 'line': parts[i]}})) AS t(u)
        ),
        typed AS (
          SELECT host, pos,
                 CASE WHEN instr(trim(split_part(line, '#', 1)), ':') = 0
                      THEN 'other'
                      WHEN lower(trim(split_part(trim(split_part(line, '#', 1)), ':', 1))) = 'user-agent' THEN 'ua'
                      WHEN lower(trim(split_part(trim(split_part(line, '#', 1)), ':', 1))) = 'allow' THEN 'allow'
                      WHEN lower(trim(split_part(trim(split_part(line, '#', 1)), ':', 1))) = 'disallow' THEN 'disallow'
                      ELSE 'other' END AS kind,
                 trim(substring(trim(split_part(line, '#', 1)),
                      instr(trim(split_part(line, '#', 1)), ':') + 1)) AS val
          FROM rlines
        ),
        marked AS (
          SELECT host, pos, kind, val,
                 CASE WHEN kind = 'ua' AND
                      coalesce(LAG(CASE WHEN kind = 'ua' THEN 1 ELSE 0 END)
                        OVER (PARTITION BY host ORDER BY pos), 0) = 0
                      THEN 1 ELSE 0 END AS run_start
          FROM typed
        ),
        grouped AS (
          SELECT host, pos, kind, val,
                 SUM(run_start)
                   OVER (PARTITION BY host ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS gid
          FROM marked
        ),
        stars AS (
          SELECT host, gid FROM grouped
          WHERE kind = 'ua' GROUP BY host, gid
          HAVING max(CASE WHEN val = '*' THEN 1 ELSE 0 END) = 1
        ),
        rules AS (
          SELECT DISTINCT g2.host, g2.kind AS rule, g2.val AS prefix
          FROM grouped g2 JOIN stars USING (host, gid)
          WHERE g2.kind IN ('allow', 'disallow') AND g2.val <> ''
            AND g2.gid > 0
        ),
        urls AS (SELECT DISTINCT {url} AS url FROM documents),
        base AS (
          SELECT url, lower({g(2, "url")}) AS host,
                 CASE WHEN {g(4, "url")} = '' THEN '/'
                      ELSE {g(4, "url")} END AS path
          FROM urls WHERE lower({g(2, "url")}) <> ''
        ),
        joined AS (
          SELECT base.url, base.host, r.rule, r.prefix
          FROM base LEFT JOIN rules r
            ON base.host = r.host AND starts_with(base.path, r.prefix)
        ),
        ranked AS (
          SELECT url, host, rule, prefix,
                 ROW_NUMBER() OVER (PARTITION BY url
                   ORDER BY (prefix IS NOT NULL) DESC,
                            length(prefix) DESC, (rule = 'allow') DESC)
                   AS rn
          FROM joined
        )
        SELECT url, host,
               CASE WHEN prefix IS NULL THEN true
                    ELSE rule = 'allow' END AS allowed,
               CAST(coalesce(length(prefix), 0) AS INTEGER) AS match_len,
               CASE WHEN prefix IS NULL THEN ''
                    WHEN rule = 'allow' THEN 'allow'
                    ELSE 'disallow' END AS match_rule
        FROM ranked WHERE rn = 1
    """


# sitemap fixture: per host 4 <url> blocks — padded loc, loc-without-
# lastmod, lastmod-without-loc (dropped), empty loc (dropped).  ONE
# template, both engines ({h} = host-id cast).
_SITEMAP_XML_TMPL = (
    "concat('<urlset>',"
    " '<url><loc>  http://h', {h}, '.example.com/a', {h}, '  </loc>',"
    " '<lastmod>2024-0', cast(hid % 9 + 1 as string_t), '-15T10:00:00Z'"
    " , '</lastmod></url>',"
    " '<url><loc>http://h', {h}, '.example.com/b', {h}, '</loc></url>',"
    " '<url><lastmod>2024-01-01</lastmod></url>',"
    " '<url><loc></loc></url>',"
    " '</urlset>')"
)


def q_web_sitemap_parse(spark, sf_dir):
    """Sitemap XML -> frontier entries (datapipe/robots.parse_sitemap):
    <url> blocks exploded, loc/lastmod extracted with padded-value trim,
    loc-less and empty-loc blocks dropped, lastmod also emitted as epoch
    DAYS (integer, so re-crawl scheduling never compares strings).
    Per-row regex battery, zero shuffle."""
    from literature_to_facts_spark.datapipe.robots import parse_sitemap

    h = "cast(hid as string)"
    sitemaps = (
        _t(spark, sf_dir, "documents")
        .selectExpr("doc_id % 5 AS hid")
        .distinct()
        .selectExpr(
            f"concat('h', {h}, '.example.com') AS host",
            _SITEMAP_XML_TMPL.format(h=h).replace("string_t", "string")
            + " AS sitemap_xml",
        )
    )
    out = parse_sitemap(sitemaps, carry_cols=("host",))
    # contract-output NULL parity: the compare harness sorts rows, and
    # NULL strings/ints break the sort — coalesce in BOTH engines
    return out.select(
        "host",
        "loc",
        F.coalesce("lastmod", F.lit("")).alias("lastmod"),
        F.coalesce("lastmod_day", F.lit(-1)).cast("int").alias("lastmod_day"),
    )


def _web_sitemap_parse_oracle() -> str:
    from literature_to_facts_spark.datapipe.robots import (
        SITEMAP_LASTMOD_PATTERN,
        SITEMAP_LOC_PATTERN,
        SITEMAP_URL_BLOCK_PATTERN,
    )

    h = "CAST(hid AS VARCHAR)"
    xml = _SITEMAP_XML_TMPL.format(h=h).replace("string_t", "varchar")
    return f"""
        WITH hosts AS (SELECT DISTINCT doc_id % 5 AS hid FROM documents),
        sm AS (
          SELECT 'h' || {h} || '.example.com' AS host, {xml} AS xml
          FROM hosts
        ),
        b AS (
          SELECT host,
                 unnest(regexp_extract_all(xml,
                        '{SITEMAP_URL_BLOCK_PATTERN}', 1)) AS blk
          FROM sm
        ),
        f AS (
          SELECT host,
                 regexp_extract(blk, '{SITEMAP_LOC_PATTERN}', 1) AS loc,
                 NULLIF(regexp_extract(blk, '{SITEMAP_LASTMOD_PATTERN}', 1),
                        '') AS lastmod
          FROM b
        )
        SELECT host, loc, coalesce(lastmod, '') AS lastmod,
               CAST(coalesce(datediff('day', DATE '1970-01-01',
                    try_cast(substring(lastmod, 1, 10) AS DATE)), -1)
                 AS INTEGER) AS lastmod_day
        FROM f WHERE loc <> ''
    """


# WARC fixture: per doc a 3-record payload — request (full headers),
# response (LOWERCASE field names, no Content-Length), header-only
# metadata trailer without the inter-record terminator.  Raw \r\n bytes
# embedded in the SQL literals; ONE template, both engines.
_WARC_TMPL = (
    "concat("
    "'WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://h', {m5},"
    " '.example.com/p', {id},"
    " '\r\nWARC-Date: 2024-02-0', {m3p1},"
    " 'T08:00:00Z\r\nContent-Length: 12\r\n\r\nGET /p', {id}, '\r\n\r\n',"
    "'WARC/1.0\r\nwarc-type: response\r\nwarc-target-uri: http://h', {m5},"
    " '.example.com/p', {id},"
    " '\r\nwarc-date: 2024-02-0', {m3p1},"
    " 'T08:00:05Z\r\n\r\n<html>body ', {id}, '</html>\r\n\r\n',"
    "'WARC/1.0\r\nWARC-Type: metadata\r\n\r\n'"
    ")"
)


def q_web_warc_parse(spark, sf_dir):
    """WARC container parsing (datapipe/warc.parse_warc): the Common-Crawl
    entry format — records split on the version line, case-insensitive
    header fields, epoch-microsecond fetch stamps (try_cast, ANSI-safe),
    bodies delimited by the header blank line with the record terminator
    trimmed.  Per-row split + regex battery, zero shuffle.  NULL-absent
    fields coalesced at the contract boundary only (checker row-sort
    parity)."""
    from literature_to_facts_spark.datapipe.warc import parse_warc

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        _WARC_TMPL.format(
            id="cast(doc_id as string)",
            m5="cast(doc_id % 5 as string)",
            m3p1="cast(doc_id % 3 + 1 as string)",
        )
        + " AS warc",
    )
    out = parse_warc(docs, carry_cols=("doc_id",))
    z = F.lit("")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.coalesce("warc_type", z).alias("warc_type"),
        F.coalesce("target_uri", z).alias("target_uri"),
        F.coalesce("warc_date", z).alias("warc_date"),
        F.coalesce("warc_ts_us", F.lit(-1)).cast("bigint").alias("warc_ts_us"),
        F.coalesce("content_length", F.lit(-1))
        .cast("bigint")
        .alias("content_length"),
        "body",
    )


def _duck_warc_ctes(warc_expr: str) -> str:
    """The parse_warc replay as a CTE chain ending at ``wrec(doc_id,
    warc_type, target_uri, warc_date, warc_ts_us, content_length, body)``
    with the operator's NULL semantics — shared by the web_warc_parse and
    crawl_warc_chain oracles.  Header patterns interpolate from
    datapipe.warc (operator edits propagate)."""
    from literature_to_facts_spark.datapipe.warc import WARC_HEADER_PATTERNS

    crlf2 = "chr(13) || chr(10) || chr(13) || chr(10)"
    pt = WARC_HEADER_PATTERNS
    return f"""
        w AS (SELECT doc_id, {warc_expr} AS warc FROM documents),
        recs AS (
          SELECT doc_id,
                 unnest(list_slice(string_split(warc,
                        'WARC/1.0' || chr(13) || chr(10)), 2, 2147483647))
                   AS rec
          FROM w
        ),
        p AS (
          SELECT doc_id, rec, instr(rec, {crlf2}) AS he FROM recs
        ),
        f AS (
          SELECT doc_id,
                 substring(rec, 1, he - 1) AS hdr,
                 regexp_replace(substring(rec, he + 4),
                                '\\r\\n\\r\\n$', '') AS body
          FROM p WHERE he > 0
        ),
        wrec AS (
          SELECT doc_id,
                 nullif(trim(regexp_extract(hdr, '{pt["warc_type"]}', 1)), '')
                   AS warc_type,
                 nullif(trim(regexp_extract(hdr, '{pt["target_uri"]}', 1)), '')
                   AS target_uri,
                 nullif(trim(regexp_extract(hdr, '{pt["warc_date"]}', 1)), '')
                   AS warc_date,
                 CAST(epoch_us(try_cast(
                      nullif(trim(regexp_extract(hdr, '{pt["warc_date"]}', 1)), '')
                      AS TIMESTAMP)) AS BIGINT) AS warc_ts_us,
                 try_cast(regexp_extract(hdr, '{pt["content_length"]}', 1)
                      AS BIGINT) AS content_length,
                 body
          FROM f
        )"""


def _web_warc_parse_oracle() -> str:
    xml = _WARC_TMPL.format(
        id="cast(doc_id as varchar)",
        m5="cast(doc_id % 5 as varchar)",
        m3p1="cast(doc_id % 3 + 1 as varchar)",
    )
    return f"""
        WITH {_duck_warc_ctes(xml)}
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               coalesce(warc_type, '') AS warc_type,
               coalesce(target_uri, '') AS target_uri,
               coalesce(warc_date, '') AS warc_date,
               CAST(coalesce(warc_ts_us, -1) AS BIGINT) AS warc_ts_us,
               CAST(coalesce(content_length, -1) AS BIGINT)
                 AS content_length,
               body
        FROM wrec
    """


# WARC chain fixture: a response record whose BODY is the main-content
# page fixture, plus a header-only metadata trailer.  {page} = the engine's
# main-html expression.
_WARC_CHAIN_TMPL = (
    "concat("
    "'WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://h', {m5},"
    " '.example.com/p', {id}, '\r\nWARC-Date: 2024-02-01T08:00:05Z\r\n\r\n',"
    " {page}, '\r\n\r\n',"
    "'WARC/1.0\r\nWARC-Type: metadata\r\n\r\n'"
    ")"
)


def q_crawl_warc_chain(spark, sf_dir):
    """The full byte-stream -> training-doc chain (the Common-Crawl recipe
    end-to-end): WARC payload -> parse_warc (response records only) ->
    html_main_content over the record BODY -> quality gate over the
    extracted text.  Three operators, one plan, no materialization
    between stages — everything is per-row, so the ONLY Exchange is the
    bench fixture's spreading repartition.  Oracle replays warc CTEs ->
    main-content CTEs -> the shared quality-gate CTE, bit-exact through
    all three stages."""
    from literature_to_facts_spark.datapipe.html import html_main_content
    from literature_to_facts_spark.datapipe.textstats import quality_filter
    from literature_to_facts_spark.datapipe.warc import parse_warc

    docs = _spread(_t(spark, sf_dir, "documents")).selectExpr(
        "doc_id",
        _WARC_CHAIN_TMPL.format(
            id="cast(doc_id as string)",
            m5="cast(doc_id % 5 as string)",
            page=_MAIN_HTML_SPARK,
        )
        + " AS warc",
    )
    pages = (
        parse_warc(docs, carry_cols=("doc_id",))
        .where(F.col("warc_type") == "response")
        .select("doc_id", F.col("target_uri"), F.col("body").alias("html"))
    )
    mc = html_main_content(
        pages,
        min_block_chars=_MAIN_MIN_CHARS,
        max_link_density_pct=_MAIN_MAX_LINK_PCT,
    )
    gated = quality_filter(mc, text_col="main_text")
    return gated.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "target_uri",
        "n_kept",
        F.col("keep").cast("boolean").alias("keep"),
        F.coalesce("drop_reason", F.lit("kept")).alias("reason"),
    )


def _crawl_warc_chain_oracle() -> str:
    xml = _WARC_CHAIN_TMPL.format(
        id="cast(doc_id as varchar)",
        m5="cast(doc_id % 5 as varchar)",
        page=_MAIN_HTML_DUCK,
    )
    return f"""
        WITH {_duck_warc_ctes(xml)},
        pages AS (
          SELECT doc_id, target_uri, body AS page_html
          FROM wrec WHERE warc_type = 'response'
        ),
        {_main_content_ctes(html_expr="page_html", src_rel="pages")},
        mct AS (SELECT doc_id, main_text AS text, n_kept FROM mc),
        {_quality_gated_cte(src="mct")}
        SELECT CAST(g.doc_id AS BIGINT) AS doc_id, pages.target_uri,
               mct.n_kept, (g.drop_reason IS NULL) AS keep,
               COALESCE(g.drop_reason, 'kept') AS reason
        FROM gated g JOIN mct USING (doc_id) JOIN pages USING (doc_id)
    """


_ROBOTS_SM_TAIL = (
    ", chr(10), 'Sitemap: http://h', {h}, '.example.com/sm.xml', chr(10),"
    " 'sitemap:   http://h', {h}, '.example.com/sm2.xml   # mirrors',"
    " chr(10), 'Sitemap:', chr(10),"
    " 'Sitemap: http://h', {h}, '.example.com/sm.xml'"
)


def q_web_robots_sitemaps(spark, sf_dir):
    """Sitemap directives from robots.txt (datapipe/robots.robots_sitemaps):
    group-independent per the REP — extracted from the same fixture bodies
    the gate query parses, plus case-variant / comment-tailed / empty /
    duplicate directives; distinct (host, sitemap_url) out.  One
    scan-fused extract-all, one distinct."""
    from literature_to_facts_spark.datapipe.robots import robots_sitemaps

    h = "cast(hid as string)"
    robots = (
        _t(spark, sf_dir, "documents")
        .selectExpr("doc_id % 7 AS hid")
        .distinct()
        .selectExpr(
            f"concat('h', {h}, '.example.com') AS host",
            "concat("
            + _ROBOTS_BODY_TMPL.format(h=h)
            + _ROBOTS_SM_TAIL.format(h=h)
            + ") AS robots_txt",
        )
    )
    return robots_sitemaps(robots)


def _web_robots_sitemaps_oracle() -> str:
    from literature_to_facts_spark.datapipe.robots import (
        SITEMAP_DIRECTIVE_PATTERN,
    )

    h = "CAST(hid AS VARCHAR)"
    body = (
        "concat("
        + _ROBOTS_BODY_TMPL.format(h=h)
        + _ROBOTS_SM_TAIL.format(h=h)
        + ")"
    )
    return f"""
        WITH hosts AS (SELECT DISTINCT doc_id % 7 AS hid FROM documents),
        rb AS (
          SELECT 'h' || {h} || '.example.com' AS host, {body} AS body
          FROM hosts
        ),
        v AS (
          SELECT host,
                 trim(unnest(regexp_extract_all(body,
                      '{SITEMAP_DIRECTIVE_PATTERN}', 1))) AS sitemap_url
          FROM rb
        )
        SELECT DISTINCT host, sitemap_url FROM v WHERE sitemap_url <> ''
    """


_TRIANGLE_MAX_DEGREE = 10_000


def q_web_triangle_count(spark, sf_dir):
    """Per-host triangle counts over the cyclic host graph (datapipe/graphs.
    triangle_count): the link-farm density signal — canonical undirected
    edges, ordered-wedge enumeration (each triangle once), degree cap for
    super-hubs.  Shares the path-closure fixture; oracle is the same
    two-join enumeration in DuckDB, bit-exact including degrees and the
    cap flag."""
    from literature_to_facts_spark.datapipe.graphs import triangle_count

    docs = _t(spark, sf_dir, "documents")
    parts = [
        docs.selectExpr(f"{s} AS src", f"{d} AS dst")
        for s, d in _PATH_EDGES_EXPRS
    ]
    return triangle_count(
        parts[0].unionByName(parts[1]), max_degree=_TRIANGLE_MAX_DEGREE
    )


def _web_triangle_count_oracle() -> str:
    dup = " UNION ALL ".join(
        f"SELECT {s.replace('as string', 'as varchar')} AS src, "
        f"{d.replace('as string', 'as varchar')} AS dst FROM documents"
        for s, d in _PATH_EDGES_EXPRS
    )
    cap = _TRIANGLE_MAX_DEGREE
    return f"""
        WITH raw AS ({dup}),
        e AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
        ),
        deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
          GROUP BY node
        ),
        hubs AS (SELECT node FROM deg WHERE degree > {cap}),
        ee AS (
          SELECT * FROM e
          WHERE a NOT IN (SELECT node FROM hubs)
            AND b NOT IN (SELECT node FROM hubs)
        ),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM ee e1 JOIN ee e2 ON e1.b = e2.a
                     JOIN ee e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        pn AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
          FROM (SELECT x AS node FROM tri UNION ALL
                SELECT y AS node FROM tri UNION ALL
                SELECT z AS node FROM tri)
          GROUP BY node
        )
        SELECT deg.node, deg.degree,
               coalesce(pn.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
               deg.degree > {cap} AS capped
        FROM deg LEFT JOIN pn USING (node)
    """


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry order is the driver correctness gate's sampling order (it
    # checks the first 50 entries): the 68 operators that never had a
    # driver row lead, newest lanes first (the round-6 web/kg-query/url
    # waves land inside the 50-entry window); the long-green original 50
    # follow.  Oracles and the bench address queries by NAME — the
    # registry order carries no semantics.
    return {
        "web_robots_sitemaps": q_web_robots_sitemaps,
        "crawl_warc_chain": q_crawl_warc_chain,
        "web_warc_parse": q_web_warc_parse,
        "web_sitemap_parse": q_web_sitemap_parse,
        "web_robots_gate": q_web_robots_gate,
        "web_frontier_rank": q_web_frontier_rank,
        "web_triangle_count": q_web_triangle_count,
        "text_line_dedup_grouped": q_text_line_dedup_grouped,
        "web_extract_gate": q_web_extract_gate,
        "web_anchor_text_incremental": q_web_anchor_text_incremental,
        "html_main_content": q_html_main_content,
        "kg_path_closure": q_kg_path_closure,
        "kg_triple_provenance": q_kg_triple_provenance,
        "kg_star_join": q_kg_star_join,
        "web_anchor_text": q_web_anchor_text,
        "kg_pattern_join": q_kg_pattern_join,
        "crawl_ingest_gate": q_crawl_ingest_gate,
        "kg_charsets_incremental": q_kg_charsets_incremental,
        "url_canonical_dedup": q_url_canonical_dedup,
        "html_meta_robots": q_html_meta_robots,
        "kg_cooccurrence_pmi": q_kg_cooccurrence_pmi,
        "kg_predicate_stats_incremental": q_kg_predicate_stats_incremental,
        "kg_two_hop": q_kg_two_hop,
        "kg_entity_cooccurrence": q_kg_entity_cooccurrence,
        "kg_characteristic_sets": q_kg_characteristic_sets,
        "kg_predicate_stats": q_kg_predicate_stats,
        "url_domain_quality": q_url_domain_quality,
        "url_blocklist": q_url_blocklist,
        "url_latest_snapshot": q_url_latest_snapshot,
        "url_dedup": q_url_dedup,
        "url_normalize": q_url_normalize,
        "url_parts": q_url_parts,
        "text_chunk_sliding": q_text_chunk_sliding,
        "sample_shuffle_shards": q_sample_shuffle_shards,
        "semantic_dedup_incremental": q_semantic_dedup_incremental,
        "semantic_dedup": q_semantic_dedup,
        "multimodal_features": q_multimodal_features,
        "sample_mixture_temperature": q_sample_mixture_temperature,
        "sample_mixture_weights": q_sample_mixture_weights,
        "text_pii_redact": q_text_pii_redact,
        "text_tokenize_encode": q_text_tokenize_encode,
        "text_token_topk": q_text_token_topk,
        "text_blocklist_filter": q_text_blocklist_filter,
        "kg_triples_delta": q_kg_triples_delta,
        "corpus_snapshot_diff": q_corpus_snapshot_diff,
        "sample_pack_sequences": q_sample_pack_sequences,
        "source_quality_stats": q_source_quality_stats,
        "text_quality_clf": q_text_quality_clf,
        "web_link_rank": q_web_link_rank,
        "html_extract_links": q_html_extract_links,
        "html_extract_text": q_html_extract_text,
        "graph_pagerank": q_graph_pagerank,
        "text_lm_perplexity": q_text_lm_perplexity,
        "text_span_dedup_clean": q_text_span_dedup_clean,
        "text_span_dedup_incremental": q_text_span_dedup_incremental,
        "text_span_dedup": q_text_span_dedup,
        "text_line_dedup_incremental": q_text_line_dedup_incremental,
        "text_line_dedup": q_text_line_dedup,
        "decontam_bloom": q_decontam_bloom,
        "decontam_purge": q_decontam_purge,
        "decontam_pairs": q_decontam_pairs,
        "text_repetition": q_text_repetition,
        "text_fingerprint": q_text_fingerprint,
        "text_lang_trigram": q_text_lang_trigram,
        "text_lang_id": q_text_lang_id,
        "text_quality_report": q_text_quality_report,
        "text_quality_filter": q_text_quality_filter,
        "text_quality": q_text_quality,
        "kg_triples_melt": q_kg_triples_melt,
        "kg_dict_view": q_kg_dict_view,
        "kg_valuable_filter": q_kg_valuable_filter,
        "kg_mention_detection": q_kg_mention_detection,
        "kg_entity_link": q_kg_entity_link,
        "kg_canonicalize_salted": q_kg_canonicalize_salted,
        "kg_counterpart_join": q_kg_counterpart_join,
        "kg_reaction_pivot": q_kg_reaction_pivot,
        "json_extract": q_json_extract,
        "sessionize_window": q_sessionize_window,
        "events_asof_join": q_events_asof_join,
        "events_interval_join": q_events_interval_join,
        "tpch_q1_pricing": q_tpch_q1_pricing,
        "tpch_q6_forecast": q_tpch_q6_forecast,
        "rollup_orders": q_rollup_orders,
        "anti_join_inactive_customers": q_anti_join_inactive_customers,
        "topk_orders_per_priority": q_topk_orders_per_priority,
        "tpch_q3_shipping": q_tpch_q3_shipping,
        "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
        "top_parts_by_qty": q_top_parts_by_qty,
        "set_ops_union_distinct": q_set_ops_union_distinct,
        "percentiles_by_flag": q_percentiles_by_flag,
        "dedup_exact": q_dedup_exact,
        "dedup_exact_incremental": q_dedup_exact_incremental,
        "dedup_corpus_purge": q_dedup_corpus_purge,
        "dedup_corpus_keep_best": q_dedup_corpus_keep_best,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_minhash_incremental": q_dedup_minhash_incremental,
        "dedup_lsh_bucket_stats": q_dedup_lsh_bucket_stats,
        "dedup_clusters_cc": q_dedup_clusters_cc,
        "dedup_clusters_cc_incremental": q_dedup_clusters_cc_incremental,
        "sample_hash_fraction": q_sample_hash_fraction,
        "sample_stratified_topn": q_sample_stratified_topn,
        "sample_token_budget": q_sample_token_budget,
        "curation_pipeline": q_curation_pipeline,
        "curation_pipeline_full": q_curation_pipeline_full,
        "curation_pipeline_cleaned": q_curation_pipeline_cleaned,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_simhash_incremental": q_dedup_simhash_incremental,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_embedding_incremental": q_dedup_embedding_incremental,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_ann_lsh": q_emb_ann_lsh,
        "emb_ann_lsh_multiprobe": q_emb_ann_lsh_multiprobe,
        "emb_ann_ivf": q_emb_ann_ivf,
        "emb_ann_ivf_incremental": q_emb_ann_ivf_incremental,
        "stream_windowed_counts": q_stream_windowed_counts,
        "text_token_counts": q_text_token_counts,
    }


# ---------------------------------------------------------------------------
# generated oracles for the hash/LSH family (portable md5-derived hashes:
# DuckDB computes the identical fingerprints, so candidate generation is
# checked end-to-end, not just the verified tail)
# ---------------------------------------------------------------------------

_H1 = "CAST('0x' || substr(md5({x}), 1, 13) AS BIGINT)"
_H2 = "CAST('0x' || substr(md5({x}), 14, 7) AS BIGINT)"
_H52B = "CAST('0x' || substr(md5({x}), 14, 13) AS BIGINT)"


def _duck_shingles(n: int) -> str:
    """DuckDB expression for the distinct word n-gram shingle list (mirrors
    datapipe.dedup._shingles: split on single space, lowercase, whole text
    as the only shingle when shorter than n tokens)."""
    toks = "string_split(lower(text), ' ')"
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')) "
        f"ELSE [lower(text)] END)"
    )


def _minhash_oracle(
    n_gram: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    src: str = "documents",
) -> str:
    """``src`` is the table/CTE the pairs are computed over — "documents"
    for the standalone dedup oracles, the gated-survivors CTE for the
    composed curation pipeline."""
    rpb = n_hashes // bands
    mins = ",\n                   ".join(
        f"MIN(h1 + {s} * h2) AS m{s}" for s in range(n_hashes)
    )
    banded = "\n              UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(',', "
        + ", ".join(f"m{b * rpb + i}" for i in range(rpb))
        + ") AS key FROM sig"
        for b in range(bands)
    )
    h1 = _H1.format(x="sh")
    h2 = _H2.format(x="sh")
    return f"""
            WITH sh AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest({_duck_shingles(n_gram)}) AS sh
              FROM {src} WHERE text IS NOT NULL
            ),
            h AS (SELECT doc_id, {h1} AS h1, {h2} AS h2 FROM sh),
            sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
            banded AS ({banded}),
            bsize AS (SELECT band, key, COUNT(DISTINCT doc_id) AS n
                      FROM banded GROUP BY band, key),
            cand_small AS (
              SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
              FROM banded l
              JOIN banded r ON l.band = r.band AND l.key = r.key
                           AND l.doc_id < r.doc_id
              JOIN bsize s ON s.band = l.band AND s.key = l.key
              WHERE s.n BETWEEN 2 AND {max_bucket}
            ),
            cand_exact AS (
              SELECT mn AS id_a, doc_id AS id_b FROM (
                SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                       MIN(CAST(d.doc_id AS BIGINT)) OVER (PARTITION BY md5(d.text)) AS mn
                FROM {src} d WHERE d.text IS NOT NULL
              ) WHERE doc_id > mn
            ),
            cands AS (
              SELECT DISTINCT id_a, id_b FROM (
                SELECT id_a, id_b FROM cand_small
                UNION ALL SELECT id_a, id_b FROM cand_exact)
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
              FROM cands c
              JOIN sh a ON a.doc_id = c.id_a
              JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
              GROUP BY c.id_a, c.id_b
            )
            SELECT i.id_a, i.id_b,
                   ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= {threshold}
        """


def _sample_fraction_oracle(fractions: dict, default_fraction: float) -> str:
    # round(), not int(): truncation under-samples by up to 1e-6 of the
    # requested fraction (0.29 * 1e6 floats to 289999.999...); the engine
    # computes the identical Python round, so parity is unchanged either way
    h = _H1.format(x="CAST(doc_id AS VARCHAR)")
    thresh = str(round(default_fraction * 1_000_000))
    cases = " ".join(
        f"WHEN lang = '{val}' THEN {round(frac * 1_000_000)}"
        for val, frac in sorted(fractions.items())
    )
    return f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
            FROM documents
            WHERE ({h}) % 1000000 < (CASE {cases} ELSE {thresh} END)
        """


def _sample_topn_oracle(n: int) -> str:
    h = _H1.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
            SELECT doc_id, lang FROM (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                     ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY {h} ASC, CAST(doc_id AS BIGINT) ASC) AS rk
              FROM documents) WHERE rk <= {n}
        """


def _cc_oracle(pairs_sql: str) -> str:
    """Connected components over a pair query: undirected reachability
    closure via a recursive CTE, MIN(reachable id) per node — exactly the
    fixpoint connected_components() converges to."""
    return f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
            edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b AS a, id_a AS b FROM pairs),
            nodes AS (SELECT DISTINCT a AS node FROM edges),
            closure(node, reach) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT c.node, e.b FROM closure c JOIN edges e ON e.a = c.reach
            )
            SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS cluster_rep
            FROM closure GROUP BY node
        """


def _cc_incremental_oracle(
    pairs_sql: str, touch_pred: str = "id_a % 5 = 0 OR id_b % 5 = 0"
) -> str:
    """Delta-closure contract: the full recursive closure over ALL pairs,
    restricted to components containing at least one endpoint of a pair
    matching ``touch_pred`` (the new batch)."""
    return f"""
            WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
            edges AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs
                      UNION SELECT id_b AS a, id_a AS b FROM pairs),
            nodes AS (SELECT DISTINCT a AS node FROM edges),
            closure(node, reach) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT c.node, e.b FROM closure c JOIN edges e ON e.a = c.reach
            ),
            labels AS (
              SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS cluster_rep
              FROM closure GROUP BY node
            ),
            newnodes AS (
              SELECT DISTINCT n FROM (
                SELECT id_a AS n FROM pairs WHERE {touch_pred}
                UNION ALL SELECT id_b FROM pairs WHERE {touch_pred})
            ),
            touched AS (
              SELECT DISTINCT l.cluster_rep AS r
              FROM labels l JOIN newnodes nn ON l.doc_id = nn.n
            )
            SELECT doc_id, cluster_rep FROM labels
            WHERE cluster_rep IN (SELECT r FROM touched)
        """


def _lsh_bucket_stats_oracle(
    n_gram: int = 3, n_hashes: int = 16, bands: int = 4, max_bucket: int = 20
) -> str:
    """Mirrors lsh_bucket_stats: the same signature/banding CTEs as the pair
    oracle (incl. the NULL-text exclusion on the exact band), reduced to the
    one-row bucket-population report."""
    rpb = n_hashes // bands
    mins = ",\n                   ".join(
        f"MIN(h1 + {s} * h2) AS m{s}" for s in range(n_hashes)
    )
    banded = "\n              UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat_ws(',', "
        + ", ".join(f"m{b * rpb + i}" for i in range(rpb))
        + ") AS key FROM sig"
        for b in range(bands)
    )
    h1 = _H1.format(x="sh")
    h2 = _H2.format(x="sh")
    return f"""
            WITH sh AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest({_duck_shingles(n_gram)}) AS sh
              FROM documents WHERE text IS NOT NULL
            ),
            h AS (SELECT doc_id, {h1} AS h1, {h2} AS h2 FROM sh),
            sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
            banded AS ({banded}
              UNION ALL SELECT CAST(doc_id AS BIGINT), {bands} AS band,
                               md5(text) AS key
                        FROM documents WHERE text IS NOT NULL),
            bsize AS (SELECT band, key, COUNT(DISTINCT doc_id) AS n
                      FROM banded GROUP BY band, key)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_multi_buckets,
                   CAST(SUM(CASE WHEN band < {bands} AND n > {max_bucket}
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize_buckets,
                   CAST(SUM(CASE WHEN band < {bands} AND n > {max_bucket}
                            THEN n ELSE 0 END) AS BIGINT) AS n_docs_in_oversize
            FROM bsize
        """


def _simhash_core_sql() -> str:
    """WITH-clause body computing agg(doc_id, n, c0..c63) bit-vote counts."""
    hlo = _H1.format(x="tk")
    hhi = _H52B.format(x="tk")
    sums = []
    for b in range(64):
        src, off = ("hlo", b) if b < 52 else ("hhi", b - 52)
        sums.append(f"SUM(({src} >> {off}) & 1) AS c{b}")
    sums_sql = ",\n                     ".join(sums)
    return f"""
            t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                         unnest(string_split(lower(text), ' ')) AS tk
                  FROM documents),
            h AS (SELECT doc_id, {hlo} AS hlo, {hhi} AS hhi FROM t),
            agg AS (SELECT doc_id, COUNT(*) AS n,
                     {sums_sql}
                    FROM h GROUP BY doc_id)
    """


def _simhash_fp_terms(flag: str) -> str:
    """Fingerprint as pure arithmetic over 0/1 flag expressions: bit 63 is
    the (negative) long min so the sum never overflows a signed 64-bit int.
    ``flag`` is a format string producing the flag expression for bit {b}."""
    terms = [f"({flag.format(b=b)} * {1 << b})" for b in range(63)]
    terms.append(f"({flag.format(b=63)} * (-9223372036854775807 - 1))")
    return " + ".join(terms)


def _simhash_oracle() -> str:
    flag = "(CASE WHEN 2 * c{b} > n THEN 1 ELSE 0 END)"
    return f"""
            WITH {_simhash_core_sql()}
            SELECT doc_id, CAST({_simhash_fp_terms(flag)} AS BIGINT) AS simhash
            FROM agg
        """


def _simhash_pairs_oracle(max_hamming: int = 8, max_bucket: int = 1000) -> str:
    flags = ", ".join(
        f"CASE WHEN 2 * c{b} > n THEN 1 ELSE 0 END AS f{b}" for b in range(64)
    )
    keys = ", ".join(
        " + ".join(f"(f{16 * j + i} * {1 << i})" for i in range(16)) + f" AS k{j}"
        for j in range(4)
    )
    banded = "\n              UNION ALL ".join(
        f"SELECT doc_id, simhash, {j} AS band, k{j} AS key FROM sims" for j in range(4)
    )
    return f"""
            WITH {_simhash_core_sql()},
            flags AS (SELECT doc_id, n, {flags} FROM agg),
            sims AS (SELECT doc_id,
                            CAST({_simhash_fp_terms("f{b}")} AS BIGINT) AS simhash,
                            {keys}
                     FROM flags),
            banded AS ({banded}),
            bsize AS (SELECT band, key, COUNT(DISTINCT doc_id) AS n
                      FROM banded GROUP BY band, key)
            SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                   CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
            FROM banded l
            JOIN banded r ON l.band = r.band AND l.key = r.key
                         AND l.doc_id < r.doc_id
            JOIN bsize s ON s.band = l.band AND s.key = l.key
            WHERE s.n BETWEEN 2 AND {max_bucket}
              AND bit_count(xor(l.simhash, r.simhash)) <= {max_hamming}
        """


def _ann_lsh_oracle(k: int = 5, n_planes: int = 6, dim: int = 64, seed: int = 7) -> str:
    from literature_to_facts_spark.datapipe.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)

    def bucket(col: str) -> str:
        terms = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(str(x) for x in p) + "]"
            terms.append(
                f"(CASE WHEN list_dot_product({lit}::DOUBLE[], {col}) > 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        return " + ".join(terms)

    return f"""
            WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                              embedding::DOUBLE[] AS e,
                              {bucket("embedding::DOUBLE[]")} AS bucket
                       FROM embeddings),
            q AS (SELECT vec_id AS q_id, e AS qe, bucket FROM v WHERE vec_id < 3),
            scored AS (
              SELECT q.q_id, v.vec_id,
                     ROUND(list_dot_product(q.qe, v.e) /
                       (sqrt(list_dot_product(q.qe, q.qe)) *
                        sqrt(list_dot_product(v.e, v.e))), 6) AS c6
              FROM v JOIN q USING (bucket)
            )
            SELECT q_id, vec_id, ROUND(c6, 4) AS cosine_r4, CAST(rnk AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                               ORDER BY c6 DESC, vec_id ASC) AS rnk
                  FROM scored)
            WHERE rnk <= {k}
        """


def _emb_near_dup_oracle(
    threshold: float = 0.4,
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 7,
    max_bucket: int = 1000,
) -> str:
    from literature_to_facts_spark.datapipe.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(str(x) for x in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({lit}::DOUBLE[], e) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
            WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                              embedding::DOUBLE[] AS e
                       FROM embeddings),
            vb AS (SELECT vec_id, e, {bucket} AS bucket FROM v),
            bsize AS (SELECT bucket, COUNT(*) AS n FROM vb GROUP BY bucket),
            cand AS (
              SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b,
                     l.e AS e_a, r.e AS e_b
              FROM vb l
              JOIN vb r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
              JOIN bsize s ON s.bucket = l.bucket
              WHERE s.n BETWEEN 2 AND {max_bucket}
            ),
            scored AS (
              SELECT id_a, id_b,
                     ROUND(list_dot_product(e_a, e_b) /
                       (sqrt(list_dot_product(e_a, e_a)) *
                        sqrt(list_dot_product(e_b, e_b))), 6) AS c6
              FROM cand
            )
            SELECT id_a, id_b, ROUND(c6, 4) AS cosine_r4
            FROM scored WHERE c6 >= {threshold}
        """


def _ann_ivf_oracle(
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 3,
    dim: int = 64,
    train_restrict: str | None = None,
) -> str:
    """Mirrors cosine_topk_ivf end-to-end: hash-sampled seed centroids, ONE
    Lloyd refinement (per-dimension FIXED-POINT mean: components quantized to
    integer micro-units, summed exactly, divided and floor-rounded with
    single IEEE ops — order-independent, so the mean is bit-portable; a
    ROUND(AVG) of raw doubles could flip in the last ulp between engines),
    assignment, probing and ranking.  DuckDB lists are 1-indexed, hence
    e[i+1].

    ``train_restrict`` freezes centroid training (seed + Lloyd) to a subset
    of the corpus while the inverted lists still cover everything — the
    incremental-index contract (build_ivf_index over history,
    ivf_index_append for the batch)."""
    h = _H1.format(x="CAST(vec_id AS VARCHAR)")
    train_where = f"WHERE {train_restrict}" if train_restrict else ""
    avgs = ", ".join(
        f"FLOOR(SUM(CAST(FLOOR(e[{i + 1}] * 1000000.0 + 0.5) AS BIGINT))"
        f" / COUNT(*) + 0.5) / 1000000.0 AS a{i}"
        for i in range(dim)
    )
    relist = "[" + ", ".join(f"a{i}" for i in range(dim)) + "]"
    return f"""
            WITH v AS (SELECT CAST(vec_id AS BIGINT) AS vec_id,
                              embedding::DOUBLE[] AS e
                       FROM embeddings),
            vt AS (SELECT * FROM v {train_where}),
            seed AS (SELECT vec_id AS centroid_id, e AS ce FROM vt
                     ORDER BY {h} ASC, vec_id ASC LIMIT {n_centroids}),
            assign0 AS (
              SELECT vec_id, e, centroid_id FROM (
                SELECT v.vec_id, v.e, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY list_dot_product(v.e, c.ce) DESC,
                                  c.centroid_id ASC) AS rn
                FROM vt v, seed c) WHERE rn = 1),
            lmeans AS (SELECT centroid_id, {avgs}
                       FROM assign0 GROUP BY centroid_id),
            cent AS (SELECT centroid_id, {relist}::DOUBLE[] AS ce FROM lmeans),
            assign AS (
              SELECT vec_id, e, centroid_id FROM (
                SELECT v.vec_id, v.e, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY list_dot_product(v.e, c.ce) DESC,
                                  c.centroid_id ASC) AS rn
                FROM v, cent c) WHERE rn = 1),
            probes AS (
              SELECT q_id, qe, centroid_id FROM (
                SELECT q.vec_id AS q_id, q.e AS qe, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY q.vec_id
                         ORDER BY list_dot_product(q.e, c.ce) DESC,
                                  c.centroid_id ASC) AS rn
                FROM v q, cent c WHERE q.vec_id < 3) WHERE rn <= {nprobe}),
            scored AS (
              SELECT p.q_id, a.vec_id,
                     ROUND(list_dot_product(p.qe, a.e) /
                       (sqrt(list_dot_product(p.qe, p.qe)) *
                        sqrt(list_dot_product(a.e, a.e))), 6) AS c6
              FROM probes p JOIN assign a USING (centroid_id))
            SELECT q_id, vec_id, ROUND(c6, 4) AS cosine_r4, CAST(rnk AS BIGINT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                               ORDER BY c6 DESC, vec_id ASC) AS rnk
                  FROM scored)
            WHERE rnk <= {k}
        """


# shared CTE chain for the quality gate (filter + per-reason report oracles
# must gate identically — one definition, two SELECT tails)
def _quality_gated_cte(src: str = "documents") -> str:
    """The quality-gate CTE chain (t -> m -> gated), parametrized over the
    source relation so composed pipelines can gate CLEANED text (the
    curation_pipeline_cleaned oracle gates the line-deduped + PII-redacted
    CTE instead of raw documents)."""
    return f"""t AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> x != '') AS toks,
                     text
              FROM {src}
            ),
            m AS (
              SELECT doc_id,
                     len(toks) AS n_words,
                     CASE WHEN len(toks) = 0 THEN 0.0
                          ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     END AS mean_word_len,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS alpha_ratio,
                     CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS punct_ratio,
                     CAST(len(list_filter(toks, x ->
                       list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE)
                       / greatest(len(toks), 1) AS stopword_ratio
              FROM t
            ),
            gated AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     CASE WHEN n_words < 10 THEN 'too_few_words'
                          WHEN n_words > 100000 THEN 'too_many_words'
                          WHEN ROUND(mean_word_len, 6) < 3.0 THEN 'mean_word_len_low'
                          WHEN ROUND(mean_word_len, 6) > 10.0 THEN 'mean_word_len_high'
                          WHEN ROUND(alpha_ratio, 6) < 0.6 THEN 'low_alpha_ratio'
                          WHEN ROUND(stopword_ratio, 6) < 0.02 THEN 'no_stopwords'
                          WHEN ROUND(punct_ratio, 6) > 0.2 THEN 'too_much_punct'
                          ELSE NULL END AS drop_reason
              FROM m
            )"""


def _line_dedup_oracle(restrict: str | None = None) -> str:
    """Full-corpus CCNet line dedup over the sentence-per-line synthesized
    corpus; ``restrict`` filters the OUTPUT rows only (frequencies always
    come from the whole corpus) — the incremental query's contract."""
    where = f"HAVING {restrict}" if restrict else ""
    return f"""
        WITH m AS (
          SELECT doc_id, replace(text, '. ', '.' || chr(10)) AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id, u.pos AS pos, u.line AS line
          FROM (SELECT doc_id, string_split(text, chr(10)) AS parts
                FROM m WHERE text IS NOT NULL),
               UNNEST(list_transform(range(1, len(parts) + 1),
                      i -> {{'pos': i, 'line': parts[i]}})) AS t(u)
        ),
        keyed AS (
          SELECT doc_id, pos, line,
                 CASE WHEN length(trim(line)) >= {_LINE_DEDUP_MIN_CHARS}
                      THEN {_H1.format(x="line")} END AS key_e
          FROM lines
        ),
        freq AS (
          SELECT key_e AS fkey FROM keyed WHERE key_e IS NOT NULL
          GROUP BY 1 HAVING count(DISTINCT doc_id) >= {_LINE_DEDUP_MIN_DF}
        )
        SELECT CAST(k.doc_id AS BIGINT) AS doc_id,
               coalesce(string_agg(CASE WHEN f.fkey IS NULL THEN k.line END,
                                   chr(10) ORDER BY k.pos), '') AS clean_text,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(f.fkey) AS BIGINT) AS n_dropped
        FROM keyed k LEFT JOIN freq f ON k.key_e = f.fkey
        GROUP BY k.doc_id
        {where}
    """


def _pack_sequences_oracle(seq_len: int = 512) -> str:
    """DuckDB recomputation of pack_sequences with a PLAIN GLOBAL window
    over the same canonical order — matching the Spark side's bucketed
    two-phase cumsum proves the decomposition exact.  Integer division
    throughout (prefix sums are corpus-total-token-sized; double division
    is only exact to 2^53)."""
    h = _H1.format(x="CAST(doc_id AS VARCHAR)")
    sl = int(seq_len)
    return f"""
        WITH t AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                   AS BIGINT) AS n,
                 {h} AS h
          FROM documents WHERE text IS NOT NULL
        ),
        c AS (
          SELECT doc_id, n,
                 SUM(n) OVER (ORDER BY h ASC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                   AS gs
          FROM t
        )
        SELECT doc_id,
               n AS n_toks,
               gs AS global_start,
               gs // {sl} AS seq_id,
               (gs + greatest(n - 1, 0)) // {sl} AS seq_end,
               gs % {sl} AS seq_offset
        FROM c
    """


def _source_stats_oracle(
    min_mean_quality: float = 0.78, max_doc_share: float = 0.5,
    src: str = "documents", prelude: str = "",
) -> str:
    """DuckDB recomputation of source_stats: the with_quality score formula
    per doc, quantized to integer micro-units, summed exactly per source,
    floor-rounded once — the same fixed-point mean the Spark side computes,
    so means (and the keep decisions derived from them) match bit-exactly.
    ``src``/``prelude`` let composed oracles feed a derived (source, text)
    relation (the url_domain_quality chain)."""
    return f"""
        WITH {prelude}t AS (
          SELECT source,
                 list_filter(string_split(lower(text), ' '), x -> x != '')
                   AS toks,
                 text
          FROM {src}
        ),
        m AS (
          SELECT source,
                 len(toks) AS n_words,
                 CASE WHEN len(toks) = 0 THEN 0.0
                      ELSE CAST(list_sum(list_transform(toks, x -> length(x)))
                           AS DOUBLE) / len(toks) END AS mwl,
                 CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                   AS DOUBLE) / greatest(length(text), 1) AS ar,
                 CAST(len(list_filter(toks, x -> list_contains(
                   ['the','a','of','and','to','in','is'], x))) AS DOUBLE)
                   / greatest(len(toks), 1) AS sr
          FROM t
        ),
        s AS (
          SELECT source,
                 ROUND(least(n_words / 50.0, 1.0) * 0.3
                   + CASE WHEN mwl >= 3 AND mwl <= 10 THEN 0.3 ELSE 0.0 END
                   + ar * 0.2 + least(sr * 5.0, 1.0) * 0.2, 6) AS q
          FROM m
        ),
        agg AS (
          SELECT source,
                 count(*) AS n_docs,
                 count(q) AS n_scored,
                 SUM(CAST(FLOOR(q * 1000000.0 + 0.5) AS BIGINT)) AS s
          FROM s GROUP BY source
        ),
        tot AS (SELECT SUM(n_docs) AS t FROM agg)
        SELECT a.source,
               CAST(a.n_docs AS BIGINT) AS n_docs,
               ROUND(CAST(a.n_docs AS DOUBLE) / greatest(tot.t, 1), 6)
                 AS doc_share,
               CASE WHEN a.n_scored > 0
                    THEN FLOOR(a.s / a.n_scored + 0.5) / 1000000.0 END
                 AS mean_quality,
               coalesce(
                 CASE WHEN a.n_scored > 0
                      THEN FLOOR(a.s / a.n_scored + 0.5) / 1000000.0
                           >= {float(min_mean_quality)} END, false)
                 AND ROUND(CAST(a.n_docs AS DOUBLE) / greatest(tot.t, 1), 6)
                     <= {float(max_doc_share)} AS keep
        FROM agg a, tot
    """


def _quality_clf_oracle(bias: float = 0.0, threshold: float = 0.0) -> str:
    """DuckDB recomputation of quality_classifier under the shared
    _QUALITY_CLF_MODEL: same lowercased split-on-space tokens, integer
    weight sums, rounded-score keep rule; every document emitted (NULL
    text scores the bias with n_toks = 0)."""
    values = ", ".join(f"('{t}', {w})" for t, w in _QUALITY_CLF_MODEL)
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x != '')
                   AS toks
          FROM documents
        ),
        inst AS (SELECT doc_id, u AS tok FROM t, UNNEST(toks) AS s(u)),
        m(tok, w) AS (VALUES {values}),
        agg AS (
          SELECT i.doc_id,
                 count(*) AS n,
                 CAST(coalesce(sum(m.w), 0) AS BIGINT) AS s
          FROM inst i LEFT JOIN m ON i.tok = m.tok
          GROUP BY i.doc_id
        )
        SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
               CAST(coalesce(a.n, 0) AS BIGINT) AS n_toks,
               CAST(coalesce(a.s, 0) AS BIGINT) AS w_sum,
               round({float(bias)} + CAST(coalesce(a.s, 0) AS DOUBLE)
                     / greatest(coalesce(a.n, 0), 1), 6) AS clf_score,
               round({float(bias)} + CAST(coalesce(a.s, 0) AS DOUBLE)
                     / greatest(coalesce(a.n, 0), 1), 6) >= {float(threshold)}
                 AS clf_keep
        FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
    """


def _span_dedup_oracle(
    window: int = _SPAN_DEDUP_WINDOW,
    min_df: int = _SPAN_DEDUP_MIN_DF,
    restrict: str | None = None,
    emit: str = "stats",
) -> str:
    """DuckDB recomputation of span_dedup end-to-end: the same split-on-space
    tokens, md5-52-bit window keys, global occurrence counts and
    interval-union coverage (sorted duplicated positions, each contributing
    min(gap, window), the last a full window).  ``restrict`` filters the
    OUTPUT rows only (frequencies always come from the whole corpus) — the
    incremental query's contract."""
    where = f"WHERE {restrict}" if restrict else ""
    w = int(window)
    key = _H1.format(x=f"array_to_string(toks[i:i+{w - 1}], ' ')")
    if emit == "stats":
        tail = f"""        SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
               CAST(b.ntok AS BIGINT) AS n_tokens,
               CAST(coalesce(c.n_windows, 0) AS BIGINT) AS n_windows,
               CAST(coalesce(c.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
               CAST(coalesce(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               round(CAST(coalesce(c.dup_tokens, 0) AS DOUBLE)
                     / greatest(b.ntok, 1), 6) AS dup_frac
        FROM b LEFT JOIN cov c ON b.doc_id = c.doc_id"""
    else:
        tail = f"""        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               CASE WHEN a.ps IS NULL OR len(a.ps) = 0 THEN d.text
                    -- coalesce: DuckDB array_to_string([]) is NULL, Spark
                    -- array_join([]) is '' (a fully-duplicated doc)
                    ELSE coalesce(array_to_string(list_filter(
                      list_transform(range(1, len(t.toks) + 1),
                        i -> CASE WHEN len(list_filter(a.ps,
                               p -> p <= i AND i < p + {w})) > 0 THEN NULL
                             ELSE t.toks[i] END),
                      x -> x IS NOT NULL), ' '), '')
               END AS span_clean_text
        FROM documents d
        LEFT JOIN t ON d.doc_id = t.doc_id
        LEFT JOIN agg a ON d.doc_id = a.doc_id"""
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x != '') AS toks
          FROM documents WHERE text IS NOT NULL
        ),
        b AS (SELECT doc_id, len(toks) AS ntok FROM t),
        wins AS (
          SELECT doc_id, u.pos AS pos, u.wkey AS wkey
          FROM (SELECT doc_id,
                       CASE WHEN len(toks) >= {w} THEN
                         list_transform(range(1, len(toks) - {w} + 2),
                           i -> {{'pos': i, 'wkey': {key}}})
                       ELSE [] END AS ws
                FROM t),
               UNNEST(ws) AS s(u)
        ),
        freq AS (
          SELECT wkey FROM wins GROUP BY 1 HAVING count(*) >= {int(min_df)}
        ),
        agg AS (
          SELECT w.doc_id,
                 count(*) AS n_windows,
                 count(f.wkey) AS n_dup_windows,
                 list_sort(list(w.pos) FILTER (WHERE f.wkey IS NOT NULL))
                   AS ps
          FROM wins w LEFT JOIN freq f ON w.wkey = f.wkey
          GROUP BY w.doc_id
        ),
        cov AS (
          SELECT doc_id, n_windows, n_dup_windows,
                 CASE WHEN ps IS NULL OR len(ps) = 0 THEN 0
                      WHEN len(ps) = 1 THEN {w}
                      ELSE CAST(list_sum(list_transform(range(1, len(ps)),
                             i -> least(ps[i + 1] - ps[i], {w}))) AS BIGINT)
                           + {w}
                 END AS dup_tokens
          FROM agg
        )
        {tail}
        {where}
    """


def _pii_oracle() -> str:
    """DuckDB recomputation of pii_redact over the synthesized corpus: the
    regexes come straight from textclean.PII_PATTERNS (RE2-compatible by
    contract), so pattern edits propagate to the oracle automatically."""
    from literature_to_facts_spark.datapipe.textclean import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    clean = "text"
    for _, pat, mask in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{mask}', 'g')"
    # NULL parity: '||' propagates NULL like Spark's concat (DuckDB's
    # concat() SKIPS NULL args and would turn a NULL-text doc into a
    # suffix-only doc with planted PII); has_pii derives from the
    # coalesced counts so NULL text reads false, matching pii_redact.
    return f"""
        WITH p AS (
          SELECT doc_id, text || ({_PII_SUFFIX_DUCK}) AS text FROM documents
        ),
        c AS (
          SELECT CAST(doc_id AS BIGINT) AS doc_id,
                 CAST(coalesce(len(regexp_extract_all(text, '{pats["email"]}')), 0)
                      AS BIGINT) AS n_email,
                 CAST(coalesce(len(regexp_extract_all(text, '{pats["ipv4"]}')), 0)
                      AS BIGINT) AS n_ipv4,
                 CAST(coalesce(len(regexp_extract_all(text, '{pats["phone"]}')), 0)
                      AS BIGINT) AS n_phone,
                 {clean} AS clean_text
          FROM p
        )
        SELECT doc_id, n_email, n_ipv4, n_phone,
               (n_email > 0 OR n_ipv4 > 0 OR n_phone > 0) AS has_pii,
               clean_text
        FROM c
    """


def _duck_pii_clean_chain(col: str) -> str:
    """The sequential mask chain over ``col``, patterns verbatim from
    textclean.PII_PATTERNS."""
    from literature_to_facts_spark.datapipe.textclean import PII_PATTERNS

    clean = col
    for _, pat, mask in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{mask}', 'g')"
    return clean


def _curation_cleaned_oracle() -> str:
    """The five-stage cleaned curation chain in ONE statement: sentence-split
    + planted-PII synthesis -> cross-document line dedup -> PII masking ->
    quality gate -> MinHash closure purge -> hash-fraction mixture sample.
    Every fragment is the same SQL the stage's standalone oracle uses
    (line-dedup CTEs, PII chain from PII_PATTERNS, the parametrized gated
    CTE, the closure over ``src="kept"``), so stage drift surfaces here."""
    return f"""
        WITH m0 AS (
          SELECT doc_id, lang,
                 replace(text, '. ', '.' || chr(10)) || ({_PII_SUFFIX_DUCK}) AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id, lang, u.pos AS pos, u.line AS line
          FROM (SELECT doc_id, lang, string_split(text, chr(10)) AS parts
                FROM m0 WHERE text IS NOT NULL),
               UNNEST(list_transform(range(1, len(parts) + 1),
                      i -> {{'pos': i, 'line': parts[i]}})) AS t(u)
        ),
        keyed AS (
          SELECT doc_id, lang, pos, line,
                 CASE WHEN length(trim(line)) >= {_LINE_DEDUP_MIN_CHARS}
                      THEN {_H1.format(x="line")} END AS key_e
          FROM lines
        ),
        lfreq AS (
          SELECT key_e AS fkey FROM keyed WHERE key_e IS NOT NULL
          GROUP BY 1 HAVING count(DISTINCT doc_id) >= {_LINE_DEDUP_MIN_DF}
        ),
        cleaned AS (
          SELECT CAST(k.doc_id AS BIGINT) AS doc_id, min(k.lang) AS lang,
                 coalesce(string_agg(CASE WHEN f.fkey IS NULL THEN k.line END,
                                     chr(10) ORDER BY k.pos), '') AS text0
          FROM keyed k LEFT JOIN lfreq f ON k.key_e = f.fkey
          GROUP BY k.doc_id
        ),
        red AS (
          SELECT doc_id, lang, {_duck_pii_clean_chain("text0")} AS text
          FROM cleaned
        ),
        {_quality_gated_cte(src="red")},
        kept AS (
          SELECT r.doc_id, r.text, r.lang
          FROM red r JOIN gated g ON r.doc_id = g.doc_id
          WHERE g.drop_reason IS NULL
        )
        SELECT k.doc_id, k.lang
        FROM kept k
        WHERE k.doc_id NOT IN (
          SELECT doc_id FROM (
            {_cc_oracle(_minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4, src="kept"))}
          ) WHERE doc_id != cluster_rep)
          AND ({_H1.format(x="CAST(k.doc_id AS VARCHAR)")}) % 1000000 <
              (CASE WHEN k.lang = 'de' THEN 200000
                    WHEN k.lang = 'en' THEN 500000
                    ELSE 50000 END)
    """


def _mixture_weights_oracle() -> str:
    """mixture_weights(alpha=0.5) recomputed end-to-end: sqrt is correctly
    rounded under IEEE-754 and the weights are exact integer micro-units, so
    the fractions are bit-identical (see datapipe/sampling.py)."""
    return f"""
        WITH g AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS n_tokens
          FROM documents GROUP BY lang
        ),
        w AS (
          SELECT *, CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
                         AS BIGINT) AS weight_micro
          FROM g
        ),
        s AS (SELECT *, SUM(weight_micro) OVER () AS w_sum FROM w)
        SELECT lang, n_docs, n_tokens, weight_micro,
               CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE least(CAST(1.0 AS DOUBLE),
                      round((CAST({_MIXTURE_TOKEN_BUDGET} AS DOUBLE)
                             * CAST(weight_micro AS DOUBLE))
                            / (CAST(w_sum AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
                            6)) END AS sample_fraction
        FROM s
    """


def oracle_sql() -> dict[str, str]:
    cents = "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
    dpct = "CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)"
    tpct = "CAST(FLOOR(l_tax * 100 + 0.5) AS BIGINT)"
    toks = "string_split(lower(text), ' ')"
    return {
        "kg_triples_melt": """
            SELECT CAST(doc_id AS BIGINT) AS subj, 'source' AS pred, source AS obj FROM documents
            UNION ALL
            SELECT CAST(doc_id AS BIGINT), 'lang', lang FROM documents
            UNION ALL
            SELECT CAST(doc_id AS BIGINT), 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
        """,
        "kg_dict_view": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        """,
        "kg_valuable_filter": """
            WITH triples AS (
              SELECT CAST(doc_id AS BIGINT) AS subj, 'text' AS pred, text AS obj FROM documents
              UNION ALL
              SELECT CAST(doc_id AS BIGINT), 'lang', lang FROM documents
            )
            SELECT subj, CAST(COUNT(*) AS BIGINT) AS n_triples
            FROM triples t
            WHERE EXISTS (
              SELECT 1 FROM triples f
              WHERE f.subj = t.subj AND f.pred = 'text' AND f.obj LIKE '%spark%'
            )
            GROUP BY subj
        """,
        "kg_mention_detection": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, mention,
                   CAST(COUNT(*) AS BIGINT) AS n_times
            FROM (
              SELECT doc_id, unnest(regexp_extract_all(text, '(spark|window|merge|batch)', 1)) AS mention
              FROM documents
            ) GROUP BY doc_id, mention
        """,
        "kg_entity_link": """
            WITH gaz(mention, canonical_uri, entity_type) AS (VALUES
              ('spark', 'entity:engine/spark', 'engine'),
              ('window', 'entity:op/window', 'operator'),
              ('merge', 'entity:op/merge', 'operator')),
            m AS (
              SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest(regexp_extract_all(text, '(spark|window|merge)', 1)) AS mention
              FROM documents
            )
            SELECT m.doc_id, m.mention, g.canonical_uri, g.entity_type
            FROM m JOIN gaz g USING (mention)
        """,
        "kg_canonicalize_salted": """
            SELECT mention, CAST(COUNT(*) AS BIGINT) AS n_mentions,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest(regexp_extract_all(text, '(spark|window|merge|batch)', 1)) AS mention
              FROM documents
            ) GROUP BY mention
        """,
        "kg_counterpart_join": """
            SELECT CAST(e.user_id AS BIGINT) AS user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM events e JOIN events c
              ON e.user_id = c.user_id
             AND e.event_type = 'error' AND c.event_type = 'click'
             AND e.ts < c.ts
            GROUP BY e.user_id
        """,
        "kg_reaction_pivot": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   epoch_us(first_error) AS first_error_us,
                   epoch_us(first_click) AS first_click_us
            FROM (
              SELECT user_id,
                     MIN(CASE WHEN event_type = 'error' THEN ts END) AS first_error,
                     MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click
              FROM events GROUP BY user_id
            )
            WHERE first_error IS NOT NULL AND first_click IS NOT NULL
              AND first_error != first_click
        """,
        "json_extract": """
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
            FROM events
        """,
        "sessionize_window": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM (
              SELECT user_id,
                     CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > 300000000
                          THEN 1 ELSE 0 END AS new_session
              FROM (
                SELECT user_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events
              )
            ) GROUP BY user_id
        """,
        "tpch_q1_pricing": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM({cents}) AS BIGINT) AS sum_base_cents,
                   CAST(SUM({cents} * (100 - {dpct})) AS BIGINT) AS sum_disc_c4,
                   CAST(SUM({cents} * (100 - {dpct}) * (100 + {tpct})) AS BIGINT) AS sum_charge_c6,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q6_forecast": f"""
            SELECT CAST(SUM({cents} * {dpct}) AS BIGINT) AS revenue_c4,
                   CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "rollup_orders": """
            SELECT o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "anti_join_inactive_customers": """
            SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_inactive
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_mktsegment
        """,
        "topk_orders_per_priority": """
            SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS o_orderkey,
                   cents, CAST(rnk AS BIGINT) AS rnk
            FROM (
              SELECT o_orderpriority, o_orderkey,
                     CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                                                 o_orderkey ASC) AS rnk
              FROM orders
            ) WHERE rnk <= 3
        """,
        "tpch_q3_shipping": f"""
            SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                   CAST(o_orderdate AS VARCHAR) AS o_orderdate,
                   CAST(SUM({cents} * (100 - {dpct})) AS BIGINT) AS revenue_c4
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < '1997-01-01' AND l_shipdate > '1997-01-01'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue_c4 DESC, l_orderkey ASC
            LIMIT 10
        """,
        "tpch_q5_local_supplier": f"""
            SELECT n_name,
                   CAST(SUM({cents} * (100 - {dpct})) AS BIGINT) AS revenue_c4
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= '1995-01-01' AND o_orderdate < '1997-01-01'
            GROUP BY n_name
        """,
        "top_parts_by_qty": """
            SELECT CAST(p.p_partkey AS BIGINT) AS p_partkey, p.p_name,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_partkey, p.p_name
            ORDER BY total_qty DESC, p_partkey ASC
            LIMIT 10
        """,
        "percentiles_by_flag": """
            SELECT l_returnflag,
                   ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
                   ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
                   ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_p50
            FROM lineitem GROUP BY l_returnflag
        """,
        "set_ops_union_distinct": """
            SELECT key % 10 AS key_mod, CAST(COUNT(*) AS BIGINT) AS n_keys
            FROM (
              SELECT DISTINCT key FROM (
                SELECT CAST(o_custkey AS BIGINT) AS key FROM orders
                UNION ALL
                SELECT CAST(c_custkey AS BIGINT) FROM customer
              )
            ) GROUP BY key % 10
        """,
        "dedup_exact": """
            SELECT md5(text) AS text_hash,
                   CAST(COUNT(*) AS BIGINT) AS cluster_size,
                   CAST(MIN(doc_id) AS BIGINT) AS canonical_id
            FROM documents GROUP BY md5(text)
        """,
        "dedup_ngram_jaccard": f"""
            WITH sh0 AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest(list_distinct(
                       CASE WHEN len({toks}) >= 2 THEN
                         list_transform(range(1, len({toks})),
                                        i -> array_to_string({toks}[i:i+1], ' '))
                       ELSE [lower(text)] END)) AS sh
              FROM documents
            ),
            hot AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) > 100),
            sh AS (SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)),
            sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
            inter AS (
              SELECT l.doc_id AS id_a, r.doc_id AS id_b, COUNT(*) AS n_inter
              FROM sh l JOIN sh r ON l.sh = r.sh AND l.doc_id < r.doc_id
              GROUP BY l.doc_id, r.doc_id
            )
            SELECT id_a, id_b,
                   ROUND(CAST(n_inter AS DOUBLE) / (a.n_sh + b.n_sh - n_inter), 6) AS jaccard
            FROM inter
            JOIN sizes a ON a.doc_id = id_a
            JOIN sizes b ON b.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (a.n_sh + b.n_sh - n_inter) >= 0.08
        """,
        "emb_cosine_topk": """
            WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.q_id, v.vec_id,
                     ROUND(ROUND(list_dot_product(q.q_emb, v.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                        sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))), 6), 4) AS cosine_r4,
                     ROUND(list_dot_product(q.q_emb, v.embedding::DOUBLE[]) /
                       (sqrt(list_dot_product(q.q_emb, q.q_emb)) *
                        sqrt(list_dot_product(v.embedding::DOUBLE[], v.embedding::DOUBLE[]))), 6) AS c6
              FROM embeddings v, q
            )
            SELECT CAST(q_id AS BIGINT) AS q_id, CAST(vec_id AS BIGINT) AS vec_id,
                   cosine_r4, CAST(rnk AS BIGINT) AS rank
            FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c6 DESC, vec_id ASC) AS rnk
              FROM scored
            ) WHERE rnk <= 5
        """,
        "text_token_counts": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(list_filter(string_split(lower(text), ' '), t -> t != '')) AS BIGINT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish_tokens
            FROM documents
        """,
        "text_lang_id": """
            WITH scored AS (
              SELECT doc_id,
                     len(list_filter(string_split(lower(text), ' '),
                         t -> list_contains(['the','a','of','and','to','in','is'], t)))
                       / greatest(len(list_filter(string_split(lower(text), ' '), t -> t != '')), 1) AS s_en,
                     len(list_filter(string_split(lower(text), ' '),
                         t -> list_contains(['der','die','das','und','ist','ein','zu'], t)))
                       / greatest(len(list_filter(string_split(lower(text), ' '), t -> t != '')), 1) AS s_de,
                     len(list_filter(string_split(lower(text), ' '),
                         t -> list_contains(['le','la','les','et','est','un','une'], t)))
                       / greatest(len(list_filter(string_split(lower(text), ' '), t -> t != '')), 1) AS s_fr,
                     len(list_filter(string_split(lower(text), ' '),
                         t -> list_contains(['el','la','los','y','es','un','una'], t)))
                       / greatest(len(list_filter(string_split(lower(text), ' '), t -> t != '')), 1) AS s_es
              FROM documents
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE
                     WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
                     WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
                     WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
                     WHEN s_es > 0 THEN 'es'
                     ELSE 'und'
                   END AS lang_guess
            FROM scored
        """,
        "text_fingerprint": r"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp_md5,
                   list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                         list_filter(string_split(lower(text), ' '), x -> x != ''),
                         t -> CAST('0x' || substr(md5(t), 1, 13) AS BIGINT))),
                     (acc, h) -> (31 * acc + h) % 4503599627370496) AS fp_rolling
            FROM documents
        """,
        "text_quality": """
            WITH t AS (
              SELECT doc_id,
                     list_filter(string_split(lower(text), ' '), x -> x != '') AS toks,
                     text
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     len(toks) AS n_words,
                     CASE WHEN len(toks) = 0 THEN 0.0
                          ELSE CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                     END AS mean_word_len,
                     CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                       / greatest(length(text), 1) AS alpha_ratio,
                     CAST(len(list_filter(toks, x ->
                       list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE)
                       / greatest(len(toks), 1) AS stopword_ratio
              FROM t
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   ROUND(mean_word_len, 6) AS mean_word_len,
                   ROUND(stopword_ratio, 6) AS stopword_ratio,
                   ROUND(
                     least(n_words / 50.0, 1.0) * 0.3
                     + CASE WHEN mean_word_len >= 3 AND mean_word_len <= 10 THEN 0.3 ELSE 0.0 END
                     + alpha_ratio * 0.2
                     + least(stopword_ratio * 5.0, 1.0) * 0.2, 6) AS quality_score
            FROM m
        """,
        "events_interval_join": """
            SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
                   CAST(c.event_id AS BIGINT) AS click_id,
                   CAST(c.user_id AS BIGINT) AS user_id,
                   epoch_us(c.ts) AS click_ts_us
            FROM events p
            JOIN events c
              ON c.user_id = p.user_id
             AND c.ts >= p.ts - INTERVAL 1 HOUR
             AND c.ts < p.ts
            WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        """,
        "events_asof_join": """
            WITH purchases AS (
              SELECT CAST(event_id AS BIGINT) AS event_id,
                     CAST(user_id AS BIGINT) AS user_id, ts
              FROM events WHERE event_type = 'purchase'
            ),
            clicks AS (
              SELECT CAST(user_id AS BIGINT) AS user_id, ts,
                     CAST(MAX(event_id) AS BIGINT) AS click_event_id
              FROM events WHERE event_type = 'click'
              GROUP BY user_id, ts
            )
            SELECT l.event_id, l.user_id,
                   epoch_us(l.ts) AS ts_us,
                   r.click_event_id,
                   epoch_us(r.ts) AS click_ts_us
            FROM purchases l
            ASOF JOIN clicks r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "decontam_pairs": f"""
            WITH tr AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest({_duck_shingles(4)}) AS g
              FROM documents WHERE doc_id % 17 != 0 AND text IS NOT NULL
            ),
            ev AS (
              SELECT CAST(doc_id AS BIGINT) AS eval_id,
                     unnest({_duck_shingles(4)}) AS g
              FROM documents WHERE doc_id % 17 = 0 AND text IS NOT NULL
            ),
            gram_pairs AS (
              SELECT tr.doc_id, ev.eval_id,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM tr JOIN ev ON tr.g = ev.g
              GROUP BY tr.doc_id, ev.eval_id
              HAVING COUNT(*) >= 1
            ),
            short_ev AS (
              SELECT CAST(doc_id AS BIGINT) AS eval_id, lower(text) AS ev_lt
              FROM documents
              WHERE doc_id % 17 = 0 AND text IS NOT NULL
                AND len(string_split(lower(text), ' ')) < 4
                AND length(lower(text)) > 0
            ),
            contain_pairs AS (
              SELECT CAST(d.doc_id AS BIGINT) AS doc_id, s.eval_id,
                     CAST(1 AS BIGINT) AS n
              FROM documents d, short_ev s
              WHERE d.doc_id % 17 != 0 AND d.text IS NOT NULL
                AND instr(lower(d.text), s.ev_lt) >= 1
            )
            SELECT doc_id, eval_id,
                   CAST(MAX(n) AS BIGINT) AS n_shared_grams
            FROM (SELECT * FROM gram_pairs UNION ALL SELECT * FROM contain_pairs)
            GROUP BY doc_id, eval_id
        """,
        "decontam_bloom": _decontam_bloom_oracle(),
        "decontam_purge": f"""
            WITH tr_g AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest({_duck_shingles(4)}) AS g
              FROM documents WHERE doc_id % 17 != 0 AND text IS NOT NULL
            ),
            ev_g AS (
              SELECT unnest({_duck_shingles(4)}) AS g
              FROM documents WHERE doc_id % 17 = 0 AND text IS NOT NULL
            ),
            short_ev AS (
              SELECT lower(text) AS ev_lt FROM documents
              WHERE doc_id % 17 = 0 AND text IS NOT NULL
                AND len(string_split(lower(text), ' ')) < 4
                AND length(lower(text)) > 0
            ),
            bad AS (
              SELECT DISTINCT tr_g.doc_id FROM tr_g
              JOIN ev_g ON tr_g.g = ev_g.g
              UNION
              SELECT DISTINCT CAST(d.doc_id AS BIGINT) FROM documents d, short_ev s
              WHERE d.doc_id % 17 != 0 AND d.text IS NOT NULL
                AND instr(lower(d.text), s.ev_lt) >= 1
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
            FROM documents
            WHERE doc_id % 17 != 0
              AND CAST(doc_id AS BIGINT) NOT IN (SELECT doc_id FROM bad)
        """,
        "text_repetition": """
            WITH t AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     list_filter(string_split(lower(text), ' '), x -> x != '') AS toks
              FROM documents
            ),
            g AS (
              SELECT doc_id, toks,
                     CASE WHEN toks IS NULL THEN NULL
                          WHEN len(toks) >= 2 THEN
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i + 1])
                     ELSE [] END AS grams
              FROM t
            ),
            w AS (SELECT doc_id, unnest(toks) AS tok FROM t),
            tc AS (
              SELECT doc_id, MAX(c) AS top FROM (
                SELECT doc_id, tok, COUNT(*) AS c FROM w GROUP BY doc_id, tok
              ) GROUP BY doc_id
            )
            SELECT g.doc_id,
                   ROUND(CASE WHEN len(toks) = 0 THEN 0
                         ELSE 1 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                         END, 6) AS dup_word_frac,
                   ROUND(CASE WHEN len(grams) = 0 THEN 0
                         ELSE 1 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
                         END, 6) AS dup_ngram_frac,
                   ROUND(CASE WHEN len(toks) = 0 THEN 0
                         ELSE CAST(tc.top AS DOUBLE) / len(toks)
                         END, 6) AS top_word_frac
            FROM g LEFT JOIN tc ON g.doc_id = tc.doc_id
        """,
        "text_quality_filter": f"""
            WITH {_quality_gated_cte()}
            SELECT doc_id, (drop_reason IS NULL) AS keep, drop_reason
            FROM gated
        """,
        "text_quality_report": f"""
            WITH {_quality_gated_cte()}
            SELECT COALESCE(drop_reason, 'kept') AS reason,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM gated GROUP BY 1
        """,
        # generated oracles: md5-derived hash family + inlined hyperplane
        # constants make the full LSH/ANN pipelines engine-portable (round 1
        # recorded these as no_oracle)
        "dedup_minhash_lsh": _minhash_oracle(
            n_gram=3, threshold=0.5, n_hashes=16, bands=4
        ),
        # incremental contract: full-corpus pairs restricted to pairs
        # touching the new batch (doc_id % 5 == 0) — the oracle recomputes
        # the full pair set and restricts, which the delta job must equal
        "dedup_minhash_incremental": f"""
            SELECT id_a, id_b, jaccard FROM (
              {_minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4)}
            ) WHERE id_a % 5 = 0 OR id_b % 5 = 0
        """,
        "dedup_lsh_bucket_stats": _lsh_bucket_stats_oracle(
            n_gram=3, n_hashes=16, bands=4, max_bucket=20
        ),
        "dedup_clusters_cc": _cc_oracle(
            _minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4)
        ),
        "dedup_clusters_cc_incremental": _cc_incremental_oracle(
            _minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4)
        ),
        "dedup_exact_incremental": """
            WITH corpus AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
              WHERE text IS NOT NULL
              UNION ALL
              SELECT CAST(doc_id AS BIGINT) + 1000000, text FROM documents
              WHERE doc_id % 7 = 0 AND text IS NOT NULL
            )
            SELECT md5(text) AS text_hash,
                   CAST(COUNT(*) AS BIGINT) AS cluster_size,
                   CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
                   array_to_string(list_sort(list(doc_id)), ',') AS members
            FROM corpus GROUP BY md5(text)
            HAVING SUM(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) >= 1
               AND COUNT(*) >= 2
        """,
        # purge = corpus minus non-representative cluster members, where the
        # clusters are the recursive closure of the SAME recomputed pair set
        "dedup_corpus_purge": f"""
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
            FROM documents d
            WHERE CAST(d.doc_id AS BIGINT) NOT IN (
              SELECT doc_id FROM (
                {_cc_oracle(_minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4))}
              ) WHERE doc_id != cluster_rep)
        """,
        # quality-aware purge: same closure, rep = (quality DESC, id ASC)
        # argmax per cluster; quality fixture n_chars % 997 (exact, with
        # ties so the id tie-break is exercised)
        "dedup_corpus_keep_best": f"""
            WITH labels AS (
              SELECT * FROM (
                {_cc_oracle(_minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4))}
              )
            ),
            q AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     coalesce(CAST(n_chars % 997 AS DOUBLE),
                              CAST('-infinity' AS DOUBLE)) AS q
              FROM documents
            ),
            m AS (
              SELECT l.doc_id, l.cluster_rep, q.q
              FROM labels l JOIN q ON l.doc_id = q.doc_id
            ),
            best AS (
              SELECT doc_id FROM (
                SELECT doc_id, row_number() OVER (
                  PARTITION BY cluster_rep
                  ORDER BY q DESC, doc_id ASC) AS rn
                FROM m) WHERE rn = 1
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
            FROM documents d
            WHERE CAST(d.doc_id AS BIGINT) NOT IN (
              SELECT doc_id FROM m
              WHERE doc_id NOT IN (SELECT doc_id FROM best))
        """,
        # the COMPLETE curation chain: gate -> decontam -> purge -> budget
        # prefix, every stage's SQL fragment nested into one statement over
        # the survivors of the previous one
        "curation_pipeline_full": f"""
            WITH {_quality_gated_cte()},
            base AS (
              SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, d.text,
                     len(list_filter(string_split(lower(d.text), ' '),
                                     x -> x != '')) AS w
              FROM documents d WHERE d.doc_id % 17 != 0
            ),
            kept0 AS (
              SELECT b.* FROM base b JOIN gated g ON b.doc_id = g.doc_id
              WHERE g.drop_reason IS NULL
            ),
            ev_g AS (
              SELECT unnest({_duck_shingles(4)}) AS g
              FROM documents WHERE doc_id % 17 = 0 AND text IS NOT NULL
            ),
            short_ev AS (
              SELECT lower(text) AS ev_lt FROM documents
              WHERE doc_id % 17 = 0 AND text IS NOT NULL
                AND len(string_split(lower(text), ' ')) < 4
                AND length(lower(text)) > 0
            ),
            contam AS (
              SELECT DISTINCT k.doc_id FROM (
                SELECT doc_id, unnest({_duck_shingles(4)}) AS g
                FROM kept0 WHERE text IS NOT NULL
              ) k JOIN ev_g e ON k.g = e.g
              UNION
              SELECT DISTINCT k2.doc_id FROM kept0 k2, short_ev s
              WHERE k2.text IS NOT NULL
                AND instr(lower(k2.text), s.ev_lt) >= 1
            ),
            kept AS (
              SELECT * FROM kept0
              WHERE doc_id NOT IN (SELECT doc_id FROM contam)
            ),
            purged AS (
              SELECT k.doc_id, k.lang, k.w,
                     {_H1.format(x="CAST(k.doc_id AS VARCHAR)")} AS h
              FROM kept k
              WHERE k.doc_id NOT IN (
                SELECT doc_id FROM (
                  {_cc_oracle(_minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4, src="kept"))}
                ) WHERE doc_id != cluster_rep)
            ),
            c AS (
              SELECT doc_id, lang,
                     COALESCE(SUM(w) OVER (PARTITION BY lang ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
              FROM purged
            )
            SELECT doc_id, lang FROM c
            WHERE cb < (CASE lang WHEN 'en' THEN 3000
                                  WHEN 'de' THEN 1200 ELSE 0 END)
        """,
        "sample_hash_fraction": _sample_fraction_oracle(
            {"en": 0.5, "de": 0.2}, default_fraction=0.05
        ),
        # the composed curation contract: gate -> purge -> sample in ONE
        # statement; the pair/closure fragments run over the gated CTE (the
        # `src="kept"` parametrization), the purge anti-selects
        # non-representative closure members, and the sample thresholds are
        # the same round(frac*1e6) integers the engine compiles
        "curation_pipeline": f"""
            WITH {_quality_gated_cte()},
            kept AS (
              SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.text, d.lang
              FROM documents d JOIN gated g ON CAST(d.doc_id AS BIGINT) = g.doc_id
              WHERE g.drop_reason IS NULL
            )
            SELECT k.doc_id, k.lang
            FROM kept k
            WHERE k.doc_id NOT IN (
              SELECT doc_id FROM (
                {_cc_oracle(_minhash_oracle(n_gram=3, threshold=0.5, n_hashes=16, bands=4, src="kept"))}
              ) WHERE doc_id != cluster_rep)
              AND ({_H1.format(x="CAST(k.doc_id AS VARCHAR)")}) % 1000000 <
                  (CASE WHEN k.lang = 'de' THEN 200000
                        WHEN k.lang = 'en' THEN 500000
                        ELSE 50000 END)
        """,
        "sample_stratified_topn": _sample_topn_oracle(n=7),
        "curation_pipeline_cleaned": _curation_cleaned_oracle(),
        # the naive per-group hash-ordered prefix window — the contract the
        # bucketed boundary-search implementation must equal row-for-row
        "sample_token_budget": f"""
            WITH t AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                     len(list_filter(string_split(lower(text), ' '),
                                     x -> x != '')) AS w,
                     {_H1.format(x="CAST(doc_id AS VARCHAR)")} AS h
              FROM documents
            ),
            c AS (
              SELECT doc_id, lang,
                     COALESCE(SUM(w) OVER (PARTITION BY lang ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
              FROM t
            )
            SELECT doc_id, lang FROM c
            WHERE cb < (CASE lang WHEN 'en' THEN 5000
                                  WHEN 'de' THEN 2000 ELSE 0 END)
        """,
        "dedup_simhash": _simhash_oracle(),
        "dedup_simhash_pairs": _simhash_pairs_oracle(max_hamming=8),
        "dedup_simhash_incremental": f"""
            SELECT id_a, id_b, hamming FROM (
              {_simhash_pairs_oracle(max_hamming=8)}
            ) WHERE id_a % 5 = 0 OR id_b % 5 = 0
        """,
        "dedup_embedding_cosine": _emb_near_dup_oracle(threshold=0.4, n_planes=4),
        "dedup_embedding_incremental": f"""
            SELECT id_a, id_b, cosine_r4 FROM (
              {_emb_near_dup_oracle(threshold=0.4, n_planes=4)}
            ) WHERE id_a % 5 = 0 OR id_b % 5 = 0
        """,
        "emb_ann_lsh": _ann_lsh_oracle(k=5, n_planes=6),
        "emb_ann_lsh_multiprobe": _ann_lsh_multiprobe_oracle(),
        "emb_ann_ivf": _ann_ivf_oracle(k=5, n_centroids=8, nprobe=3),
        "emb_ann_ivf_incremental": _ann_ivf_oracle(
            k=5, n_centroids=8, nprobe=3, train_restrict="vec_id % 5 != 0"
        ),
        # tumbling event-time window == epoch-aligned hour bucket
        "stream_windowed_counts": """
            SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
                     AS win_start_us,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events
            GROUP BY 1, 2
        """,
        "kg_triples_delta": """
            WITH n AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' updated batch v2'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 13 != 0
            )
            SELECT CAST(doc_id AS BIGINT) AS doc_id, mention,
                   CAST(count(*) AS BIGINT) AS n_times
            FROM (
              SELECT doc_id,
                     unnest(regexp_extract_all(text, '(spark|window|merge|batch)', 1))
                       AS mention
              FROM n
            )
            GROUP BY 1, 2
        """,
        "text_blocklist_filter": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(coalesce(len(list_intersect(
                     list_filter(string_split(lower(text), ' '), t -> t != ''),
                     ['batch', 'merge'])), 0) AS BIGINT) AS n_blocked_terms,
                   coalesce(len(list_intersect(
                     list_filter(string_split(lower(text), ' '), t -> t != ''),
                     ['batch', 'merge'])), 0) > 0 AS blocked
            FROM documents
        """,
        "text_token_topk": """
            WITH t AS (
              SELECT doc_id,
                     unnest(list_filter(string_split(lower(text), ' '),
                            x -> x != '')) AS token
              FROM documents WHERE text IS NOT NULL
            ),
            c AS (
              SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
                     CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM t GROUP BY 1
            )
            SELECT token, n_occurrences, n_docs FROM c
            ORDER BY n_occurrences DESC, token ASC LIMIT 20
        """,
        "text_tokenize_encode": _tokenize_encode_oracle(),
        "text_line_dedup": _line_dedup_oracle(),
        # '||' not concat(): NULL-propagating like Spark's concat, so a
        # NULL-text doc perturbs to NULL (unchanged), matching snapshot_diff
        "corpus_snapshot_diff": """
            WITH o AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS old_hash
              FROM documents WHERE doc_id % 11 != 0
            ),
            n AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                              ELSE text END) AS new_hash
              FROM documents WHERE doc_id % 13 != 0
            ),
            j AS (
              SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                     o.old_hash, n.new_hash,
                     CASE WHEN o.doc_id IS NULL THEN 'added'
                          WHEN n.doc_id IS NULL THEN 'removed'
                          WHEN o.old_hash IS DISTINCT FROM n.new_hash THEN 'changed'
                          END AS status
              FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
            )
            SELECT doc_id, status, old_hash, new_hash FROM j
            WHERE status IS NOT NULL
        """,
        "text_line_dedup_incremental": _line_dedup_oracle(restrict="k.doc_id % 5 = 0"),
        "text_span_dedup": _span_dedup_oracle(),
        "text_span_dedup_clean": _span_dedup_oracle(emit="clean"),
        "text_lm_perplexity": _lm_perplexity_oracle(),
        "graph_pagerank": _pagerank_oracle(),
        "html_extract_text": _html_extract_oracle(),
        "html_extract_links": _html_links_oracle(),
        "web_link_rank": _web_link_rank_oracle(),
        "text_span_dedup_incremental": _span_dedup_oracle(
            restrict="b.doc_id % 5 = 0"
        ),
        "text_quality_clf": _quality_clf_oracle(),
        "source_quality_stats": _source_stats_oracle(),
        "sample_pack_sequences": _pack_sequences_oracle(),
        "text_pii_redact": _pii_oracle(),
        "sample_mixture_weights": _mixture_weights_oracle(),
        "sample_mixture_temperature": f"""
            WITH fr AS (
              SELECT lang,
                     CAST(FLOOR(sample_fraction * 1000000 + 0.5) AS BIGINT) AS t
              FROM ({_mixture_weights_oracle()})
            )
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang AS lang
            FROM documents d JOIN fr USING (lang)
            WHERE {_H1.format(x="CAST(d.doc_id AS VARCHAR)")} % 1000000 < fr.t
        """,
        "multimodal_features": _multimodal_oracle_sql(),
        "semantic_dedup_incremental": _semantic_dedup_oracle(
            train_restrict="vec_id % 5 <> 0",
            out_restrict="vec_id % 5 = 0",
            **{k: v for k, v in _SEMDEDUP_PARAMS.items() if k != "refine_iters"},
        ),
        "sample_shuffle_shards": _shuffle_shards_oracle(),
        "text_chunk_sliding": _chunk_sliding_oracle(),
        "semantic_dedup": _semantic_dedup_oracle(**{k: v for k, v in _SEMDEDUP_PARAMS.items() if k != "refine_iters"}),
        "url_parts": _url_parts_oracle(),
        "url_normalize": _url_normalize_oracle(),
        "url_dedup": _url_dedup_oracle(),
        "url_latest_snapshot": _url_latest_snapshot_oracle(),
        "url_blocklist": _url_blocklist_oracle(),
        "url_domain_quality": _url_domain_quality_oracle(),
        "text_lang_trigram": _lang_trigram_oracle_sql(),
        "kg_predicate_stats": f"""
            WITH triples AS ({_KG_RICH_TRIPLES_DUCK})
            SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_triples,
                   CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subj,
                   CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_obj
            FROM triples GROUP BY pred
        """,
        "kg_characteristic_sets": f"""
            WITH triples AS ({_KG_RICH_TRIPLES_DUCK})
            SELECT pred_set, CAST(COUNT(*) AS BIGINT) AS n_subj,
                   CAST(MIN(np) AS BIGINT) AS n_preds
            FROM (
              SELECT subj,
                     array_to_string(list_sort(list_distinct(list(pred))), ',') AS pred_set,
                     len(list_distinct(list(pred))) AS np
              FROM triples GROUP BY subj
            ) GROUP BY pred_set
        """,
        "kg_entity_cooccurrence": f"""
            WITH de AS (
              SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc,
                     unnest(regexp_extract_all(text, '{_KG_MENTION_RE}', 1)) AS ent
              FROM documents
            ),
            keep AS (SELECT doc FROM de GROUP BY doc HAVING COUNT(*) <= 64)
            SELECT a.ent AS entity_a, b.ent AS entity_b,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM de a
            JOIN de b ON a.doc = b.doc AND a.ent < b.ent
            JOIN keep k ON a.doc = k.doc
            GROUP BY a.ent, b.ent
        """,
        "kg_two_hop": f"""
            WITH ab AS (
              SELECT DISTINCT source AS a, CAST(doc_id AS BIGINT) AS b FROM documents
            ),
            bc AS (
              SELECT DISTINCT CAST(doc_id AS BIGINT) AS b,
                     unnest(regexp_extract_all(text, '{_KG_MENTION_RE}', 1)) AS c
              FROM documents
            )
            SELECT a, c, CAST(COUNT(DISTINCT b) AS BIGINT) AS n_mid
            FROM ab JOIN bc USING (b) GROUP BY a, c
        """,
        # the incremental contract IS "bit-equal to the full recompute over
        # old ∪ batch", so the oracle is the full-corpus stats query
        "kg_predicate_stats_incremental": f"""
            WITH triples AS ({_KG_RICH_TRIPLES_DUCK})
            SELECT pred, CAST(COUNT(*) AS BIGINT) AS n_triples,
                   CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subj,
                   CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_obj
            FROM triples GROUP BY pred
        """,
        "kg_cooccurrence_pmi": f"""
            WITH de AS (
              SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc,
                     unnest(regexp_extract_all(text, '{_KG_MENTION_RE}', 1)) AS ent
              FROM documents
            ),
            keep AS (SELECT doc FROM de GROUP BY doc HAVING COUNT(*) <= 64),
            pairs AS (
              SELECT a.ent AS entity_a, b.ent AS entity_b,
                     CAST(COUNT(*) AS BIGINT) AS n_docs
              FROM de a
              JOIN de b ON a.doc = b.doc AND a.ent < b.ent
              JOIN keep k ON a.doc = k.doc
              GROUP BY a.ent, b.ent
            ),
            dfreq AS (SELECT ent, CAST(COUNT(*) AS BIGINT) AS df FROM de GROUP BY ent),
            tot AS (SELECT CAST(COUNT(DISTINCT doc) AS BIGINT) AS n_total FROM de)
            SELECT p.entity_a, p.entity_b, p.n_docs,
                   ROUND(LN(CAST(p.n_docs AS DOUBLE) * CAST(t.n_total AS DOUBLE)
                         / (CAST(fa.df AS DOUBLE) * CAST(fb.df AS DOUBLE))), 6) AS pmi
            FROM pairs p
            JOIN dfreq fa ON fa.ent = p.entity_a
            JOIN dfreq fb ON fb.ent = p.entity_b
            CROSS JOIN tot t
        """,
        "html_meta_robots": _html_meta_oracle(),
        "url_canonical_dedup": _url_canonical_dedup_oracle(),
        # incremental contract = bit-equal to the full recompute
        "kg_charsets_incremental": f"""
            WITH triples AS ({_KG_RICH_TRIPLES_DUCK})
            SELECT pred_set, CAST(COUNT(*) AS BIGINT) AS n_subj,
                   CAST(MIN(np) AS BIGINT) AS n_preds
            FROM (
              SELECT subj,
                     array_to_string(list_sort(list_distinct(list(pred))), ',') AS pred_set,
                     len(list_distinct(list(pred))) AS np
              FROM triples GROUP BY subj
            ) GROUP BY pred_set
        """,
        "crawl_ingest_gate": _crawl_ingest_gate_oracle(),
        "web_anchor_text": _web_anchor_text_oracle(),
        "kg_star_join": f"""
            WITH triples AS ({_KG_RICH_TRIPLES_DUCK})
            SELECT a.subj AS subj, a.obj AS n_spark, b.obj AS src,
                   c.obj AS n_merge
            FROM triples a JOIN triples b ON a.subj = b.subj
                           JOIN triples c ON a.subj = c.subj
            WHERE a.pred = 'mentions_spark' AND b.pred = 'source'
              AND c.pred = 'mentions_merge'
        """,
        "kg_triple_provenance": f"""
            WITH m AS (
              SELECT CAST(doc_id AS BIGINT) AS doc_id,
                     unnest(regexp_extract_all(text, '{_KG_MENTION_RE}', 1)) AS kw
              FROM documents
            ),
            asserts AS (
              SELECT a.kw AS subj, 'comentions' AS pred, b.kw AS obj,
                     a.doc_id,
                     a.doc_id * 3600000000 + 1500000000000000 AS ts_us
              FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.kw < b.kw
            )
            SELECT subj, pred, obj,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_assertions,
                   MIN(ts_us) AS first_seen, MAX(ts_us) AS last_seen
            FROM asserts GROUP BY subj, pred, obj
        """,
        "kg_pattern_join": f"""
            WITH triples AS ({_KG_RICH_TRIPLES_DUCK})
            SELECT a.subj AS subj, a.obj AS val_a, b.obj AS val_b
            FROM triples a JOIN triples b ON a.subj = b.subj
            WHERE a.pred = 'mentions_spark' AND b.pred = 'lang'
        """,
        "kg_path_closure": _kg_path_closure_oracle(),
        "html_main_content": _html_main_content_oracle(),
        "web_anchor_text_incremental": _web_anchor_text_oracle(
            restrict="doc_id % 10 = 0"
        ),
        "web_extract_gate": _web_extract_gate_oracle(),
        "web_triangle_count": _web_triangle_count_oracle(),
        "web_frontier_rank": _web_frontier_rank_oracle(),
        "web_robots_gate": _web_robots_gate_oracle(),
        "web_sitemap_parse": _web_sitemap_parse_oracle(),
        "web_warc_parse": _web_warc_parse_oracle(),
        "crawl_warc_chain": _crawl_warc_chain_oracle(),
        "web_robots_sitemaps": _web_robots_sitemaps_oracle(),
        "text_line_dedup_grouped": f"""
        WITH m AS (
          SELECT doc_id, 'h' || CAST(doc_id % 4 AS VARCHAR) AS host,
                 replace(text, '. ', '.' || chr(10)) AS text
          FROM documents
        ),
        lines AS (
          SELECT doc_id, host, u.pos AS pos, u.line AS line
          FROM (SELECT doc_id, host, string_split(text, chr(10)) AS parts
                FROM m WHERE text IS NOT NULL),
               UNNEST(list_transform(range(1, len(parts) + 1),
                      i -> {{'pos': i, 'line': parts[i]}})) AS t(u)
        ),
        keyed AS (
          SELECT doc_id, host, pos, line,
                 CASE WHEN length(trim(line)) >= {_LINE_DEDUP_MIN_CHARS}
                      THEN {_H1.format(x="host || chr(31) || line")} END AS key_e
          FROM lines
        ),
        freq AS (
          SELECT key_e AS fkey FROM keyed WHERE key_e IS NOT NULL
          GROUP BY 1 HAVING count(DISTINCT doc_id) >= {_LINE_DEDUP_MIN_DF}
        )
        SELECT CAST(k.doc_id AS BIGINT) AS doc_id, k.host AS host,
               coalesce(string_agg(CASE WHEN f.fkey IS NULL THEN k.line END,
                                   chr(10) ORDER BY k.pos), '') AS clean_text,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(f.fkey) AS BIGINT) AS n_dropped
        FROM keyed k LEFT JOIN freq f ON k.key_e = f.fkey
        GROUP BY k.doc_id, k.host
        """,
    }

"""Eval-set decontamination: remove training documents that overlap a
benchmark/eval corpus — the step that keeps test answers out of the
training set (the standard n-gram-overlap method: a training doc sharing
``min_overlap`` distinct word n-grams with any eval document is flagged).

Scale shape: the EVAL side is benchmark-sized (MBs against a 100 TB train
corpus), so its exploded n-gram set is BROADCAST and the training side is
probed at its scan — one pass over the corpus, zero shuffle of it; the only
aggregations run over the (tiny) matched pair set.  An ``eval_df_cap``
drops n-grams shared by many eval documents (benchmark boilerplate —
prompt headers, answer scaffolding) before the join, bounding the
per-training-gram fan-out; with long n-grams (8-13 words in production,
4 at fixture scale) true-content grams are effectively unique.

N-gram semantics reuse ``dedup._shingle_frame`` (lowercased, space-split,
per-doc distinct, whole-text fallback below ``n_gram`` tokens), so the
DuckDB oracle recomputes the exact gram sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from literature_to_facts_spark.datapipe.dedup import _shingle_frame


def contamination_pairs(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    n_gram: int = 8,
    min_overlap: int = 1,
    eval_df_cap: int | None = None,
) -> DataFrame:
    """(doc_id, eval_id, n_shared_grams) for every contaminated
    training/eval document pair.  Two match modes:

    * eval docs with >= ``n_gram`` tokens: share at least ``min_overlap``
      distinct word ``n_gram``-grams (the standard overlap rule);
    * eval docs SHORTER than ``n_gram`` tokens ('Paris', a 7-word answer
      key): gram equality can never fire — their only gram is the whole
      text, which no n_gram-token training gram equals — so they match by
      SUBSTRING CONTAINMENT in the lowercased training text instead
      (``n_shared_grams = 1``; full containment of an eval item is
      categorical contamination, exempt from ``min_overlap``).  The short
      set is benchmark-bounded and broadcasts; the containment join is a
      BroadcastNestedLoopJoin over it — fine because the broadcast side is
      a handful of short strings.

    NULL-text rows on either side contribute nothing."""
    tr = _shingle_frame(
        docs.where(F.col(text_col).isNotNull()), id_col, text_col, n_gram,
        explode=True,
    )
    ev = _shingle_frame(
        eval_docs.where(F.col(eval_text_col).isNotNull()),
        eval_id_col, eval_text_col, n_gram, explode=True,
    ).withColumnRenamed("doc_id", "eval_id")
    if eval_df_cap is not None:
        hot = (
            ev.groupBy("sh")
            .agg(F.countDistinct("eval_id").alias("df"))
            .where(F.col("df") > eval_df_cap)
            .select("sh")
        )
        ev = ev.join(F.broadcast(hot), on="sh", how="left_anti")
    # per-doc grams are already distinct (_shingle_frame array_distinct),
    # so count(*) after the gram join counts DISTINCT shared grams
    gram_pairs = (
        tr.join(F.broadcast(ev), on="sh")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .where(F.col("n_shared_grams") >= min_overlap)
    )
    short_ev = eval_docs.where(F.col(eval_text_col).isNotNull()).selectExpr(
        f"{eval_id_col} AS eval_id", f"lower({eval_text_col}) AS _ev_lt"
    ).where(
        F.expr(f"size(split(lower({eval_text_col}), ' ')) < {n_gram}")
        & (F.length("_ev_lt") > 0)
    )
    contain_pairs = (
        docs.where(F.col(text_col).isNotNull())
        .selectExpr(f"{id_col} AS doc_id", f"lower({text_col}) AS _tr_lt")
        .join(F.broadcast(short_ev), F.expr("instr(_tr_lt, _ev_lt) >= 1"))
        .select(
            "doc_id", "eval_id", F.lit(1).cast("long").alias("n_shared_grams")
        )
    )
    return (
        gram_pairs.unionByName(contain_pairs)
        .groupBy("doc_id", "eval_id")
        .agg(F.max("n_shared_grams").alias("n_shared_grams"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "doc_id",
    eval_text_col: str = "text",
    n_gram: int = 8,
    min_overlap: int = 1,
    eval_df_cap: int | None = None,
) -> DataFrame:
    """The shipped artifact: ``docs`` minus every document contaminated by
    the eval set (one left-anti join on the flagged id set; at 100 TB the
    flagged set is contamination-sized, and AQE broadcasts it when small).
    """
    bad = contamination_pairs(
        docs, eval_docs, id_col, text_col, eval_id_col, eval_text_col,
        n_gram, min_overlap, eval_df_cap,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return docs.join(bad, on=id_col, how="left_anti")

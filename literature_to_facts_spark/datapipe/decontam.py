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


# --- Bloom-filter membership (constant-memory decontamination) -------------
#
# The exact broadcast-gram-set shape above ships the full eval gram set to
# every executor; a Bloom filter makes the shipped state CONSTANT-SIZE in
# the eval corpus (m bits regardless of gram count) at the cost of a
# deterministic, engine-portable false-positive rate.  Representation: a
# (word_idx, bits) table with 63 usable bits per bigint word (bit 63 never
# set, so no engine hits signed-shift overflow), hashes from the portable
# md5 family ("i:key" -> first 13 hex chars as bigint) — DuckDB recomputes
# the identical filter, so membership answers (INCLUDING false positives)
# match bit-for-bit.

BLOOM_WORD_BITS = 63


def _bloom_pos(key_sql: str, i: int, m_bits: int) -> str:
    """Portable probe position i for a key expression: 52-bit md5 slice of
    'i:key' mod m_bits (same hash family as dedup._h52)."""
    return (
        f"(cast(conv(substr(md5(concat('{i}:', {key_sql})), 1, 13), 16, 10)"
        f" as bigint) % {m_bits})"
    )


def build_bloom_filter(
    keys: DataFrame,
    key_col: str = "sh",
    m_bits: int = 1 << 18,
    k_hashes: int = 5,
) -> DataFrame:
    """Aggregate a key set into a Bloom filter table ``(word_idx bigint,
    bits bigint)`` — only non-zero words are materialized (probe misses on
    absent words read as 0 via a left-join coalesce).

    Scale shape: k probe positions explode map-side; the single Exchange
    is the ``groupBy(word_idx)`` whose map-side partial ``bit_or`` caps
    each partition's contribution at m/63 rows — the shuffle carries
    filter-sized data, not key-instance-sized.  The result is
    ceil(m/63) rows max (2^18 bits -> <=4,162 rows), broadcastable
    regardless of how many keys went in.
    """
    if m_bits < BLOOM_WORD_BITS:
        raise ValueError(f"m_bits must be >= {BLOOM_WORD_BITS}, got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    poss = ", ".join(
        _bloom_pos(key_col, i, int(m_bits)) for i in range(int(k_hashes))
    )
    return (
        keys.where(F.col(key_col).isNotNull())
        .selectExpr(f"explode(array({poss})) AS _pos")
        .selectExpr(
            f"_pos div {BLOOM_WORD_BITS} AS word_idx",
            f"shiftleft(1L, cast(_pos % {BLOOM_WORD_BITS} as int)) AS _mask",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(_mask)").alias("bits"))
    )


def bloom_contaminated(
    docs: DataFrame,
    bloom: DataFrame,
    m_bits: int = 1 << 18,
    k_hashes: int = 5,
    n_gram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Probe every training document's distinct word ``n_gram``-grams
    against a Bloom filter built with the SAME (m_bits, k_hashes).
    Returns a REPORT frame — ``(id_col, n_flagged_grams, contaminated)``,
    one row per non-NULL-text doc (``n_flagged_grams`` counts grams whose
    k probe bits are all set: true matches plus the filter's deterministic
    false positives; ``contaminated`` is ``>= min_hits``).  NULL-text docs
    are omitted (they have no grams to probe); feed ``contaminated`` ids
    to a left-anti purge, or left-join the report back for decoration —
    returning the full input decorated would force a second corpus-keyed
    shuffle here, which at 100 TB costs more than the probe itself.
    ``m_bits``/``k_hashes`` must match the build — a mismatch silently
    probes wrong bits, so pass them explicitly from one config.

    Scale shape: NO gram-level shuffle — each gram row computes its k
    (word, mask) pairs in-plan and resolves them through k
    BroadcastHashJoins against the (<= m/63)-row filter table (one
    broadcast, reused); the ONLY Exchange is the per-doc count groupBy
    carrying (id, one int).  Compare ``contamination_pairs``: same
    one-pass-over-the-corpus story, but executor state is m bits instead
    of the eval gram set.
    """
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    k = int(k_hashes)
    grams = _shingle_frame(
        docs.where(F.col(text_col).isNotNull()), id_col, text_col,
        int(n_gram), explode=True,
    )
    # positions projected ONCE (each feeds a word and a mask expression)
    g = grams.selectExpr(
        "doc_id",
        *[f"{_bloom_pos('sh', i, int(m_bits))} AS _p{i}" for i in range(k)],
    ).selectExpr(
        "doc_id",
        *[f"_p{i} div {BLOOM_WORD_BITS} AS _w{i}" for i in range(k)],
        *[
            f"shiftleft(1L, cast(_p{i} % {BLOOM_WORD_BITS} as int)) AS _m{i}"
            for i in range(k)
        ],
    )
    for i in range(k):
        side = bloom.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        g = g.join(F.broadcast(side), on=f"_w{i}", how="left")
    hit_all = " AND ".join(
        f"(coalesce(_b{i}, 0L) & _m{i}) != 0" for i in range(k)
    )
    return (
        g.selectExpr("doc_id", f"cast(({hit_all}) as int) AS _f")
        .groupBy("doc_id")
        .agg(F.sum("_f").cast("bigint").alias("n_flagged_grams"))
        .select(
            F.col("doc_id").alias(id_col),
            "n_flagged_grams",
            (F.col("n_flagged_grams") >= int(min_hits)).alias("contaminated"),
        )
    )

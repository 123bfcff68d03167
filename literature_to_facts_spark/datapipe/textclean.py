"""Corpus-level text cleaning: cross-document line dedup + PII redaction.

Two operators web-scale curation pipelines (CCNet, RefinedWeb, Dolma) run
between quality filtering and near-dup purge, re-expressed Spark-first and
fully DuckDB-oracled:

* :func:`line_dedup` — CCNet-style paragraph/line deduplication: a line that
  occurs in >= ``min_df`` distinct documents is removed from EVERY document
  (boilerplate headers, cookie banners, navigation chrome).  Lines shorter
  than ``min_line_chars`` after trim never participate (they are kept
  verbatim — dropping every blank line or ``---`` separator would destroy
  document structure, which is also CCNet's rule).
* :func:`pii_redact` — regex detection + masking of emails, IPv4 addresses
  and phone numbers, with per-document match counts computed on the
  ORIGINAL text (the counts are an audit artifact; masking is sequential,
  emails first, so an address like ``a@1.2.3.4`` is counted by both the
  email and IPv4 counters but masked once, as an email).

Portability contract (the repo-wide invariant): line keys use the md5-derived
52-bit hash family (DuckDB recomputes them bit-exactly) and every regex is
restricted to the RE2-compatible subset (no lookaround, no backreferences)
so Java's engine and DuckDB's RE2 agree match-for-match; both engines use
leftmost-first semantics and ASCII character classes here.

Scale notes (100 TB):

* ``line_dedup`` is inherently a four-Exchange job over the EXPLODED corpus
  (count(DISTINCT doc) per line key is two-phase — (key,id) then key; join
  the frequent-key set back by key; reassemble by doc) — the same shape as
  exact document dedup, one level down.  With ``min_df=2`` the frequent set
  is a large fraction of all duplicated lines, so the key-join must
  shuffle; with a high ``min_df`` (true boilerplate, say >= 1000 docs) the
  frequent set collapses to a small table — ``broadcast_frequent=True``
  then removes the corpus-side key-join shuffle (plan-pinned 4 -> 3
  Exchanges).  The exploded frame feeds two consumers
  (the frequency count and the join's left side); the upstream is a narrow
  scan + split, so two scan-fused passes beat materializing an exploded
  copy of the corpus (same trade as datapipe/curation.py documents).
* ``pii_redact`` is pure per-row expressions: zero shuffle, scan-fused,
  pushdown-transparent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from literature_to_facts_spark.datapipe.dedup import _h52

# (name, RE2-compatible pattern, mask) — masking applies IN THIS ORDER.
# Patterns deliberately ASCII-only and lookaround-free so Spark (java.util
# .regex) and DuckDB (RE2) produce identical matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (
        "phone",
        r"\+\d{1,3}[ -]?\d{2,4}[ -]?\d{2,4}[ -]?\d{2,4}|\b\d{3}[ -]\d{3}[ -]\d{4}\b",
        "<PHONE>",
    ),
]


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    min_line_chars: int = 10,
    broadcast_frequent: bool = False,
) -> DataFrame:
    """Remove every line occurring in >= ``min_df`` distinct documents.

    Returns one row per non-NULL-text input document:
    ``(id_col, clean_text, n_lines, n_dropped)`` where ``clean_text`` joins
    the surviving lines with ``\\n`` in original order ('' when every line
    was dropped), ``n_lines`` counts the document's lines and ``n_dropped``
    the removed ones.  NULL-text documents are excluded (the datapipe
    NULL-text convention — there is nothing to clean and a NULL line set
    would otherwise alias the empty document).

    Frequency is per distinct DOCUMENT: a line repeated inside one document
    counts once toward ``min_df`` (and if the line is corpus-frequent, every
    in-document occurrence is removed).  Only lines with
    ``length(trim(line)) >= min_line_chars`` participate; shorter lines are
    kept verbatim even when identical across millions of documents.

    ``broadcast_frequent=True`` broadcasts the frequent-line key set instead
    of shuffling the exploded corpus by line key — correct always, but only
    sane when ``min_df`` is high enough that the frequent set is small
    (boilerplate mode); at ``min_df=2`` the set scales with the corpus and
    MUST use the default shuffle join.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    lines = (
        docs.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
        )
        .selectExpr(
            "_id",
            "_pos",
            "_line",
            # NULL key for short lines: NULL never matches a join, so they
            # bypass both the frequency count and the removal join.
            f"CASE WHEN length(trim(_line)) >= {int(min_line_chars)}"
            f" THEN {_h52('_line')} END AS _key",
        )
    )
    freq = (
        lines.where(F.col("_key").isNotNull())
        .groupBy("_key")
        .agg(F.countDistinct("_id").alias("_df"))
        .where(F.col("_df") >= F.lit(int(min_df)))
        .select(F.col("_key").alias("_fkey"))
    )
    if broadcast_frequent:
        freq = F.broadcast(freq)
    flagged = lines.join(freq, lines["_key"] == freq["_fkey"], "left")
    return (
        flagged.groupBy(F.col("_id").alias(id_col))
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        # collect_list skips NULLs: dropped lines vanish here
                        # but still count below.
                        F.collect_list(
                            F.when(
                                F.col("_fkey").isNull(),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.count(F.col("_fkey")).cast("bigint").alias("n_dropped"),
        )
    )


def pii_redact(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Detect and mask emails / IPv4 addresses / phone numbers.

    Adds ``n_email``, ``n_ipv4``, ``n_phone`` (match counts on the ORIGINAL
    text), ``has_pii`` and ``clean_text`` (masks applied sequentially in
    ``PII_PATTERNS`` order).  NULL text passes through with zero counts and
    NULL ``clean_text``.  Pure per-row expressions — zero shuffle.
    """
    counts = [
        F.coalesce(
            F.regexp_count(F.col(text_col), F.lit(pat)), F.lit(0)
        )
        .cast("bigint")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, mask in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, mask)
    out = docs.select(
        "*",
        *counts,
        clean.alias("clean_text"),
    )
    flag = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        flag = c if flag is None else (flag | c)
    return out.withColumn("has_pii", flag)

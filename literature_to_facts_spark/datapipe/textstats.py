"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All JVM-side (built-in functions only)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}

# whitespace token + BPE-ish word/punct split
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text_col: str) -> str:
    return f"filter(split(lower({text_col}), ' '), t -> t != '')"


def lang_scores(toks_col: str = "_toks") -> list[Column]:
    """Per-language stopword-hit-ratio score columns over a PRE-PROJECTED
    token-array column (see ``_with_tokens``)."""
    cols = []
    for lang, words in LANG_STOPWORDS.items():
        arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
        cols.append(
            F.expr(
                f"size(filter({toks_col}, t -> array_contains({arr}, t)))"
                f" / greatest(size({toks_col}), 1)"
            ).alias(f"score_{lang}")
        )
    return cols


def _with_tokens(docs: DataFrame, text_col: str) -> DataFrame:
    """Project the token array ONCE as ``_toks``.  The token expression is a
    higher-order ``filter`` (CodegenFallback — evaluated interpreted), so
    repeating it textually across output columns re-tokenizes the text per
    column with no common-subexpression sharing; one projection removes the
    repeat (same fix, measured ~1.7x, as datapipe.dedup._shingle_frame)."""
    return docs.withColumn("_toks", F.expr(_tokens(text_col)))


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax stopword-hit-ratio language guess (deterministic 'und' when no
    list scores above zero)."""
    scored = _with_tokens(docs, text_col).select("*", *lang_scores("_toks")).drop("_toks")
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    guess = F.lit("und")
    # reversed so earlier languages win ties (en first)
    for lg in reversed(langs):
        guess = F.when(
            (F.col(f"score_{lg}") == best) & (best > 0), F.lit(lg)
        ).otherwise(guess)
    return scored.withColumn("lang_guess", guess).drop(
        *[f"score_{lg}" for lg in langs]
    )


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics.

    quality_score in [0,1]: blends length sufficiency, reasonable mean word
    length, alpha ratio and stopword presence — rounded for engine-portable
    comparison.
    """
    en = "array(" + ",".join(f"'{w}'" for w in LANG_STOPWORDS["en"]) + ")"
    out = (
        _with_tokens(docs, text_col)
        .withColumn("n_words", F.expr("size(_toks)"))
        .withColumn(
            "mean_word_len",
            F.expr(
                "CASE WHEN size(_toks) = 0 THEN 0D ELSE"
                " aggregate(_toks, 0D, (acc, t) -> acc + length(t)) / size(_toks) END"
            ),
        )
        .withColumn(
            "alpha_ratio",
            F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
            / F.greatest(F.length(F.col(text_col)), F.lit(1)),
        )
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(F.col(text_col), r"[^\.,;:!\?]", ""))
            / F.greatest(F.length(F.col(text_col)), F.lit(1)),
        )
        .withColumn(
            "stopword_ratio",
            F.expr(
                f"size(filter(_toks, t -> array_contains({en}, t)))"
                f" / greatest(size(_toks), 1)"
            ),
        )
        .drop("_toks")
    )
    score = (
        F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0)) * 0.3
        + F.when((F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10), 0.3).otherwise(0.0)
        + F.col("alpha_ratio") * 0.2
        + F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0)) * 0.2
    )
    return out.withColumn("quality_score", F.round(score, 6))


def with_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish (word/number/punct) token count."""
    return docs.withColumn(
        "n_ws_tokens", F.expr(f"size({_tokens(text_col)})")
    ).withColumn(
        "n_bpeish_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))),
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints:

    * ``fp_md5``: md5 of the whitespace-normalized lowercased text (engine-
      portable canonical content hash);
    * ``fp_rolling``: 52-bit polynomial rolling hash over tokens
      (``acc' = (31*acc + h52(token)) mod 2^52``, where h52 is the repo's
      portable md5-derived hash family — the same family every dedup/ANN
      operator uses, so an independent SQL engine recomputes it bit-exactly)
      — order-sensitive, cheap to compute incrementally at ingest.  ANSI-safe
      by construction: acc < 2^52, so 31*acc + h52 < 2^57 + 2^52 << 2^63.
      NULL text yields a NULL fingerprint (both columns).

    The round-4 variant used ``xxhash64``, which no other engine shares —
    leaving fp_rolling the one datapipe column outside the independent-oracle
    story; the md5-family polynomial closes that (and changes persisted
    fp_rolling values — re-fingerprint or pin the old expression when
    comparing against pre-round-5 outputs).
    """
    from literature_to_facts_spark.datapipe.dedup import _h52

    norm = f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
    rolling = (
        f"aggregate({_tokens(text_col)}, 0L,"
        f" (acc, t) -> (31 * acc + {_h52('t')}) % 4503599627370496)"
    )
    return docs.withColumn("fp_md5", F.md5(F.expr(norm))).withColumn(
        "fp_rolling", F.expr(rolling)
    )


def with_repetition(
    docs: DataFrame, text_col: str = "text", n_gram: int = 2
) -> DataFrame:
    """Gopher-style intra-document repetition signals — boilerplate and
    degenerate (looping) text shows up as duplicated n-grams INSIDE one
    document, which the cross-document dedup family cannot see:

    * ``dup_word_frac``: 1 - distinct(tokens)/count(tokens);
    * ``dup_ngram_frac``: 1 - distinct(n-grams)/count(n-grams) (word
      ``n_gram``-grams, duplicates counted positionally);
    * ``top_word_frac``: occurrences of the most frequent token / total
      tokens (a single token dominating the document).

    Pure per-row array expressions (no shuffle, scales as one scan); each
    ratio is rounded to 6dp for engine-portable comparison.  Empty/NULL
    texts yield 0 ratios (nothing repeats in nothing) — NULL text yields
    NULL, matching the other textstats columns.
    """
    # explicit NULL arm: without it a NULL token array falls through to the
    # empty-array ELSE, making dup_ngram_frac 0.0 while the sibling ratios
    # are NULL — an inconsistent "clean" signal for an unknown document
    grams = (
        f"CASE WHEN _toks IS NULL THEN CAST(NULL AS array<string>) "
        f"WHEN size(_toks) >= {n_gram} THEN "
        f"transform(sequence(0, size(_toks) - {n_gram}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n_gram}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )
    # top-token count without a shuffle: sort the tokens, then the longest
    # run of equal adjacent values is the max frequency — computed with one
    # aggregate over the sorted array carrying (prev, run, best)
    top_run = (
        "aggregate(array_sort(_toks), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L), "
        "(acc, t) -> named_struct("
        " 'prev', t,"
        " 'run', CASE WHEN acc.prev IS NOT NULL AND t = acc.prev"
        "         THEN acc.run + 1 ELSE 1L END,"
        " 'best', greatest(acc.best, CASE WHEN acc.prev IS NOT NULL AND t = acc.prev"
        "         THEN acc.run + 1 ELSE 1L END)), "
        "acc -> acc.best)"
    )
    return (
        _with_tokens(docs, text_col)
        .withColumn("_grams", F.expr(grams))
        .selectExpr(
            "*",
            "round(CASE WHEN size(_toks) = 0 THEN 0D ELSE"
            " 1D - size(array_distinct(_toks)) / size(_toks) END, 6)"
            " AS dup_word_frac",
            "round(CASE WHEN size(_grams) = 0 THEN 0D ELSE"
            " 1D - size(array_distinct(_grams)) / size(_grams) END, 6)"
            " AS dup_ngram_frac",
            f"round(CASE WHEN size(_toks) = 0 THEN 0D ELSE"
            f" CAST({top_run} AS DOUBLE) / size(_toks) END, 6)"
            " AS top_word_frac",
        )
        .drop("_toks", "_grams")
    )


# every column quality_filter adds/replaces on its input — callers that
# re-emit the input schema after gating (curation.curate_corpus) guard
# against collisions with this set so it cannot drift from the code below
QUALITY_GATE_COLS = frozenset(
    {
        "n_words",
        "mean_word_len",
        "alpha_ratio",
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
        "drop_reason",
        "keep",
    }
)


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.6,
    min_stopword_ratio: float = 0.02,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """Gopher-style document quality gate over the :func:`with_quality`
    signals: ``keep`` boolean plus a ``drop_reason`` code (FIRST failing
    rule, fixed evaluation order) so filter composition is auditable —
    production corpus curation reports per-reason drop counts, not a bare
    pass rate.  All thresholds compare ROUNDED (6dp) ratios so the decision
    is bit-portable across engines (an exact-threshold float in the last
    ulp cannot flip between Spark and the oracle).

    Narrow plan: with_quality is pure per-row expressions, the gate adds a
    CASE ladder — no shuffle, scales as one scan.
    """
    q = with_quality(docs, text_col)
    mwl = F.round(F.col("mean_word_len"), 6)
    al = F.round(F.col("alpha_ratio"), 6)
    sw = F.round(F.col("stopword_ratio"), 6)
    pr = F.round(F.col("punct_ratio"), 6)
    reason = (
        F.when(F.col("n_words") < min_words, "too_few_words")
        .when(F.col("n_words") > max_words, "too_many_words")
        .when(mwl < min_mean_word_len, "mean_word_len_low")
        .when(mwl > max_mean_word_len, "mean_word_len_high")
        .when(al < min_alpha_ratio, "low_alpha_ratio")
        .when(sw < min_stopword_ratio, "no_stopwords")
        .when(pr > max_punct_ratio, "too_much_punct")
        .otherwise(F.lit(None).cast("string"))
    )
    return q.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def blocklist_filter(
    docs: DataFrame,
    terms: list,
    text_col: str = "text",
) -> DataFrame:
    """C4-style token blocklist: flag documents containing any blocked term.

    Adds ``n_blocked_terms`` (DISTINCT blocklist terms present in the
    document's lowercased whitespace tokens — both engines' array
    intersection dedups, so the count is term-distinct, not
    occurrence-count) and ``blocked``.  NULL text -> 0 / false.  Matching
    is exact-token, case-insensitive — the C4 rule; substring hits
    ("class" vs "ass") deliberately do NOT match.

    Scale: a pure per-row expression (token projection + array_intersect
    against an inline literal array) — zero shuffle, scan-fused.  Sized for
    blocklists up to a few thousand terms (the inline array rides the
    expression tree); a 10^5-term list should instead explode tokens and
    broadcast-semi-join the term table (one extra narrow join, still no
    corpus shuffle).
    """
    if not terms:
        # array() compiles as array<void> and array_intersect(_toks, array())
        # fails analysis — an empty blocklist blocks nothing
        return docs.withColumns(
            {
                "n_blocked_terms": F.lit(0).cast("bigint"),
                "blocked": F.lit(False),
            }
        )
    # escape backslashes BEFORE quotes: a raw backslash inside the SQL
    # string literal would be read as an escape sequence, silently turning
    # the compiled term into something the caller never passed
    arr = (
        "array("
        + ",".join(
            "'" + t.lower().replace("\\", "\\\\").replace("'", "\\'") + "'"
            for t in sorted(set(terms))
        )
        + ")"
    )
    out = _with_tokens(docs, text_col).withColumn(
        "n_blocked_terms",
        F.coalesce(
            F.expr(f"size(array_intersect(_toks, {arr}))"), F.lit(0)
        ).cast("bigint"),
    )
    return out.withColumn("blocked", F.col("n_blocked_terms") > 0).drop("_toks")


def token_topk(
    docs: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide heavy hitters: the ``k`` most frequent whitespace tokens
    (lowercased, empty-filtered) with occurrence and document counts —
    vocabulary/boilerplate audit stats every corpus report ships.

    Scale shape: the token distribution is maximally skewed (Zipf — 'the'
    appears in every doc), which is exactly where map-side partial
    aggregation wins: the explode feeds ``groupBy(token)`` whose partial
    HashAggregate collapses each partition's hot tokens to ONE row before
    the Exchange, so the shuffle carries vocab-sized data per partition, not
    token-instance-sized, and no single reducer sees the raw 'the' stream
    (the salting the canonicalize operator needs is unnecessary here —
    partial aggregation IS the skew handling for algebraic aggregates).
    The final top-k is a ``TakeOrderedAndProject`` over the vocab-sized
    aggregate — no global sort.  Deterministic tie-break on the token.
    """
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_doc"),
        F.explode(F.expr(_tokens(text_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.countDistinct("_doc").cast("bigint").alias("n_docs"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(int(k))

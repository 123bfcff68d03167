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


def lang_scores(text_col: str = "text") -> list[Column]:
    toks = _tokens(text_col)
    cols = []
    for lang, words in LANG_STOPWORDS.items():
        arr = "array(" + ",".join(f"'{w}'" for w in words) + ")"
        cols.append(
            F.expr(
                f"size(filter({toks}, t -> array_contains({arr}, t)))"
                f" / greatest(size({toks}), 1)"
            ).alias(f"score_{lang}")
        )
    return cols


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax stopword-hit-ratio language guess (deterministic 'und' when no
    list scores above zero)."""
    scored = docs.select("*", *lang_scores(text_col))
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
    toks = _tokens(text_col)
    en = "array(" + ",".join(f"'{w}'" for w in LANG_STOPWORDS["en"]) + ")"
    out = (
        docs.withColumn("n_words", F.expr(f"size({toks})"))
        .withColumn(
            "mean_word_len",
            F.expr(
                f"CASE WHEN size({toks}) = 0 THEN 0D ELSE"
                f" aggregate({toks}, 0D, (acc, t) -> acc + length(t)) / size({toks}) END"
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
                f"size(filter({toks}, t -> array_contains({en}, t)))"
                f" / greatest(size({toks}), 1)"
            ),
        )
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
    * ``fp_rolling``: 64-bit rolling hash over tokens
      (h' = rot(h) XOR xxhash64(token); pure bit ops, so ANSI-overflow-safe)
      — order-sensitive, cheap to compute incrementally at ingest.
    """
    norm = f"trim(regexp_replace(lower({text_col}), '\\\\s+', ' '))"
    rolling = (
        f"aggregate({_tokens(text_col)}, 0L,"
        f" (acc, t) -> shiftleft(acc, 5) ^ shiftright(acc, 59) ^ xxhash64(t))"
    )
    return docs.withColumn("fp_md5", F.md5(F.expr(norm))).withColumn(
        "fp_rolling", F.expr(rolling)
    )

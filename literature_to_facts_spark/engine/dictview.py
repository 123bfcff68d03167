"""The per-document "dict view" aggregation (facts/core.py:128-133).

Reference semantics: group triples by predicate, parse literals back to
Python values, shorten predicates to ``paper:<key>``; a single value stays
scalar, multiple values become ``sorted(set(values))``.

Spark shape: ``groupBy(subj, pred).agg(sort_array(collect_set(...)))`` with a
numeric sort key for typed literals so that float/int predicates sort
numerically exactly like Python ``sorted`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from literature_to_facts_spark.functions.literals import parse_lexical


def dict_view(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj, dtype, ...) -> one row per (subj, paper:pred) with
    the sorted-distinct value list.

    IMPORTANT: run this on the PRE-dedup triple stream
    (``extract_triples(..., dedup=False)``): the reference decides scalar vs
    list on the raw value count (facts/core.py:133) — a value emitted twice
    becomes a one-element *list*, not a scalar.

    Columns: subj, pred (paper:-shortened), values array<string> (lexical,
    sorted distinct), dtypes array<string> (aligned), n_values int (distinct),
    n_raw long (pre-dedup count — scalar iff n_raw == 1).
    """
    num = F.when(
        F.col("dtype").isin("integer", "double"), F.col("obj").cast("double")
    ).otherwise(F.lit(None).cast("double"))
    entry = F.struct(
        num.alias("num"), F.col("obj").alias("lex"), F.col("dtype").alias("dt")
    )
    return (
        triples.groupBy("subj", "pred")
        .agg(
            F.sort_array(F.collect_set(entry)).alias("entries"),
            F.count(F.lit(1)).alias("n_raw"),
        )
        .select(
            "subj",
            F.concat(F.lit("paper:"), F.col("pred")).alias("pred"),
            F.col("entries.lex").alias("values"),
            F.col("entries.dt").alias("dtypes"),
            F.size("entries").alias("n_values"),
            "n_raw",
        )
    )


def rows_to_python(rows) -> dict:
    """Collected dict-view rows for ONE subject -> the reference's dict shape
    (scalar when the raw count is 1, sorted-distinct list otherwise)."""
    out: dict = {}
    for r in rows:
        vals = [parse_lexical(lex, dt) for lex, dt in zip(r["values"], r["dtypes"])]
        out[r["pred"]] = vals[0] if r["n_raw"] == 1 else vals
    return out

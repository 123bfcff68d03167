"""URL canonicalization operators (datapipe/urls.py).

The contract queries in __spark_entry__ oracle the fixture corpus against
DuckDB end-to-end; these tests pin the per-case semantics — RFC-ish part
extraction, registered-domain suffix handling, tracking-param stripping,
normalize idempotence and the dedup grouping — plus the loud collision
guards.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from literature_to_facts_spark.datapipe.urls import (
    url_dedup,
    url_normalize,
    with_url_parts,
)


def _parts(spark, url):
    df = spark.createDataFrame([Row(doc_id=1, url=url)])
    return with_url_parts(df).collect()[0]


def _norm(spark, url):
    df = spark.createDataFrame([Row(doc_id=1, url=url)])
    return url_normalize(df).collect()[0]["url_norm"]


def test_parts_full_url(spark):
    r = _parts(
        spark,
        "HTTPS://User:Pw@WWW.BBC.CO.UK:8443/News/UK/item.html?a=1&b=2#frag",
    )
    assert r.scheme == "https"
    assert r.host == "www.bbc.co.uk"
    assert r.port == 8443
    assert r.path == "/News/UK/item.html"  # path case preserved
    assert r.query == "a=1&b=2"  # fragment dropped
    assert r.registered_domain == "bbc.co.uk"  # ccSLD -> three labels
    assert r.path_depth == 3
    assert r.is_valid_url is True


def test_parts_minimal_and_generic_tld(spark):
    r = _parts(spark, "http://example.com")
    assert (r.scheme, r.host, r.port, r.path, r.query) == (
        "http", "example.com", None, "", ""
    )
    assert r.registered_domain == "example.com"
    assert r.path_depth == 0
    r = _parts(spark, "https://a.b.news.example.org/x")
    assert r.registered_domain == "example.org"  # last two labels


def test_parts_single_label_host(spark):
    r = _parts(spark, "http://localhost:9000/x")
    assert r.host == "localhost"
    assert r.registered_domain == "localhost"
    assert r.port == 9000


def test_parts_invalid_and_null(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, url="not a url"), Row(doc_id=2, url=None)]
    )
    rows = {r.doc_id: r for r in with_url_parts(df).collect()}
    assert rows[1].is_valid_url is False
    assert rows[1].host is None and rows[1].path_depth is None
    assert rows[2].is_valid_url is None
    assert rows[2].host is None


def test_parts_ipv6_out_of_scope(spark):
    # documented limit: bracket hosts parse as invalid, never wrong
    assert _parts(spark, "http://[::1]:8080/x").is_valid_url is False


def test_parts_rejects_colliding_columns(spark):
    df = spark.createDataFrame([Row(doc_id=1, url="http://a.com", host="x")])
    with pytest.raises(ValueError, match="host"):
        with_url_parts(df)


def test_normalize_tracking_and_sorting(spark):
    n = _norm(
        spark,
        "HTTP://Example.COM:80/a?utm_source=x&b=2&UTM_CAMPAIGN=y&a=1&fbclid=z#f",
    )
    assert n == "http://example.com/a?a=1&b=2"


def test_normalize_default_vs_explicit_port(spark):
    assert _norm(spark, "https://a.com:443/x") == "https://a.com/x"
    assert _norm(spark, "https://a.com:8443/x") == "https://a.com:8443/x"
    # default-port rule is scheme-aware: 443 on http is NOT default
    assert _norm(spark, "http://a.com:443/x") == "http://a.com:443/x"


def test_normalize_empty_path_userinfo_and_bare_names(spark):
    assert _norm(spark, "http://u:p@A.com?Z=1&y=") == "http://a.com/?Z=1&y="
    # bare param names (no '=') pass the tracking check by full name
    assert _norm(spark, "http://a.com/?ref&x") == "http://a.com/?x"


def test_normalize_invalid_null_and_idempotent(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="nope"),
            Row(doc_id=2, url=None),
            Row(doc_id=3, url="HTTPS://A.com:443/p?b=2&a=1&utm_x=1#z"),
        ]
    )
    out = {r.doc_id: r.url_norm for r in url_normalize(df).collect()}
    assert out[1] is None and out[2] is None
    assert out[3] == "https://a.com/p?a=1&b=2"
    # normalize(normalize(u)) == normalize(u)
    df2 = spark.createDataFrame([Row(doc_id=3, url=out[3])])
    assert url_normalize(df2).collect()[0]["url_norm"] == out[3]


def test_normalize_output_collision_guard(spark):
    df = spark.createDataFrame([Row(doc_id=1, url="http://a.com", url_norm="x")])
    with pytest.raises(ValueError, match="url_norm"):
        url_normalize(df)


def test_url_dedup_groups_variants(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="http://A.com:80/p?b=2&a=1&utm_s=x"),
            Row(doc_id=2, url="HTTP://a.com/p?a=1&b=2#frag"),
            Row(doc_id=3, url="http://a.com/p?a=1"),
            Row(doc_id=4, url="garbage"),
            Row(doc_id=5, url=None),
        ]
    )
    rows = {r.url_norm: r for r in url_dedup(df).collect()}
    assert set(rows) == {"http://a.com/p?a=1&b=2", "http://a.com/p?a=1"}
    dup = rows["http://a.com/p?a=1&b=2"]
    assert (dup.rep_id, dup.n_docs) == (1, 2)
    assert rows["http://a.com/p?a=1"].n_docs == 1


def test_url_dedup_plan_partial_agg(spark):
    """The one Exchange carries partially-aggregated rows (map-side
    min/count before the shuffle) — the canonical exact-dedup plan."""
    df = spark.range(100).selectExpr(
        "id AS doc_id", "'http://a.com/' || cast(id % 10 as string) AS url"
    )
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    first_agg = plan.index("HashAggregate")
    assert "Exchange" in plan[first_agg:], "expected partial agg before exchange"


def test_url_latest_snapshot(spark):
    """Latest-crawl argmax: max warc_ts wins, tie -> min id, NULL ts sorts
    oldest, invalid urls excluded, n_crawls counts all variants."""
    import datetime as dt

    from pyspark.sql import functions as F

    from literature_to_facts_spark.datapipe.urls import url_latest_snapshot

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    docs = spark.createDataFrame(
        [
            (1, "http://a.com:80/x?utm_source=f", t("2024-01-01T00:00:00")),
            (2, "http://a.com/x", t("2024-03-01T00:00:00")),
            (3, "http://a.com/x#frag", t("2024-03-01T00:00:00")),  # tie -> 2
            (4, "http://a.com/x", None),  # NULL ts never wins
            (5, "not a url", t("2024-01-01T00:00:00")),
            (6, "http://b.com/only", None),  # NULL ts wins a 1-crawl group
        ],
        "doc_id long, url string, warc_ts timestamp",
    )
    rows = {
        r.url_norm: (r.rep_id, r.latest_ts, r.n_crawls)
        for r in url_latest_snapshot(docs).collect()
    }
    assert set(rows) == {"http://a.com/x", "http://b.com/only"}
    assert rows["http://a.com/x"] == (2, t("2024-03-01T00:00:00"), 4)
    assert rows["http://b.com/only"] == (6, None, 1)


def test_url_domain_blocklist(spark):
    """Registered-domain gate: subdomains of a blocked domain drop, SLD
    domains handled, invalid urls dropped by default / kept on request,
    output columns unchanged."""
    from pyspark.sql import functions as F

    from literature_to_facts_spark.datapipe.urls import url_domain_blocklist

    docs = spark.createDataFrame(
        [
            (1, "http://spam.bad.com/x"),       # subdomain of blocked
            (2, "http://bad.com/y"),            # exactly blocked
            (3, "http://good.org/z"),
            (4, "http://a.bad.co.uk/w"),        # SLD: registered bad.co.uk
            (5, "not-a-url"),
            (6, None),
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame(
        [("bad.com",), ("bad.co.uk",)], "domain string"
    )
    out = url_domain_blocklist(docs, blocked)
    assert out.columns == ["doc_id", "url"]
    assert {r.doc_id for r in out.collect()} == {3}
    kept = url_domain_blocklist(docs, blocked, keep_invalid=True)
    assert {r.doc_id for r in kept.collect()} == {3, 5, 6}

    import pytest as _pt

    with _pt.raises(ValueError, match="host"):
        url_domain_blocklist(docs.withColumn("host", F.lit("x")), blocked)


def test_url_canonical_dedup(spark):
    """Canonical override: absolute http(s) canonicals merge fetch-url
    variants into one group; relative / non-http canonicals fall back to
    the page url; n_canonicalized counts the redirected members; latest
    argmax semantics unchanged."""
    import datetime as dt

    from literature_to_facts_spark.datapipe.urls import url_canonical_dedup

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    c = lambda href: f'<html><link rel="canonical" href="{href}"></html>'  # noqa: E731
    docs = spark.createDataFrame(
        [
            # two mirrors declaring the same canonical + the canonical itself
            (1, "http://m.a.com/x", t("2024-01-01"), c("http://a.com/x")),
            (2, "http://www.a.com/x?utm_source=f", t("2024-02-01"), c("http://a.com/x#top")),
            (3, "http://a.com/x", t("2024-03-01"), "<html>no canon</html>"),
            # relative canonical -> page url stands in
            (4, "http://b.com/y", t("2024-01-01"), c("/y")),
            # non-http canonical ignored
            (5, "http://c.com/z", t("2024-01-01"), c("ftp://c.com/z")),
            # NULL html -> page url
            (6, "http://d.com/w", t("2024-01-01"), None),
        ],
        "doc_id long, url string, warc_ts timestamp, html string",
    )
    rows = {
        r.url_norm: (r.rep_id, r.n_crawls, r.n_canonicalized)
        for r in url_canonical_dedup(docs).collect()
    }
    assert rows["http://a.com/x"] == (3, 3, 2)  # latest crawl wins the merged group
    assert rows["http://b.com/y"] == (4, 1, 0)
    assert rows["http://c.com/z"] == (5, 1, 0)
    assert rows["http://d.com/w"] == (6, 1, 0)
    assert len(rows) == 4


def test_url_canonical_dedup_single_exchange(spark):
    """The canonical override must add zero wide ops: exactly one Exchange
    (the url_norm argmax), extraction + normalization scan-fused."""
    from pyspark.sql import functions as F

    from literature_to_facts_spark.datapipe.urls import url_canonical_dedup

    df = spark.range(100).selectExpr(
        "id AS doc_id",
        "'http://a.com/' || cast(id % 10 as string) AS url",
        "timestamp_micros(id * 1000000) AS warc_ts",
        "'<html></html>' AS html",
    )
    plan = (
        url_canonical_dedup(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1

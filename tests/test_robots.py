"""robots.txt parsing + URL gating (datapipe/robots.py).

Hand-computable fixtures pin the REP grammar subset (comment strip,
multi-agent group headers, star-group selection, empty-Disallow skip,
orphan-rule drop) and the longest-prefix / Allow-tiebreak matching the
DuckDB oracle then re-verifies at scale.
"""

import pytest
from pyspark.sql import functions as F

from literature_to_facts_spark.datapipe.robots import apply_robots, parse_robots

_BODY = """# rules
User-agent: googlebot
Disallow: /

User-agent: *
User-agent: bingbot
Disallow: /private   # no peeking
Allow: /private/pub
Crawl-delay: 5
Disallow:

Sitemap: http://a.com/sm.xml
User-agent: yandex
Disallow: /yonly
"""


@pytest.fixture(scope="module")
def rules(spark):
    rb = spark.createDataFrame(
        [
            ("a.com", _BODY),
            ("b.com", None),
            ("c.com", "Disallow: /orphan\nUser-agent: *\nDisallow: /x"),
        ],
        "host string, robots_txt string",
    )
    return parse_robots(rb)


def test_parse_robots_groups_and_grammar(rules):
    got = sorted(map(tuple, rules.collect()))
    # googlebot-only + yandex-only groups excluded; inline comment stripped;
    # empty Disallow skipped; orphan rule (before any group) dropped; the
    # multi-agent (* + bingbot) header captures both its rules
    assert got == [
        ("a.com", "allow", "/private/pub"),
        ("a.com", "disallow", "/private"),
        ("c.com", "disallow", "/x"),
    ]


def test_apply_robots_longest_prefix_and_tiebreak(spark, rules):
    urls = spark.createDataFrame(
        [
            ("http://a.com/private/secret",),
            ("http://a.com/private/pub/x",),   # allow wins by length
            ("http://a.com/private",),         # exact prefix
            ("http://a.com/privateer",),       # prefix, not segment, match
            ("http://a.com/open",),
            ("http://A.COM/private",),         # host casefolds
            ("http://c.com/x/1",),
            ("http://unknown.com/q",),         # no rules -> allowed
            ("not-a-url",),                    # dropped (no host)
        ],
        "url string",
    )
    got = {r["url"]: r for r in apply_robots(urls, rules).collect()}
    assert len(got) == 8  # the invalid url is gone
    assert not got["http://a.com/private/secret"]["allowed"]
    assert got["http://a.com/private/pub/x"]["allowed"]
    assert got["http://a.com/private/pub/x"]["match_len"] == 12
    assert not got["http://a.com/private"]["allowed"]
    assert not got["http://a.com/privateer"]["allowed"]  # literal prefix
    assert got["http://a.com/open"]["allowed"]
    assert got["http://a.com/open"]["match_rule"] == ""
    assert got["http://a.com/open"]["match_len"] == 0
    assert not got["http://A.COM/private"]["allowed"]
    assert not got["http://c.com/x/1"]["allowed"]
    assert got["http://unknown.com/q"]["allowed"]


def test_apply_robots_allow_tie_wins(spark):
    # same-length allow + disallow for one path: allow wins (REP tiebreak)
    rules = spark.createDataFrame(
        [("t.com", "allow", "/a"), ("t.com", "disallow", "/b")],
        "host string, rule string, prefix string",
    )
    tie = spark.createDataFrame(
        [("t.com", "allow", "/ab"), ("t.com", "disallow", "/ab")],
        "host string, rule string, prefix string",
    )
    urls = spark.createDataFrame([("http://t.com/ab/x",)], "url string")
    r = apply_robots(urls, tie).collect()[0]
    assert r["allowed"] and r["match_rule"] == "allow" and r["match_len"] == 3


def test_apply_robots_broadcasts_rules(spark, rules):
    urls = spark.createDataFrame([("http://a.com/private",)], "url string")
    plan = (
        apply_robots(urls, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    out = apply_robots(urls, rules, broadcast_rules=False)
    assert out.collect()[0]["allowed"] is False


def test_parse_sitemap_fields_and_drops(spark):
    from literature_to_facts_spark.datapipe.robots import parse_sitemap

    xml = (
        "<urlset>"
        "<url><loc>  http://a.com/x  </loc>"
        "<lastmod>2024-03-15T10:00:00Z</lastmod></url>"
        "<URL><LOC>http://a.com/upper</LOC></URL>"      # case-insensitive
        "<url><loc>http://a.com/nolm</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"       # no loc: dropped
        "<url><loc></loc></url>"                         # empty: dropped
        "<url><loc>http://a.com/badlm</loc>"
        "<lastmod>not-a-date</lastmod></url>"
        "</urlset>"
    )
    df = spark.createDataFrame(
        [("a.com", xml), ("b.com", None)], "host string, sitemap_xml string"
    )
    got = {
        r["loc"]: r for r in parse_sitemap(df, carry_cols=("host",)).collect()
    }
    assert set(got) == {
        "http://a.com/x", "http://a.com/upper", "http://a.com/nolm",
        "http://a.com/badlm",
    }
    assert got["http://a.com/x"]["lastmod"] == "2024-03-15T10:00:00Z"
    assert got["http://a.com/x"]["lastmod_day"] == 19797  # 2024-03-15
    assert got["http://a.com/nolm"]["lastmod"] is None
    assert got["http://a.com/nolm"]["lastmod_day"] is None
    assert got["http://a.com/badlm"]["lastmod_day"] is None  # try_cast
    assert all(r["host"] == "a.com" for r in got.values())


def test_parse_sitemap_collision_guard(spark):
    import pytest as _pytest

    from literature_to_facts_spark.datapipe.robots import parse_sitemap

    df = spark.createDataFrame(
        [("x", "<url><loc>u</loc></url>")], "loc string, sitemap_xml string"
    )
    with _pytest.raises(ValueError, match="collide"):
        parse_sitemap(df)


# ----------------------- seeded randomized cross-check vs a Python reference

def _py_parse_robots(body):
    """Independent row-at-a-time REP-subset reference (the shim pattern):
    returns the star group's {(rule, prefix)} set."""
    rules = set()
    star = False
    prev_ua = False
    in_group = False
    for raw in body.split("\n"):
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            prev_ua = False
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if prev_ua:
                star = star or val == "*"
            else:
                star = val == "*"
                in_group = True
            prev_ua = True
        elif key in ("allow", "disallow"):
            prev_ua = False
            if in_group and star and val:
                rules.add((key, val))
        else:
            prev_ua = False
    return rules


def test_parse_robots_seeded_random_vs_reference(spark):
    import random

    from literature_to_facts_spark.datapipe.robots import parse_robots

    rng = random.Random(42)
    agents = ["*", "googlebot", "bingbot", "  * ", "YaNdEx"]
    prefixes = ["/", "/a", "/a/b", "/priv ate", "", "/x#y", "  /pad  "]
    noise = ["Crawl-delay: 5", "Sitemap: http://s/x.xml", "", "garbage line",
             "# pure comment", ":", "Disallow", "Allow :"]

    def line(r):
        k = r.random()
        if k < 0.3:
            return f"User-agent: {r.choice(agents)}"
        if k < 0.55:
            return f"Disallow: {r.choice(prefixes)}"
        if k < 0.7:
            return f"Allow: {r.choice(prefixes)}"
        if k < 0.8:
            return f"disallow: {r.choice(prefixes)}  # cmt"
        return r.choice(noise)

    bodies = [
        "\n".join(line(rng) for _ in range(rng.randint(0, 25)))
        for _ in range(150)
    ]
    df = spark.createDataFrame(
        [(f"h{i}.com", b) for i, b in enumerate(bodies)],
        "host string, robots_txt string",
    )
    got = {}
    for r in parse_robots(df).collect():
        got.setdefault(r["host"], set()).add((r["rule"], r["prefix"]))
    for i, b in enumerate(bodies):
        want = _py_parse_robots(b)
        assert got.get(f"h{i}.com", set()) == want, f"body {i}:\n{b!r}"


def test_robots_sitemaps_directives(spark):
    from literature_to_facts_spark.datapipe.robots import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: http://a.com/sm1.xml\n"
        "sitemap:   http://a.com/sm2.xml   # comment\n"
        "Sitemap:\n"                       # empty: dropped
        "Sitemap: http://a.com/sm1.xml\n"  # duplicate: distinct
        "NotSitemap: http://a.com/no.xml\n"
    )
    df = spark.createDataFrame(
        [("a.com", body), ("b.com", None)], "host string, robots_txt string"
    )
    got = sorted(map(tuple, robots_sitemaps(df).collect()))
    assert got == [
        ("a.com", "http://a.com/sm1.xml"),
        ("a.com", "http://a.com/sm2.xml"),
    ]

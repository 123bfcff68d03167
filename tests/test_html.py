

# ---------------------------------------------------------------------------
# html_meta_directives (robots meta + rel=canonical gate)
# ---------------------------------------------------------------------------


def _meta_rows(spark, pages):
    from literature_to_facts_spark.datapipe.html import html_meta_directives

    df = spark.createDataFrame(pages, "doc_id bigint, html string")
    return {
        r["doc_id"]: (
            r["robots_noindex"], r["robots_nofollow"], r["canonical_href"]
        )
        for r in html_meta_directives(df).collect()
    }


def test_meta_robots_orderings_and_tokens(spark):
    got = _meta_rows(
        spark,
        [
            (1, '<meta name="robots" content="noindex, follow">'),
            (2, "<META CONTENT='nofollow' NAME='robots'>"),
            (3, '<meta name="robots" content="NONE">'),
            (4, '<meta name="robots" content="noindexing">'),
            (5, "<p>no meta at all</p>"),
            (6, '<meta name="robots" content=" NoIndex , NOFOLLOW ">'),
        ],
    )
    assert got[1] == (True, False, None)
    assert got[2] == (False, True, None)   # content-first ordering
    assert got[3] == (True, True, None)    # none implies both
    assert got[4] == (False, False, None)  # exact token, not prefix
    assert got[5] == (False, False, None)
    assert got[6] == (True, True, None)    # case + whitespace normalization


def test_meta_canonical_first_and_fragment(spark):
    got = _meta_rows(
        spark,
        [
            (1, '<link rel="canonical" href="https://e.com/a#frag">'),
            (2, "<link href='/b.html' rel='canonical'>"),
            (
                3,
                '<link rel="canonical" href="https://e.com/first">'
                '<link rel="canonical" href="https://e.com/second">',
            ),
            (4, "<p>none</p>"),
        ],
    )
    assert got[1] == (False, False, "https://e.com/a")
    assert got[2] == (False, False, "/b.html")  # href-first ordering
    assert got[3][2] == "https://e.com/first"
    assert got[4][2] is None


def test_meta_null_html_propagates(spark):
    got = _meta_rows(spark, [(1, None)])
    assert got[1] == (None, None, None)


def test_meta_binary_html_decodes(spark):
    from literature_to_facts_spark.datapipe.html import html_meta_directives
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '<meta name="robots" content="noindex">')], "doc_id bigint, h string"
    ).select("doc_id", F.encode("h", "UTF-8").alias("html"))
    row = html_meta_directives(df).collect()[0]
    assert row["robots_noindex"] is True and row["robots_nofollow"] is False


def test_meta_collision_guard(spark):
    import pytest as _pytest

    from literature_to_facts_spark.datapipe.html import html_meta_directives

    df = spark.createDataFrame(
        [(1, "<p>x</p>", True)], "doc_id bigint, html string, robots_noindex boolean"
    )
    with _pytest.raises(ValueError, match="robots_noindex"):
        html_meta_directives(df)

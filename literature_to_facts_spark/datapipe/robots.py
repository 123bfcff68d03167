"""robots.txt parsing and URL gating — the crawl-politeness stage.

The reference ingests politely by construction (fixed archive index pages,
``/root/reference/facts/gcn.py:72-85``); a web-scale crawl must parse each
host's robots.txt and gate its URL frontier.  Two operators:

* :func:`parse_robots` — (host, robots body) -> the ``User-agent: *``
  group's ``(host, rule, prefix)`` table.  DECLARATIVE group tracking: a
  rule line belongs to the nearest preceding run of consecutive
  ``User-agent`` lines, so group ids are a running sum of run-starts over
  a per-host window — no stateful fold (a fold would also hit DuckDB
  1.0's list-accumulator ``list_reduce`` bug, so the window form is what
  keeps the oracle bit-exact).
* :func:`apply_robots` — longest-prefix-match gating of URLs against the
  rules table; ties prefer Allow (the Google REP tiebreak).

Documented subset (each a deliberate simplification, not a silent one):
only the ``*`` agent group is extracted; prefixes match literally (no
``*`` wildcards / ``$`` anchors); matching is on the PATH only (query
strings excluded); ``%``-escapes are not normalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Extract the ``User-agent: *`` group's Allow/Disallow rules:
    ``(host, rule, prefix)`` with ``rule`` ∈ {'allow','disallow'} and
    ``prefix`` the literal path prefix.

    Line grammar per REP: ``key: value`` with ``#`` starting a comment
    anywhere; keys case-insensitive; consecutive ``User-agent`` lines form
    ONE group header (a group may name several agents); rules before any
    group header are ignored; an empty Disallow value ("allow everything")
    contributes no rule.  NULL bodies parse to no rules.

    Scale shape: one per-host window (lines of one robots file are a few
    hundred rows — the partition is tiny by construction) + one group-id
    join; everything else is per-row string expressions.  The output is
    hosts-sized — broadcastable against any URL frontier.
    """
    lines = robots.where(F.col(body_col).isNotNull()).select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("_pos", "_raw"),
    )
    clean = F.trim(F.substring_index(F.col("_raw"), "#", 1))
    has_kv = F.instr(clean, ":") > 0
    key = F.lower(F.trim(F.substring_index(clean, ":", 1)))
    value = F.trim(F.expr(
        "substring(trim(substring_index(_raw, '#', 1)),"
        " instr(trim(substring_index(_raw, '#', 1)), ':') + 1)"
    ))
    kind = (
        F.when(~has_kv, F.lit("other"))
        .when(key == "user-agent", F.lit("ua"))
        .when(key == "allow", F.lit("allow"))
        .when(key == "disallow", F.lit("disallow"))
        .otherwise(F.lit("other"))
    )
    typed = lines.select(
        "host", "_pos", kind.alias("_kind"), value.alias("_val")
    )
    w = Window.partitionBy("host").orderBy("_pos")
    is_ua = (F.col("_kind") == "ua").cast("int")
    run_start = (
        (F.col("_kind") == "ua")
        & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    grouped = typed.withColumns(
        {
            "_gid": F.sum(run_start).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        }
    )
    stars = (
        grouped.where(F.col("_kind") == "ua")
        .groupBy("host", "_gid")
        .agg(
            F.max((F.col("_val") == "*").cast("int")).alias("_star")
        )
        .where(F.col("_star") == 1)
        .select("host", "_gid")
    )
    return (
        grouped.where(
            F.col("_kind").isin("allow", "disallow")
            & (F.col("_val") != "")
            & (F.col("_gid") > 0)
        )
        .join(stars, on=["host", "_gid"], how="left_semi")
        .select(
            "host",
            F.col("_kind").alias("rule"),
            F.col("_val").alias("prefix"),
        )
        .distinct()
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Gate a URL set against a :func:`parse_robots` rules table: one row
    per DISTINCT input url — ``(url, host, allowed, match_len,
    match_rule)`` with longest-prefix-match semantics and Allow winning
    length ties (the REP tiebreak); a url with no matching rule (or no
    rules for its host) is allowed with ``match_len = 0`` and
    ``match_rule = ''``.  Invalid urls (no host) are dropped.

    Scale shape: rules are hosts-sized, so the default BROADCAST join
    means the URL frontier is never shuffled; matching fans out only per
    matching rule (bounded by a host's rule count) and collapses with a
    map-side max-struct argmax — no window over the frontier.
    """
    from literature_to_facts_spark.datapipe.urls import URL_PATTERN

    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, URL_PATTERN, 2))
    path_raw = F.regexp_extract(u, URL_PATTERN, 4)
    path = F.when(path_raw == "", F.lit("/")).otherwise(path_raw)
    base = (
        urls.select(u.alias("url"))
        .distinct()
        .select("url", host.alias("host"), path.alias("_path"))
        .where(F.col("host") != "")
    )
    r = rules.select(
        F.col("host").alias("_rhost"),
        F.col("rule").alias("_rule"),
        F.col("prefix").alias("_prefix"),
    )
    if broadcast_rules:
        r = F.broadcast(r)
    joined = base.join(
        r,
        (F.col("host") == F.col("_rhost"))
        & F.col("_path").startswith(F.col("_prefix")),
        "left",
    )
    best = F.max(
        F.when(
            F.col("_prefix").isNotNull(),
            F.struct(
                F.length("_prefix").alias("l"),
                (F.col("_rule") == "allow").alias("a"),
            ),
        )
    )
    return (
        joined.groupBy("url", "host")
        .agg(best.alias("_best"))
        .select(
            "url",
            "host",
            F.coalesce(F.col("_best.a"), F.lit(True)).alias("allowed"),
            F.coalesce(F.col("_best.l"), F.lit(0))
            .cast("int")
            .alias("match_len"),
            F.when(F.col("_best").isNull(), F.lit(""))
            .when(F.col("_best.a"), F.lit("allow"))
            .otherwise(F.lit("disallow"))
            .alias("match_rule"),
        )
    )


# sitemap <url> entry blocks and their fields — RE2-safe non-greedy, one
# capture group each; patterns live ONLY here (oracles interpolate).
# Explicit whitespace class: Java \s includes U+000B, RE2's does not.
_SM_WS = r"[ \t\n\x0B\f\r]"
SITEMAP_URL_BLOCK_PATTERN = r"(?is)<url>(.*?)</url>"
SITEMAP_LOC_PATTERN = rf"(?is)<loc>{_SM_WS}*(.*?){_SM_WS}*</loc>"
SITEMAP_LASTMOD_PATTERN = rf"(?is)<lastmod>{_SM_WS}*(.*?){_SM_WS}*</lastmod>"

_SITEMAP_INTERNAL_COLS = frozenset({"_sm_blocks", "_sm_b"})


def parse_sitemap(
    docs: DataFrame,
    xml_col: str = "sitemap_xml",
    carry_cols: tuple = (),
) -> DataFrame:
    """Extract URL entries from sitemap XML — the crawl-discovery feed that
    pairs with :func:`parse_robots` (robots.txt points at sitemaps;
    sitemaps seed the frontier :func:`apply_robots` then gates).  One row
    per ``<url>`` block carrying a non-empty ``<loc>``:
    ``([carry...,] loc, lastmod, lastmod_day)`` — ``lastmod`` the raw
    W3C-datetime string (NULL when absent), ``lastmod_day`` its date part
    as epoch DAYS (int; NULL when absent/unparseable) so re-crawl
    scheduling compares integers, not strings.

    Per-row regex battery over block arrays (explode, then per-row field
    extraction — no nested HOF), zero shuffle, scan-fused; NULL xml rows
    contribute nothing.  Documented subset: ``<sitemapindex>`` recursion
    and gzip are the fetch layer's job; fields beyond loc/lastmod
    (changefreq, priority) are advisory and skipped.
    """
    clash = sorted(
        (_SITEMAP_INTERNAL_COLS | {"loc", "lastmod", "lastmod_day"})
        & set(docs.columns)
    )
    if clash:
        raise ValueError(
            f"input columns {clash} collide with parse_sitemap "
            "internals/outputs; rename them first"
        )
    blocks = docs.where(F.col(xml_col).isNotNull()).select(
        *[F.col(c) for c in carry_cols],
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(SITEMAP_URL_BLOCK_PATTERN), F.lit(1)
            )
        ).alias("_sm_b"),
    )
    loc = F.regexp_extract(F.col("_sm_b"), SITEMAP_LOC_PATTERN, 1)
    lastmod_raw = F.regexp_extract(
        F.col("_sm_b"), SITEMAP_LASTMOD_PATTERN, 1
    )
    lastmod = F.when(lastmod_raw != "", lastmod_raw)
    return (
        blocks.withColumns({"loc": loc, "lastmod": lastmod})
        .withColumns(
            {
                "lastmod_day": F.datediff(
                    F.expr("try_cast(substring(lastmod, 1, 10) as date)"),
                    F.lit("1970-01-01").cast("date"),
                ).cast("int")
            }
        )
        .where(F.col("loc") != "")
        .drop("_sm_b")
    )


# Sitemap directives are GROUP-INDEPENDENT per the REP (valid anywhere in
# the file); value runs to end-of-line before any comment
SITEMAP_DIRECTIVE_PATTERN = r"(?im)^Sitemap:[ \t]*([^\r\n#]*)"


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Extract ``Sitemap:`` directives from robots.txt bodies — the link
    that closes the discovery loop (robots names the sitemaps,
    :func:`parse_sitemap` reads them, :func:`apply_robots` gates what they
    yield): distinct ``(host, sitemap_url)`` rows, values trimmed, empty
    values dropped.  Sitemap directives are group-independent per the REP,
    so no group window is needed — one scan-fused extract-all + explode,
    one distinct.
    """
    return (
        robots.where(F.col(body_col).isNotNull())
        .select(
            F.col(host_col).alias("host"),
            F.explode(
                F.regexp_extract_all(
                    F.col(body_col),
                    F.lit(SITEMAP_DIRECTIVE_PATTERN),
                    F.lit(1),
                )
            ).alias("_v"),
        )
        .select("host", F.trim(F.col("_v")).alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
        .distinct()
    )

"""URL canonicalization and host-level curation operators.

Common-Crawl-scale corpora key everything on the page URL (the reference
keys its documents on ``url`` too — /root/reference/facts/core.py:121
groups the valuable filter per url), and real curation pipelines
(CCNet / RefinedWeb / Dolma) start with URL normalization + host extraction
before any text-level stage: the same page crawled as
``HTTP://Example.com:80/a?utm_source=x&b=1#frag`` and
``http://example.com/a?b=1`` must dedup as ONE document, and domain-level
filters need a ``registered_domain`` column.

Everything here is a pure per-row expression battery — zero shuffle, fused
into the scan by whole-stage codegen; only :func:`url_dedup` adds the one
groupBy Exchange its semantics require.  All regexes stay in the
RE2-compatible subset (no lookaround/backrefs, ASCII classes) and all list
operations have exact DuckDB equivalents, so the contract queries are
oracled end-to-end (see ``__spark_entry__._url_*_oracle``).

Deliberate scope limits (documented, not silent):

* no IPv6 bracket hosts (``http://[::1]/``) — the host group excludes
  ``:`` so a bracket host parses as invalid;
* ``registered_domain`` uses a compact second-level-TLD exception set, not
  the full Public Suffix List (a data file, not an algorithm change —
  swap :data:`SECOND_LEVEL_TLDS` for the PSL set at deployment);
* no percent-decoding (normalizing ``%41`` -> ``A`` requires a decode
  table; crawl pipelines typically compare the encoded form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one regex, five capture groups: scheme, host, port, path, query.
# Userinfo (user:pw@) is consumed un-captured; fragment is everything after
# '#' and never captured.  RE2-compatible: non-capturing groups only, no
# lookaround, ASCII classes.  Kept free of single quotes so it interpolates
# verbatim into DuckDB SQL string literals.
URL_PATTERN = (
    r"^([A-Za-z][A-Za-z0-9+.\-]*)://"  # 1: scheme
    r"(?:[^/?#@]*@)?"                  # userinfo, dropped
    r"([^/?#:@\[\]]*)"                 # 2: host (brackets excluded: an
    #    IPv6 host yields an empty match -> is_valid_url false, never a
    #    silently-wrong '[' host)
    r"(?::([0-9]+))?"                  # 3: port
    r"([^?#]*)"                        # 4: path
    r"(?:\?([^#]*))?"                  # 5: query
)

# second-level public suffixes where the registered domain is THREE labels
# (bbc.co.uk, not co.uk).  A compact, commonly-crawled subset of the Public
# Suffix List — swap for the full PSL table at deployment (same expression,
# bigger IN set).
SECOND_LEVEL_TLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn",
    "co.in", "net.in", "org.in",
    "co.za", "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "co.kr",
)

# query parameters stripped by url_normalize: click/campaign trackers that
# vary per-referral while the page content does not.  ``utm_`` is a prefix
# match; the rest are exact (case-insensitive) names.
TRACKING_PARAM_PREFIX = "utm_"
TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src", "spm", "yclid", "_ga",
)

# names with_url_parts / url_normalize emit — inputs colliding with these
# would be silently replaced (withColumns), so entry points reject loudly
_RESERVED_URL_COLS = frozenset(
    {
        "scheme", "host", "port", "path", "query",
        "registered_domain", "path_depth", "is_valid_url",
        "_url_params_raw", "_url_params",
    }
)


def _grp(url_col: str, i: int) -> Column:
    return F.regexp_extract(F.col(url_col), URL_PATTERN, i)


def _registered_domain(host_l: Column) -> Column:
    """Registered domain from a lowercased host: last two labels, or last
    three when the two-label suffix is a known second-level TLD."""
    labels = F.split(host_l, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return (
        F.when(n <= 2, host_l)
        .when(last2.isin(*SECOND_LEVEL_TLDS) & (n >= 3), last3)
        .otherwise(last2)
    )


def with_url_parts(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Decompose ``url_col`` into typed part columns: ``scheme`` / ``host``
    (both lowercased — case-insensitive per RFC 3986), ``port`` (bigint,
    NULL when absent), ``path`` / ``query`` (case-preserved, fragment
    dropped), ``registered_domain``, ``path_depth`` (non-empty path
    segments) and ``is_valid_url``.

    Invalid URLs (no scheme://host match) get NULL parts and
    ``is_valid_url = false``; NULL urls additionally get NULL
    ``is_valid_url``.  Pure per-row expressions — zero shuffle; the five
    group extracts run the same compiled regex per row inside one codegen
    stage (per-row constant work, not per-element HOF work).
    """
    clash = sorted(_RESERVED_URL_COLS & set(docs.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with with_url_parts outputs; "
            "rename them first"
        )
    host_raw = _grp(url_col, 2)
    valid = F.when(
        F.col(url_col).isNotNull(), host_raw != F.lit("")
    )  # NULL url -> NULL
    host = F.when(valid, F.lower(host_raw))
    port_s = _grp(url_col, 3)
    out = docs.withColumns(
        {
            "scheme": F.when(valid, F.lower(_grp(url_col, 1))),
            "host": host,
            # guarded cast: the regex only admits digits, but try_cast keeps
            # an overflow-length port NULL instead of an ANSI error
            "port": F.when(
                valid & (port_s != F.lit("")), port_s.try_cast("bigint")
            ),
            "path": F.when(valid, _grp(url_col, 4)),
            "query": F.when(valid, _grp(url_col, 5)),
            "registered_domain": F.when(valid, _registered_domain(host)),
            "is_valid_url": valid.otherwise(
                F.when(F.col(url_col).isNotNull(), F.lit(False))
            ),
        }
    )
    # the path-segment array is projected from the ALREADY-COMPUTED `path`
    # column (repo invariant: never inline a non-cheap expression into a
    # HOF consumer — it re-evaluates per element)
    segs = F.filter(F.split(F.col("path"), "/"), lambda s: s != F.lit(""))
    return out.withColumns(
        {"path_depth": F.when(F.col("path").isNotNull(), F.size(segs)).cast("bigint")}
    )


def _is_tracking(p: Column) -> Column:
    """True when query param ``p`` (a ``name=value`` or bare ``name``
    string) is a tracking parameter."""
    name = F.lower(
        F.when(F.instr(p, "=") > 0, F.substring_index(p, "=", 1)).otherwise(p)
    )
    pref = F.lit(TRACKING_PARAM_PREFIX)
    return name.startswith(pref) | name.isin(*TRACKING_PARAMS)


def url_normalize(
    docs: DataFrame, url_col: str = "url", output_col: str = "url_norm"
) -> DataFrame:
    """Canonical URL form for exact URL-level dedup: lowercase scheme+host,
    strip default ports (http:80 / https:443), drop the fragment, drop
    tracking query parameters (:data:`TRACKING_PARAMS` /
    :data:`TRACKING_PARAM_PREFIX`), SORT the surviving parameters
    (``?b=2&a=1`` == ``?a=1&b=2``), empty path -> ``/``.

    Invalid or NULL urls get NULL ``output_col``.  Pure per-row — the
    params array is projected ONCE before the filter HOF consumes it
    (an inlined split would re-evaluate per element).
    """
    if output_col in docs.columns and output_col != url_col:
        raise ValueError(
            f"output column {output_col!r} already exists; rename it first"
        )
    clash = sorted({"_url_params_raw", "_url_params"} & set(docs.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with url_normalize internals; "
            "rename them first"
        )
    host_raw = _grp(url_col, 2)
    valid = F.when(F.col(url_col).isNotNull(), host_raw != F.lit(""))
    scheme = F.lower(_grp(url_col, 1))
    host = F.lower(host_raw)
    port_s = _grp(url_col, 3)
    default_port = (
        (port_s == F.lit(""))
        | ((scheme == F.lit("http")) & (port_s == F.lit("80")))
        | ((scheme == F.lit("https")) & (port_s == F.lit("443")))
    )
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), port_s)
    )
    path_raw = _grp(url_col, 4)
    path_n = F.when(path_raw == F.lit(""), F.lit("/")).otherwise(path_raw)
    # project the raw param array ONCE into a real column before the filter
    # HOF consumes it (repo invariant: an expression inlined into a HOF
    # argument re-evaluates per element — here that would rerun the query
    # regex + split for every parameter)
    staged = docs.withColumns(
        {"_url_params_raw": F.when(valid, F.split(_grp(url_col, 5), "&"))}
    )
    staged = staged.withColumns(
        {
            "_url_params": F.array_sort(
                F.filter(
                    F.col("_url_params_raw"),
                    lambda p: (p != F.lit("")) & ~_is_tracking(p),
                )
            )
        }
    )
    qs = F.when(
        F.size(F.col("_url_params")) > 0,
        F.concat(F.lit("?"), F.array_join(F.col("_url_params"), "&")),
    ).otherwise(F.lit(""))
    norm = F.concat(scheme, F.lit("://"), host, port_part, path_n, qs)
    return staged.withColumns({output_col: F.when(valid, norm)}).drop(
        "_url_params_raw", "_url_params"
    )


def url_dedup(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Exact URL-level dedup over the NORMALIZED url: one row per distinct
    ``url_norm`` with the representative (minimum) ``id_col`` and the
    member count — the first stage of every crawl-corpus pipeline (the
    same page fetched via tracking-parameter / default-port / fragment
    variants collapses before any text-level dedup pays for it).

    Invalid/NULL urls are excluded (they cannot assert equality).  Scale
    shape: normalization fuses into the scan; the single groupBy Exchange
    carries (url_norm, id) pairs with map-side partial ``min``/``count`` —
    the canonical exact-dedup plan (same as dedup.exact_dedup, keyed on
    url_norm instead of content hash).
    """
    normed = url_normalize(docs, url_col=url_col, output_col="_url_norm")
    return (
        normed.where(F.col("_url_norm").isNotNull())
        .groupBy(F.col("_url_norm").alias("url_norm"))
        .agg(
            F.min(id_col).alias("rep_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )
    )


def url_domain_blocklist(
    docs: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    blocked_col: str = "domain",
    keep_invalid: bool = False,
) -> DataFrame:
    """Drop documents whose REGISTERED DOMAIN appears in a blocklist table
    — the UT1/adult-domain-list gate every crawl pipeline runs before any
    text-level stage (RefinedWeb/FineWeb block by registered domain so
    ``spam.bad.com`` and ``www.bad.com`` both match a ``bad.com`` entry).

    ``blocked`` is a one-column DataFrame of lowercase registered domains
    (blocklist-sized: 10^4-10^6 rows).  Invalid/NULL-url docs are dropped
    by default (an unparseable URL cannot be cleared against the list);
    ``keep_invalid=True`` retains them for a downstream quarantine stage.

    Scale shape: domain extraction fuses into the scan (the
    :func:`with_url_parts` regex battery) and the gate is ONE broadcast
    left-anti join — zero shuffle of the corpus, blocklist shipped once
    per executor.  Output = input columns unchanged (the parts columns are
    internal here).
    """
    clash = sorted(_RESERVED_URL_COLS & set(docs.columns))
    if clash:
        raise ValueError(
            f"input columns {clash} collide with url_domain_blocklist "
            "internals; rename them first"
        )
    parts = with_url_parts(docs, url_col=url_col)
    gated = parts.join(
        F.broadcast(
            blocked.select(F.col(blocked_col).alias("registered_domain"))
        ),
        on="registered_domain",
        how="left_anti",
    )
    if not keep_invalid:
        gated = gated.where(F.col("is_valid_url"))
    return gated.select(*docs.columns)


def url_latest_snapshot(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Crawl-snapshot dedup: one row per distinct normalized URL keeping
    the LATEST crawl (max ``ts_col``; ties -> minimum id) — the
    re-crawl-collapse stage a Common-Crawl-style table needs before
    content-level dedup (the same page fetched across monthly snapshots
    must contribute one document, the freshest).  Returns ``(url_norm,
    rep_id, latest_ts, n_crawls)``; NULL-timestamp crawls sort oldest
    (a dated crawl always beats an undated one); invalid/NULL urls are
    excluded (as in :func:`url_dedup`).

    Deterministic exact argmax — ``max(struct(epoch_micros, -id))``, a
    plain aggregate with map-side partial max (no window, no sort), so
    the one ``groupBy(url_norm)`` Exchange carries (url_norm, struct,
    count) partials.  Normalization fuses into the scan.
    """
    normed = url_normalize(docs, url_col=url_col, output_col="_url_norm")
    # argmax(ts, tie: min id): max of (micros, -id); NULL ts -> LONG_MIN
    # micros so any real timestamp wins
    best = F.max(
        F.struct(
            F.coalesce(
                F.unix_micros(F.col(ts_col)),
                F.lit(-(1 << 62)).cast("bigint"),
            ).alias("t"),
            (-F.col(id_col)).cast("bigint").alias("ni"),
            F.col(ts_col).alias("ts"),
        )
    )
    return (
        normed.where(F.col("_url_norm").isNotNull())
        .groupBy(F.col("_url_norm").alias("url_norm"))
        .agg(
            best.alias("_b"),
            F.count(F.lit(1)).cast("bigint").alias("n_crawls"),
        )
        .select(
            "url_norm",
            (-F.col("_b.ni")).cast("bigint").alias("rep_id"),
            F.col("_b.ts").alias("latest_ts"),
            "n_crawls",
        )
    )


def url_canonical_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Canonical-aware crawl-snapshot dedup — :func:`url_latest_snapshot`
    keyed on the EFFECTIVE url: the page's declared ``<link
    rel="canonical">`` target when it is an absolute http(s) URL
    (:func:`~literature_to_facts_spark.datapipe.html.html_meta_directives`),
    else the page url.  Crawl variants that declare the same canonical
    (mobile/www/tracking-param mirrors of one article) collapse into ONE
    group even though their fetch urls differ — the dedup the raw
    normalizer cannot do, because the variance is in the page content's
    self-declaration, not the url string.

    Returns ``(url_norm, rep_id, latest_ts, n_crawls, n_canonicalized)``
    with the same latest-crawl argmax semantics as
    :func:`url_latest_snapshot` (NULL ts oldest, ties -> min id);
    ``n_canonicalized`` counts the member crawls that were redirected into
    the group by their canonical declaration.  Relative canonical hrefs
    are NOT resolved (documented subset — the page url stands in), and a
    non-http(s) canonical is ignored.

    Scale shape: the canonical extraction and effective-url normalization
    fuse into the scan (all per-row regexes); the single Exchange is the
    ``groupBy(url_norm)`` argmax with map-side partial aggregation —
    identical to the plain snapshot dedup, the canonical override adds
    zero wide operations.
    """
    from .html import HTTP_LINK_PATTERN, html_meta_directives

    clash = sorted(
        {"_eff_url", "_canonized", "_url_norm", "_canon_b"} & set(docs.columns)
    )
    if clash:
        raise ValueError(
            f"input columns {clash} collide with url_canonical_dedup "
            "internals; rename them first"
        )
    meta = html_meta_directives(docs, html_col=html_col)
    # HARD projection barrier around the canonical extraction:
    # url_normalize multi-references its input column (five regex groups +
    # the param split), and CollapseProject chains straight through
    # withColumns layers — with the canonical battery as the input that
    # inlined the four extract-alls into EVERY consumer (measured: 581
    # regexp_extract_all nodes in the executed plan, ~10 s warm at sf0.1).
    # explode(array(x)) is a 1:1 Generate node projections cannot collapse
    # through, so the battery is evaluated exactly once per row (NULL
    # passes through: array(NULL) is a one-element array).
    meta = meta.withColumn(
        "_canon_b", F.explode(F.array(F.col("canonical_href")))
    )
    canon = F.col("_canon_b")
    use_canon = (
        canon.isNotNull()
        & (canon != F.lit(""))
        & canon.rlike(HTTP_LINK_PATTERN)
    )
    staged = meta.withColumns(
        {
            "_eff_url": F.when(use_canon, canon).otherwise(F.col(url_col)),
            "_canonized": F.coalesce(use_canon, F.lit(False)).cast("int"),
        }
    ).drop("robots_noindex", "robots_nofollow", "canonical_href", "_canon_b")
    normed = url_normalize(staged, url_col="_eff_url", output_col="_url_norm")
    best = F.max(
        F.struct(
            F.coalesce(
                F.unix_micros(F.col(ts_col)),
                F.lit(-(1 << 62)).cast("bigint"),
            ).alias("t"),
            (-F.col(id_col)).cast("bigint").alias("ni"),
            F.col(ts_col).alias("ts"),
        )
    )
    return (
        normed.where(F.col("_url_norm").isNotNull())
        .groupBy(F.col("_url_norm").alias("url_norm"))
        .agg(
            best.alias("_b"),
            F.count(F.lit(1)).cast("bigint").alias("n_crawls"),
            F.sum("_canonized").cast("bigint").alias("n_canonicalized"),
        )
        .select(
            "url_norm",
            (-F.col("_b.ni")).cast("bigint").alias("rep_id"),
            F.col("_b.ts").alias("latest_ts"),
            "n_crawls",
            "n_canonicalized",
        )
    )

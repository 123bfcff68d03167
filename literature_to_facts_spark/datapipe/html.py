"""HTML -> text extraction for the web-page input table.

The engine's input schema carries the raw page (``html binary``) alongside
the extracted ``text`` (BASELINE.json input_hint); production crawls run a
strip stage between them.  This module is that stage as a pure JVM-side
regexp/replace chain — zero Python, zero shuffle, scan-fused — covering the
deterministic part of extraction (script/style/comment removal, tag strip,
basic entity decode, whitespace collapse).  It is deliberately NOT a
readability/boilerplate model (trafilatura-class main-content detection
needs a DOM and learned rules); pair it with
:func:`~literature_to_facts_spark.datapipe.textclean.line_dedup` — corpus
line frequencies remove nav/footer boilerplate without a DOM.

Every pattern stays in the RE2-compatible subset ((?is) inline flags and
non-greedy repetition are RE2-safe; no lookaround/backrefs) and whitespace
uses the explicit ``[ \\t\\n\\x0B\\f\\r]`` class, so the DuckDB oracle
recomputes the chain verbatim — patterns live ONLY here and oracles
interpolate them (the PII_PATTERNS contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# applied IN ORDER; (pattern, replacement) — replacement syntax shared by
# Java and RE2 (no backrefs used)
HTML_STRIP_PATTERNS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]+>", " "),
]

# entity decode AFTER tag strip; '&amp;' decodes LAST so '&amp;lt;' yields
# the literal '&lt;' (single-pass decode, the lxml/html.unescape order)
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

_WS_CLASS = r"[ \t\n\x0B\f\r]+"  # explicit: Java \s includes U+000B, RE2 does not


def html_extract_text(
    docs: DataFrame,
    html_col: str = "html",
    output_col: str = "extracted_text",
) -> DataFrame:
    """Extract display text from raw HTML: drop script/style/comment
    blocks, strip tags, decode the six common entities, collapse
    whitespace, trim.  ``html_col`` may be binary (decoded as ASCII with
    U+FFFD replacement — the reference's ``decode('ascii', 'replace')``
    invariant, /root/reference/facts/gcn.py:39) or string.  NULL in, NULL
    out.

    Scale shape: a per-row regexp_replace chain fused into the scan — zero
    shuffle, no Python.  Each pattern is a separate pass over the string
    (bounded constant factor); the non-greedy block patterns are linear in
    RE2 and Java alike.
    """
    if output_col in docs.columns:
        raise ValueError(
            f"output column {output_col!r} already exists; rename it first"
        )
    col = F.col(html_col)
    if dict(docs.dtypes)[html_col] == "binary":
        # ANSI mode makes decode(.., 'US-ASCII') THROW on non-ascii bytes;
        # latin-1 is a total bytes->chars map, so decode with it and replace
        # the high range with U+FFFD — byte-identical to python's
        # decode('ascii', 'replace') (verified in tests)
        col = F.regexp_replace(
            F.decode(col, "ISO-8859-1"), r"[^\x00-\x7F]", "�"
        )
    for pat, repl in HTML_STRIP_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    for ent, ch in HTML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    col = F.trim(F.regexp_replace(col, _WS_CLASS, " "))
    return docs.withColumns({output_col: col})

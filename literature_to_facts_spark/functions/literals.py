"""RDF literal rendering/parsing with rdflib-``Literal.n3()`` parity.

The reference renders every fact value through ``rdflib.Literal(v).n3()``
(/root/reference/facts/core.py:108) and parses it back in the dict view via
``rdflib.util.from_n3(o).value`` (/root/reference/facts/core.py:131).  rdflib
is not available in this sandbox, so we implement the same lexical mapping
from rdflib's public source (rdflib/term.py):

* ``str``   -> plain quoted literal; quoting per rdflib ``_quote_encode``:
  backslash, newline, double-quote, carriage-return escaped, in that order.
* ``bool``  -> ``"true"/"false"^^xsd:boolean`` (castFunc ``str(i).lower()``).
* ``int``   -> ``"<str(i)>"^^xsd:integer``.
* ``float`` -> ``"<str(f)>"^^xsd:double`` (no lexical cast function for float
  in ``_GenericPythonToXSDRules``; the instance string is ``str(value)``,
  i.e. Python's shortest-round-trip repr, e.g. ``4.6e-07``).

These rules are pinned by tests/test_literals.py (round-trip property tests).
"""

from __future__ import annotations

from typing import Union

XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_INTEGER = XSD + "integer"
XSD_DOUBLE = XSD + "double"
XSD_BOOLEAN = XSD + "boolean"

DTYPE_STRING = "string"
DTYPE_INTEGER = "integer"
DTYPE_DOUBLE = "double"
DTYPE_BOOLEAN = "boolean"

PAPER_NS = "http://odahub.io/ontology/paper"

PlainValue = Union[str, int, float, bool]


def quote_encode(s: str) -> str:
    """rdflib ``_quote_encode``: escape ``\\``, ``\\n``, ``"``, ``\\r``."""
    return (
        '"'
        + s.replace("\\", "\\\\")
        .replace("\n", "\\n")
        .replace('"', '\\"')
        .replace("\r", "\\r")
        + '"'
    )


def quote_encode_column(col):
    """Spark Column version of :func:`quote_encode` (same escape set and
    order: backslash, newline, quote, carriage return) — literal ``replace``,
    no regex, so backslashes need no double-escaping."""
    from pyspark.sql import functions as F

    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.concat(F.lit('"'), out, F.lit('"'))


def quote_decode(s: str) -> str:
    """Inverse of :func:`quote_encode` for a quoted body (without quotes)."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "n":
                out.append("\n")
            elif nxt == "r":
                out.append("\r")
            elif nxt == "t":
                out.append("\t")
            elif nxt == '"':
                out.append('"')
            elif nxt == "\\":
                out.append("\\")
            else:
                out.append(nxt)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def literal_n3(v: PlainValue) -> str:
    """Render a Python value exactly as ``rdflib.Literal(v).n3()`` would."""
    # bool is an int subclass: check first (rdflib rule order does the same)
    if isinstance(v, bool):
        return f'"{str(v).lower()}"^^<{XSD_BOOLEAN}>'
    if isinstance(v, int):
        return f'"{v}"^^<{XSD_INTEGER}>'
    if isinstance(v, float):
        return f'"{str(v)}"^^<{XSD_DOUBLE}>'
    return quote_encode(str(v))


def lexical_and_dtype(v: PlainValue) -> tuple[str, str]:
    """(lexical form, engine dtype tag) for a Python value."""
    if isinstance(v, bool):
        return str(v).lower(), DTYPE_BOOLEAN
    if isinstance(v, int):
        return str(v), DTYPE_INTEGER
    if isinstance(v, float):
        return str(v), DTYPE_DOUBLE
    return str(v), DTYPE_STRING


def n3_from_lexical(lexical: str, dtype: str) -> str:
    """N3 token from a stored (lexical, dtype) pair."""
    if dtype == DTYPE_INTEGER:
        return f'"{lexical}"^^<{XSD_INTEGER}>'
    if dtype == DTYPE_DOUBLE:
        return f'"{lexical}"^^<{XSD_DOUBLE}>'
    if dtype == DTYPE_BOOLEAN:
        return f'"{lexical}"^^<{XSD_BOOLEAN}>'
    return quote_encode(lexical)


def from_n3(token: str) -> PlainValue:
    """Parse an N3 literal token back to a Python value.

    Mirrors the reference dict view (``rdflib.util.from_n3(o).value``,
    /root/reference/facts/core.py:131): typed literals come back as
    int/float/bool, plain literals as the unescaped string (the reference's
    own tests compare plain values directly, tests/test_gcn.py:105,136,207).
    """
    if token.startswith('"'):
        end = _closing_quote(token)
        body = quote_decode(token[1:end])
        rest = token[end + 1 :]
        if rest.startswith("^^<") and rest.endswith(">"):
            dt = rest[3:-1]
            if dt == XSD_INTEGER:
                return int(body)
            if dt == XSD_DOUBLE:
                return float(body)
            if dt == XSD_BOOLEAN:
                return body == "true"
        return body
    raise ValueError(f"not a literal token: {token!r}")


def parse_lexical(lexical: str, dtype: str) -> PlainValue:
    """Typed Python value from a stored (lexical, dtype) pair."""
    if dtype == DTYPE_INTEGER:
        return int(lexical)
    if dtype == DTYPE_DOUBLE:
        return float(lexical)
    if dtype == DTYPE_BOOLEAN:
        return lexical == "true"
    return lexical


def _closing_quote(token: str) -> int:
    i = 1
    n = len(token)
    while i < n:
        if token[i] == "\\":
            i += 2
            continue
        if token[i] == '"':
            return i
        i += 1
    raise ValueError(f"unterminated literal: {token!r}")

"""Text normalization primitives shared by extractors (vectorized).

Each helper exists because the reference normalizes text in a specific —
sometimes buggy — way that parity requires us to reproduce exactly:

* :func:`ascii_replace_decode` — ``bytes.decode('ascii', 'replace')``
  (/root/reference/facts/gcn.py:39).  This defines the "byte-identical
  extracted text per url" invariant of BASELINE.json.
* :func:`collapse_ws` — ``re.sub(r"[ \\n\\r]+", " ", text)`` used by many GCN
  extractors (/root/reference/facts/gcn.py:432,456,467,482 …).
* :func:`collapse_space_nl` — ``re.sub("[ \\n]+", " ", text)`` (note: no
  ``\\r``) used only by fermi_v2 (/root/reference/facts/gcn.py:145).
* :func:`collapse_nl_24` — ``re.sub("\\n", " ", text, re.M | re.S)``: the
  third positional arg of ``re.sub`` is ``count``, and ``re.M | re.S == 24``,
  so ONLY THE FIRST 24 newlines are replaced.  Reference bug preserved
  (/root/reference/facts/gcn.py:181,200).
* :func:`collapse_wsr` — ``re.sub(r"[ \\n\\r]+", " ", ...)`` variant used by
  gcn_lvc_event (/root/reference/facts/gcn.py:258) — same as collapse_ws.
"""

from __future__ import annotations

import re

import pandas as pd

_WS_RE = re.compile(r"[ \n\r]+")
_SPACE_NL_RE = re.compile(r"[ \n]+")


def ascii_replace_decode(b: bytes) -> str:
    """Decode raw page bytes exactly like the reference's gcn_source."""
    return b.decode("ascii", "replace")


def ascii_replace_decode_series(s: pd.Series) -> pd.Series:
    """Vectorized ascii-replace decode of a Series of bytes."""
    return s.map(lambda b: b.decode("ascii", "replace") if b is not None else None)


def collapse_ws(text: str) -> str:
    return _WS_RE.sub(" ", text)


def collapse_ws_series(s: pd.Series) -> pd.Series:
    return s.str.replace(_WS_RE, " ", regex=True)


def collapse_space_nl(text: str) -> str:
    return _SPACE_NL_RE.sub(" ", text)


def collapse_space_nl_series(s: pd.Series) -> pd.Series:
    return s.str.replace(_SPACE_NL_RE, " ", regex=True)


def collapse_nl_24(text: str) -> str:
    """Replace only the first 24 newlines (reference ``count=24`` quirk)."""
    return text.replace("\n", " ", 24)


def collapse_nl_24_series(s: pd.Series) -> pd.Series:
    return s.map(lambda t: t.replace("\n", " ", 24) if t is not None else None)

"""Vectorized shared extractors: keywords, named-event NER, citations.

Batch re-expressions of facts/common.py with all observable bugs preserved
(see shim/reference_shim.py for the row-at-a-time oracle):

* keyword list concatenation bug ("blazarGW170817"), facts/common.py:17-18;
* title ``_times`` stores the body count, facts/common.py:77;
* ``cites_<kind>_id`` assignment (last match wins), facts/common.py:32.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from literature_to_facts_spark.shim.reference_shim import (
    CITE_PREFIXES,
    GRBLIKE_PATTERNS,
    RELEVANT_KEYWORDS,
    paperid_to_uri,
)

_GRBLIKE_COMPILED = [(re.compile(p), fmt) for p, fmt in GRBLIKE_PATTERNS]
# kind -> compiled prefix regexes, preserving the reference's scan order
# (kind -> text -> prefix, facts/common.py:25-31)
_CITE_COMPILED = {
    kind: [re.compile(f"{prefix} *?" + r"#?(\d{3,})", re.I) for prefix in prefixes]
    for kind, prefixes in CITE_PREFIXES.items()
}


def mentions_keyword_batch(title: pd.Series, body: pd.Series) -> dict:
    """facts/common.py:60-80, vectorized with ``Series.str.count``.

    The value is "title" when the keyword appears in the title (title checked
    last, so it wins), else "body"; ``_times`` carries the BODY count ``n``
    whenever either count exceeds 1 (reference bug preserved).
    """
    out: dict = {}
    for keyword in RELEVANT_KEYWORDS:
        k = keyword.lower()
        n = body.str.count(keyword).fillna(0).astype(int)
        nt = title.str.count(keyword).fillna(0).astype(int)
        value = pd.Series(
            np.select([nt > 0, n > 0], ["title", "body"], default=None),
            index=body.index,
            dtype=object,
        )
        hit_times = ((n > 1) | (nt > 1)).to_numpy()
        n_arr = n.to_numpy()
        times = pd.Series(
            [int(n_arr[i]) if hit_times[i] else None for i in range(len(n_arr))],
            index=body.index,
            dtype=object,
        )
        if value.notna().any():
            out["mentions_" + k] = value
        if times.notna().any():
            out["mentions_" + k + "_times"] = times
    return out


def arxiv_mentions_keyword_batch(
    title: pd.Series, summary: pd.Series, keywords: tuple
) -> dict:
    """facts/arxiv.py:105-120: field loop title->summary; summary wins for
    both the value and (when its count > 1) the ``_times`` count."""
    out: dict = {}
    for keyword in keywords:
        k = keyword.lower()
        n_t = title.str.count(keyword).fillna(0).astype(int)
        n_s = summary.str.count(keyword).fillna(0).astype(int)
        value = pd.Series(
            np.select([n_s > 0, n_t > 0], ["summary", "title"], default=None),
            index=title.index,
            dtype=object,
        )
        times_val = np.select([n_s > 1, n_t > 1], [n_s, n_t], default=-1)
        times = pd.Series(
            [int(v) if v >= 0 else None for v in times_val],
            index=title.index,
            dtype=object,
        )
        if value.notna().any():
            out["mentions_" + k] = value
        if times.notna().any():
            out["mentions_" + k + "_times"] = times
    return out


def mentions_grblike_batch(title: pd.Series, body: pd.Series) -> dict:
    """facts/common.py:37-57: three NER patterns over title then body,
    duplicates kept at triple level (the dict view dedups later).

    ``Series.str.findall`` does the vectorized scan; the per-match name
    formatting is a cheap loop over matches only.
    """
    idx = title.index
    events: list = [[] for _ in range(len(idx))]
    etypes: list = [[] for _ in range(len(idx))]
    per_type: dict[str, list] = {}

    for text_series in (title, body):
        for pattern, fmt in _GRBLIKE_COMPILED:
            found = text_series.str.findall(pattern)
            for pos, matches in enumerate(found):
                if not isinstance(matches, list):
                    continue
                for m in matches:
                    parts = [m] if isinstance(m, str) else list(m)
                    full_name = fmt.format(*parts).replace(" ", "")
                    kind = parts[0]
                    events[pos].append(full_name)
                    etypes[pos].append(kind)
                    key = f"mentions_named_{kind.lower()}"
                    if key not in per_type:
                        per_type[key] = [[] for _ in range(len(idx))]
                    per_type[key][pos].append(full_name)

    out = {
        "mentions_named_event": pd.Series(events, index=idx, dtype=object),
        "mentions_named_event_type": pd.Series(etypes, index=idx, dtype=object),
    }
    for key, lists in per_type.items():
        out[key] = pd.Series(lists, index=idx, dtype=object)
    return out


def cites_batch(title: pd.Series, body: pd.Series) -> dict:
    """facts/common.py:22-35: citation mining.  The scalar ``cites_<kind>_id``
    is the LAST match in (title, body) x prefix scan order (assignment bug)."""
    idx = title.index
    cites: list = [[] for _ in range(len(idx))]
    last_id: dict[str, list] = {
        "atel": [None] * len(idx),
        "gcn": [None] * len(idx),
    }
    for kind, rxs in _CITE_COMPILED.items():
        for text_series in (title, body):
            for rx in rxs:
                found = text_series.str.findall(rx)
                for pos, matches in enumerate(found):
                    if not isinstance(matches, list):
                        continue
                    for pid in matches:
                        last_id[kind][pos] = pid
                        cites[pos].append(paperid_to_uri(kind, pid))
    out = {
        "cites_atel_id": pd.Series(last_id["atel"], index=idx, dtype=object),
        "cites_gcn_id": pd.Series(last_id["gcn"], index=idx, dtype=object),
        "cites": pd.Series(cites, index=idx, dtype=object),
    }
    return out

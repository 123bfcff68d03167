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


_REGEX_META = set(".^$*+?()[]{}|\\")


def _literal_head(pattern: str) -> str:
    """Longest literal prefix of a regex string (stops at the first
    metacharacter) — a sound row gate for `pattern...` matches."""
    out = []
    for c in pattern:
        if c in _REGEX_META:
            break
        out.append(c)
    return "".join(out)


def _literal_counts(texts: list, keyword: str) -> np.ndarray:
    """Per-row non-overlapping literal substring counts (C-level str.count —
    the keywords contain no regex metacharacters, so this equals the
    reference's ``len(re.findall(keyword, text))``)."""
    return np.fromiter(
        (t.count(keyword) if isinstance(t, str) else 0 for t in texts),
        np.int64,
        len(texts),
    )


def mentions_keyword_batch(title: pd.Series, body: pd.Series) -> dict:
    """facts/common.py:60-80.

    The value is "title" when the keyword appears in the title (title checked
    last, so it wins), else "body"; ``_times`` carries the BODY count ``n``
    whenever either count exceeds 1 (reference bug preserved).

    Batch fast path: one concatenated-haystack membership test per keyword
    skips keywords absent from the whole batch (output keys are only emitted
    on a hit anyway), and present keywords count via C-level ``str.count``
    instead of the regex engine.
    """
    out: dict = {}
    t_list = title.tolist()
    b_list = body.tolist()
    hay = "\x00".join(x for x in b_list if isinstance(x, str)) + "\x00" + "\x00".join(
        x for x in t_list if isinstance(x, str)
    )
    idx = body.index
    for keyword in RELEVANT_KEYWORDS:
        if keyword not in hay:
            continue
        k = keyword.lower()
        n = _literal_counts(b_list, keyword)
        nt = _literal_counts(t_list, keyword)
        value = pd.Series(
            np.select([nt > 0, n > 0], ["title", "body"], default=None),
            index=idx,
            dtype=object,
        )
        hit_times = (n > 1) | (nt > 1)
        times = pd.Series(
            [int(n[i]) if hit_times[i] else None for i in range(len(n))],
            index=idx,
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
    t_list = title.tolist()
    s_list = summary.tolist()
    hay = "\x00".join(x for x in s_list if isinstance(x, str)) + "\x00" + "\x00".join(
        x for x in t_list if isinstance(x, str)
    )
    for keyword in keywords:
        if keyword not in hay:
            continue
        k = keyword.lower()
        n_t = _literal_counts(t_list, keyword)
        n_s = _literal_counts(s_list, keyword)
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
        prefixes = CITE_PREFIXES[kind]
        for text_series in (title, body):
            for rx, prefix in zip(rxs, prefixes):
                # findall only where the prefix's LITERAL HEAD occurs (the
                # pattern is `<prefix> *?#?(\d{3,})` under re.I, and the
                # prefix string is used as REGEX — the '.' in "gcn circ." is
                # an any-char, contractually (shim docstring).  The gate
                # therefore uses only the prefix up to its first regex
                # metacharacter: a row without that literal head cannot
                # match); scan order preserved
                mask = (
                    text_series.str.contains(
                        _literal_head(prefix), case=False, regex=False
                    )
                    .fillna(False)
                    .to_numpy(dtype=bool)
                )
                if not mask.any():
                    continue
                positions = np.flatnonzero(mask)
                found = text_series.iloc[positions].str.findall(rx)
                for pos, matches in zip(positions, found):
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

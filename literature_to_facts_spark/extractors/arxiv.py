"""Vectorized arXiv extractors (batch re-expression of facts/arxiv.py).

arXiv docs carry the Atom-feed entry as JSON in the ``text`` column; the
prep step parses the four used keys (id, title, summary, updated).
"""

from __future__ import annotations

import json

import pandas as pd

from literature_to_facts_spark.extractors import common as vcommon
from literature_to_facts_spark.extractors.base import ExtractorSpec, Sides
from literature_to_facts_spark.functions.literals import PAPER_NS
from literature_to_facts_spark.shim.reference_shim import ARXIV_KEYWORDS

_EPOCH = pd.Timestamp("1970-01-01")
_EPOCH_UTC = pd.Timestamp("1970-01-01", tz="UTC")


def prepare_arxiv(docs: pd.DataFrame) -> tuple[pd.DataFrame, int]:
    def _load(t):
        try:
            d = json.loads(t)
            if isinstance(d, dict) and all(
                k in d for k in ("id", "title", "summary", "updated")
            ):
                return d
        except Exception:
            pass
        return None

    parsed = docs["text"].map(_load)
    ok = parsed.notna()
    n_bad = int((~ok).sum())

    sub = parsed[ok]
    prep = pd.DataFrame(index=sub.index)
    prep["url_page"] = docs.loc[sub.index, "url"]
    prep["id"] = sub.map(lambda d: d["id"])
    prep["title"] = sub.map(lambda d: d["title"])
    prep["summary"] = sub.map(lambda d: d["summary"])
    prep["updated"] = sub.map(lambda d: d["updated"])
    # identity: facts/arxiv.py:130-132 (suffix verbatim, not int-coerced)
    prep["subj"] = (PAPER_NS + "#arXiv") + prep["id"].str.split("/").str[-1]
    return prep, n_bad


def x_basic_meta(p: pd.DataFrame, side: Sides) -> dict:
    """facts/arxiv.py:87-93."""
    return {
        "location": p["id"].astype(object),
        "title": p["title"].str.replace(r"[\n\r]", " ", regex=True).astype(object),
        "source": pd.Series(["arXiv"] * len(p), index=p.index, dtype=object),
    }


def x_basic_time_meta(p: pd.DataFrame, side: Sides) -> dict:
    """facts/arxiv.py:95-102 (fromisoformat after Z-strip; naive .timestamp()
    under pinned UTC).  ``utc=True`` handles tz-offset values the way the
    reference does (aware datetime -> correct epoch) and treats naive values
    as UTC, matching the pinned-TZ semantics; without it a mixed batch of
    aware/naive values raises instead of parsing."""
    # format="mixed": without it pandas locks onto the first row's format and
    # NaT's every differently-shaped (e.g. tz-offset) value in the batch
    parsed = pd.to_datetime(
        p["updated"].str.replace("Z", "", regex=False),
        errors="coerce",
        utc=True,
        format="mixed",
    )
    ts = ((parsed - _EPOCH_UTC) / pd.Timedelta(seconds=1)).where(parsed.notna(), None).astype(object)
    return {
        "updated_isot": p["updated"].where(parsed.notna(), None).astype(object),
        "updated_ts": ts,
        "timestamp": ts,
    }


def x_mentions_keyword(p: pd.DataFrame, side: Sides) -> dict:
    """facts/arxiv.py:105-120."""
    return vcommon.arxiv_mentions_keyword_batch(p["title"], p["summary"], ARXIV_KEYWORDS)


ARXIV_BATCH_EXTRACTORS: list[ExtractorSpec] = [
    ExtractorSpec("basic_meta", x_basic_meta),
    ExtractorSpec("basic_time_meta", x_basic_time_meta),
    ExtractorSpec("mentions_keyword", x_mentions_keyword),
]

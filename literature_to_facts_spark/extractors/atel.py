"""Vectorized ATel extractors (batch re-expression of facts/atel.py).

:func:`prepare_atel` is the vectorized ``parse_atel_email`` projection
(facts/atel.py:74-101): the reference parses ATel emails at ingestion into
entry dicts; here the email text arrives in the ``text`` column of the
web-page table and the field extraction is a batch of ``.str.extract`` calls.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from literature_to_facts_spark.extractors import common as vcommon
from literature_to_facts_spark.extractors.base import ExtractorSpec, Sides
from literature_to_facts_spark.functions.literals import PAPER_NS
from literature_to_facts_spark.shim.reference_shim import ATEL_FIELD_SPECS

_EPOCH = pd.Timestamp("1970-01-01")
_WS_FIELD = re.compile(r"[\t\r\n]+")
_WS_BODY = re.compile(r"[\n\r\t ]+")


def prepare_atel(docs: pd.DataFrame) -> tuple[pd.DataFrame, int]:
    """Email text -> entry fields; unparseable docs are dropped + counted
    (in the reference they would never enter atels.json)."""
    # email payload = after first blank line (non-multipart message body)
    payload = docs["text"].str.split("\n\n", n=1).str[1]

    prep = pd.DataFrame(index=docs.index)
    prep["url_page"] = docs["url"]
    ok = payload.notna()

    for atel_field, fieldname, endt in ATEL_FIELD_SPECS:
        raw = payload.str.extract(
            f"{atel_field}:(.*?)(?={endt})", flags=re.S, expand=False
        )
        prep[fieldname] = raw.str.replace(_WS_FIELD, " ", regex=True).str.strip()
        ok &= prep[fieldname].notna()

    prep["authors"] = prep["authors"].str.split(";", n=1).str[-1].str.strip()
    prep["atelid"] = payload.str.extract(r"ATEL #(\d+)", expand=False).str.strip()
    ok &= prep["atelid"].notna()
    prep["url"] = "https://www.astronomerstelegram.org/?read=" + prep["atelid"]
    body = payload.str.extract(r"Subjects:.*?\n\n(.*?)[=\-]{20,}", flags=re.S, expand=False)
    prep["body"] = body.str.replace(_WS_BODY, " ", regex=True)
    ok &= prep["body"].notna()

    n_bad = int((~ok).sum())
    prep = prep[ok].copy()
    # identity: facts/atel.py:179-181 (atelid digits guaranteed by regex)
    prep["subj"] = (PAPER_NS + "#atel") + prep["atelid"].astype("int64").astype(str)
    return prep, n_bad


def x_atel_date(p: pd.DataFrame, side: Sides) -> dict:
    """facts/atel.py:31-36."""
    parsed = pd.to_datetime(
        p["date"].str.strip(), format="%d %b %Y; %H:%M UT", errors="coerce"
    )
    ts = (parsed - _EPOCH) / pd.Timedelta(seconds=1)
    return {"timestamp": ts.where(parsed.notna(), None).astype(object)}


def x_atel_tags(p: pd.DataFrame, side: Sides) -> dict:
    """facts/atel.py:39-41."""
    topics = p["tags"].map(
        lambda t: [tag.strip().lower() for tag in t.split(",")] if t is not None else None
    )
    return {"topics": topics}


def x_mentions_keyword(p: pd.DataFrame, side: Sides) -> dict:
    """facts/atel.py:148-150."""
    return vcommon.mentions_keyword_batch(p["title"], p["body"])


def x_mentions_named(p: pd.DataFrame, side: Sides) -> dict:
    """facts/atel.py:153-155."""
    return vcommon.mentions_grblike_batch(p["title"], p["body"])


def x_cites(p: pd.DataFrame, side: Sides) -> dict:
    """facts/atel.py:158-160."""
    return vcommon.cites_batch(p["title"], p["body"])


def x_basic_meta(p: pd.DataFrame, side: Sides) -> dict:
    """facts/atel.py:163-170."""
    return {
        "location": p["url"].astype(object),
        "title": p["title"].str.replace(r"[\n\r]", " ", regex=True).astype(object),
        "source": pd.Series(["ATel"] * len(p), index=p.index, dtype=object),
        "atelid": p["atelid"].astype(object),
    }


ATEL_BATCH_EXTRACTORS: list[ExtractorSpec] = [
    ExtractorSpec("atel_date", x_atel_date),
    ExtractorSpec("atel_tags", x_atel_tags),
    ExtractorSpec("mentions_keyword", x_mentions_keyword),
    ExtractorSpec("mentions_named", x_mentions_named),
    ExtractorSpec("cites", x_cites),
    ExtractorSpec("basic_meta", x_basic_meta),
]

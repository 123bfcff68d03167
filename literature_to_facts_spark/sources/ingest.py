"""Ingestion-side index parsers (SURVEY.md §2.1 source operators).

The reference enumerates documents by scraping archive indexes:

* GCN archive page -> circular ids (facts/gcn.py:72-85 ``gcn_list_recent``;
  gcnsall.py:15-40 ``gcn_list_all`` id-range variant);
* ATel index page -> entry rows (facts/atel.py:44-69 ``parse_html`` and
  facts/atel.py:123-146 ``fetch_web``).

Over a web-scale table, enumeration is ingestion, not query — these parsers
turn fetched index pages into document url lists / pre-parsed entry rows.
They are pure-Python + vectorized (no network; fetching is out of scope per
SURVEY §2.1).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from literature_to_facts_spark.engine.kinds import GCN_URL_PREFIX

# facts/gcn.py:75
GCN_INDEX_RE = re.compile(r"<A HREF=(gcn3/\d{1,5}.gcn3)>(\d{1,5})</A>")

# facts/atel.py:136-138 (fetch_web variant, re.I)
ATEL_INDEX_RE = re.compile(
    r'<tr valign="top"><td class="num">(\d+)</td>'
    r'<td class="title"><a href="(.*?)">(.*?)</a></td>'
    r'<td class="author" valign="top">(.*?)<br><em>(.*?)</em></td></tr>',
    re.I,
)


def gcn_ids_from_index(index_html: str) -> list[int]:
    """Archive page -> circular ids, oldest-first (the reference iterates
    ``reversed(findall)``, facts/gcn.py:79)."""
    return [int(i) for _u, i in reversed(GCN_INDEX_RE.findall(index_html))]


def gcn_urls_for_range(from_gcn: int, to_gcn: int) -> list[str]:
    """gcnsall.py:32: exhaustive id range, newest-first."""
    return [f"{GCN_URL_PREFIX}{i}.gcn3" for i in reversed(range(from_gcn, to_gcn))]


def gcn_range_filter(url: Column, from_gcn: int, to_gcn: int) -> Column:
    """Query-side equivalent of the id-range source: a pushable predicate
    over the documents table (``id BETWEEN`` on the url-embedded id)."""
    # try_cast, not cast: regexp_extract yields '' for non-GCN urls and
    # Spark 4 ANSI mode makes ''::long a runtime error — conjunct order is
    # NOT guaranteed, so the startswith guard may not short-circuit (it
    # didn't under the uncached-plan shape; NULL from try_cast filters out)
    gcn_id = F.regexp_extract(url, r"gcn3/(\d+)\.gcn3", 1).try_cast("long")
    return url.startswith(GCN_URL_PREFIX) & (gcn_id >= from_gcn) & (gcn_id < to_gcn)


def atel_entries_from_index(index_html: str) -> pd.DataFrame:
    """ATel index page -> entry rows (atelid, url, title, authors, date),
    matching the reference's dict(zip(...)) construction."""
    rows = [
        dict(zip(["atelid", "url", "title", "authors", "date"], m))
        for m in ATEL_INDEX_RE.findall(index_html)
    ]
    return pd.DataFrame(rows, columns=["atelid", "url", "title", "authors", "date"])


def documents_in_gcn_range(docs: DataFrame, from_gcn: int, to_gcn: int) -> DataFrame:
    return docs.where(gcn_range_filter(F.col("url"), from_gcn, to_gcn))

"""Swift-notices table -> triples sink (``l2f learn parse_notices``,
/root/reference/facts/learn.py:160-225).

The reference scrapes an HTML table of Swift GRB notices, derives
``event_isot`` from the date/time columns, and emits triples
``<paper:swift_notice_trigger_{trig}> <paper:swift_<col>> "value"`` for a
whitelisted column set, serialized as Turtle.

Here the HTML parse is a vectorized batch step and the melt is the engine's
stack/explode; the Turtle export reuses the graph writer.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# facts/learn.py:210-221 — whitelisted columns
NOTICE_COLUMNS = [
    "bat_dec", "bat_error", "bat_ra", "date_yy_mm_dd", "event_isot",
    "time_ut", "trig", "xrt_dec", "xrt_error", "xrt_ra",
]

NOTICE_NS = "https://odahub.io/ontology/paper/"

_TR = re.compile(r"<tr.*?>(.*?)</tr>", re.S | re.M)
_TH = re.compile(r"<th.*?>(.*?)</th>", re.S | re.M)
_TD = re.compile(r"<td.*?>(.*?)</td>", re.S | re.M)
_TAG = re.compile(r"<.*?>")
_NONALNUM = re.compile(r"[^a-z0-9]+")


def parse_notices_html(page: str) -> pd.DataFrame:
    """facts/learn.py:173-197: header row -> normalized column names; each
    body row -> an entry dict; rows whose event_isot can't be derived are
    dropped (with the reference's try/except semantics)."""
    col_names = None
    entries = []
    for row in _TR.findall(page):
        if col_names is None:
            cand = [_NONALNUM.sub("_", c.lower()) for c in _TH.findall(row)]
            if len(cand) > 2:
                col_names = cand
            continue
        d = {}
        for i, col in enumerate(_TD.findall(row)):
            if i < len(col_names):
                d[col_names[i]] = _TAG.sub("", col)
        try:
            d["event_isot"] = (
                "20" + d["date_yy_mm_dd"].replace("/", "-") + "T" + d["time_ut"]
            )
        except Exception:
            continue
        entries.append(d)
    return pd.DataFrame(entries)


def notices_to_triples(spark: SparkSession, entries: pd.DataFrame) -> DataFrame:
    """Entries -> triples via stack-melt over the whitelisted columns
    (facts/learn.py:205-222); subjects are swift_notice_trigger_{trig}."""
    cols = [c for c in NOTICE_COLUMNS if c in entries.columns]
    df = spark.createDataFrame(entries[cols].astype(str))
    stack_args = ", ".join(f"'swift_{c}', `{c}`" for c in cols)
    return (
        df.withColumn(
            "subj", F.concat(F.lit(NOTICE_NS + "swift_notice_trigger_"), F.col("trig"))
        )
        .selectExpr("subj", f"stack({len(cols)}, {stack_args}) AS (pred, obj)")
        .where(F.col("obj").isNotNull())
    )


def notices_turtle(triples: DataFrame) -> str:
    """Turtle text: prefix header + one statement per triple (semantically
    the reference's rdflib Turtle serialization; formatting is N-Triples
    style, a Turtle subset).  Object literals use the full rdflib escape set
    (backslash, newline, quote, carriage return — functions/literals
    quote_encode), so cell values with embedded backslashes/newlines still
    serialize to valid Turtle."""
    from literature_to_facts_spark.functions.literals import quote_encode_column

    rows = triples.select(
        F.concat_ws(
            " ",
            F.concat(F.lit("<"), F.col("subj"), F.lit(">")),
            F.concat(F.lit("<" + NOTICE_NS), F.col("pred"), F.lit(">")),
            quote_encode_column(F.col("obj")),
            F.lit("."),
        ).alias("line")
    ).collect()
    return (
        f"@prefix paper: <{NOTICE_NS}> .\n" + "\n".join(sorted(r["line"] for r in rows)) + "\n"
    )

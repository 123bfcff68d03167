"""The extraction pipeline: documents -> (subj, pred, obj) triples.

Spark shape (SURVEY.md §3.1):

    spark.read(... documents ...)                      # url, text pruned scan
      .filter(kind != 'other')                         # pushable url prefixes
      .mapInPandas(batch_extract, TRIPLE_SCHEMA)       # Arrow batches, one
                                                       #   pass: prep -> all
                                                       #   extractors -> melt
                                                       #   -> valuable filter
      ... dropDuplicates / dict view / linking downstream

Design notes for 100 TB scale:
* the valuable filter (facts/core.py:121-123) is computed *inside* the batch
  — all triples of a doc are produced together, so the filter needs NO
  shuffle (the declarative window variant exists in engine/valuable.py for
  the oracle checks);
* side tables ride along as Spark broadcast variables (driver-fetched,
  executor-local joins — the reference fetched them per doc over HTTP);
* ``html`` is never read: the pipeline selects only (url, text), letting
  Parquet/Iceberg column pruning skip the heavy binary column.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from literature_to_facts_spark.extractors.arxiv import ARXIV_BATCH_EXTRACTORS, prepare_arxiv
from literature_to_facts_spark.extractors.atel import ATEL_BATCH_EXTRACTORS, prepare_atel
from literature_to_facts_spark.extractors.base import DYNAMIC, Sides
from literature_to_facts_spark.extractors.gcn import (
    GCN_BATCH_EXTRACTORS,
    prepare_amon_side,
    prepare_gcn,
)
from literature_to_facts_spark.engine.kinds import (
    ARXIV_URL_PREFIX,
    ATEL_URL_PREFIX,
    GCN_URL_PREFIX,
    KIND_ARXIV,
    KIND_ATEL,
    KIND_GCN,
    kind_column,
)
from literature_to_facts_spark.functions.literals import (
    lexical_and_dtype,
    n3_from_lexical,
)

TRIPLE_SCHEMA = (
    "url string, subj string, pred string, obj string, dtype string, obj_n3 string"
)
TRIPLE_COLS = ["url", "subj", "pred", "obj", "dtype", "obj_n3"]

_PREPARERS = {
    KIND_GCN: prepare_gcn,
    KIND_ATEL: prepare_atel,
    KIND_ARXIV: prepare_arxiv,
}

_DEFAULT_BATTERIES = {
    KIND_GCN: GCN_BATCH_EXTRACTORS,
    KIND_ATEL: ATEL_BATCH_EXTRACTORS,
    KIND_ARXIV: ARXIV_BATCH_EXTRACTORS,
}


def snapshot_batteries() -> dict:
    """Plan-time snapshot of the (possibly plugin-extended) batteries.

    Executors run separate Python processes that re-import the modules, so
    driver-side registry mutations (extractors/registry.py) must travel with
    the job — the snapshot is cloudpickled into the mapInPandas closure."""
    return {k: list(v) for k, v in _DEFAULT_BATTERIES.items()}


def _is_null(v) -> bool:
    if v is None:
        return True
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _pyval(v):
    if isinstance(v, np.generic):
        return v.item()
    return v


def _emit(rows: list, url: str, subj: str, pred: str, value, rowid) -> None:
    """One fact (k, v): list values fan out (facts/core.py:96-101)."""
    vs = value if isinstance(value, (list, tuple, np.ndarray)) else [value]
    for _v in vs:
        _v = _pyval(_v)
        lexical, dtype = lexical_and_dtype(_v)
        rows.append(
            (url, subj, pred, lexical, dtype, n3_from_lexical(lexical, dtype), rowid)
        )


def _rowwise_fallback(spec, prep: pd.DataFrame, sides: Sides) -> dict:
    """Per-row re-run of a batch extractor that raised: each failing row
    contributes nothing (reference semantics), surviving rows keep their
    facts.  Results are re-assembled into the normal {pred: Series} shape."""
    collected: dict[str, dict] = {}
    for i in prep.index:
        try:
            row_out = spec.fn(prep.loc[[i]], sides)
        except Exception:
            continue
        for pred, series in row_out.items():
            v = series.iloc[0] if hasattr(series, "iloc") else series
            if _is_null(v):
                continue
            collected.setdefault(pred, {})[i] = v
    return {
        pred: pd.Series(vals, index=prep.index, dtype=object).reindex(prep.index)
        for pred, vals in collected.items()
    }


def extract_kind_batch(
    kind: str, docs: pd.DataFrame, sides: Sides, extractors: Optional[list] = None
) -> tuple[pd.DataFrame, int]:
    """Run the full extractor battery for one kind over one batch.

    Returns (long-format triples incl. non-valuable, n_identity_failures);
    the valuable filter is applied by the caller per document.
    """
    prepare = _PREPARERS[kind]
    if extractors is None:
        extractors = _DEFAULT_BATTERIES[kind]
    prep, n_bad = prepare(docs)
    rows: list = []
    if len(prep) == 0:
        return pd.DataFrame(columns=TRIPLE_COLS), n_bad

    urls = prep["url_page"] if "url_page" in prep.columns else prep["url"]
    subjs = prep["subj"]
    u = urls.to_numpy(dtype=object)
    s = subjs.to_numpy(dtype=object)
    rowids = prep.index.to_numpy()  # per-input-row identity for the filter

    for spec in extractors:
        try:
            out = spec.fn(prep, sides)
        except Exception:
            # The reference swallows per-DOCUMENT extractor exceptions
            # (facts/core.py:114-115).  A vectorized extractor can only fail
            # for the whole batch, so isolate the offender: re-run row by
            # row, keeping the rows that succeed.  Slow, but only on the
            # failure path — and one poisoned document must never kill a
            # whole task at 100 TB scale.
            out = _rowwise_fallback(spec, prep, sides)
        if not out:
            continue
        dynamic = out.pop(DYNAMIC, None)
        for pred, series in out.items():
            vals = series.to_numpy(dtype=object)
            for i in range(len(vals)):
                v = vals[i]
                if _is_null(v):
                    continue
                _emit(rows, u[i], s[i], pred, v, rowids[i])
        if dynamic is not None:
            dvals = dynamic.to_numpy(dtype=object)
            for i in range(len(dvals)):
                d = dvals[i]
                if not isinstance(d, dict):
                    continue
                for pred, v in d.items():
                    if _is_null(v):
                        continue
                    _emit(rows, u[i], s[i], pred, v, rowids[i])

    return pd.DataFrame(rows, columns=TRIPLE_COLS + ["_rowid"]), n_bad


def apply_valuable_filter(triples: pd.DataFrame) -> pd.DataFrame:
    """facts/core.py:121-123: keep a doc's facts only if 'mentions' occurs in
    any joined triple line.

    Grouped by the per-input-row id (the reference's filtering unit is the
    *document row*: crawl duplicates sharing a NUMBER — or even a url — are
    each filtered independently; both cases caught by the hypothesis
    fuzzer).  Local per batch — all triples of a doc are emitted together."""
    if len(triples) == 0:
        return triples
    has = triples["pred"].str.contains("mentions", regex=False) | triples[
        "obj_n3"
    ].str.contains("mentions", regex=False)
    valuable_rows = set(triples.loc[has, "_rowid"])
    return triples[triples["_rowid"].isin(valuable_rows)]


def extract_batch(
    docs: pd.DataFrame,
    sides: Sides,
    local_dedup: bool = False,
    batteries: Optional[dict] = None,
) -> pd.DataFrame:
    """documents batch (url, text, kind) -> valuable triples batch.

    ``local_dedup=True`` drops duplicate (subj, pred, obj) rows inside the
    batch before they reach the shuffle — all intra-document duplicates (the
    common case: two extractors emitting the same fact) die map-side, so the
    global dedup exchange only carries cross-document collisions.  Keep it
    OFF when pre-dedup multiplicities matter (the dict view's scalar-vs-list
    rule needs raw counts).
    """
    parts = []
    for kind in (KIND_GCN, KIND_ATEL, KIND_ARXIV):
        sub = docs[docs["kind"] == kind]
        if len(sub) == 0:
            continue
        extractors = batteries.get(kind) if batteries else None
        triples, _ = extract_kind_batch(kind, sub, sides, extractors)
        parts.append(apply_valuable_filter(triples))
    if not parts:
        return pd.DataFrame(columns=TRIPLE_COLS)
    out = pd.concat(parts, ignore_index=True)[TRIPLE_COLS]
    if local_dedup:
        out = out.drop_duplicates(subset=["subj", "pred", "obj_n3"], keep="first")
    return out


def make_sides(
    balrog: Optional[pd.DataFrame] = None,
    amon_notices: Optional[pd.DataFrame] = None,
    ads_authors: Optional[pd.DataFrame] = None,
) -> Sides:
    """Pre-parse raw side tables into executor-ready form (AMON notices are
    parsed ONCE here, not per document as the reference does)."""
    return Sides(
        balrog=balrog if balrog is not None else pd.DataFrame(columns=["url_json"]),
        amon=prepare_amon_side(amon_notices)
        if amon_notices is not None and len(amon_notices)
        else pd.DataFrame(columns=["url", "fields", "isot", "invalid"]),
        ads=ads_authors if ads_authors is not None else pd.DataFrame(columns=["subject"]),
    )


def relevant_docs(docs: DataFrame) -> DataFrame:
    """Prune to extractable kinds with pushable url-prefix predicates and
    prune columns to (url, text) — never reads ``html``."""
    return (
        docs.where(
            F.col("url").startswith(GCN_URL_PREFIX)
            | F.col("url").startswith(ATEL_URL_PREFIX)
            | F.col("url").startswith(ARXIV_URL_PREFIX)
        )
        .select("url", "text")
        .withColumn("kind", kind_column(F.col("url")))
    )


def extract_triples(
    spark: SparkSession,
    docs: DataFrame,
    sides: Optional[Sides] = None,
    dedup: bool = True,
    map_side_dedup: bool = False,
) -> DataFrame:
    """documents DataFrame -> triples DataFrame (the KG-construction core).

    ``dedup=True`` adds the rdflib-Graph set semantics
    (facts/core.py:197-219) via ``dropDuplicates`` — the only shuffle in the
    extraction phase; AQE handles skew/coalescing.

    ``map_side_dedup=True`` additionally drops intra-batch duplicates before
    the shuffle (~14% fewer rows on the fixture mix).  It costs ~15% batch
    CPU (pandas drop_duplicates over strings), so enable it only when the
    shuffle crosses a real network — on a cluster it trades cheap map CPU
    for shuffle bytes; in local mode it's a net loss.
    """
    sides = sides or make_sides()
    bc = spark.sparkContext.broadcast(sides)
    local_dedup = dedup and map_side_dedup
    batteries = snapshot_batteries()  # carries driver-registered plugins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_sides = bc.value
        for pdf in batches:
            out = extract_batch(
                pdf, local_sides, local_dedup=local_dedup, batteries=batteries
            )
            if len(out):
                yield out

    triples = relevant_docs(docs).mapInPandas(run, schema=TRIPLE_SCHEMA)
    if dedup:
        triples = triples.dropDuplicates(["subj", "pred", "obj_n3"])
    return triples

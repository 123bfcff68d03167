"""Poisoned-document isolation: the bisecting batch fallback.

The reference swallows per-DOCUMENT extractor exceptions
(/root/reference/facts/core.py:114-115).  A vectorized extractor fails for
the whole Arrow batch, so engine/pipeline._rowwise_fallback bisects the batch
to isolate offenders: p poisoned rows cost O(p * log n) re-runs, not n
single-row re-runs.
"""

import time

import numpy as np
import pandas as pd

from literature_to_facts_spark.engine.pipeline import _rowwise_fallback
from literature_to_facts_spark.extractors.base import ExtractorSpec


def _counting_spec(poison_idx: set):
    """Extractor that raises iff the batch contains a poisoned row; counts
    invocations so the test can assert the O(p log n) bound."""
    calls = {"n": 0}

    def fn(prep: pd.DataFrame, _sides) -> dict:
        calls["n"] += 1
        if any(i in poison_idx for i in prep.index):
            raise ValueError("poisoned document")
        return {
            "pred_a": pd.Series(
                ["v" + str(i) for i in prep.index], index=prep.index, dtype=object
            )
        }

    return ExtractorSpec("counting", fn), calls


def test_bisect_fallback_drops_only_poisoned_rows():
    prep = pd.DataFrame({"text": [f"doc {i}" for i in range(100)]})
    poison = {13, 57}
    spec, calls = _counting_spec(poison)
    out = _rowwise_fallback(spec, prep, None)
    got = out["pred_a"]
    assert list(got.index) == list(prep.index)
    for i in prep.index:
        if i in poison:
            assert pd.isna(got.loc[i])
        else:
            assert got.loc[i] == f"v{i}"
    # 2 poisoned rows in 100: O(p * log n) re-runs, nowhere near 100
    assert calls["n"] <= 30


def test_bisect_fallback_10k_batch_under_time_bound():
    n = 10_000
    prep = pd.DataFrame({"text": [f"doc {i}" for i in range(n)]})
    poison = {4242}
    spec, calls = _counting_spec(poison)
    t0 = time.time()
    out = _rowwise_fallback(spec, prep, None)
    wall = time.time() - t0
    assert calls["n"] <= 2 * int(np.ceil(np.log2(n))) + 2  # ~O(log n) re-runs
    assert wall < 5.0  # the old per-row loop built 10k single-row frames here
    assert pd.isna(out["pred_a"].loc[4242])
    assert out["pred_a"].loc[0] == "v0"
    assert out["pred_a"].notna().sum() == n - 1


def test_bisect_fallback_all_rows_poisoned():
    prep = pd.DataFrame({"text": ["a", "b", "c"]})
    spec, _ = _counting_spec({0, 1, 2})
    assert _rowwise_fallback(spec, prep, None) == {}


def test_bisect_fallback_scalar_output_single_row():
    """A len-1 frame whose extractor returns scalars (not Series) is still
    reassembled correctly — the shape some reference-style row functions use."""

    def fn(prep: pd.DataFrame, _sides) -> dict:
        if 1 in prep.index:
            raise ValueError("boom")
        return {"p": "scalar-val"}

    prep = pd.DataFrame({"text": ["x", "y"]})
    out = _rowwise_fallback(ExtractorSpec("s", fn), prep, None)
    assert out["p"].loc[0] == "scalar-val"
    assert pd.isna(out["p"].loc[1])


def test_bisect_fallback_positional_alignment_default_index():
    """A default-indexed Series (legal on the happy path, which consumes
    series.to_numpy() positionally) must align POSITIONALLY in the fallback
    too — label-matching would hand row 2's facts to row 0."""

    def fn(prep: pd.DataFrame, _sides) -> dict:
        if 0 in prep.index:
            raise ValueError("poison at row 0")
        # default RangeIndex(len(prep)) — NOT aligned to prep.index
        return {"p": pd.Series([f"row{i}" for i in prep.index])}

    prep = pd.DataFrame({"text": list("abcd")})  # index [0,1,2,3]
    out = _rowwise_fallback(ExtractorSpec("s", fn), prep, None)
    got = out["p"]
    assert pd.isna(got.loc[0])  # poisoned row contributes nothing
    assert got.loc[1] == "row1"
    assert got.loc[2] == "row2"
    assert got.loc[3] == "row3"


def test_bisect_fallback_scalar_multi_row_half():
    """A scalar return from a MULTI-row half means (per the old per-row
    semantics) every row in that half carries the value."""

    def fn(prep: pd.DataFrame, _sides) -> dict:
        if 3 in prep.index:
            raise ValueError("poison at row 3")
        return {"p": "v"}

    prep = pd.DataFrame({"text": list("wxyz")})  # index [0,1,2,3]
    out = _rowwise_fallback(ExtractorSpec("s", fn), prep, None)
    got = out["p"]
    assert list(got.loc[[0, 1, 2]]) == ["v", "v", "v"]
    assert pd.isna(got.loc[3])

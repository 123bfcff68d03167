"""Public API facade + plugin registry (the reference's -m module surface)."""

import pandas as pd
import pytest

from literature_to_facts_spark import api
from literature_to_facts_spark.sources.corpus import GOLDEN_GCNS


def test_parse_document_point_query():
    g = api.parse_document("gcn", GOLDEN_GCNS[31120])
    assert g["paper:mentions_named_event"] == ["IceCube-211123A"]
    assert g["paper:NUMBER"] == "31120"


def test_registry_plugin_roundtrip(spark, corpus, sides):
    from literature_to_facts_spark.extractors.registry import (
        battery,
        register_extractor,
        unregister_extractor,
    )

    def x_has_telescope(prep: pd.DataFrame, _sides) -> dict:
        hit = prep["text"].str.contains("telescope", case=False).fillna(False)
        return {
            "mentions_telescope_plugin": pd.Series(
                ["body" if h else None for h in hit], index=prep.index, dtype=object
            )
        }

    register_extractor("gcn", "has_telescope", x_has_telescope)
    try:
        assert any(s.name == "has_telescope" for s in battery("gcn"))
        with pytest.raises(ValueError):
            register_extractor("gcn", "has_telescope", x_has_telescope)

        docs = spark.createDataFrame(corpus.documents)
        triples = api.extract_triples(spark, docs, sides)
        plugin_rows = triples.where("pred = 'mentions_telescope_plugin'").collect()
        assert len(plugin_rows) > 0  # fixtures mention telescopes
        assert all(r["obj"] == "body" for r in plugin_rows)
    finally:
        assert unregister_extractor("gcn", "has_telescope")
    assert not any(s.name == "has_telescope" for s in battery("gcn"))


def test_unregister_gcnsall_pattern():
    from literature_to_facts_spark.extractors.registry import (
        battery,
        register_extractor,
        unregister_extractor,
    )

    # remove + restore an existing battery entry (gcnsall.py:44 style)
    specs = battery("gcn")
    target = next(s for s in specs if s.name == "gcn_ads_data")
    assert unregister_extractor("gcn", "gcn_ads_data")
    assert not any(s.name == "gcn_ads_data" for s in battery("gcn"))
    register_extractor("gcn", target.name, target.fn)
    assert any(s.name == "gcn_ads_data" for s in battery("gcn"))

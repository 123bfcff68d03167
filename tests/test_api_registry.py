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


def test_plugin_kind_problematic_identity(spark, sides):
    """A plugin kind with NO identity extractor emits facts under the
    reference's problematic subject (facts/core.py:54) instead of being
    dropped — Spark path and shim agree on subject and triples."""
    import hashlib

    import pandas as pd

    from literature_to_facts_spark.engine.pipeline import extract_triples
    from literature_to_facts_spark.extractors.registry import (
        register_kind,
        unregister_kind,
        register_extractor,
    )
    from literature_to_facts_spark.shim import reference_shim as shim

    prefix = "https://notes.example.org/n/"

    def x_note_kw(prep: pd.DataFrame, _sides) -> dict:
        hit = prep["text"].str.contains("GRB", regex=False).fillna(False)
        return {
            "mentions_grb_note": pd.Series(
                ["body" if h else None for h in hit], index=prep.index, dtype=object
            )
        }

    def shim_note_kw(doc: str, _side) -> dict:
        return {"mentions_grb_note": "body"} if "GRB" in doc else {}

    register_kind("note", prefix, type_name="NoteText")
    register_extractor("note", "note_kw", x_note_kw)
    shim.register_shim_kind("note", [("note_kw", shim_note_kw)], "NoteText")
    try:
        texts = ["a GRB note", "nothing here", "GRB 221009A again"]
        pdf = pd.DataFrame(
            {
                "url": [f"{prefix}{i}" for i in range(len(texts))],
                "text": texts,
                "html": [b""] * len(texts),
            }
        )
        docs = spark.createDataFrame(pdf)
        rows = (
            extract_triples(spark, docs, sides, dedup=False)
            .where("pred = 'mentions_grb_note'")
            .collect()
        )
        # doc 1 has no mention -> dropped by the valuable filter; 0 and 2 kept
        assert len(rows) == 2
        expected_subjs = {
            "http://odahub.io/ontology/paper#problematicNoteText"
            + hashlib.sha224(repr(t).encode()).hexdigest()[:8]
            for t in (texts[0], texts[2])
        }
        assert {r["subj"] for r in rows} == expected_subjs

        # shim parity: same subject token and same triples per doc
        for t in (texts[0], texts[2]):
            cid, triples = shim.extract_doc_facts("note", t)
            assert "problematicNoteText" in cid
            assert any("mentions_grb_note" in p for _s, p, _o in triples)
            assert shim.problematic_id("NoteText", t).endswith(cid)
    finally:
        unregister_kind("note")
        shim.unregister_shim_kind("note")

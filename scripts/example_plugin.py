"""Example pipeline plugin — the reference's ``l2f -m <module>`` pattern
(/root/reference/facts/learn.py:42-44: plugin modules imported by name extend
the workflow registry before the run).

Ship it with ``spark-submit --py-files dist/l2f_spark.zip,scripts/example_plugin.py``
and activate with ``--plugin example_plugin``: ``register()`` runs on the
driver before planning, and the registered battery travels to executors
inside the cloudpickled mapInPandas closure (engine/pipeline.snapshot_batteries)
— no executor-side imports of this module are required.

Registers BOTH plugin surfaces in one job:
* a new document kind ``memo`` (url prefix dispatch + the reference's
  problematic-identity fallback, facts/core.py:54), and
* a vectorized extractor attached to the built-in ``gcn`` battery and to the
  new kind.
"""

from __future__ import annotations

import pandas as pd

MEMO_PREFIX = "https://memos.example.org/m/"


def x_mentions_neutrino(prep: pd.DataFrame, _sides) -> dict:
    """Vectorized plugin extractor: flags documents mentioning neutrinos."""
    hit = prep["text"].str.contains("neutrino", case=False).fillna(False)
    return {
        "mentions_neutrino_plugin": pd.Series(
            ["body" if h else None for h in hit], index=prep.index, dtype=object
        )
    }


def register() -> None:
    from literature_to_facts_spark.extractors.registry import (
        register_extractor,
        register_kind,
    )

    register_kind("memo", MEMO_PREFIX, type_name="MemoText")
    register_extractor("memo", "mentions_neutrino_plugin", x_mentions_neutrino)
    register_extractor("gcn", "mentions_neutrino_plugin", x_mentions_neutrino)

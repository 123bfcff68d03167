"""Extractor registry: the reference's plugin surface, Spark-side.

The reference registers workflows globally via the ``@workflow`` decorator
(facts/core.py:29-39) and lets plugin modules extend or rewrite the registry
(``l2f -m adsabs learn ...``, facts/learn.py:42-44; gcnsall.py:44 removes
``gcn_list_recent``).  The equivalents here:

    register_extractor("gcn", "my_workflow", fn)      # append a battery entry
    unregister_extractor("gcn", "gcn_ads_data")       # drop one (gcnsall-style)
    battery("gcn")                                    # inspect

Registered functions take (prep_batch: pd.DataFrame, sides: Sides) and
return {predicate: pd.Series} like every built-in extractor; they run inside
the same mapInPandas pass, so plugins inherit vectorization, broadcast side
tables, the valuable filter and lineage for free.
"""

from __future__ import annotations

from typing import Callable, Optional

from literature_to_facts_spark.extractors.arxiv import ARXIV_BATCH_EXTRACTORS
from literature_to_facts_spark.extractors.atel import ATEL_BATCH_EXTRACTORS
from literature_to_facts_spark.extractors.base import ExtractorSpec
from literature_to_facts_spark.extractors.gcn import GCN_BATCH_EXTRACTORS

_BATTERIES: dict[str, list[ExtractorSpec]] = {
    "gcn": GCN_BATCH_EXTRACTORS,
    "atel": ATEL_BATCH_EXTRACTORS,
    "arxiv": ARXIV_BATCH_EXTRACTORS,
}


def battery(kind: str) -> list[ExtractorSpec]:
    return list(_BATTERIES[kind])


def register_extractor(
    kind: str, name: str, fn: Callable, position: Optional[int] = None
) -> None:
    """Add a vectorized extractor to a kind's battery (registry order matters
    only for triple emission order, which the dict view sorts away)."""
    spec = ExtractorSpec(name, fn)
    lst = _BATTERIES[kind]
    if any(s.name == name for s in lst):
        raise ValueError(f"extractor {name!r} already registered for {kind!r}")
    if position is None:
        lst.append(spec)
    else:
        lst.insert(position, spec)


def unregister_extractor(kind: str, name: str) -> bool:
    """Remove an extractor by name (the gcnsall.py:44 registry-rewrite
    pattern).  Returns True if something was removed."""
    lst = _BATTERIES[kind]
    before = len(lst)
    lst[:] = [s for s in lst if s.name != name]
    return len(lst) < before


# Preparers for plugin kinds (built-in kinds keep their module preparers in
# engine/pipeline._PREPARERS).  Snapshot together with the batteries so the
# mapInPandas closure carries them to executors.
_PLUGIN_PREPARERS: dict[str, Callable] = {}


def register_kind(
    kind: str,
    url_prefix: str,
    type_name: Optional[str] = None,
    identity: Optional[Callable] = None,
) -> None:
    """Introduce a whole new document kind (the reference's plugin-module
    input-type pattern, facts/learn.py:42-44).

    ``identity``: optional preparer ``docs -> (prep, n_bad)`` establishing
    per-doc subjects.  When omitted, the reference's problematic-identity
    fallback applies: facts are emitted under
    ``paper#problematic<TypeName><sha224(repr(text))[:8]>``
    (facts/core.py:54) instead of the kind being dropped.
    """
    from literature_to_facts_spark.engine import kinds as kinds_mod
    from literature_to_facts_spark.extractors.base import make_problematic_preparer

    tname = type_name or (kind.capitalize() + "Text")
    kinds_mod.register_plugin_kind(kind, url_prefix, tname)
    _BATTERIES.setdefault(kind, [])
    _PLUGIN_PREPARERS[kind] = identity or make_problematic_preparer(tname)


def unregister_kind(kind: str) -> None:
    from literature_to_facts_spark.engine import kinds as kinds_mod

    kinds_mod.unregister_plugin_kind(kind)
    _BATTERIES.pop(kind, None)
    _PLUGIN_PREPARERS.pop(kind, None)


def plugin_preparers() -> dict[str, Callable]:
    return dict(_PLUGIN_PREPARERS)

"""Document-kind classification from URL.

The reference dispatches extractors on Python input *types* (GCNText /
ATelEntry / PaperEntry, facts/core.py:83).  Over a web-page table the
dispatch key becomes a derived ``kind`` column computed from ``url`` —
a cheap, Catalyst-optimizable projection (no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KIND_GCN = "gcn"
KIND_ATEL = "atel"
KIND_ARXIV = "arxiv"
KIND_OTHER = "other"

GCN_URL_PREFIX = "https://gcn.gsfc.nasa.gov/gcn3/"
ATEL_URL_PREFIX = "https://www.astronomerstelegram.org/?read="
ARXIV_URL_PREFIX = "http://arxiv.org/abs/"


# Plugin document kinds (the reference lets plugin modules introduce new
# input *types*; here a plugin kind is a url prefix + a type name used by the
# problematic-identity fallback, facts/core.py:54).  Keyed by kind name.
PLUGIN_KINDS: dict[str, dict] = {}


def register_plugin_kind(kind: str, url_prefix: str, type_name: str) -> None:
    if kind in (KIND_GCN, KIND_ATEL, KIND_ARXIV, KIND_OTHER):
        raise ValueError(f"{kind!r} is a built-in kind")
    PLUGIN_KINDS[kind] = {"prefix": url_prefix, "type_name": type_name}


def unregister_plugin_kind(kind: str) -> None:
    PLUGIN_KINDS.pop(kind, None)


def classify_url(url: str) -> str:
    """Plain-Python classifier (shim / corpus side)."""
    if url.startswith(GCN_URL_PREFIX):
        return KIND_GCN
    if url.startswith(ATEL_URL_PREFIX):
        return KIND_ATEL
    if url.startswith(ARXIV_URL_PREFIX):
        return KIND_ARXIV
    for kind, meta in PLUGIN_KINDS.items():
        if url.startswith(meta["prefix"]):
            return kind
    return KIND_OTHER


def kind_column(url: Column) -> Column:
    """Spark-native kind classifier (whole-stage-codegen friendly).

    Built dynamically so driver-registered plugin kinds participate; the
    when-chain is evaluated at plan time, so the snapshot travels with the
    plan like any literal."""
    col = (
        F.when(url.startswith(GCN_URL_PREFIX), F.lit(KIND_GCN))
        .when(url.startswith(ATEL_URL_PREFIX), F.lit(KIND_ATEL))
        .when(url.startswith(ARXIV_URL_PREFIX), F.lit(KIND_ARXIV))
    )
    for kind, meta in PLUGIN_KINDS.items():
        col = col.when(url.startswith(meta["prefix"]), F.lit(kind))
    return col.otherwise(F.lit(KIND_OTHER))


def with_kind(docs: DataFrame) -> DataFrame:
    return docs.withColumn("kind", kind_column(F.col("url")))

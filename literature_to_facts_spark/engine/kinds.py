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


def classify_url(url: str) -> str:
    """Plain-Python classifier (shim / corpus side)."""
    if url.startswith(GCN_URL_PREFIX):
        return KIND_GCN
    if url.startswith(ATEL_URL_PREFIX):
        return KIND_ATEL
    if url.startswith(ARXIV_URL_PREFIX):
        return KIND_ARXIV
    return KIND_OTHER


def kind_column(url: Column) -> Column:
    """Spark-native kind classifier (whole-stage-codegen friendly)."""
    return (
        F.when(url.startswith(GCN_URL_PREFIX), F.lit(KIND_GCN))
        .when(url.startswith(ATEL_URL_PREFIX), F.lit(KIND_ATEL))
        .when(url.startswith(ARXIV_URL_PREFIX), F.lit(KIND_ARXIV))
        .otherwise(F.lit(KIND_OTHER))
    )


def with_kind(docs: DataFrame) -> DataFrame:
    return docs.withColumn("kind", kind_column(F.col("url")))

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns travelling next to
typed metadata structs.  The Spark-side plumbing — schema, partition-safe
batch iteration, Arrow batch shapes, pandas-UDF signatures — is real and
tested; the actual codec step is STUBBED (the decode libraries are not in
this container): ``decode_media`` raises ``NotImplementedError`` unless
``fake=True`` selects the deterministic fake decoder used by the tests.

Usage shape (mapInPandas keeps one media batch in memory at a time, so
executor memory is bounded by maxRecordsPerBatch x payload size):

    feats = extract_media_features(media_df, fake=True)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, codec:string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha1 string, "
    "feature array<float>, decoder string"
)

FEATURE_DIM = 8


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload into a feature vector.

    STUB: real decode (image resize / audio resample / video frame-sample)
    needs PIL / torchaudio / pyav, which are not available here.  The
    ``fake=True`` path is a deterministic stand-in (sha1-seeded vector) that
    preserves the exact data flow and shapes.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "container; pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha1(kind.encode() + payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def extract_media_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Binary payloads -> fixed-dim feature vectors via mapInPandas.

    Batch shape contract: each Arrow batch holds <= maxRecordsPerBatch rows;
    payloads are decoded one batch at a time and never concatenated, so peak
    executor memory is one batch of payloads + one batch of features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, k, fake=fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                    "decoder": "fake" if fake else "real",
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media-shaped table from the corpus documents (html bytes act
    as opaque payloads) — exercises the binary-column plumbing end to end."""
    return docs.select(
        F.xxhash64("url").alias("media_id"),
        F.when(F.length("url") % 3 == 0, "image")
        .when(F.length("url") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("html").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )

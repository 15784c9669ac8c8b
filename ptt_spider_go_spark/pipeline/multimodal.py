"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with typed
metadata structs. The Spark-side plumbing — schemas, partition-friendly
metadata extraction, Arrow-batched UDF signatures, frame-sampling batch
shape — is real and tested; the actual codec work is STUBBED (the
sandbox has no image/audio libraries): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic
fake decode (derived from the payload hash) exercises the full plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import blake2b

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, n_bytes:long, sha:string>"
)

DECODED_SCHEMA = (
    "media_id long, width int, height int, n_frames int, feature array<float>"
)


def to_media_table(docs: DataFrame) -> DataFrame:
    """Adapter: documents -> a media table with binary payloads (the
    text bytes stand in for image bytes) + typed metadata. At scale the
    payload column stays out of every projection that doesn't need it
    (Parquet column pruning), which is the whole point of this layout."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """STUB: real decoding needs an image library not present in this
    environment. fake=True returns a deterministic pseudo-decode so the
    distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL/cv2); "
            "run with fake=True for the deterministic test decode"
        )
    h = blake2b(payload, digest_size=16).digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "n_frames": 1 + h[2] % 4,
        "feature": [b / 255.0 for b in h[:8]],
    }


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode/feature-extract stage: Arrow batches in, one
    decoded row per media row out. Batch shape (no per-row Python at
    the Spark API level) is the contract a real codec drops into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "n_frames": [],
                   "feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = decode_image(bytes(payload), fake=fake)
                out["media_id"].append(mid)
                out["width"].append(d["width"])
                out["height"].append(d["height"])
                out["n_frames"].append(d["n_frames"])
                out["feature"].append(d["feature"])
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, DECODED_SCHEMA)


def sample_frames(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling shape: explode n_frames -> keep every nth frame.
    JVM-side (sequence + explode), no Python."""
    return (
        decoded.select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame"),
        )
        .filter(F.col("frame") % every_nth == 0)
    )

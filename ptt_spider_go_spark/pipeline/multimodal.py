"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns with typed
metadata structs. The Spark-side plumbing — schemas, partition-friendly
metadata extraction, Arrow-batched UDF signatures, frame-sampling batch
shape — is real and tested; the actual codec work is gated behind an
optional PIL import (absent in this sandbox): `decode_image` raises
NotImplementedError on the real path unless PIL is importable, and the
default `fake=True` path runs a deterministic md5-derived pseudo-decode
that exercises the full plumbing AND is SQL-expressible, so the
contract queries carry real DuckDB oracles (every derived value is an
md5 digest byte; features are byte/256 — exact in float32/float64).
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import md5

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional real codec (sandbox has no imaging lib — see SURVEY §2.1)
    from io import BytesIO

    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:  # pragma: no cover - sandbox default
    _HAS_PIL = False

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
    """Decode one payload. fake=True (the test/oracle default) derives
    every output from md5(payload): width/height/n_frames from digest
    bytes, feature[i] = digest_byte[i] / 256 (exactly representable in
    float32 and float64, so the DuckDB oracle reproduces it bit-for-bit
    from substr(md5(...))). The real path uses PIL when importable and
    raises NotImplementedError otherwise (no imaging lib in sandbox)."""
    if not fake:
        if not _HAS_PIL:  # pragma: no cover - sandbox default
            raise NotImplementedError(
                "image decoding requires an imaging library (PIL/cv2); "
                "run with fake=True for the deterministic test decode"
            )
        img = Image.open(BytesIO(payload)).convert("L")
        px = img.resize((8, 8)).tobytes()
        return {
            "width": img.width,
            "height": img.height,
            "n_frames": getattr(img, "n_frames", 1),
            "feature": [b / 256.0 for b in px[:8]],
        }
    h = md5(payload).digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "n_frames": 1 + h[2] % 4,
        "feature": [b / 256.0 for b in h[:8]],
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

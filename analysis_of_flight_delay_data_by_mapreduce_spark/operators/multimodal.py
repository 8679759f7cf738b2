"""Multimodal column handling (extension tier).

Images/audio/video are opaque ``binary`` payloads plus a typed metadata
struct (schema.MULTIMODAL_ASSET). The Spark-side plumbing — schema, Arrow
batch shape, ``mapInPandas`` iteration, partition sizing — is real and
tested; the actual codec step is STUBBED with a deterministic fake because
no image/audio libraries exist in this container (clearly marked below —
swap ``_fake_decode_*`` for PIL/librosa/av calls in a real deployment).

Scale notes: payloads stay in executor memory one Arrow batch at a time
(``mapInPandas`` is an iterator — never materializes a partition);
``spark.sql.files.maxPartitionBytes`` and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bound batch footprint when
payloads are large. Decode is per-row parallel: zero shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_payload",
    "decode_images",
    "extract_features",
    "sample_video_frames",
    "stub_features",
]

#: Output schema of decode_images (Arrow-compatible; arrays stay columnar).
DECODED_SCHEMA = (
    "asset_id long, modality string, width int, height int, "
    "n_bytes long, content_sha256 string"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = f"asset_id long, features array<float>"

FRAMES_SCHEMA = "asset_id long, frame_idx int, frame_sha256 string"


def attach_payload(
    df: DataFrame, text_col: str, id_col: str, modality: str = "image"
) -> DataFrame:
    """Build a MULTIMODAL_ASSET-shaped frame from any table, treating a
    string column's bytes as the opaque payload (the test-fixture path —
    real pipelines read payload bytes from object storage)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.lit(f"{modality}/raw").alias("mime"),
            (F.length(payload) % 1024).cast("int").alias("width"),
            (F.length(payload) % 768).cast("int").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode_image(payload: bytes) -> tuple[int, int, str]:
    """STUB decoder — deterministic fake standing in for a real image
    codec (PIL etc. are not installed in this container). Derives stable
    pseudo-dimensions and a content digest from the bytes."""
    digest = hashlib.sha256(payload).hexdigest()
    w = 1 + int(digest[:4], 16) % 4096
    h = 1 + int(digest[4:8], 16) % 4096
    return w, h, digest


def decode_images(assets: DataFrame) -> DataFrame:
    """Decode binary payloads → (dimensions, digest) via ``mapInPandas``.

    The iterator signature processes one Arrow batch at a time, so payload
    bytes never accumulate; output drops the payload column (decode early,
    project away the heavy bytes — the multimodal analog of column pruning).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode_image(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "content_sha256": [d[2] for d in decoded],
                }
            )

    return assets.mapInPandas(op, schema=DECODED_SCHEMA)


def stub_features(payload: bytes) -> list[float]:
    """The STUB featurizer as a plain function: deterministic hash-derived
    vector standing in for a real embedding model. Exposed so a caller can
    featurize a *request* payload driver-side (e.g. the query vector of an
    ANN probe) with exactly the distributed featurizer's semantics."""
    d = hashlib.sha256(payload).digest()
    return [(d[i] - 128) / 128.0 for i in range(FEATURE_DIM)]


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset feature vector (array<float>) via ``mapInPandas``.

    STUB featurizer (``stub_features``): the Spark-side contract (Arrow
    batches in, ``array<float>`` column out, schema fixed at plan time) is
    the real production shape.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [stub_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": feats})

    return assets.mapInPandas(op, schema=FEATURES_SCHEMA)


def sample_video_frames(assets: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """Frame sampling stub: one "frame" digest per ``every_n_bytes`` chunk
    of payload (a real implementation seeks keyframes with av/ffmpeg). A
    table-generating op — rows out ≥ rows in — exercising the explode-shaped
    mapInPandas contract."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_sha = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(p)
                chunks = range(0, max(len(raw), 1), every_n_bytes)
                for i, off in enumerate(chunks):
                    out_id.append(aid)
                    out_idx.append(i)
                    out_sha.append(
                        hashlib.sha256(raw[off : off + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_idx": out_idx, "frame_sha256": out_sha}
            )

    return assets.mapInPandas(op, schema=FRAMES_SCHEMA)

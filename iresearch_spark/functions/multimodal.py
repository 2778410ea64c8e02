"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages. The decode step itself is STUBBED in
this environment (no image/audio libraries in the container) behind
`set_decoder(...)` — the Spark-side contract (schema, partitioning, batch
shape, UDF signatures) is real and tested with the deterministic fake
decoder.

Schema convention:
    payload:  binary            (the encoded media bytes)
    media:    struct<kind:string, mime:string, width:int, height:int,
                     n_frames:int, sample_rate:int>
    features: array<float>      (extractor output)
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("kind", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

Decoder = Callable[[bytes, dict], np.ndarray]


def _fake_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for a real image/audio decoder: derives a
    fixed-size pseudo-pixel array from the payload bytes. Replace via
    set_decoder() where PIL/av are available."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(16, dtype=np.float32)
    # fold payload into 16 deterministic "feature" buckets
    pad = (-arr.size) % 16
    folded = np.pad(arr, (0, pad)).reshape(-1, 16).astype(np.float64)
    return (folded.mean(axis=0) / 255.0).astype(np.float32)


_DECODER: Decoder = _fake_decoder


def set_decoder(fn: Decoder) -> None:
    """Install a real decoder (e.g. PIL-based). Not available in this
    container — raise-or-fake is the documented contract."""
    global _DECODER
    _DECODER = fn


def synthesize_media(
    df: DataFrame, id_col: str = "doc_id", payload_from: str = "text"
) -> DataFrame:
    """Attach a deterministic fake binary payload + metadata (test fixture
    for the plumbing; payload = utf-8 bytes of an existing column)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(payload_from), "utf-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/x-fake").alias("mime"),
            F.lit(4).alias("width"),
            F.lit(4).alias("height"),
            F.lit(1).alias("n_frames"),
            F.lit(0).alias("sample_rate"),
        ).alias("media"),
    )


def extract_features(media_df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, media).

    Real contract: one Arrow batch in -> one features row per input row;
    decode failures yield null features rather than failing the stage
    (at corpus scale a poison payload must not kill the job)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # PER-ROW BY DESIGN: media decode is per-blob — a real decoder
        # (PIL/ffmpeg/soundfile) is one C call per opaque payload, so the
        # Python loop contributes O(rows) dispatch against O(bytes) decode
        # work; there is no vectorizable inner dimension across blobs.
        # Arrow still batches the TRANSFER (one batch in/out per ~10k
        # rows); only the decode dispatch is row-wise.
        for pdf in batches:
            ids, kinds, feats = [], [], []
            for row in pdf.itertuples(index=False):
                meta = row.media if isinstance(row.media, dict) else row.media._asdict()
                try:
                    v = _DECODER(bytes(row.payload), meta)
                    feats.append(np.asarray(v, dtype=np.float32))
                except NotImplementedError:
                    feats.append(None)
                ids.append(row.doc_id)
                kinds.append(meta.get("kind"))
            yield pd.DataFrame({"doc_id": ids, "kind": kinds, "features": feats})

    return media_df.mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media", MEDIA_STRUCT),
    ]
)


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage: (doc_id, payload, media) -> same schema with target
    dimensions. The pixel transform is the installed decoder's job (STUB:
    payload passes through, metadata records the new shape — the real
    contract is the schema + batch plumbing, which is what Spark sees)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["media"] = out["media"].map(
                lambda m: {
                    **(m if isinstance(m, dict) else m._asdict()),
                    "width": width,
                    "height": height,
                }
            )
            yield out[["doc_id", "payload", "media"]]

    return media_df.mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("media", MEDIA_STRUCT),
    ]
)


def sample_frames(media_df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame-sampling stage for video payloads: one output row per sampled
    frame (frame extraction itself is the decoder's job — STUB slices the
    payload deterministically so row counts and batch shapes are real).
    Fan-out happens inside the Arrow kernel, so a 10k-frame video never
    materializes as a JVM array."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # PER-ROW BY DESIGN (same rationale as extract_features): frame
        # extraction is a per-blob container parse with variable fan-out;
        # the loop is decode dispatch, not data-plane work, and the real
        # cost per iteration is the decoder's C-side byte handling.
        for pdf in batches:
            ids, idxs, payloads, metas = [], [], [], []
            for row in pdf.itertuples(index=False):
                meta = row.media if isinstance(row.media, dict) else row.media._asdict()
                n = max(1, int(meta.get("n_frames") or 1))
                buf = bytes(row.payload)
                step = max(1, len(buf) // n)
                for fi in range(0, n, every_nth):
                    ids.append(row.doc_id)
                    idxs.append(fi)
                    payloads.append(buf[fi * step : (fi + 1) * step])
                    metas.append({**meta, "n_frames": 1})
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "frame_idx": idxs, "payload": payloads, "media": metas}
                )

    return media_df.mapInPandas(kernel, FRAME_SCHEMA)

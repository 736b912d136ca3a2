"""Multimodal column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs.  The Spark-side plumbing — schemas, Arrow batching, partitioning,
UDF signatures, frame-index explosion — is real and tested; the actual
codec decode is STUBBED because no image/audio libraries exist in this
container: ``decode_media`` parses only the deterministic synthetic header
and raises ``NotImplementedError`` for real codecs (clearly marked), and
``extract_features`` derives a deterministic fake feature vector from the
payload bytes (sha-seeded), standing in for a model forward pass with the
same shape contract.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_MAGIC = b"MEDI"
KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, "
    "duration_ms: int, n_frames: int>"
)


def make_media_corpus(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic media table: MEDI header + seeded bytes."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = KINDS[i % 3]
        w, h = int(rng.randint(16, 256)), int(rng.randint(16, 256))
        sr = int(rng.choice([8000, 16000, 44100]))
        dur = int(rng.randint(100, 10_000))
        frames = int(rng.randint(1, 300))
        body = rng.bytes(int(rng.randint(64, 2048)))
        payload = MEDIA_MAGIC + struct.pack("<iiiii", w, h, sr, dur, frames) + body
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "width": w,
                    "height": h,
                    "sample_rate": sr,
                    "duration_ms": dur,
                    "n_frames": frames,
                },
            )
        )
    return pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])


def decode_media(media: DataFrame) -> DataFrame:
    """Parse payload headers -> (media_id, kind, width, height, n_frames,
    status).  STUB: only the synthetic MEDI container is implemented; a
    real deployment would dispatch to PIL/ffmpeg here."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"], "kind": pdf["kind"]}
            ws, hs, fs, status = [], [], [], []
            for payload in pdf["payload"]:
                if payload[:4] == MEDIA_MAGIC:
                    w, h, _sr, _dur, frames = struct.unpack_from("<iiiii", payload, 4)
                    ws.append(w)
                    hs.append(h)
                    fs.append(frames)
                    status.append("ok")
                else:
                    # real codec path intentionally unimplemented (no image/
                    # audio libs in this container); see module docstring
                    ws.append(0)
                    hs.append(0)
                    fs.append(0)
                    status.append("unsupported_codec")
            out.update(
                {
                    "width": pd.array(ws, dtype="int64"),
                    "height": pd.array(hs, dtype="int64"),
                    "n_frames": pd.array(fs, dtype="int64"),
                    "status": status,
                }
            )
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen,
        schema="media_id long, kind string, width long, height long, "
        "n_frames long, status string",
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """(media_id, features array<float>): deterministic sha-seeded stand-in
    for an embedding-model forward pass — the Arrow batch shape, schema,
    and normalization are the real contract."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                seed = int.from_bytes(digest[:4], "big")
                vec = np.random.RandomState(seed).normal(size=dim)
                vec /= np.linalg.norm(vec)
                feats.append([float(x) for x in vec])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        gen, schema="media_id long, features array<double>"
    )


def sample_frames(media: DataFrame, every_k: int = 30) -> DataFrame:
    """(media_id, frame_idx) for videos: every k-th frame plus the last —
    pure JVM sequence/explode, no Python."""
    v = media.filter(F.col("kind") == "video")
    idxs = F.array_distinct(
        F.concat(
            F.sequence(
                F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_k)
            ),
            F.array(F.greatest(F.col("meta.n_frames") - 1, F.lit(0))),
        )
    )
    return v.select(
        "media_id", F.explode(idxs).alias("frame_idx")
    ).withColumn("frame_idx", F.col("frame_idx").cast("long"))

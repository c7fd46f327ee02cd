"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns + typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The decode kernels are STUBS by design — this container has no
image/audio libraries — but everything Spark-side is real and tested:
schemas, binary round-trips through Arrow, batch shapes, partitioning,
and the UDF signatures. Swap ``_decode_image_stub`` for a PIL/ffmpeg
call at deploy time; nothing else changes.

The deterministic fake decode derives (width, height, channels, n
frames, duration) from a stable hash of the bytes so tests are
reproducible without media libs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("bytes", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


def _stable_u32(raw: bytes, salt: bytes = b"") -> int:
    return int.from_bytes(hashlib.md5(salt + raw[:256]).digest()[:4], "little")


def _decode_image_stub(raw: bytes) -> tuple[int, int, int]:
    """Deterministic fake (width, height, channels). Real impl:
    PIL.Image.open(io.BytesIO(raw)).size — same signature."""
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("wire PIL decode here at deploy time")
    h = _stable_u32(raw)
    return 160 + h % 1920, 90 + (h >> 8) % 1080, 1 + (h >> 20) % 4


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas image-metadata stage: per Arrow batch, one python
    pass; binary column stays zero-copy through Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_image_stub(b or b"") for b in pdf["bytes"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.array([d[0] for d in dims], dtype=np.int32),
                    "height": np.array([d[1] for d in dims], dtype=np.int32),
                    "channels": np.array([d[2] for d in dims], dtype=np.int32),
                    "n_bytes": pdf["bytes"].map(lambda b: len(b or b"")).astype("int64"),
                    "content_hash": pdf["bytes"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                }
            )

    return df.mapInPandas(run, schema=IMAGE_META_SCHEMA)


EMBED_DIM = 32
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction stage (deterministic fake embedding from a
    byte histogram — real impl: a vision model over decoded pixels).
    Batched numpy: one histogram matrix per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["bytes"]:
                arr = np.frombuffer((b or b"\x00")[:4096], dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=EMBED_DIM, range=(0, 256))
                v = hist.astype(np.float32)
                n = float(np.linalg.norm(v)) or 1.0
                feats.append((v / n).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling stage: 1->N rows per video (the explode
    shape of the reference's chunker, 04_Chunk_Articles_Content.py:100,
    done inside the batch iterator). Duration is stub-derived."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_ts, out_hash = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                raw = b or b""
                duration_ms = 1000 + _stable_u32(raw, b"dur") % 30_000
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_ts.append(ts)
                    out_hash.append(
                        hashlib.md5(raw[:64] + ts.to_bytes(8, "little")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": np.array(out_id, dtype=np.int64),
                    "frame_idx": np.array(out_idx, dtype=np.int32),
                    "frame_ts_ms": np.array(out_ts, dtype=np.int64),
                    "frame_hash": out_hash,
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media table (bytes = seeded pseudo-random)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                h = hashlib.md5(f"media{i}".encode()).digest()
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "bytes": h * (8 + int(i) % 64),
                        "meta": {"source": f"src{int(i) % 7}", "codec": "fake"},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)

"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched ``mapInPandas`` pipelines.

Beyond-reference capability (BASELINE.json north star). The Spark-side
contract is fully real — schemas, partition-preserving ``mapInPandas``
signatures, Arrow batch shapes, deterministic outputs — while the actual
codec work is pluggable:

* with Pillow/torchaudio/decord installed, ``decode_image`` would hand the
  bytes to the codec (this container has none of them, so that branch raises
  ``NotImplementedError`` explicitly);
* without codecs, a clearly-marked **deterministic fake decoder** derives
  dimensions/features from the bytes via the same portable polynomial hash
  the rest of the engine uses — so the full pipeline is testable end-to-end
  and even DuckDB-oracle-checkable.

At 100 TB, media payloads dominate row size: keep them in their own table
keyed by ``media_id``, partition by acquisition batch, and join metadata
late (column pruning keeps the binary column out of scans that don't decode).
"""
from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.LongType(), False),
        T.StructField("frame_data", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)

_MOD = 1_000_000_007
_BASE = 131

HAVE_REAL_CODECS = False  # no image/audio libraries in this container
try:  # pragma: no cover - exercised only where Pillow exists
    import PIL.Image  # noqa: F401

    HAVE_REAL_CODECS = True
except ModuleNotFoundError:
    pass


def _poly_hash_bytes(data: bytes) -> int:
    """Identical recurrence to ``functions.hashing.poly_hash`` (for ASCII
    payloads byte == code point, so SQL oracles can reproduce it)."""
    h = 0
    for b in data:
        h = (h * _BASE + b) % _MOD
    return h


def _fake_decode(data: bytes) -> tuple[int, int]:
    """STUB DECODER (deterministic fake): dimensions derived from the
    payload hash. A real deployment replaces this with an actual codec."""
    h = _poly_hash_bytes(data)
    return 64 + h % 961, 64 + (h * 31 + 7) % 961


def _pillow_decode(data: bytes) -> tuple[int, int]:  # pragma: no cover
    """Real-codec branch: Pillow header decode (bytes → (width, height))."""
    import io

    import PIL.Image

    with PIL.Image.open(io.BytesIO(data)) as im:
        return im.width, im.height


# The pluggable codec seam: any callable bytes -> (width, height). Resolved
# to Pillow when installed, the deterministic fake otherwise; swappable at
# runtime (tests inject a stand-in "real" codec through this exact seam).
_IMAGE_DECODER = _pillow_decode if HAVE_REAL_CODECS else _fake_decode


def set_image_decoder(decoder):
    """Plug an image codec (``bytes -> (width, height)``); returns the
    previous decoder so callers/tests can restore it."""
    global _IMAGE_DECODER
    prev = _IMAGE_DECODER
    _IMAGE_DECODER = decoder
    return prev


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo/test helper: wrap each document's UTF-8 bytes as an 'image'."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def decode_images(media: DataFrame) -> DataFrame:
    """Binary → (width, height, n_bytes) via Arrow-batched ``mapInPandas``.

    Partition-preserving (no shuffle): each Arrow batch is decoded where it
    sits. The codec is whatever ``_IMAGE_DECODER`` resolves to (Pillow when
    installed, the deterministic fake in this container) — captured into the
    closure HERE, at plan-build time, so an injected decoder rides along in
    the serialized task instead of being re-resolved to the module default
    on the executor.
    """
    decoder = _IMAGE_DECODER

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decoder(bytes(d)) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_bytes": [len(bytes(d)) for d in pdf["data"]],
                }
            )

    return media.select("media_id", "data").mapInPandas(
        decode, schema=DECODED_IMAGE_SCHEMA
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' via mapInPandas — fake path truncates/pads the payload to
    ``width*height`` bytes (real path: codec resample)."""
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (bytes(d) + b"\x00" * target)[:target] for d in pdf["data"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "data": out,
                 "meta": pdf["meta"]}
            )

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 64, every_n: int = 2) -> DataFrame:
    """'Video' frame sampling: split the payload into ``frame_bytes`` chunks,
    keep every ``every_n``-th — the plumbing (explode inside mapInPandas,
    1→N rows) mirrors a real frame sampler's shape."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, d in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(d)
                chunks = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                for j, chunk in enumerate(chunks):
                    if j % every_n == 0:
                        ids.append(mid)
                        idxs.append(j)
                        frames.append(chunk)
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_data": frames}
            )

    return media.select("media_id", "data").mapInPandas(sample, schema=FRAME_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic byte-statistics 'embedding' (real path: a vision/audio
    encoder batch-inferencing per Arrow batch)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for d in pdf["data"]:
                raw = bytes(d)
                vec = [0.0] * dim
                for i, b in enumerate(raw):
                    vec[i % dim] += b / 255.0
                n = max(len(raw), 1)
                feats.append([v / n * dim for v in vec])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "data").mapInPandas(
        featurize, schema=FEATURE_SCHEMA
    )


__all__ = [
    "DECODED_IMAGE_SCHEMA",
    "FEATURE_DIM",
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "HAVE_REAL_CODECS",
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_images",
    "extract_features",
    "resize_images",
    "sample_frames",
    "set_image_decoder",
]

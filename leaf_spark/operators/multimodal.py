"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBBED
(deterministic fakes clearly marked below); everything Spark-side — schema,
batch iteration, partitioning, UDF signatures — is real and tested, and a
deployment swaps `_decode_image_stub` for PIL/ffmpeg without touching the
plumbing.

Asset schema (the pattern for 100 TB multimodal corpora: content in large
binary columns, metadata columns first so column pruning can skip the bytes):

    asset_id BIGINT, kind STRING, meta STRUCT<...>, content BINARY
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "asset_id bigint, kind string, n_bytes bigint, sha256 string, "
    "width int, height int, channels int, decode_ok boolean"
)

FRAME_SCHEMA = "asset_id bigint, frame_no int, frame_sha string"

REAL_DECODERS_AVAILABLE = False  # flipped when PIL/av are importable


def _decode_image_stub(content: bytes) -> tuple[int, int, int]:
    """STUB: deterministic fake decoder (no image libs in this container).

    Derives plausible (width, height, channels) from the content hash so
    tests are reproducible. A real deployment raises NotImplementedError
    here and wires PIL instead — the mapInPandas plumbing is unchanged.
    """
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire a real decoder (PIL.Image.open) here")
    h = hashlib.sha256(content).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 3


def extract_image_metadata(assets: DataFrame) -> DataFrame:
    """BINARY content → typed metadata rows, Arrow-batched per partition.

    The content column is only deserialized inside the executor-side pandas
    batches; the output is narrow (metadata only) so downstream stages never
    carry the bytes — at 100 TB this is the difference between shuffling
    metadata (GBs) and shuffling content (the full corpus).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, kind, content in zip(pdf["asset_id"], pdf["kind"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                try:
                    w, h, c = _decode_image_stub(b)
                    ok = True
                except Exception:
                    w = h = c = 0
                    ok = False
                rows.append(
                    (
                        int(asset_id),
                        str(kind),
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        w,
                        h,
                        c,
                        ok,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id",
                    "kind",
                    "n_bytes",
                    "sha256",
                    "width",
                    "height",
                    "channels",
                    "decode_ok",
                ],
            )

    return assets.select("asset_id", "kind", "content").mapInPandas(
        batches, schema=IMAGE_META_SCHEMA
    )


def sample_frames(assets: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8) -> DataFrame:
    """Video-frame-sampling plumbing: emits up to ``max_frames`` 'frames'
    per asset (STUB: hash of byte windows stands in for decoded frames —
    real path: av/ffmpeg keyframe extraction with identical shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for asset_id, content in zip(pdf["asset_id"], pdf["content"]):
                b = bytes(content) if content is not None else b""
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    window = b[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append((int(asset_id), i, hashlib.sha256(window).hexdigest()[:16]))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no", "frame_sha"])

    return assets.select("asset_id", "content").mapInPandas(batches, schema=FRAME_SCHEMA)


def synthesize_assets(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a fake asset table from the documents corpus (text bytes as the
    binary payload) — exercises the full multimodal path on testdata."""
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
    )

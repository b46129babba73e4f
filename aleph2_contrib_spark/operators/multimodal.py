"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design: media payloads are ``binary`` columns with a metadata struct
(mime, width/height/duration, codec). Decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas passes over ``mapInPandas`` —
per-batch Python, zero shuffle, scales linearly with executors.

The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in this
container, so the decode kernels are deliberately stubbed: the default
``decoder`` raises NotImplementedError, and tests inject a deterministic
fake decoder. The Spark-side plumbing — schema, batch iteration, partition
behavior, UDF signatures — is real and tested; swapping in a real decoder
is a one-argument change.

At 100 TB: binary payloads dominate row size, so batch sizes are controlled
by bytes not rows — set spark.sql.execution.arrow.maxRecordsPerBatch low
(or pre-split with maxPartitionBytes) to bound executor memory; metadata-
only queries never touch the binary column (parquet column pruning).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "mime string, width int, height int, n_frames int, duration_s double, codec string"
)


def _default_decoder(payload: bytes) -> dict:
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg — inject a decoder callable"
    )


def fake_decoder(payload: bytes) -> dict:
    """Deterministic stand-in decoder for tests: derives pseudo-metadata and
    a 16-dim feature vector from the payload hash."""
    h = hashlib.sha256(payload).digest()
    return {
        "mime": "image/fake",
        "width": 16 + h[0],
        "height": 16 + h[1],
        "n_frames": 1,
        "duration_s": 0.0,
        "codec": "fake",
        "features": [b / 255.0 for b in h[:16]],
    }


def extract_media_metadata(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "__source_file",
    decoder: Callable[[bytes], dict] = _default_decoder,
) -> DataFrame:
    """Decode each payload and emit (id, metadata struct columns). The
    binary column is dropped from the output — downstream metadata queries
    stay columnar and never reload payload bytes."""
    schema = f"`{id_col}` string, {MEDIA_META_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                meta = decoder(bytes(r[binary_col]))
                rows.append(
                    {
                        id_col: r[id_col],
                        "mime": meta["mime"],
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_frames": meta.get("n_frames"),
                        "duration_s": meta.get("duration_s"),
                        "codec": meta.get("codec"),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def extract_media_features(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "__source_file",
    decoder: Callable[[bytes], dict] = _default_decoder,
    dim: int = 16,
) -> DataFrame:
    """Decode + featurize each payload → (id, embedding array<double>).
    Output feeds directly into operators.similarity."""
    schema = f"`{id_col}` string, embedding array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                meta = decoder(bytes(r[binary_col]))
                feats = meta.get("features")
                if feats is not None and len(feats) == dim:
                    rows.append({id_col: r[id_col], "embedding": list(feats)})
            yield pd.DataFrame(rows, columns=[id_col, "embedding"])

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def extract_media(
    df: DataFrame,
    binary_col: str = "content",
    id_col: str = "__source_file",
    decoder: Callable[[bytes], dict] = _default_decoder,
    dim: int = 16,
) -> DataFrame:
    """Metadata AND features in ONE decode pass → (id, metadata columns,
    embedding array<double>; embedding NULL when the decoder yields no
    ``dim``-length feature vector).

    Why it exists: decode is the dominant cost of any media pass — a
    pipeline that calls :func:`extract_media_metadata` and
    :func:`extract_media_features` separately decodes every payload
    twice and then pays an id-keyed join shuffle to glue the halves
    back together. At 100 TB of payload bytes that is strictly 2× the
    decode CPU plus a shuffle of every row for zero extra information.
    This pass emits both projections from the single decoder call, no
    join anywhere. Keep the narrow extracts for when only one side is
    needed (metadata-only queries stay columnar and cheap)."""
    schema = f"`{id_col}` string, {MEDIA_META_SCHEMA}, embedding array<double>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for rid, payload in zip(b[id_col], b[binary_col]):
                meta = decoder(bytes(payload))
                feats = meta.get("features")
                rows.append(
                    {
                        id_col: rid,
                        "mime": meta["mime"],
                        "width": meta.get("width"),
                        "height": meta.get("height"),
                        "n_frames": meta.get("n_frames"),
                        "duration_s": meta.get("duration_s"),
                        "codec": meta.get("codec"),
                        "embedding": list(feats)
                        if feats is not None and len(feats) == dim
                        else None,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "mime",
                    "width",
                    "height",
                    "n_frames",
                    "duration_s",
                    "codec",
                    "embedding",
                ],
            )

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    binary_col: str = "content",
    id_col: str = "__source_file",
    frame_extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Frame sampling for video payloads → one row per sampled frame
    (id, frame_idx, frame binary). ``frame_extractor(payload, every_n)``
    returns the sampled frames; stubbed by default."""
    if frame_extractor is None:
        def frame_extractor(payload: bytes, n: int) -> list[bytes]:  # noqa: F811
            raise NotImplementedError("frame extraction requires ffmpeg — inject one")

    schema = f"`{id_col}` string, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                for i, frame in enumerate(frame_extractor(bytes(r[binary_col]), every_n)):
                    rows.append({id_col: r[id_col], "frame_idx": i, "frame": frame})
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame"])

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "content",
    id_col: str = "__source_file",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize → (id, resized binary, width, height). ``resizer``
    (payload, w, h) -> bytes is stubbed by default (PIL not available);
    the Arrow-batched plumbing is real."""
    if resizer is None:
        def resizer(payload: bytes, w: int, h: int) -> bytes:  # noqa: F811
            raise NotImplementedError("image resize requires PIL — inject a resizer")

    schema = f"`{id_col}` string, content binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                rows.append(
                    {
                        id_col: r[id_col],
                        "content": resizer(bytes(r[binary_col]), width, height),
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "content", "width", "height"])

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def dhash_bits(w: int, h: int, rgb: bytes, grid: tuple[int, int] = (9, 8)) -> tuple[int, int, int, int]:
    """Difference-hash of one raster (the classic dHash — Krawetz 2013,
    "Kind of Like That", hackerfactor blog): sample a (gx+1)×gy grid by
    NEAREST-NEIGHBOR integer mapping (x = (i·w) div gx+1 — integer
    division, no resampling floats), reduce to integer luma
    (299r+587g+114b) div 1000, set bit (j·(gx) + i) when the right
    sample is strictly brighter than its left neighbor, pack row-major
    into two unsigned 32-bit halves. Returns (width, height, lo, hi).

    Everything is integer arithmetic on exact decoded bytes, so the
    hash is reproducible by ANY implementation from the pixel values —
    the property the oracle uses, and the property that makes the hash
    a stable dedup key across engines and languages."""
    gx1, gy = grid
    gx = gx1 - 1
    lo = hi = 0
    for j in range(gy):
        y = (j * h) // gy
        row = []
        for i in range(gx1):
            x = (i * w) // gx1
            p = 3 * (y * w + x)
            r, g, b = rgb[p], rgb[p + 1], rgb[p + 2]
            row.append((299 * r + 587 * g + 114 * b) // 1000)
        for i in range(gx):
            if row[i + 1] > row[i]:
                bit = j * gx + i
                if bit < 32:
                    lo |= 1 << bit
                else:
                    hi |= 1 << (bit - 32)
    return w, h, lo, hi


def image_dhash(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    grid: tuple[int, int] = (9, 8),
) -> DataFrame:
    """Perceptual difference-hash per image payload — the image-side
    counterpart of SimHash for near-duplicate detection: two images
    whose dHashes sit within a small Hamming distance are crops/
    recompressions/brightness-shifts of each other, and the 64-bit key
    buckets a billion-image corpus for pairwise verification exactly
    like ``dedup.simhash`` buckets text.

    Decodes REAL payloads through the in-repo still-image decoders
    (PPM/BMP/PNG/GIF/JPEG — ``codecs.decode_image``), then pure integer
    dHash (:func:`dhash_bits`). Returns (id, width, height, dhash_lo,
    dhash_hi) — halves are unsigned-32 values in BIGINTs, Hamming =
    bit_count(xor) per half, exactly the ``sign_hamming_codes`` join
    pattern.

    Plan shape: ONE Arrow-batched mapInPandas pass, no shuffle; at
    100 TB batch size is bounded by bytes (arrow.maxRecordsPerBatch),
    and the output is 5 narrow columns — the raster never crosses the
    wire."""
    from aleph2_contrib_spark.operators.codecs import decode_image

    schema = (
        f"{id_col} long, width int, height int, dhash_lo long, dhash_hi long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for did, payload in zip(b[id_col], b[content_col]):
                w, h, rgb = decode_image(bytes(payload))
                w, h, lo, hi = dhash_bits(w, h, rgb, grid)
                out.append(
                    {
                        id_col: int(did),
                        "width": w,
                        "height": h,
                        "dhash_lo": lo,
                        "dhash_hi": hi,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[id_col, "width", "height", "dhash_lo", "dhash_hi"],
            )

    return df.select(id_col, content_col).mapInPandas(run, schema)

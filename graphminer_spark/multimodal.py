"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata structs; all
transforms are Arrow-batched ``mapInPandas`` passes so the Spark-side
plumbing (schema, partitioning, batch shape, UDF signature) is real
and tested. The codec step itself is STUBBED: the image/audio libs are
not in this container, so decoding uses a deterministic fake (parses
our own synthetic header) and raises ``NotImplementedError`` for real
media unless a decoder is injected.

At 100 TB the pattern is: keep blobs in their own column family /
parquet files (never shuffled with analytics columns), push metadata
extraction down to the first scan, and repartition by content hash so
replicated assets dedup before decode.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# synthetic media header: magic(4s) kind(B) width(H) height(H) n_frames(H)
_MAGIC = b"GMSM"
_HDR = struct.Struct("<4sBHHH")
KINDS = {0: "image", 1: "audio", 2: "video"}

META_SCHEMA = (
    "asset_id long, kind string, width int, height int, n_frames int, "
    "n_bytes long, content_sha256 string"
)


def make_fake_media(asset_id: int, kind: int, w: int, h: int, frames: int) -> bytes:
    """Deterministic synthetic media blob (tests + datagen)."""
    payload = hashlib.sha256(f"{asset_id}:{kind}".encode()).digest() * max(
        1, (w * h * frames) // 32 % 64 + 1
    )
    return _HDR.pack(_MAGIC, kind, w, h, frames) + payload


def _params_for_key(k: int) -> tuple[int, int, int, int]:
    """Closed-form synthetic media parameters for integer key ``k``.

    Pure integer arithmetic so an independent SQL oracle can derive the
    expected metadata without touching bytes: kind = k%3,
    width = 8+k%25, height = 8+k%17, frames = 1+k%30 for video else 1.
    """
    kind = k % 3
    w = 8 + k % 25
    h = 8 + k % 17
    frames = 1 + k % 30 if kind == 2 else 1
    return kind, w, h, frames


def synthesize_assets(
    docs: DataFrame, dup_groups: int | None = None
) -> DataFrame:
    """``documents`` → ``(asset_id, media)`` with deterministic blobs.

    One Arrow pass builds a binary media column per document; blob
    content is a pure function of ``doc_id`` (or ``doc_id %
    dup_groups`` when set, yielding exact duplicate blobs for the
    content-hash dedup path). Stands in for the 100 TB scan of a real
    asset column family; everything downstream (decode, frame
    sampling, dedup) exercises the genuine mapInPandas plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(x) for x in pdf["doc_id"]]
            blobs = []
            for aid in ids:
                k = aid % dup_groups if dup_groups else aid
                kind, w, h, frames = _params_for_key(k)
                blobs.append(make_fake_media(k, kind, w, h, frames))
            yield pd.DataFrame({"asset_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(
        run, schema="asset_id long, media binary"
    )


def decode_header(blob: bytes) -> tuple[str, int, int, int]:
    """STUB decoder: real deployments plug ffmpeg/PIL here."""
    if blob[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decoding needs an image/audio codec not present "
            "in this container; inject a decoder or use synthetic blobs"
        )
    _, kind, w, h, frames = _HDR.unpack_from(blob)
    return KINDS.get(kind, "unknown"), w, h, frames


def extract_media_meta(assets: DataFrame) -> DataFrame:
    """``(asset_id, media)`` → typed metadata, one Arrow pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                b = bytes(blob)
                kind, w, h, fr = decode_header(b)
                recs.append(
                    (
                        int(aid),
                        kind,
                        w,
                        h,
                        fr,
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id",
                    "kind",
                    "width",
                    "height",
                    "n_frames",
                    "n_bytes",
                    "content_sha256",
                ],
            )

    return assets.select("asset_id", "media").mapInPandas(run, schema=META_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Video → sampled frame index rows ``(asset_id, frame_idx)``.

    The decode-to-pixels step is stubbed; the explode/partition shape
    (one output row per sampled frame, order-preserving within asset)
    is the real, tested plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_a, out_f = [], []
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                kind, _, _, frames = decode_header(bytes(blob))
                if kind != "video":
                    continue
                for fi in range(0, frames, every_n):
                    out_a.append(int(aid))
                    out_f.append(fi)
            yield pd.DataFrame({"asset_id": out_a, "frame_idx": out_f})

    return assets.select("asset_id", "media").mapInPandas(
        run, schema="asset_id long, frame_idx int"
    )


def dedup_assets(assets: DataFrame) -> DataFrame:
    """Content-hash dedup of media blobs → ``(content_sha256, keep_id,
    n_copies)`` — the decode-once-per-distinct-asset pattern."""
    meta = extract_media_meta(assets)
    return meta.groupBy("content_sha256").agg(
        F.min("asset_id").alias("keep_id"), F.count("*").alias("n_copies")
    )

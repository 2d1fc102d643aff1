"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata structs; all
transforms are Arrow-batched ``mapInPandas`` passes so the Spark-side
plumbing (schema, partitioning, batch shape, UDF signature) is real
and tested. ``decode_header`` dispatches on magic bytes: REAL formats
PNG / JPEG / BMP / GIF / WAV are decoded with pure-stdlib parsers
(``zlib`` + ``struct`` — no optional image/audio dependency needed for
metadata, and PNG decodes all the way to pixels), while the synthetic
``GMSM`` header stays the deterministic oracle path the DuckDB gate
reproduces. Anything else still raises ``NotImplementedError`` (real
video codecs need ffmpeg — inject a decoder).

At 100 TB the pattern is: keep blobs in their own column family /
parquet files (never shuffled with analytics columns), push metadata
extraction down to the first scan, and repartition by content hash so
replicated assets dedup before decode.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
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


# ------------------------------------------------------ real codecs
# Pure-stdlib header (and, for PNG, pixel) decoders. Dimension/frame
# semantics per kind: image → (width_px, height_px, 1); audio →
# (sample_rate_hz, n_channels, n_sample_frames).


def _decode_png(blob: bytes) -> tuple[str, int, int, int]:
    # IHDR is always the first chunk: length(4) 'IHDR' w(4) h(4) ...
    if blob[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w, h = struct.unpack_from(">II", blob, 16)
    return "image", w, h, 1


def _decode_jpeg(blob: bytes) -> tuple[str, int, int, int]:
    # walk markers to the first SOFn frame header (height, width)
    i = 2
    while i + 9 <= len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack_from(">H", blob, i + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack_from(">HH", blob, i + 5)
            return "image", w, h, 1
        i += 2 + seglen
    raise ValueError("JPEG missing SOF marker")


def _decode_bmp(blob: bytes) -> tuple[str, int, int, int]:
    w, h = struct.unpack_from("<ii", blob, 18)
    return "image", w, abs(h), 1  # negative height = top-down rows


def _decode_gif(blob: bytes) -> tuple[str, int, int, int]:
    w, h = struct.unpack_from("<HH", blob, 6)
    try:
        n = sum(1 for _ in _gif_walk(blob))
    except (ValueError, IndexError, struct.error):
        n = 1  # header-only / truncated: dimensions still valid
    if n > 1:
        return "video", w, h, n  # animated GIF = the multi-frame kind
    return "image", w, h, 1


def _decode_wav(blob: bytes) -> tuple[str, int, int, int]:
    # RIFF chunk walk: fmt → (channels, sample rate, block align);
    # data → size; frames = data size / block align
    if blob[8:12] != b"WAVE":
        raise ValueError("RIFF is not WAVE")
    pos, channels, rate, block_align, frames = 12, 0, 0, 0, 0
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        if cid == b"fmt ":
            channels, rate = struct.unpack_from("<HI", blob, pos + 10)
            block_align = struct.unpack_from("<H", blob, pos + 20)[0]
        elif cid == b"data" and block_align:
            frames = size // block_align
        pos += 8 + size + (size & 1)
    return "audio", rate, channels, frames


_CODECS = {
    b"\x89PNG": _decode_png,
    b"\xff\xd8": _decode_jpeg,
    b"BM": _decode_bmp,
    b"GIF8": _decode_gif,
    b"RIFF": _decode_wav,
}


def decode_header(blob: bytes) -> tuple[str, int, int, int]:
    """Magic-dispatch decoder → ``(kind, width, height, n_frames)``.

    Synthetic ``GMSM`` blobs are the deterministic oracle path; PNG /
    JPEG / BMP / GIF / WAV decode for real via the stdlib parsers
    above. Unknown formats raise — real deployments inject ffmpeg/PIL
    for the long tail (the reference keeps media decoding external
    too; this module owns the Spark plumbing)."""
    if blob[:4] == _MAGIC:
        _, kind, w, h, frames = _HDR.unpack_from(blob)
        return KINDS.get(kind, "unknown"), w, h, frames
    for magic, fn in _CODECS.items():
        if blob[: len(magic)] == magic:
            return fn(blob)
    raise NotImplementedError(
        "unrecognized media format; inject a decoder (ffmpeg/PIL) for "
        "codecs beyond PNG/JPEG/BMP/GIF/WAV"
    )


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


def synthesize_png_assets(docs: DataFrame) -> DataFrame:
    """``documents`` → ``(asset_id, media)`` where media is a REAL PNG
    (encoded by :func:`encode_png_gray`, decoded back by the real
    codec path). Pixels are the closed form ``(31r + 17c + k) % 256``
    with ``w = 8 + k%9, h = 8 + k%7`` so an independent SQL oracle can
    derive pixel statistics without touching bytes — the real-codec
    analogue of :func:`synthesize_assets`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(x) for x in pdf["doc_id"]]
            blobs = []
            for k in ids:
                w, h = 8 + k % 9, 8 + k % 7
                r = np.arange(h).reshape(-1, 1)
                c = np.arange(w).reshape(1, -1)
                blobs.append(
                    encode_png_gray(((31 * r + 17 * c + k) % 256))
                )
            yield pd.DataFrame({"asset_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(
        run, schema="asset_id long, media binary"
    )


# ------------------------------------------- PNG pixels (pure stdlib)


def encode_png_gray(pixels: "np.ndarray") -> bytes:
    """Minimal 8-bit grayscale PNG encoder (zlib + crc32) — produces
    REAL PNG bytes for tests and fixtures without Pillow."""
    h, w = pixels.shape
    raw = b"".join(
        b"\x00" + pixels[r].astype(np.uint8).tobytes() for r in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, no interlace
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_wav_pcm16(samples: "np.ndarray", rate: int = 16000) -> bytes:
    """Minimal mono PCM16 WAV encoder — REAL RIFF bytes for tests."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_png_gray(blob: bytes) -> "np.ndarray":
    """Full 8-bit grayscale PNG decode: inflate IDAT, undo all five
    scanline filters (None/Sub/Up/Average/Paeth) → (h, w) uint8."""
    if blob[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w, h = struct.unpack_from(">II", blob, 16)
    bit_depth, color_type = blob[24], blob[25]
    if (bit_depth, color_type) != (8, 0):
        raise NotImplementedError("pixel decode supports 8-bit grayscale")
    idat, pos = [], 8
    while pos + 8 <= len(blob):
        size = struct.unpack_from(">I", blob, pos)[0]
        tag = blob[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat.append(blob[pos + 8 : pos + 8 + size])
        pos += 12 + size
    raw = zlib.decompress(b"".join(idat))
    out = np.zeros((h, w), dtype=np.int32)
    stride = w + 1
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        ftype, cur = line[0], np.frombuffer(line[1:], np.uint8).astype(np.int32)
        up = out[r - 1] if r else np.zeros(w, np.int32)
        if ftype == 0:
            out[r] = cur
        elif ftype == 2:  # Up
            out[r] = (cur + up) & 0xFF
        else:  # Sub / Average / Paeth need the running left pixel
            left = 0
            row = out[r]
            for c in range(w):
                ul = up[c - 1] if c else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up[c]) // 2
                else:  # Paeth
                    p = left + up[c] - ul
                    pa, pb, pc = abs(p - left), abs(p - up[c]), abs(p - ul)
                    pred = (
                        left
                        if pa <= pb and pa <= pc
                        else (up[c] if pb <= pc else ul)
                    )
                left = row[c] = (cur[c] + pred) & 0xFF
    return out.astype(np.uint8)


def decode_wav_pcm16(blob: bytes) -> tuple[int, "np.ndarray"]:
    """Full mono PCM16 WAV decode → ``(sample_rate, int16 samples)`` —
    the audio analogue of :func:`decode_png_gray` (RIFF chunk walk,
    then the data payload reinterpreted little-endian)."""
    if blob[8:12] != b"WAVE":
        raise ValueError("RIFF is not WAVE")
    pos, rate, data = 12, 0, b""
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", blob, pos + 8)
            bits = struct.unpack_from("<H", blob, pos + 22)[0]
            if (fmt, channels, bits) != (1, 1, 16):
                raise NotImplementedError(
                    "sample decode supports mono PCM16"
                )
        elif cid == b"data":
            data = blob[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    return rate, np.frombuffer(data, "<i2")


def synthesize_wav_assets(docs: DataFrame) -> DataFrame:
    """``documents`` → ``(asset_id, media)`` where media is a REAL mono
    PCM16 WAV (encoded by :func:`encode_wav_pcm16`, decoded back by
    :func:`decode_wav_pcm16`). Samples are the closed form
    ``s_i = ((37k + 11i) % 4001) - 2000`` with ``n = 64 + k%41`` and
    ``rate = 8000 + (k%3)*4000``, so an independent SQL oracle derives
    sample statistics arithmetically without touching bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(x) for x in pdf["doc_id"]]
            blobs = []
            for k in ids:
                n = 64 + k % 41
                i = np.arange(n, dtype=np.int64)
                s = ((37 * k + 11 * i) % 4001) - 2000
                blobs.append(
                    encode_wav_pcm16(
                        s.astype(np.int16), rate=8000 + (k % 3) * 4000
                    )
                )
            yield pd.DataFrame({"asset_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(
        run, schema="asset_id long, media binary"
    )


def audio_sample_stats(assets: DataFrame) -> DataFrame:
    """REAL decode-to-samples feature extraction for WAV blobs → one
    row per asset ``(asset_id, sample_rate, n_samples, sum_abs,
    max_abs, n_positive)`` — all exact integers, so the SQL oracle can
    re-derive them from the closed-form sample generator. Non-RIFF
    blobs are skipped. Same Arrow batch shape as
    :func:`image_pixel_stats`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                b = bytes(blob)
                if b[:4] != b"RIFF":
                    continue
                rate, s = decode_wav_pcm16(b)
                a = np.abs(s.astype(np.int64))
                recs.append(
                    (
                        int(aid),
                        rate,
                        int(s.size),
                        int(a.sum()),
                        int(a.max()) if s.size else 0,
                        int((s > 0).sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "sample_rate", "n_samples", "sum_abs",
                    "max_abs", "n_positive",
                ],
            )

    return assets.select("asset_id", "media").mapInPandas(
        run,
        schema="asset_id long, sample_rate int, n_samples int, "
        "sum_abs bigint, max_abs int, n_positive bigint",
    )


def image_pixel_stats(assets: DataFrame) -> DataFrame:
    """REAL decode-to-pixels feature extraction for PNG blobs → one row
    per image ``(asset_id, width, height, px_mean_bp, px_nonzero)``
    (mean gray level in basis points of 255 — integer-stable). Non-PNG
    blobs pass through the header decoder only and are skipped. The
    Arrow batch shape is identical to ``extract_media_meta`` — this is
    the codec step that used to be stubbed, now real for PNG."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                b = bytes(blob)
                if b[:4] != b"\x89PNG":
                    continue
                px = decode_png_gray(b)
                # integer-stable: bp = sum * 10000 // (255 * n) — floor
                # division an independent SQL oracle reproduces exactly
                recs.append(
                    (
                        int(aid),
                        px.shape[1],
                        px.shape[0],
                        int(px.sum()) * 10_000 // (255 * px.size),
                        int((px > 0).sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "width", "height", "px_mean_bp", "px_nonzero",
                ],
            )

    return assets.select("asset_id", "media").mapInPandas(
        run,
        schema="asset_id long, width int, height int, px_mean_bp int, "
        "px_nonzero long",
    )


def dedup_assets(assets: DataFrame) -> DataFrame:
    """Content-hash dedup of media blobs → ``(content_sha256, keep_id,
    n_copies)`` — the decode-once-per-distinct-asset pattern."""
    meta = extract_media_meta(assets)
    return meta.groupBy("content_sha256").agg(
        F.min("asset_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


# --------------------------------- baseline JPEG gray (pure stdlib)
#
# Full ITU-T T.81 baseline codec for 8-bit grayscale: the encoder is
# the fixture path (DCT -> Annex-K quantization -> zigzag -> DC-diff +
# run-length Huffman with the standard Annex-K luminance tables ->
# byte-stuffed entropy stream), the decoder walks DQT/SOF0/DHT/SOS,
# rebuilds the canonical Huffman codes, entropy-decodes, dequantizes
# and inverse-DCTs. Completes the real-codec set next to PNG
# (decode_png_gray) and WAV (decode_wav_pcm16).

_JPEG_QTAB = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# zigzag scan: _JPEG_ZZ[i] = natural (row-major) index of the i-th
# zigzag coefficient
def _jpeg_zigzag() -> "np.ndarray":
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 else rc[0],
        ),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_JPEG_ZZ = _jpeg_zigzag()

# Annex K.3 standard luminance Huffman specs: (bits[1..16], values)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman assignment → {symbol: (code, length)}."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _dct_c() -> "np.ndarray":
    x = np.arange(8, dtype=np.float64)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    c[0, :] /= np.sqrt(2)
    return c  # F = C f C^T ; f = C^T F C


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1-bits
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding → (category, value-bits)."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg_gray(pixels: "np.ndarray") -> bytes:
    """Grayscale uint8 image → REAL baseline JPEG bytes (SOI, DQT,
    SOF0, 2×DHT, SOS, entropy scan, EOI; Annex-K tables, no
    subsampling). Edge-replicates to 8×8 blocks like every real
    encoder."""
    px = np.asarray(pixels, dtype=np.float64)
    h, w = px.shape
    ph, pw = -h % 8, -w % 8
    px = np.pad(px, ((0, ph), (0, pw)), mode="edge")
    c = _dct_c()
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for br in range(0, px.shape[0], 8):
        for bc in range(0, px.shape[1], 8):
            f = c @ (px[br : br + 8, bc : bc + 8] - 128.0) @ c.T
            # quantizer spec: half-up with a 1e-9 tie guard — integer
            # pixel blocks can land DCT/Q exactly on .5, where
            # np.round's banker's tie-break is fp-jitter-unstable
            # across DCT implementations
            ratio = f / _JPEG_QTAB
            q = np.floor(np.abs(ratio) + 0.5 + 1e-9).astype(
                np.int64
            ) * np.sign(ratio).astype(np.int64)
            zz = q.reshape(-1)[_JPEG_ZZ]
            s, mag = _magnitude(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
            bw.put(*dc_codes[s])
            if s:
                bw.put(mag, s)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac_codes[0xF0])  # ZRL
                    run -= 16
                s, mag = _magnitude(v)
                bw.put(*ac_codes[(run << 4) | s])
                bw.put(mag, s)
                run = 0
            if run:
                bw.put(*ac_codes[0x00])  # EOB

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(
        0xDB,
        b"\x00" + bytes(int(x) for x in _JPEG_QTAB.reshape(-1)[_JPEG_ZZ]),
    )
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS),
    ) + seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bw.flush() + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if not self.n:
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(r: int, s: int) -> int:
    return r if s == 0 or r >= (1 << (s - 1)) else r - (1 << s) + 1


def decode_jpeg_gray(blob: bytes) -> "np.ndarray":
    """Full baseline JPEG grayscale decode → uint8 pixel array:
    marker walk, canonical Huffman rebuild from DHT, entropy decode
    (DC differences + AC run-lengths, byte-unstuffing), dequantize,
    inverse DCT, level shift. Single-component scans only (the
    grayscale analogue of :func:`decode_png_gray`)."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    i, qtab, huffs, dims, scan = 2, None, {}, None, None
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack_from(">H", blob, i + 2)[0]
        body = blob[i + 4 : i + 2 + seglen]
        if marker == 0xDB:
            if body[0] & 0x0F == 0:
                nat = np.zeros(64, dtype=np.int64)
                nat[_JPEG_ZZ] = np.frombuffer(
                    body[1:65], dtype=np.uint8
                ).astype(np.int64)
                qtab = nat.reshape(8, 8)
        elif marker == 0xC4:
            pos = 0
            while pos < len(body):
                tcth = body[pos]
                bits = list(body[pos + 1 : pos + 17])
                nv = sum(bits)
                vals = list(body[pos + 17 : pos + 17 + nv])
                codes = _huff_codes(bits, vals)
                huffs[tcth] = {
                    (code, ln): sym for sym, (code, ln) in codes.items()
                }
                pos += 17 + nv
        elif marker == 0xC0:
            _, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if nc != 1:
                raise NotImplementedError(
                    "pixel decode supports 1-component baseline JPEG"
                )
            dims = (h, w)
        elif marker == 0xC1 or (0xC2 <= marker <= 0xCF and marker != 0xC4):
            raise NotImplementedError("baseline (SOF0) JPEG only")
        elif marker == 0xDA:
            # entropy scan follows the SOS header; unstuff to EOI
            raw = bytearray()
            j = i + 2 + seglen
            while j < len(blob):
                b = blob[j]
                if b == 0xFF:
                    nxt = blob[j + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        j += 2
                        continue
                    break  # EOI or next marker
                raw.append(b)
                j += 1
            scan = bytes(raw)
            break
        i += 2 + seglen
    if qtab is None or dims is None or scan is None:
        raise ValueError("JPEG missing DQT/SOF0/SOS")

    def read_sym(br: _BitReader, table: dict) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.bit()
            ln += 1
            if (code, ln) in table:
                return table[(code, ln)]
        raise ValueError("invalid Huffman code")

    h, w = dims
    bh, bw_ = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.zeros((bh, bw_), dtype=np.float64)
    c = _dct_c()
    br = _BitReader(scan)
    dc_tab, ac_tab = huffs[0x00], huffs[0x10]
    dc = 0
    for rr in range(0, bh, 8):
        for cc in range(0, bw_, 8):
            zz = np.zeros(64, dtype=np.int64)
            s = read_sym(br, dc_tab)
            dc += _extend(br.bits(s), s)
            zz[0] = dc
            k = 1
            while k < 64:
                sym = read_sym(br, ac_tab)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                size = sym & 0x0F
                zz[k] = _extend(br.bits(size), size)
                k += 1
            coef = np.zeros(64, dtype=np.int64)
            coef[_JPEG_ZZ] = zz
            f = (coef.reshape(8, 8) * qtab).astype(np.float64)
            out[rr : rr + 8, cc : cc + 8] = c.T @ f @ c + 128.0
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


def synthesize_jpeg_assets(docs: DataFrame) -> DataFrame:
    """``documents`` → ``(asset_id, media)`` where media is a REAL
    baseline JPEG. Every 8×8 block is constant with an EVEN offset
    from 128 (``c_b = 128 + 2·(((37k + 11b) % 64) − 32)``, blocks
    row-major, ``w = 8·(2 + k%3)``, ``h = 8·(2 + k%2)``), so the
    quantized stream is DC-only and the decode is bit-exact — an
    independent SQL oracle derives pixel statistics from the closed
    form while the decoder still runs the full marker/Huffman/
    dequant/IDCT path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(x) for x in pdf["doc_id"]]
            blobs = []
            for k in ids:
                w, h = 8 * (2 + k % 3), 8 * (2 + k % 2)
                b = np.arange((h // 8) * (w // 8), dtype=np.int64)
                vals = 128 + 2 * ((37 * k + 11 * b) % 64 - 32)
                px = np.kron(
                    vals.reshape(h // 8, w // 8), np.ones((8, 8), np.int64)
                ).astype(np.uint8)
                blobs.append(encode_jpeg_gray(px))
            yield pd.DataFrame({"asset_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(
        run, schema="asset_id long, media binary"
    )


def jpeg_pixel_stats(assets: DataFrame) -> DataFrame:
    """REAL decode-to-pixels feature extraction for baseline JPEG →
    ``(asset_id, width, height, px_sum, px_min, px_max)`` per image
    (exact integers). Non-JPEG blobs are skipped. Same Arrow batch
    shape as :func:`image_pixel_stats`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                b = bytes(blob)
                if b[:2] != b"\xff\xd8":
                    continue
                px = decode_jpeg_gray(b).astype(np.int64)
                recs.append(
                    (
                        int(aid),
                        px.shape[1],
                        px.shape[0],
                        int(px.sum()),
                        int(px.min()),
                        int(px.max()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "width", "height", "px_sum", "px_min",
                    "px_max",
                ],
            )

    return assets.select("asset_id", "media").mapInPandas(
        run,
        schema="asset_id long, width int, height int, px_sum bigint, "
        "px_min int, px_max int",
    )


# ------------------------------- animated GIF frames (pure stdlib)
#
# Real GIF89a container + real variable-width LSB-first LZW: the
# encoder is the fixture path (grayscale global palette, one Graphic
# Control Extension + Image Descriptor + compressed index stream per
# frame), the decoder walks the block structure and inflates every
# frame's palette indices. Completes the VIDEO analogue of the
# PNG/JPEG/WAV real-codec set — frame_sample-style operators get an
# actual multi-frame byte format to decode.


def _lzw_encode_gif(data: bytes, mcs: int = 8) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    acc = nacc = 0
    width = mcs + 1
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(1 << mcs)}
    nxt = eoi + 1
    emit(clear)
    s = b""
    for byte in data:
        t = s + bytes([byte])
        if t in table:
            s = t
            continue
        emit(table[s])
        table[t] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        elif nxt == 4097:
            emit(clear)
            table = {bytes([i]): i for i in range(1 << mcs)}
            nxt = eoi + 1
            width = mcs + 1
        s = bytes([byte])
    if s:
        emit(table[s])
    emit(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, mcs: int = 8) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    acc = nacc = pos = 0
    width = mcs + 1

    def read() -> int:
        nonlocal acc, nacc, pos
        while nacc < width:
            if pos >= len(data):
                return eoi
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        return v

    base = {i: bytes([i]) for i in range(1 << mcs)}
    table = dict(base)
    nxt = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    while True:
        code = read()
        if code == eoi:
            break
        if code == clear:
            table = dict(base)
            nxt = eoi + 1
            width = mcs + 1
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == nxt:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and nxt < 4096:
            table[nxt] = prev + entry[:1]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out)


def encode_gif_frames(frames: "list[np.ndarray]") -> bytes:
    """Stack of uint8 index arrays (same shape) → REAL animated GIF89a
    bytes: grayscale global palette, one Graphic Control Extension +
    Image Descriptor + LZW-compressed index stream per frame."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # 256-entry GCT
    for i in range(256):
        out += bytes((i, i, i))
    for fr in frames:
        out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # GCE, 10cs delay
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW min code size
        comp = _lzw_encode_gif(np.asarray(fr, np.uint8).tobytes())
        for pos in range(0, len(comp), 255):
            chunk = comp[pos : pos + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _gif_walk(blob: bytes):
    """Yield ``(left, top, w, h, lzw_bytes)`` per frame (block walk
    shared by the frame decoder and the header frame-counter)."""
    if blob[:4] != b"GIF8":
        raise ValueError("not a GIF")
    sw, sh, packed = struct.unpack_from("<HHB", blob, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    while pos < len(blob):
        b = blob[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", blob, pos + 1)
            pos += 10
            if ipacked & 0x80:
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW min code size (always 8 here)
            data = bytearray()
            while blob[pos]:
                n = blob[pos]
                data += blob[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            yield left, top, w, h, bytes(data)
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")


def decode_gif_frames(blob: bytes) -> "list[np.ndarray]":
    """Full animated-GIF decode → list of uint8 palette-index arrays
    (full-frame images; interlace/local-palette variants are out of
    scope for the fixture path)."""
    return [
        np.frombuffer(_lzw_decode_gif(data), np.uint8).reshape(h, w)
        for _, _, w, h, data in _gif_walk(blob)
    ]


def synthesize_gif_assets(docs: DataFrame) -> DataFrame:
    """``documents`` → ``(asset_id, media)`` where media is a REAL
    animated GIF with ``nf = 2 + k%4`` frames of ``w = 8 + k%5,
    h = 8 + k%3`` and closed-form palette indices
    ``p(f, i) = (37k + 11f + 5i) % 256`` (i row-major), so the SQL
    oracle derives per-frame statistics arithmetically while the
    decoder runs the real LZW path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(x) for x in pdf["doc_id"]]
            blobs = []
            for k in ids:
                w, h, nf = 8 + k % 5, 8 + k % 3, 2 + k % 4
                i = np.arange(h * w, dtype=np.int64)
                frames = [
                    ((37 * k + 11 * f + 5 * i) % 256)
                    .astype(np.uint8)
                    .reshape(h, w)
                    for f in range(nf)
                ]
                blobs.append(encode_gif_frames(frames))
            yield pd.DataFrame({"asset_id": ids, "media": blobs})

    return docs.select("doc_id").mapInPandas(
        run, schema="asset_id long, media binary"
    )


def gif_frame_stats(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL decode-to-frames feature extraction: every ``every_n``-th
    frame of each GIF → ``(asset_id, frame_idx, width, height,
    idx_sum, idx_max)`` — the real-codec version of
    :func:`frame_sample` (sample + per-frame content stats in one
    Arrow pass). Non-GIF blobs are skipped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                b = bytes(blob)
                if b[:4] != b"GIF8":
                    continue
                for fi, fr in enumerate(decode_gif_frames(b)):
                    if fi % every_n:
                        continue
                    px = fr.astype(np.int64)
                    recs.append(
                        (
                            int(aid), fi, fr.shape[1], fr.shape[0],
                            int(px.sum()), int(px.max()),
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "asset_id", "frame_idx", "width", "height",
                    "idx_sum", "idx_max",
                ],
            )

    return assets.select("asset_id", "media").mapInPandas(
        run,
        schema="asset_id long, frame_idx int, width int, height int, "
        "idx_sum bigint, idx_max int",
    )

"""Round-5 additions: real media codecs (pure-stdlib PNG/JPEG/BMP/GIF/
WAV), PNG pixel decode, FSM canonical-parent invariants."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from graphminer_spark.multimodal import (
    decode_header,
    decode_png_gray,
    encode_png_gray,
    encode_wav_pcm16,
    extract_media_meta,
    image_pixel_stats,
    make_fake_media,
    synthesize_png_assets,
)


def _gradient(h, w, k=0):
    r = np.arange(h).reshape(-1, 1)
    c = np.arange(w).reshape(1, -1)
    return ((31 * r + 17 * c + k) % 256).astype(np.uint8)


# --------------------------------------------------- codec unit tests


def test_png_header_and_pixels_round_trip():
    px = _gradient(13, 21, k=5)
    blob = encode_png_gray(px)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"  # real PNG signature
    assert decode_header(blob) == ("image", 21, 13, 1)
    np.testing.assert_array_equal(decode_png_gray(blob), px)


def test_png_decode_all_five_filters():
    # hand-filter a known image with each scanline filter type and
    # check the decoder reconstructs it (encoder only emits type 0)
    px = _gradient(5, 7, k=3).astype(np.int32)
    lines = []
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = px[r]
        up = px[r - 1] if r else np.zeros(7, np.int32)
        enc = np.zeros(7, np.int32)
        for c in range(7):
            left = cur[c - 1] if c else 0
            ul = up[c - 1] if c else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up[c]
            elif ftype == 3:
                pred = (left + up[c]) // 2
            else:
                p = left + up[c] - ul
                pa, pb, pc = abs(p - left), abs(p - up[c]), abs(p - ul)
                pred = (
                    left if pa <= pb and pa <= pc else (up[c] if pb <= pc else ul)
                )
            enc[c] = (cur[c] - pred) & 0xFF
        lines.append(bytes([ftype]) + enc.astype(np.uint8).tobytes())

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(decode_png_gray(blob), px.astype(np.uint8))


def test_wav_header_real_riff_bytes():
    samples = (np.sin(np.linspace(0, 20, 800)) * 3000).astype(np.int16)
    blob = encode_wav_pcm16(samples, rate=16000)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    # audio semantics: (sample_rate, n_channels, n_sample_frames)
    assert decode_header(blob) == ("audio", 16000, 1, 800)


def test_jpeg_bmp_gif_headers():
    # minimal structurally-valid JPEG: SOI, APP0, SOF0 (h=48, w=64)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 48, 64) + b"\x01" + b"\x01\x11\x00"
    )
    assert decode_header(jpeg) == ("image", 64, 48, 1)
    bmp = b"BM" + bytes(16) + struct.pack("<ii", 320, -200) + bytes(20)
    assert decode_header(bmp) == ("image", 320, 200, 1)
    gif = b"GIF89a" + struct.pack("<HH", 99, 44) + bytes(10)
    assert decode_header(gif) == ("image", 99, 44, 1)


def test_unknown_format_still_raises():
    with pytest.raises(NotImplementedError):
        decode_header(b"\x00\x01\x02\x03 not a known codec")


# ------------------------------------------------ Spark-side plumbing


def test_extract_media_meta_mixed_real_and_synthetic(spark):
    png = encode_png_gray(_gradient(9, 11))
    wav = encode_wav_pcm16(np.zeros(123, np.int16), rate=8000)
    fake = make_fake_media(7, 2, 10, 12, 6)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(wav)), (3, bytearray(fake))],
        "asset_id long, media binary",
    )
    got = {
        r["asset_id"]: (r["kind"], r["width"], r["height"], r["n_frames"])
        for r in extract_media_meta(df).collect()
    }
    assert got[1] == ("image", 11, 9, 1)
    assert got[2] == ("audio", 8000, 1, 123)
    assert got[3] == ("video", 10, 12, 6)


def test_image_pixel_stats_matches_numpy(spark):
    docs = spark.createDataFrame([(k,) for k in range(40)], "doc_id long")
    got = {
        r["asset_id"]: r
        for r in image_pixel_stats(synthesize_png_assets(docs)).collect()
    }
    assert len(got) == 40
    for k in (0, 7, 13, 39):
        w, h = 8 + k % 9, 8 + k % 7
        px = _gradient(h, w, k)
        r = got[k]
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_mean_bp"] == int(px.sum(dtype=np.int64)) * 10_000 // (
            255 * px.size
        )
        assert r["px_nonzero"] == int((px > 0).sum())


# ------------------------------------- estimator variance + IVF recall


def test_estimator_variance_drop_and_ci():
    """R-averaged color-coding estimates have lower squared error than
    single colorings (the variance-reduction claim, measured), and
    estimate_ci's stderr is exactly sample-stddev / sqrt(R).

    Deterministic end to end: colors are md5-derived, the graph is a
    fixed seeded random graph, and every estimate is exact-integer."""
    import random

    from tests.conftest import edges_df  # reuse the canonical builder
    from graphminer_spark.algorithms.approx import (
        colorful_path_count_dp,
        estimate_ci,
    )
    from graphminer_spark.graph.build import symmetrize
    from graphminer_spark.session import get_spark

    spark = get_spark("graphminer-tests", cores=8, shuffle_partitions=8)
    rng = random.Random(41)
    edges = {(rng.randrange(40), rng.randrange(40)) for _ in range(150)}
    canon = sorted({(min(a, b), max(a, b)) for a, b in edges if a != b})
    adj: dict[int, set[int]] = {}
    for a, b in canon:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    # exact simple-4-path count (unordered) by backtracking
    exact = 0
    stack = [(v,) for v in adj]
    while stack:
        walk = stack.pop()
        if len(walk) == 4:
            exact += walk[0] < walk[-1]
            continue
        stack.extend(
            walk + (nxt,) for nxt in adj[walk[-1]] if nxt not in walk
        )

    R = 12
    sym = symmetrize(edges_df(spark, canon), dedup=False)
    rows = sorted(
        colorful_path_count_dp(
            sym, k=4, n_colorings=R, per_coloring=True
        ).collect(),
        key=lambda r: r["r"],
    )
    assert len(rows) == R
    singles = [int(r["est_paths"]) for r in rows]

    # estimate_ci: mean + stderr = stddev/sqrt(R), exactly
    mean, stderr = estimate_ci(rows)
    assert mean == sum(singles) // R
    mu = sum(singles) / R
    var = sum((x - mu) ** 2 for x in singles) / (R - 1)
    assert stderr == pytest.approx((var / R) ** 0.5)

    # empirical variance drop: MSE of 4-averaged groups < MSE of
    # individual colorings (both against the exact count)
    groups = [sum(singles[i : i + 4]) / 4 for i in range(0, R, 4)]
    mse_single = sum((x - exact) ** 2 for x in singles) / R
    mse_avg = sum((g - exact) ** 2 for g in groups) / len(groups)
    assert mse_avg < mse_single


def test_ivf_trained_quantizer_improves_recall():
    """Lloyd's-trained coarse quantizer beats the first-n init on
    recall@5 vs exact brute force (sf0.01 embeddings, 500 vectors).
    Measured this round: 0.483 (train_iters=0) -> 0.576 (train_iters=2).
    Deterministic: fixed-point integer k-means, no RNG anywhere."""
    import pyspark.sql.functions as F

    from graphminer_spark.session import get_spark
    from graphminer_spark.similarity import ivf_ann, knn_bruteforce

    spark = get_spark("graphminer-tests", cores=8, shuffle_partitions=8)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in knn_bruteforce(emb, q, k=5).collect()
    }

    def recall(train_iters):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_ann(emb, k=5, train_iters=train_iters).collect()
        }
        return len(got & truth) / len(truth)

    r0, r2 = recall(0), recall(2)
    assert r2 > r0 + 0.05  # trained beats first-n by a real margin
    assert r2 > 0.55


def test_tc2d_chunked_wedge_kernel(spark, monkeypatch):
    """ADVICE r04: the block-local kernel must not materialize the full
    wedge list — force a tiny chunk budget and assert the count is
    unchanged (chunking is a memory strategy, never a semantics one)."""
    import random

    import graphminer_spark.graph.partition2d as p2
    from tests.conftest import edges_df
    from graphminer_spark.algorithms.triangles import triangle_count
    from graphminer_spark.graph.build import build_dag, symmetrize

    rng = random.Random(7)
    # one hub (vertex 0) with high degree to exercise hub-splitting
    edges = {(0, v) for v in range(1, 30)} | {
        (rng.randrange(30), rng.randrange(30)) for _ in range(120)
    }
    dag = build_dag(symmetrize(edges_df(spark, edges), dedup=False))
    exact = triangle_count(dag).collect()[0][0]
    monkeypatch.setattr(p2, "_WEDGE_CHUNK", 16)
    assert p2.triangle_count_2d(dag, nc=3).collect()[0][0] == exact


def test_auto_nc_constraints_and_agreement(spark):
    """nc auto-pick: both constraints hold at representative scales,
    and triangle_count_2d(nc=None) agrees with the explicit-nc path."""
    import random

    from graphminer_spark.graph.partition2d import auto_nc, triangle_count_2d
    from tests.conftest import edges_df
    from graphminer_spark.algorithms.triangles import triangle_count
    from graphminer_spark.graph.build import build_dag, symmetrize

    for n_edges in (10_000, 600_000, 48_000_000, 10**12):
        for par in (8, 32, 1000):
            nc = auto_nc(n_edges, par)
            assert 3 <= nc <= 64
            # memory bound (unless capped), parallelism bound (ditto)
            if nc < 64:
                assert 6 * n_edges <= 2_000_000 * nc * nc
                assert nc * (nc - 1) * (nc - 2) >= 24 * par
    # monotone in |E|: more edges never picks a smaller nc
    ncs = [auto_nc(m, 32) for m in (10**4, 10**6, 10**8, 10**10)]
    assert ncs == sorted(ncs)

    rng = random.Random(11)
    edges = {(rng.randrange(40), rng.randrange(40)) for _ in range(200)}
    dag = build_dag(symmetrize(edges_df(spark, edges), dedup=False))
    exact = triangle_count(dag).collect()[0][0]
    assert triangle_count_2d(dag, nc=None).collect()[0][0] == exact


def test_forced_skew_split_restores_conf(spark):
    """The skew-split context forces its three confs inside and
    restores the prior state (set or unset) on exit, even on error."""
    from graphminer_spark.algorithms.triangles import (
        _SKEW_FORCE_CONF,
        forced_skew_split,
    )

    key = "spark.sql.adaptive.forceOptimizeSkewedJoin"
    spark.conf.set(key, "false")  # pre-existing value must come back
    before = {k: spark.conf.get(k) for k in _SKEW_FORCE_CONF}
    with forced_skew_split(spark):
        for k, v in _SKEW_FORCE_CONF.items():
            assert spark.conf.get(k) == v
    assert {k: spark.conf.get(k) for k in _SKEW_FORCE_CONF} == before
    spark.conf.unset(key)
    # restore must also run on error paths (finally semantics)
    try:
        with forced_skew_split(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    for k in _SKEW_FORCE_CONF:
        assert spark.conf.get(k) != _SKEW_FORCE_CONF[k] or k == key


def test_wav_decode_to_samples_round_trip():
    """REAL audio codec path: PCM16 samples encode → RIFF bytes →
    decode back bit-exact, including negative values and odd counts."""
    from graphminer_spark.multimodal import decode_wav_pcm16, encode_wav_pcm16

    s = (((37 * 5 + 11 * np.arange(77)) % 4001) - 2000).astype(np.int16)
    rate, got = decode_wav_pcm16(encode_wav_pcm16(s, rate=12000))
    assert rate == 12000
    np.testing.assert_array_equal(got, s)


def test_audio_sample_stats_matches_numpy(spark):
    from graphminer_spark.multimodal import (
        audio_sample_stats,
        synthesize_wav_assets,
    )

    docs = spark.createDataFrame([(k,) for k in range(30)], "doc_id long")
    got = {
        r["asset_id"]: r
        for r in audio_sample_stats(synthesize_wav_assets(docs)).collect()
    }
    assert len(got) == 30
    for k in (0, 3, 29):
        n = 64 + k % 41
        s = ((37 * k + 11 * np.arange(n, dtype=np.int64)) % 4001) - 2000
        r = got[k]
        assert r["sample_rate"] == 8000 + (k % 3) * 4000
        assert r["n_samples"] == n
        assert r["sum_abs"] == int(np.abs(s).sum())
        assert r["max_abs"] == int(np.abs(s).max())
        assert r["n_positive"] == int((s > 0).sum())


# ------------------------------------------- SemDeDup semantic dedup


def test_semantic_dedup_matches_numpy_transcription(spark):
    """Independent numpy transcription of the full SemDeDup pipeline
    (fixed-point Lloyd's k-means, greedy centroid-distance order,
    τ-threshold drop) on a corpus with PLANTED exact duplicates —
    every duplicate chain must keep exactly its most-central member."""
    from graphminer_spark.similarity import semantic_dedup

    rows, dim, scale = 40, 4, 10_000
    # period-31 generator: no accidental duplicates among i = 0..29
    vecs = [
        [(((17 * i + 7 * j + 5 * i * j) % 31) - 15) / 15.0 for j in range(dim)]
        for i in range(30)
    ]
    vecs += [list(vecs[i]) for i in (0, 3, 3, 7, 11, 11, 11, 20, 25, 28)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cid"], r["keep"])
        for r in semantic_dedup(
            df, n_clusters=4, tau=0.999999, train_iters=2
        ).collect()
    }
    assert len(got) == rows

    # ---- numpy replay (float32 cast first, like the parquet column)
    v = np.array(vecs, dtype=np.float32).astype(np.float64)
    q = np.round(v * scale).astype(np.int64)
    cents = q[:4].copy()
    for _ in range(2):
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin ties -> lowest cid, same
        for c in range(4):
            members = q[assign == c]
            if len(members):
                cents[c] = np.floor(
                    members.sum(axis=0) / len(members)
                ).astype(np.int64)
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d.argmin(axis=1)
    dist = d[np.arange(rows), assign]
    keep = np.ones(rows, dtype=int)
    for c in range(4):
        ids = sorted(np.where(assign == c)[0], key=lambda i: (dist[i], i))
        for pos, i in enumerate(ids):
            for j in ids[:pos]:
                sim = round(
                    float(v[i] @ v[j])
                    / (np.linalg.norm(v[i]) * np.linalg.norm(v[j])),
                    6,
                )
                if sim >= 0.999999:
                    keep[i] = 0
                    break
    for i in range(rows):
        assert got[i] == (assign[i], keep[i]), f"vec {i}"
    # sanity: every planted chain lost members, none lost all
    assert keep.sum() < rows
    for orig in (0, 3, 7, 11, 20, 25, 28):
        chain = [orig] + [
            30 + k
            for k, src in enumerate((0, 3, 3, 7, 11, 11, 11, 20, 25, 28))
            if src == orig
        ]
        assert sum(keep[i] for i in chain) == 1, f"chain {chain}"


# -------------------------------------- deterministic doc samplers


def test_samplers_deterministic_across_partitioning(spark):
    """Membership must be identical however the input is partitioned
    (stage-retry / cluster-size independence), mixture rates must
    track rates_bp, and the reservoir is exactly-n per stratum."""
    import pyspark.sql.functions as F

    from graphminer_spark.textops.sampling import (
        per_stratum_sample,
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)],
        "doc_id long, lang string",
    )
    rates = {"en": 5000, "de": 2500}

    def strat_ids(df):
        return sorted(
            r["doc_id"]
            for r in stratified_sample(df, rates, default_bp=1000).collect()
        )

    a = strat_ids(docs)
    b = strat_ids(docs.repartition(17, "lang"))
    assert a == b and len(a) > 0
    got = {
        r["lang"]: r["n"]
        for r in stratified_sample(docs, rates, default_bp=1000)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 1000 docs/stratum: expected ~500/250/100, binomial 4-sigma bands
    assert 400 < got["en"] < 600
    assert 180 < got["de"] < 320
    assert 60 < got.get("fr", 0) < 140

    def res_ids(df):
        return sorted(
            (r["lang"], r["sample_rank"], r["doc_id"])
            for r in per_stratum_sample(df, n=7).collect()
        )

    ra = res_ids(docs)
    rb = res_ids(docs.repartition(31))
    assert ra == rb and len(ra) == 21  # exactly 7 per stratum


# -------------------------------------------- baseline JPEG codec


def _jpeg_reference_reconstruct(px):
    """Independent transcription of the baseline pipeline: explicit
    cosine-sum DCT per block, Annex-K quantize/dequantize, explicit
    cosine-sum IDCT — no shared matrix helper with the codec."""
    import math

    from graphminer_spark.multimodal import _JPEG_QTAB

    h, w = px.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(px.astype(np.float64), ((0, ph), (0, pw)), mode="edge")
    out = np.zeros_like(p)

    def alpha(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    for br in range(0, p.shape[0], 8):
        for bc in range(0, p.shape[1], 8):
            f = p[br : br + 8, bc : bc + 8] - 128.0
            F = np.zeros((8, 8))
            for u in range(8):
                for v in range(8):
                    acc = 0.0
                    for x in range(8):
                        for y in range(8):
                            acc += (
                                f[x, y]
                                * math.cos((2 * x + 1) * u * math.pi / 16)
                                * math.cos((2 * y + 1) * v * math.pi / 16)
                            )
                    F[u, v] = alpha(u) * alpha(v) * acc / 4
            ratio = F / _JPEG_QTAB
            q = (
                np.floor(np.abs(ratio) + 0.5 + 1e-9) * np.sign(ratio)
            ) * _JPEG_QTAB  # same half-up tie-guard spec as the codec
            r = np.zeros((8, 8))
            for x in range(8):
                for y in range(8):
                    acc = 0.0
                    for u in range(8):
                        for v in range(8):
                            acc += (
                                alpha(u)
                                * alpha(v)
                                * q[u, v]
                                * math.cos((2 * x + 1) * u * math.pi / 16)
                                * math.cos((2 * y + 1) * v * math.pi / 16)
                            )
                    r[x, y] = acc / 4 + 128.0
            out[br : br + 8, bc : bc + 8] = r
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


def test_jpeg_round_trip_matches_reference_pipeline():
    from graphminer_spark.multimodal import (
        decode_header,
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    px = _gradient(21, 19, k=9)  # exercises edge padding both axes
    blob = encode_jpeg_gray(px)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert decode_header(blob) == ("image", 19, 21, 1)
    np.testing.assert_array_equal(
        decode_jpeg_gray(blob), _jpeg_reference_reconstruct(px)
    )


def test_jpeg_dc_only_blocks_decode_bit_exact():
    from graphminer_spark.multimodal import decode_jpeg_gray, encode_jpeg_gray

    vals = 128 + 2 * (np.arange(12).reshape(3, 4) * 7 % 64 - 32)
    px = np.kron(vals, np.ones((8, 8), np.int64)).astype(np.uint8)
    np.testing.assert_array_equal(decode_jpeg_gray(encode_jpeg_gray(px)), px)


def test_jpeg_pixel_stats_matches_numpy(spark):
    from graphminer_spark.multimodal import (
        jpeg_pixel_stats,
        synthesize_jpeg_assets,
    )

    docs = spark.createDataFrame([(k,) for k in range(24)], "doc_id long")
    got = {
        r["asset_id"]: r
        for r in jpeg_pixel_stats(synthesize_jpeg_assets(docs)).collect()
    }
    assert len(got) == 24
    for k in (0, 5, 23):
        w, h = 8 * (2 + k % 3), 8 * (2 + k % 2)
        b = np.arange((h // 8) * (w // 8), dtype=np.int64)
        vals = 128 + 2 * ((37 * k + 11 * b) % 64 - 32)
        r = got[k]
        assert (r["width"], r["height"]) == (w, h)
        assert r["px_sum"] == int(vals.sum()) * 64
        assert r["px_min"] == int(vals.min())
        assert r["px_max"] == int(vals.max())


# --------------------------------------------- animated GIF (LZW)


def test_gif_lzw_round_trip_and_width_growth():
    from graphminer_spark.multimodal import _lzw_decode_gif, _lzw_encode_gif

    # varied stream forces 9->12-bit code growth and a 4096 reset
    data = bytes((i * 7 + (i >> 3)) % 256 for i in range(30000))
    assert _lzw_decode_gif(_lzw_encode_gif(data)) == data
    comp = _lzw_encode_gif(data)
    assert len(comp) < len(data)  # actually compresses


def test_gif_animated_round_trip_and_header():
    from graphminer_spark.multimodal import (
        decode_gif_frames,
        decode_header,
        encode_gif_frames,
    )

    frames = [_gradient(10, 14, k=f) for f in range(5)]
    blob = encode_gif_frames(frames)
    assert blob[:6] == b"GIF89a" and blob[-1] == 0x3B
    # multi-frame GIF reports as the video kind with a real frame count
    assert decode_header(blob) == ("video", 14, 10, 5)
    got = decode_gif_frames(blob)
    assert len(got) == 5
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)
    # single-frame stays an image
    single = encode_gif_frames([_gradient(6, 7)])
    assert decode_header(single) == ("image", 7, 6, 1)


def test_gif_frame_stats_matches_numpy(spark):
    from graphminer_spark.multimodal import (
        gif_frame_stats,
        synthesize_gif_assets,
    )

    docs = spark.createDataFrame([(k,) for k in range(30)], "doc_id long")
    got = {
        (r["asset_id"], r["frame_idx"]): r
        for r in gif_frame_stats(synthesize_gif_assets(docs)).collect()
    }
    for k in (0, 7, 29):
        w, h, nf = 8 + k % 5, 8 + k % 3, 2 + k % 4
        for f in range(0, nf, 2):
            i = np.arange(h * w, dtype=np.int64)
            v = (37 * k + 11 * f + 5 * i) % 256
            r = got[(k, f)]
            assert (r["width"], r["height"]) == (w, h)
            assert r["idx_sum"] == int(v.sum())
            assert r["idx_max"] == int(v.max())
        assert (k, 1) not in got  # odd frames sampled out


# ------------------------------------ trigram LM coverage scoring


def test_lm_coverage_matches_python_transcription(spark):
    from collections import Counter

    from graphminer_spark.textops.lm_score import (
        lm_coverage_score,
        train_trigram_model,
    )

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "zqx!!",          # out-of-distribution noise
        "ab",             # shorter than one trigram
        "the the the the",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    model = train_trigram_model(docs, top_k=5)
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["cov_bp"])
        for r in lm_coverage_score(docs, model).collect()
    }

    cnt = Counter()
    for t in texts:
        for i in range(len(t) - 2):
            cnt[t[i : i + 3]] += 1
    top = {
        g
        for g, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    }
    assert len(got) == len(texts)
    for d, t in enumerate(texts):
        grams = [t[i : i + 3] for i in range(max(len(t) - 2, 0))]
        hits = sum(g in top for g in grams)
        bp = hits * 10000 // len(grams) if grams else 0
        assert got[d] == (len(grams), hits, bp), f"doc {d}"
    assert got[2][2] < 2000  # noise scores near zero
    assert got[3] == (0, 0, 0)

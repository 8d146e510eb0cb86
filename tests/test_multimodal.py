"""Value-level checks for the multimodal operators: known-buffer decode /
resize / frame-sample / audio math, synthesis determinism, codec stub."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators import multimodal as MM
from parquetaivectorsearch_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _manual_media(spark, rows):
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_synth_media_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    a = {(r.media_id, r.kind, bytes(r.payload)) for r in MM.synth_media(docs).collect()}
    b = {(r.media_id, r.kind, bytes(r.payload)) for r in MM.synth_media(docs).collect()}
    assert a == b and len(a) == 60


def test_payload_length_matches_meta(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    m = MM.synth_media(docs)
    bad = m.filter(
        ((F.col("kind") == "image")
         & (F.octet_length("payload")
            != F.col("meta.width") * F.col("meta.height") * F.col("meta.channels")))
        | ((F.col("kind") == "video")
           & (F.octet_length("payload")
              != F.col("meta.width") * F.col("meta.height") * F.col("meta.channels")
              * F.col("meta.n_frames")))
    )
    assert bad.count() == 0


def test_resize_known_image(spark):
    # 4×4 single-channel gradient; nearest-neighbor 2×2 picks rows/cols 0,2
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    media = _manual_media(spark, [
        (1, "image", img.tobytes(), ("raw", 4, 4, 1, None, None)),
    ])
    out = MM.resize_images(media, out_w=2, out_h=2).collect()[0]
    got = np.frombuffer(bytes(out.payload), dtype=np.uint8).reshape(2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]
    assert out.meta.width == 2 and out.meta.height == 2


def test_frame_sample_known_video(spark):
    # 5 frames of 2×2, frame i filled with value i; every_k=2 → frames 0,2,4
    frames = np.stack([np.full((2, 2, 1), i, dtype=np.uint8) for i in range(5)])
    media = _manual_media(spark, [
        (7, "video", frames.tobytes(), ("raw", 2, 2, 1, None, 5)),
    ])
    rows = sorted(MM.sample_frames(media, every_k=2).collect(),
                  key=lambda r: r.frame_no)
    assert [r.frame_no for r in rows] == [0, 2, 4]
    assert all(
        np.frombuffer(bytes(r.payload), dtype=np.uint8).tolist() == [r.frame_no] * 4
        for r in rows
    )


def test_audio_features_known_pcm(spark):
    # alternating ±1000: rms = 1000, zcr = 1.0
    x = np.tile([1000, -1000], 500).astype(np.int16)
    media = _manual_media(spark, [
        (3, "audio", x.tobytes(), ("pcm16", None, None, 1, 8000, None)),
    ])
    r = MM.audio_features(media, frame_len=250).collect()[0]
    assert r.n_samples == 1000
    assert r.rms == pytest.approx(1000.0)
    assert r.zero_crossing_rate == pytest.approx(1.0)
    assert len(r.rms_envelope) == 4
    assert all(v == pytest.approx(1000.0) for v in r.rms_envelope)


def test_image_features_known_image(spark):
    img = np.zeros((4, 4, 1), dtype=np.uint8)
    img[0, 0, 0] = 255
    media = _manual_media(spark, [
        (9, "image", img.tobytes(), ("raw", 4, 4, 1, None, None)),
    ])
    r = MM.image_features(media).collect()[0]
    assert r.mean_px[0] == pytest.approx(255 / 16)
    assert r.histogram[0] == 15 and r.histogram[7] == 1


def test_compressed_decode_is_stubbed(spark):
    # video codecs remain the documented stub (png AND jpeg are real now)
    media = _manual_media(spark, [
        (2, "image", b"\x00\x00\x01\xb3", ("h264", 4, 4, 1, None, None)),
    ])
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        MM.image_features(media).collect()
    # a truncated JPEG is a malformed-payload error, not a stub
    bad = _manual_media(spark, [
        (3, "image", b"\xff\xd8\xff", ("jpeg", 4, 4, 1, None, None)),
    ])
    with pytest.raises(Exception, match="SOF0|SOS|JPEG"):
        MM.image_features(bad).collect()


def test_png_roundtrip_all_filters_and_channels():
    """png_decode must invert png_encode bit-exactly for every scanline
    filter type (0-4) and gray/gray+alpha/RGB/RGBA — exercising the full
    unfilter matrix of RFC 2083 §6."""
    rng = np.random.RandomState(11)
    for c in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(9, 7, c), dtype=np.uint8)
        for ftype in range(5):
            payload = MM.png_encode(img, filter_type=ftype)
            assert payload[:8] == b"\x89PNG\r\n\x1a\n"
            got = MM.png_decode(payload)
            assert got.shape == img.shape, (c, ftype)
            assert (got == img).all(), (c, ftype)


def test_png_decode_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        MM.png_decode(b"not a png at all----")


def test_image_features_over_png_payloads(spark):
    """image_features over format='png' payloads must equal the raw-tier
    features of the same pixels (VERDICT r6 item 8: the codec stub now
    covers only jpeg/video)."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(12, 10, 3), dtype=np.uint8)
    media = _manual_media(spark, [
        (1, "image", img.tobytes(), ("raw", 10, 12, 3, None, None)),
        (2, "image", MM.png_encode(img), ("png", 10, 12, 3, None, None)),
    ])
    feats = {r.media_id: r for r in MM.image_features(media).collect()}
    raw, png = feats[1], feats[2]
    assert list(png.mean_px) == list(raw.mean_px)
    assert list(png.std_px) == list(raw.std_px)
    assert list(png.histogram) == list(raw.histogram)


def test_resize_over_png_payloads(spark):
    img = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16, 1)
    media = _manual_media(spark, [
        (3, "image", MM.png_encode(img, filter_type=4),
         ("png", 16, 16, 1, None, None)),
    ])
    out = MM.resize_images(media, out_w=4, out_h=4).collect()[0]
    want = img[::4, ::4]
    assert np.frombuffer(out.payload, dtype=np.uint8).reshape(4, 4, 1).tolist() \
        == want.tolist()


def test_png_tier_features_match_raw_tier(spark):
    """The registered PNG pipeline (encode_png_tier → image_features) must
    produce bit-identical features to the raw tier for every synthetic
    image — distributed decode across all five filter types."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = MM.synth_media(docs)
    raw = {r.media_id: (list(r.mean_px), list(r.std_px), list(r.histogram))
           for r in MM.image_features(media).collect()}
    png_media = MM.encode_png_tier(media)
    kinds = {r.media_id: r.meta["format"]
             for r in png_media.filter(F.col("kind") == "image").collect()}
    assert kinds and all(v == "png" for v in kinds.values())
    png = {r.media_id: (list(r.mean_px), list(r.std_px), list(r.histogram))
           for r in MM.image_features(png_media).collect()}
    assert png == raw


def test_jpeg_roundtrip_error_bounds():
    """Baseline JPEG codec (operators/jpeg.py): encode→decode must stay
    within DCT-quantization error bounds — near-lossless at quality 100,
    bounded at 90 — for gray and RGB, including odd (non-multiple-of-8)
    dimensions that exercise edge-replication padding."""
    from parquetaivectorsearch_spark.operators import jpeg as J

    yy, xx = np.mgrid[0:41, 0:53]
    rgb = np.stack([(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256],
                   axis=-1).astype(np.uint8)
    gray = ((yy * 7 + xx * 3) % 256).astype(np.uint8)[:, :, None]
    for img in (rgb, gray):
        for q, bound in ((100, 2), (90, 25)):
            enc = J.jpeg_encode(img, quality=q)
            assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
            dec = J.jpeg_decode(enc)
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.max() <= bound, (img.shape, q, err.max())


def test_jpeg_stage_inverses():
    """Where exactness IS defined, pin it: orthonormal DCT (matrix ×
    transpose = I, float round trip), amplitude-category coding
    (EXTEND ∘ bits = id over the int16 coefficient range), and the
    Huffman code tables (prefix-free, decode table inverts code table)."""
    from parquetaivectorsearch_spark.operators import jpeg as J

    assert np.allclose(J._M @ J._M.T, np.eye(8), atol=1e-12)
    rng = np.random.RandomState(1)
    b = rng.randn(8, 8)
    assert np.allclose(J._M.T @ (J._M @ b @ J._M.T) @ J._M, b, atol=1e-10)
    for v in list(range(-255, 256)) + [-2047, 2047]:
        cat = J._category(v)
        assert J._extend(J._amplitude_bits(v, cat), cat) == v, v
    for spec in (J.DC_LUMA_SPEC, J.DC_CHROMA_SPEC,
                 J.AC_LUMA_SPEC, J.AC_CHROMA_SPEC):
        codes = J._build_codes(spec)
        table = J._decode_tables(spec)
        assert len(codes) == len(spec[1])
        for sym, (code, ln) in codes.items():
            assert table[(ln, code)] == sym
        # prefix-free: no code is a prefix of a longer one
        as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
        assert len(as_bits) == len(codes)
        for a in as_bits:
            for b2 in as_bits:
                if a != b2:
                    assert not b2.startswith(a)


def test_jpeg_decode_rejects_unsupported():
    from parquetaivectorsearch_spark.operators import jpeg as J

    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"not a jpeg")
    # progressive (SOF2) must be a scope error, not garbage output
    prog = bytearray(J.jpeg_encode(np.zeros((8, 8, 1), dtype=np.uint8)))
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="baseline"):
        J.jpeg_decode(bytes(prog))


def test_jpeg_tier_features_near_raw_tier(spark):
    """The registered JPEG pipeline (encode_jpeg_tier → image_features):
    distributed entropy-decode + IDCT on executors. Lossy by construction,
    so features are NEAR the raw tier's — mean/std within 2 px levels at
    quality 95 — never asserted bit-equal (that is the PNG twin's job)."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    media = MM.synth_media(docs)
    raw = {r.media_id: (list(r.mean_px), list(r.std_px))
           for r in MM.image_features(media).collect()}
    jm = MM.encode_jpeg_tier(media, quality=95)
    kinds = {r.media_id: r.meta["format"]
             for r in jm.filter(F.col("kind") == "image").collect()}
    assert kinds and all(v == "jpeg" for v in kinds.values())
    jpg = {r.media_id: (list(r.mean_px), list(r.std_px))
           for r in MM.image_features(jm).collect()}
    assert set(jpg) == set(raw)
    for mid in raw:
        for a, b in zip(raw[mid], jpg[mid]):
            assert np.allclose(a, b, atol=2.0), (mid, raw[mid], jpg[mid])


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn resync (T.81 E.1.4): every restart interval must byte-align
    the stream, emit the cycling RST marker, reset DC predictors — and
    decode back within the same error bound as the unsegmented stream."""
    from parquetaivectorsearch_spark.operators import jpeg as J

    yy, xx = np.mgrid[0:41, 0:53]  # 6×7 = 42 MCUs
    rgb = np.stack([(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256],
                   axis=-1).astype(np.uint8)
    base = np.abs(J.jpeg_decode(J.jpeg_encode(rgb, 95)).astype(int)
                  - rgb.astype(int)).max()
    for ri in (1, 3, 7):
        enc = J.jpeg_encode(rgb, quality=95, restart_interval=ri)
        assert any(enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
                   for i in range(len(enc) - 1))
        err = np.abs(J.jpeg_decode(enc).astype(int) - rgb.astype(int)).max()
        assert err <= base + 1, (ri, err, base)


def test_jpeg_subsampled_roundtrip():
    """4:2:0 / 4:2:2 decode (the camera/web shape, VERDICT r8 #5): the
    repo encoder synthesizes externally-shaped subsampled streams
    (MCU-interleaved multi-block data units, box-downsampled chroma) and
    the decoder must reconstruct them. Constant-chroma images make the
    subsample step lossless, so the round trip must match 4:4:4 exactly;
    smooth gradients stay within a few levels; odd dims exercise the
    MCU-alignment padding crop; restart intervals count MCUs, not
    blocks."""
    from parquetaivectorsearch_spark.operators import jpeg as J

    solid = np.full((50, 70, 3), [180, 40, 90], dtype=np.uint8)
    for sub in ("4:2:0", "4:2:2"):
        dec = J.jpeg_decode(J.jpeg_encode(solid, quality=95, subsampling=sub))
        assert np.abs(dec.astype(int) - solid.astype(int)).max() == 0, sub

    yy, xx = np.mgrid[0:41, 0:53]  # odd dims: crop both MCU axes
    grad = np.stack([np.clip(80 + xx, 0, 255), np.clip(60 + yy, 0, 255),
                     np.full_like(xx, 120)], axis=-1).astype(np.uint8)
    for sub in ("4:2:0", "4:2:2"):
        for ri in (0, 3):
            enc = J.jpeg_encode(grad, quality=95, subsampling=sub,
                                restart_interval=ri)
            # SOF0 sampling byte for component 1 reflects the mode
            sof = enc.find(b"\xff\xc0")
            assert enc[sof + 11] == (0x22 if sub == "4:2:0" else 0x21)
            dec = J.jpeg_decode(enc)
            assert dec.shape == grad.shape
            err = np.abs(dec.astype(int) - grad.astype(int)).max()
            assert err <= 6, (sub, ri, err)
    # bytes actually shrink vs 4:4:4 (the point of subsampling)
    noise = np.random.RandomState(3).randint(0, 256, (48, 48, 3), np.uint8)
    b444 = len(J.jpeg_encode(noise, 90))
    b420 = len(J.jpeg_encode(noise, 90, subsampling="4:2:0"))
    assert b420 < b444


def test_jpeg_sos_scan_order_mapped_by_id():
    """T.81 lets the SOS list components in any order; the decoder must
    map each scan component to its SOF entry BY ID (ADVICE r8: indexing
    by position silently dequantizes Cr with the luma table). A reversed
    scan order must decode identically to the standard order."""
    from parquetaivectorsearch_spark.operators import jpeg as J

    yy, xx = np.mgrid[0:24, 0:32]
    img = np.stack([(yy * 3) % 256, (xx * 5) % 256, ((yy + xx) * 2) % 256],
                   axis=-1).astype(np.uint8)
    normal = J.jpeg_encode(img, quality=95)
    reordered = J.jpeg_encode(img, quality=95, _scan_order=(2, 1, 0))
    assert normal != reordered  # genuinely different stream
    assert np.array_equal(J.jpeg_decode(normal), J.jpeg_decode(reordered))
    # unknown id in SOS is a hard error, not silence
    bad = bytearray(reordered)
    sos = bytes(bad).find(b"\xff\xda")
    bad[sos + 5] = 9  # first scan-component id -> undeclared
    with pytest.raises(ValueError, match="not declared"):
        J.jpeg_decode(bytes(bad))


def test_jpeg_roundtrip_property():
    """Property test: ANY uint8 image (random content, random small dims,
    gray or RGB, any quality ≥ 70, any restart interval) must survive
    encode→decode within a conservative per-pixel bound. Noise images are
    the DCT's WORST case — a q=70-scaled high-frequency quant step is
    ~73, each truncated coefficient spreads across the block, and chroma
    error is amplified ~1.77× by the YCbCr→RGB transform, so triple-digit
    per-pixel errors on noise are legitimate quantization behavior (a
    300-image sweep measured max 103 at q∈[70,100], 19 at q≥95). Bounds
    are 2× those sweeps; the invariant under test is structural (no
    crash, right shape, bounded error), not fidelity — fidelity on
    structured images is pinned by the ≤2-at-q≥95 tests above."""
    from hypothesis import given, settings, strategies as st

    from parquetaivectorsearch_spark.operators import jpeg as J

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(4, 24), w=st.integers(4, 24),
        c=st.sampled_from([1, 3]),
        q=st.integers(70, 100),
        ri=st.integers(0, 4),
        sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(h, w, c, q, ri, sub, seed):
        img = np.random.RandomState(seed).randint(
            0, 256, (h, w, c), dtype=np.uint8)
        dec = J.jpeg_decode(J.jpeg_encode(img, quality=q,
                                          restart_interval=ri,
                                          subsampling=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        bound = 40 if q >= 95 else 208
        if sub == "4:4:4" or c == 1:
            assert err.max() <= bound
        else:
            # subsampling box-averages noise chroma — per-pixel chroma
            # error on noise is unbounded short of the pixel range, but
            # LUMA stays full-resolution in every mode, so the
            # quantization bound still applies to the luma projection
            luma = lambda a: (0.299 * a[..., 0] + 0.587 * a[..., 1]
                              + 0.114 * a[..., 2])
            lerr = np.abs(luma(dec.astype(float)) - luma(img.astype(float)))
            assert lerr.max() <= bound

    check()


def test_phash_invariance_and_discrimination(spark):
    """pHash must land identical images at hamming 0, lightly-jittered
    copies within the dedup radius, brightness-shifted copies at ~0 (the
    median threshold absorbs global shifts), and independent random
    images far apart."""
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    jit = base.copy()
    mask = rng.random(base.shape[:2]) < 0.02           # 2% of pixels
    jit[mask] = rng.integers(0, 256, (int(mask.sum()), 3), dtype=np.uint8)
    bright = np.clip(base.astype(np.int16) + 25, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)

    def row(mid, img):
        h, w, c = img.shape
        return (mid, "image", img.tobytes(), ("raw", w, h, c, None, None))

    media = spark.createDataFrame(
        [row(0, base), row(1, base), row(2, jit), row(3, bright),
         row(4, other)], MM.MEDIA_SCHEMA)
    ph = {r.media_id: r.phash for r in MM.phash_images(media).collect()}
    ham = lambda a, b: bin((ph[a] ^ ph[b]) & (2**64 - 1)).count("1")  # noqa: E731
    assert ham(0, 1) == 0
    assert ham(0, 2) <= 10, ham(0, 2)
    assert ham(0, 3) <= 4, ham(0, 3)
    assert ham(0, 4) > 16, ham(0, 4)

    # blocking: the exact dup (hamming 0) MUST surface as a pair; the
    # unrelated image must not pass the radius filter
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in MM.phash_pairs(media, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0
    assert not any(4 in p for p in pairs)


def test_phash_pairs_unfiltered_reports_all_candidates(spark):
    """max_hamming=None returns every chunk-blocked candidate with its
    distance (the dedup_phash query splits blocking from the radius
    decision)."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8)

    def row(mid, img):
        h, w, c = img.shape
        return (mid, "image", img.tobytes(), ("raw", w, h, c, None, None))

    media = spark.createDataFrame([row(0, a), row(1, a)], MM.MEDIA_SCHEMA)
    allp = MM.phash_pairs(media, max_hamming=None).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in allp] == [(0, 1, 0)]


def test_audio_fingerprint_containment(spark):
    """Identical clips at containment 1.0; a 60% truncation still ≥ 0.95
    (its landmarks are a verbatim subset of the full clip's); an
    independent noise clip stays below 0.5."""
    rng = np.random.default_rng(3)
    a = rng.integers(-20000, 20000, 4000, dtype=np.int16)
    trunc = a[: int(len(a) * 0.6)]
    other = rng.integers(-20000, 20000, 4000, dtype=np.int16)

    def row(mid, pcm):
        return (mid, "audio", pcm.tobytes(), ("pcm16", None, None, 1, 8000,
                                              None))

    media = _manual_media(spark, [row(0, a), row(1, a.copy()),
                                  row(2, trunc), row(3, other)])
    pairs = {(p.id_a, p.id_b): p.containment
             for p in MM.audio_fp_matches(media, min_containment=0.0)
             .collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] >= 0.95, pairs[(0, 2)]
    assert pairs.get((0, 3), 0.0) < 0.5, pairs.get((0, 3))
    high = MM.audio_fp_matches(media, min_containment=0.8).collect()
    ids = {(p.id_a, p.id_b) for p in high}
    assert (0, 1) in ids and (0, 2) in ids and (0, 3) not in ids


def test_video_frame_hash_containment(spark):
    """A re-cut clip (subset of frames, shuffled order) must contain at
    1.0; an unrelated clip stays below 0.8; identical clips at 1.0."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (6, 12, 10, 1), dtype=np.uint8)
    recut = frames[[4, 1, 3]]                 # subset, different order
    other = rng.integers(0, 256, (6, 12, 10, 1), dtype=np.uint8)

    def row(mid, vid):
        f, h, w, c = vid.shape
        return (mid, "video", vid.tobytes(), ("raw", w, h, c, None, f))

    media = _manual_media(spark, [row(0, frames), row(1, frames.copy()),
                                  row(2, recut), row(3, other)])
    pairs = {(p.id_a, p.id_b): p.containment
             for p in MM.video_matches(media, min_containment=0.0).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == 1.0                # subset frames all shared
    assert pairs.get((0, 3), 0.0) < 0.8
    high = {(p.id_a, p.id_b)
            for p in MM.video_matches(media, min_containment=0.8).collect()}
    assert (0, 1) in high and (0, 2) in high and (0, 3) not in high


def test_audio_fingerprint_degenerate_clip_lengths(spark):
    """Clips shorter than one FFT frame produce no rows; a clip with
    EXACTLY one spectrogram frame has no target zone and must also
    produce no landmarks (r9 regression: the vectorized pairing hit
    np.concatenate([]) on this case); two frames produce the dt=1
    pairs."""
    rng = np.random.default_rng(9)

    def row(mid, n):
        pcm = rng.integers(-20000, 20000, n, dtype=np.int16)
        return (mid, "audio", pcm.tobytes(), ("pcm16", None, None, 1, 8000,
                                              None))

    # 100 samples → 0 frames; 300 → 1 frame; 384 → 2 frames (frame=256,
    # hop=128)
    media = _manual_media(spark, [row(0, 100), row(1, 300), row(2, 384)])
    per_clip = {r.media_id: r.n for r in
                MM.audio_fingerprints(media).groupBy("media_id")
                .agg(F.count("*").alias("n")).collect()}
    assert 0 not in per_clip
    assert 1 not in per_clip
    assert per_clip.get(2, 0) > 0


def test_audio_fingerprint_df_cap_keeps_true_dups(spark):
    """The stop-hash cap must not break what dedup is FOR: identical
    clips and truncation variants share their landmarks (rare ones
    included) and stay matched at the same containment; the independent
    clip stays out. cap=3 here: the landmarks shared by (full, copy,
    trunc) have df=3 and survive, anything more common would not."""
    rng = np.random.default_rng(3)
    a = rng.integers(-20000, 20000, 4000, dtype=np.int16)
    trunc = a[: int(len(a) * 0.6)]
    other = rng.integers(-20000, 20000, 4000, dtype=np.int16)

    def row(mid, pcm):
        return (mid, "audio", pcm.tobytes(), ("pcm16", None, None, 1, 8000,
                                              None))

    media = _manual_media(spark, [row(0, a), row(1, a.copy()),
                                  row(2, trunc), row(3, other)])
    pairs = {(p.id_a, p.id_b): p.containment
             for p in MM.audio_fp_matches(media, min_containment=0.0,
                                          df_cap=3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] >= 0.95, pairs[(0, 2)]
    assert pairs.get((0, 3), 0.0) < 0.5, pairs.get((0, 3))
    high = {(p.id_a, p.id_b)
            for p in MM.audio_fp_matches(media, min_containment=0.8,
                                         df_cap=3).collect()}
    assert (0, 1) in high and (0, 2) in high and (0, 3) not in high


def test_audio_offset_coherence(spark):
    """Wang 2003 verify: identical clips and a prefix truncation align
    every shared landmark at one offset (coherence 1.0); a clip CUT FROM
    THE MIDDLE still aligns at its shift for landmarks first seen past
    the cut. min_coherence filters."""
    rng = np.random.default_rng(7)
    a = rng.integers(-20000, 20000, 4000, dtype=np.int16)
    trunc = a[: int(len(a) * 0.6)]

    def row(mid, pcm):
        return (mid, "audio", pcm.tobytes(), ("pcm16", None, None, 1, 8000,
                                              None))

    media = _manual_media(spark, [row(0, a), row(1, a.copy()),
                                  row(2, trunc)])
    pairs = {(p.id_a, p.id_b): p
             for p in MM.audio_fp_matches(media, min_containment=0.0)
             .collect()}
    assert pairs[(0, 1)].coherence == 1.0
    assert pairs[(0, 2)].coherence == 1.0
    kept = {(p.id_a, p.id_b)
            for p in MM.audio_fp_matches(media, min_containment=0.0,
                                         min_coherence=0.9).collect()}
    assert (0, 1) in kept and (0, 2) in kept


def test_mfcc_gain_shifts_only_c0(spark):
    """Whole-chain MFCC property: doubling the amplitude multiplies the
    power spectrum by 4, adds log(4) to every log-mel band, and the
    orthonormal DCT routes a constant shift entirely into c0 — so
    c1..c7 must be bit-close while c0 moves by exactly
    sqrt(n_mels)·log(4)·(DCT dc scale). Also pins frame count and the
    too-short-clip zero path."""
    rng = np.random.RandomState(7)
    x = ((rng.randn(1200) * 3000).astype(np.int16) // 2).astype(np.int16)
    x2 = (x * 2).astype(np.int16)  # exact 2x gain, no clipping
    media = _manual_media(spark, [
        (1, "audio", x.tobytes(), ("pcm16", None, None, 1, 8000, None)),
        (2, "audio", x2.tobytes(), ("pcm16", None, None, 1, 8000, None)),
        (3, "audio", np.zeros(10, np.int16).tobytes(),
         ("pcm16", None, None, 1, 8000, None)),
    ])
    rows = {r.media_id: r for r in MM.mfcc_features(media).collect()}
    a, b = rows[1], rows[2]
    assert a.n_frames == b.n_frames == 1 + (1200 - 256) // 128
    for i in range(1, 8):
        assert abs(a.mfcc[i] - b.mfcc[i]) < 1e-6, (i, a.mfcc[i], b.mfcc[i])
    import math
    # orthonormal DCT row 0 = sqrt(1/n_mels) per element; a constant
    # log-mel shift s adds s * n_mels * sqrt(1/n_mels) = s*sqrt(n_mels)
    expected_dc_shift = math.log(4.0) * math.sqrt(20)
    assert b.mfcc[0] - a.mfcc[0] == pytest.approx(expected_dc_shift,
                                                  abs=1e-3)
    assert rows[3].n_frames == 0 and all(v == 0.0 for v in rows[3].mfcc)


def test_hog_uniform_zero_and_edge_bin(spark):
    """HOG property pins: a uniform image has zero gradients everywhere
    (all-zero descriptor); a vertical step edge puts every vote of the
    edge cell into the 0-radian bin (gradient along +x ⇒ unsigned
    orientation 0), and the cell histogram is unit-norm."""
    flat = np.full((8, 8, 1), 50, dtype=np.uint8)
    edge = np.zeros((8, 8, 1), dtype=np.uint8)
    edge[:, 4:, 0] = 200  # vertical step at x=4
    media = _manual_media(spark, [
        (1, "image", flat.tobytes(), ("raw", 8, 8, 1, None, None)),
        (2, "image", edge.tobytes(), ("raw", 8, 8, 1, None, None)),
    ])
    rows = {r.media_id: r for r in MM.hog_features(media).collect()}
    assert rows[1].cells_y == rows[1].cells_x == 1
    assert all(v == 0.0 for v in rows[1].hog)
    h = np.array(rows[2].hog)
    assert h[0] == pytest.approx(1.0) and np.allclose(h[1:], 0.0)
    assert np.linalg.norm(h) == pytest.approx(1.0)


def test_video_matches_df_cap_kills_black_frame_background(spark):
    """Planted-black-frame regression (r10 What's-wrong #2, audio's
    failure mode one modality over): every clip shares 4 common frames
    (one all-black — every constant frame pHashes to the same value —
    plus three title-card-style frames) and carries 1 unique frame, and
    exactly one pair is a true duplicate. Uncapped, EVERY background
    pair hits containment 4/5 = 0.8 and crosses the threshold — the
    quadratic-bucket + precision failure. With df_cap the common hashes
    (df = n_clips > cap) drop from numerator AND denominators: the true
    duplicate survives at containment 1.0, the background vanishes."""
    rng = np.random.default_rng(11)
    black = np.zeros((1, 12, 10, 1), dtype=np.uint8)
    commons = [black] + [rng.integers(0, 256, (1, 12, 10, 1), dtype=np.uint8)
                         for _ in range(3)]

    def clip(mid, unique):
        vid = np.concatenate(commons + [unique], axis=0)
        f, h, w, c = vid.shape
        return (mid, "video", vid.tobytes(), ("raw", w, h, c, None, f))

    uniques = [rng.integers(0, 256, (1, 12, 10, 1), dtype=np.uint8)
               for _ in range(11)]
    rows = [clip(i, uniques[i]) for i in range(11)]
    rows.append(clip(11, uniques[0]))        # clip 11 duplicates clip 0
    media = _manual_media(spark, rows)
    fh = MM.video_frame_hashes(media).localCheckpoint(eager=True)

    uncapped = {(p.id_a, p.id_b)
                for p in MM.video_matches(media, min_containment=0.8,
                                          frame_hashes=fh).collect()}
    assert len(uncapped) == 12 * 11 // 2, len(uncapped)  # all 66 pairs cross

    capped = {(p.id_a, p.id_b): p.containment
              for p in MM.video_matches(media, min_containment=0.8,
                                        frame_hashes=fh,
                                        df_cap=4).collect()}
    assert capped == {(0, 11): 1.0}, capped


def test_phash_pairs_df_cap_bounds_buckets_and_rescues_exact_cliques(spark):
    """Chunk-bucket cap (r10 audit #3): crowding a chunk value past the
    cap drops it from candidate generation, and the full-hash equality
    tier star-links exact-duplicate cliques (whose 4 chunks are ALL
    crowded) so hamming-0 recall survives the cap. Planted: a 10-image
    identical clique, one near-dup pair (few flipped pixels, uncrowded
    buckets), and dense random background."""
    rng = np.random.default_rng(23)
    base = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    near = base.copy()
    near[1, 1, :] ^= 3                       # tiny perturbation: hamming ≤ 3

    def row(mid, img):
        return (mid, "image", img.tobytes(), ("raw", 32, 32, 3, None, None))

    clique = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    rows = [row(i, clique) for i in range(10)]          # exact clique 0..9
    rows += [row(100, base), row(101, near)]            # near-dup pair
    rows += [row(200 + i, rng.integers(0, 256, (32, 32, 3), dtype=np.uint8))
             for i in range(20)]                        # background
    media = _manual_media(spark, rows)
    fh = MM.phash_images(media).localCheckpoint(eager=True)

    capped = MM.phash_pairs(media, max_hamming=3, hashes=fh,
                            df_cap=3).collect()
    got = {(p.id_a, p.id_b): p.hamming for p in capped}
    # exact clique: star pairs to the min-id representative, hamming 0
    for j in range(1, 10):
        assert got.get((0, j)) == 0, got
    # clique chunks are crowded past cap=3 → no within-clique non-star pairs
    assert not any(a != 0 and a < 10 and b < 10 for a, b in got), got
    # the genuine near-dup pair survives in its uncrowded buckets
    assert (100, 101) in got and got[(100, 101)] <= 3, got

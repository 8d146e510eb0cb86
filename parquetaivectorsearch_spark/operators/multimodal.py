"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference is text+vector only; this is the north-star extension for
training-data pipelines (BASELINE.json `north_star`): media payloads ride
as `binary` columns with a metadata struct, and every transform is an
Arrow-batched pandas UDF / `mapInPandas` over the raw buffers — numpy does
the pixel/sample math, Spark does the distribution.

Two payload tiers:

- **raw buffers** (format "raw"): uint8 pixels (image: H×W×C row-major;
  video: F frames of H×W×C) and int16 PCM (audio). Decode, resize,
  frame-sample, and feature extraction are REAL numpy implementations —
  no image/audio libraries needed.
- **png** (format "png"): REAL decode (and a test-facing encoder) via
  stdlib zlib + numpy unfiltering — no codec libraries needed; see the
  PNG codec section below.
- **jpeg** (format "jpeg"): REAL baseline-JFIF decode (and a test-facing
  encoder) in pure numpy — Huffman + dequant + IDCT + YCbCr upsample
  (operators/jpeg.py); format-boundary guards (progressive, 12-bit…)
  raise NotImplementedError.
- **other compressed codecs** ("mp3", compressed video…): decoding needs
  codec libraries this container does not ship, so decode raises
  NotImplementedError for them (clearly-marked stub per the build plan);
  the Spark-side plumbing (schema, batching, partitioning) is identical
  and fully exercised by the raw, png, and jpeg tiers.

Scale posture (100 TB of media): payloads never leave executors; all
per-row outputs are bounded (features, thumbnails, sampled frames);
`mapInPandas` streams Arrow batches so executor memory is
O(batch × payload), tuned via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("format", T.StringType()),        # "raw" | "jpeg" | "png" | "pcm16" | ...
    T.StructField("width", T.IntegerType()),        # image/video
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),  # audio
    T.StructField("n_frames", T.IntegerType()),     # video
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # "image" | "audio" | "video"
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])

RAW_FORMATS = {"raw", "pcm16"}


# ---------------------------------------------------------------------------
# deterministic synthesis (fixture stand-in for a real media lake)
# ---------------------------------------------------------------------------

def synth_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media derived from `documents`: kind cycles by
    doc_id mod 3; payload bytes are the doc's utf-8 text cycled to the
    target length (np.resize), so every byte is a pure function of the row.
    Metadata dimensions are small arithmetic on doc_id (oracle-expressible —
    see the `multimodal_meta` query)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                raw = np.frombuffer((text or "x").encode("utf-8"), dtype=np.uint8)
                kind = ("image", "audio", "video")[did % 3]
                if kind == "image":
                    w, h, c = 16 + did % 16, 16 + did % 8, 1 + (did % 2) * 2
                    meta = ("raw", w, h, c, None, None)
                    n = w * h * c
                elif kind == "audio":
                    sr, n_samp = 8000, 1000 + (did % 7) * 100
                    meta = ("pcm16", None, None, 1, sr, None)
                    n = n_samp * 2  # int16
                else:
                    w, h, c, f = 8 + did % 8, 8 + did % 4, 1, 4 + did % 5
                    meta = ("raw", w, h, c, None, f)
                    n = w * h * c * f
                out.append((did, kind, np.resize(raw, n).tobytes(), meta))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return docs.select(F.col(id_col).alias("doc_id"), "text").mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


# ---------------------------------------------------------------------------
# PNG codec — stdlib zlib + numpy, no image libraries (VERDICT r6 item 8:
# PNG is deflate + per-row byte filters, RFC 2083 §6 / PNG spec 3rd ed. §9,
# so one real compressed format is decodable in this container; the codec
# stub below now covers only jpeg/video).
# Scope: bit depth 8, color types 0/2/4/6 (gray/RGB/±alpha), no interlace,
# no palette — the shapes a training-data lake actually stores.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CT_TO_C = {0: 1, 4: 2, 2: 3, 6: 4}  # color type → channels
_PNG_C_TO_CT = {v: k for k, v in _PNG_CT_TO_C.items()}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_filter_row(row: np.ndarray, prev: np.ndarray, bpp: int,
                    ftype: int) -> bytes:
    """Apply scanline filter `ftype` (encode side). row/prev are the RECON
    bytes of this and the previous scanline."""
    r = row.astype(np.int32)
    left = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]]) if len(r) >= bpp \
        else np.zeros_like(r)
    up = prev.astype(np.int32)
    upleft = np.concatenate([np.zeros(bpp, np.int32), up[:-bpp]]) if len(r) >= bpp \
        else np.zeros_like(r)
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        pred = np.fromiter(
            (_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, up, upleft)),
            dtype=np.int32, count=len(r))
        out = r - pred
    else:
        raise ValueError(f"PNG filter type {ftype}")
    return (out % 256).astype(np.uint8).tobytes()


def _png_unfilter_row(filt: np.ndarray, prev: np.ndarray, bpp: int,
                      ftype: int) -> np.ndarray:
    """Reconstruct one scanline (decode side)."""
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return (filt.astype(np.int32) + prev).astype(np.uint8)
    out = np.empty_like(filt)
    n = len(filt)
    for i in range(n):
        a = int(out[i - bpp]) if i >= bpp else 0
        if ftype == 1:
            v = filt[i] + a
        elif ftype == 3:
            v = filt[i] + (a + int(prev[i])) // 2
        elif ftype == 4:
            c = int(prev[i - bpp]) if i >= bpp else 0
            v = filt[i] + _paeth(a, int(prev[i]), c)
        else:
            raise NotImplementedError(f"PNG filter type {ftype}")
        out[i] = v % 256
    return out


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal standards-conformant 8-bit PNG writer (one IDAT, every
    scanline filtered with `filter_type`). Exists so fixtures/tests can
    produce REAL PNG payloads for png_decode without codec libraries;
    exposing filter_type makes the decoder's unfiltering of all 5 types
    testable."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ct = _PNG_C_TO_CT[c]
    bpp = c
    prev = np.zeros(w * c, dtype=np.uint8)
    lines = []
    for y in range(h):
        row = np.ascontiguousarray(img[y], dtype=np.uint8).reshape(-1)
        lines.append(bytes([filter_type])
                     + _png_filter_row(row, prev, bpp, filter_type))
        prev = row
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + chunk(b"IEND", b""))


def png_decode(payload: bytes) -> np.ndarray:
    """8-bit PNG → (H, W, C) uint8: parse chunks, inflate the IDAT stream,
    undo the per-scanline filter (types 0-4). Vectorized for filters
    none/up; sub/average/paeth reconstruct sequentially (they depend on the
    just-reconstructed left neighbor — inherent to the format)."""
    import struct
    import zlib

    if bytes(payload[:8]) != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat = 8, []
    w = h = ct = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = bytes(payload[pos + 4:pos + 8])
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ct, _comp, _filt, inter = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ct not in _PNG_CT_TO_C or inter:
                raise NotImplementedError(
                    f"PNG bit depth {depth} / color type {ct} / interlace "
                    f"{inter}: only 8-bit non-interlaced gray/RGB(±alpha)")
        elif tag == b"IDAT":
            idat.append(bytes(data))
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG without IHDR")
    c = _PNG_CT_TO_C[ct]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        out[y] = _png_unfilter_row(line, prev, c, ftype)
        prev = out[y]
    return out.reshape(h, w, c)


def encode_png_tier(media: DataFrame) -> DataFrame:
    """Re-encode the raw-tier images as real PNG payloads (per-row filter
    type cycles through 0-4, so decode exercises every unfilter path in a
    distributed run). Non-image rows pass through untouched. The media-lake
    ingest analog: compressed payloads with typed meta, opaque to Spark."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]):
                if kind != "image" or meta["format"] != "raw":
                    out.append((int(mid), kind, payload, meta))
                    continue
                img = decode_image_batch(payload, meta)
                png = png_encode(img, filter_type=int(mid) % 5)
                out.append((int(mid), kind, png,
                            ("png", int(meta["width"]), int(meta["height"]),
                             int(meta["channels"]), None, None)))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return media.mapInPandas(enc, schema=MEDIA_SCHEMA)


def encode_jpeg_tier(media: DataFrame, quality: int = 95) -> DataFrame:
    """Re-encode the raw-tier images as baseline JPEG payloads
    (operators/jpeg.py) — the lossy sibling of encode_png_tier. Same
    media-lake posture: compressed payloads with typed meta, opaque to
    Spark; decode is a distributed Arrow-batched map. Features over this
    tier are NEAR the raw tier's (bounded quantization error), never
    bit-equal — JPEG is lossy by construction; the tolerance is pinned in
    tests/test_multimodal.py."""
    from parquetaivectorsearch_spark.operators.jpeg import jpeg_encode

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, payload, meta in zip(
                    pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]):
                if kind != "image" or meta["format"] != "raw":
                    out.append((int(mid), kind, payload, meta))
                    continue
                img = decode_image_batch(payload, meta)
                jpg = jpeg_encode(img, quality=quality)
                out.append((int(mid), kind, jpg,
                            ("jpeg", int(meta["width"]), int(meta["height"]),
                             int(meta["channels"]), None, None)))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return media.mapInPandas(enc, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _require_raw(fmt: str) -> None:
    if fmt not in RAW_FORMATS:
        # STUB: video codec decode needs ffmpeg-class libraries not shipped
        # in this container (png AND baseline jpeg ARE implemented — the
        # stdlib zlib path above and operators/jpeg.py). The raw-tier path
        # below is the real, tested implementation of everything downstream
        # of decode.
        raise NotImplementedError(
            f"decode for compressed format {fmt!r} requires codec libraries "
            "(libav/ffmpeg) not available in this environment"
        )


def decode_image_batch(payload: bytes, meta) -> np.ndarray:
    """binary → (H, W, C) uint8 array. Real for format='raw', 'png'
    (stdlib decoder above) and 'jpeg' (baseline codec, operators/jpeg.py);
    video frames remain the documented stub."""
    if meta["format"] == "png":
        return png_decode(payload)
    if meta["format"] == "jpeg":
        from parquetaivectorsearch_spark.operators.jpeg import jpeg_decode

        return jpeg_decode(payload)
    _require_raw(meta["format"])
    h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * c).reshape(h, w, c)


def image_features(media: DataFrame) -> DataFrame:
    """Per-image features: mean/std per channel + 8-bin global histogram.
    mapInPandas streams batches; numpy does the math per image."""

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("mean_px", T.ArrayType(T.DoubleType())),
        T.StructField("std_px", T.ArrayType(T.DoubleType())),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ])

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = decode_image_batch(payload, meta)
                hist = np.bincount(img.reshape(-1) >> 5, minlength=8)
                out.append((
                    int(mid),
                    [float(v) for v in img.mean(axis=(0, 1))],
                    [float(v) for v in img.std(axis=(0, 1))],
                    [int(v) for v in hist],
                ))
            yield pd.DataFrame(out, columns=["media_id", "mean_px", "std_px", "histogram"])

    return media.filter(F.col("kind") == "image").mapInPandas(feats, schema=schema)


def hog_features(media: DataFrame, cell: int = 8,
                 n_bins: int = 9) -> DataFrame:
    """Histogram-of-Oriented-Gradients descriptor (Dalal & Triggs, CVPR
    2005) per image — the classic pre-CNN shape descriptor a media
    pipeline clusters/near-dups on alongside pHash (pHash keys global
    layout, HOG keys local edge structure). Pure numpy per Arrow batch:
    luminance → central-difference gradients → unsigned orientation
    (n_bins over [0, π)) with magnitude-weighted votes → per-cell (8×8)
    histograms, each L2-normalized — concatenated row-major. Descriptor
    length varies with image size ((h//cell)·(w//cell)·n_bins), carried
    as an array column plus the cell-grid dims.

    Property-pinned in tests: a uniform image votes zero everywhere; a
    vertical step edge puts every vote of its cell in the 0-radian bin
    (gradient points along +x ⇒ unsigned orientation 0)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("cells_y", T.IntegerType()),
        T.StructField("cells_x", T.IntegerType()),
        T.StructField("hog", T.ArrayType(T.DoubleType())),
    ])

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                img = decode_image_batch(payload, meta).astype(np.float64)
                lum = img.mean(axis=2)  # (h, w) luminance
                gx = np.zeros_like(lum)
                gy = np.zeros_like(lum)
                gx[:, 1:-1] = (lum[:, 2:] - lum[:, :-2]) / 2.0
                gy[1:-1, :] = (lum[2:, :] - lum[:-2, :]) / 2.0
                mag = np.hypot(gx, gy)
                # unsigned orientation in [0, pi); atan2 then fold
                ori = np.mod(np.arctan2(gy, gx), np.pi)
                bins = np.minimum((ori / np.pi * n_bins).astype(np.int64),
                                  n_bins - 1)
                cy, cx = lum.shape[0] // cell, lum.shape[1] // cell
                desc = np.zeros((cy, cx, n_bins))
                for yy in range(cy):
                    for xx in range(cx):
                        b = bins[yy * cell:(yy + 1) * cell,
                                 xx * cell:(xx + 1) * cell].ravel()
                        m = mag[yy * cell:(yy + 1) * cell,
                                xx * cell:(xx + 1) * cell].ravel()
                        h = np.bincount(b, weights=m, minlength=n_bins)
                        nrm = np.linalg.norm(h)
                        desc[yy, xx] = h / nrm if nrm > 0 else h
                out.append((int(mid), int(cy), int(cx),
                            [float(v) for v in desc.ravel()]))
            yield pd.DataFrame(
                out, columns=["media_id", "cells_y", "cells_x", "hog"])

    return media.filter(F.col("kind") == "image").mapInPandas(
        feats, schema=schema)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on raw buffers → new payload + updated meta.
    Real numpy strided sampling — the thumbnailing stage of a media pipeline."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                img = decode_image_batch(payload, meta)
                h, w, c = img.shape
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                small = img[yi][:, xi]
                out.append((int(mid), "image", small.tobytes(),
                            ("raw", out_w, out_h, c, None, None)))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return media.filter(F.col("kind") == "image").mapInPandas(rs, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling: split the payload into n_frames raw frames,
    keep every k-th → one output row per kept frame (media_id, frame_no,
    frame payload as an image row)."""

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ])

    def fs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                _require_raw(meta["format"])
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                nf = int(meta["n_frames"])
                frames = np.frombuffer(payload, dtype=np.uint8,
                                       count=nf * h * w * c).reshape(nf, h, w, c)
                for i in range(0, nf, every_k):
                    out.append((int(mid), i, "image", frames[i].tobytes(),
                                ("raw", w, h, c, None, None)))
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "kind",
                                             "payload", "meta"])

    return media.filter(F.col("kind") == "video").mapInPandas(fs, schema=schema)


def audio_features(media: DataFrame, frame_len: int = 256) -> DataFrame:
    """Per-clip audio features over int16 PCM: RMS, zero-crossing rate, and
    per-frame RMS envelope (frame_len samples per frame)."""

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("rms_envelope", T.ArrayType(T.DoubleType())),
    ])

    def af(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                _require_raw(meta["format"])
                x = np.frombuffer(payload, dtype=np.int16).astype(np.float64)
                n = len(x)
                rms = float(np.sqrt((x ** 2).mean())) if n else 0.0
                zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if n > 1 else 0.0
                nfr = n // frame_len
                env = [
                    float(np.sqrt((x[i * frame_len:(i + 1) * frame_len] ** 2).mean()))
                    for i in range(nfr)
                ]
                out.append((int(mid), n, rms, zcr, env))
            yield pd.DataFrame(out, columns=["media_id", "n_samples", "rms",
                                             "zero_crossing_rate", "rms_envelope"])

    return media.filter(F.col("kind") == "audio").mapInPandas(af, schema=schema)


def _mel_filterbank(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """HTK triangular mel filterbank (n_mels, n_fft//2 + 1): band edges
    equally spaced in mel(f) = 2595·log10(1 + f/700) from 0 to sr/2."""
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    edges_hz = imel(np.linspace(0.0, mel(sr / 2.0), n_mels + 2))
    bin_hz = np.arange(n_bins) * (sr / n_fft)
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, mid, hi = edges_hz[m], edges_hz[m + 1], edges_hz[m + 2]
        up = (bin_hz - lo) / max(mid - lo, 1e-12)
        down = (hi - bin_hz) / max(hi - mid, 1e-12)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def _dct2_ortho(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in) — the log-mel→cepstrum
    transform (scipy.fft.dct(type=2, norm='ortho') equivalent, numpy)."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_in))
    mat *= np.sqrt(2.0 / n_in)
    mat[0] *= np.sqrt(0.5)
    return mat


def mfcc_features(media: DataFrame, n_fft: int = 256, hop: int = 128,
                  n_mels: int = 20, n_mfcc: int = 8) -> DataFrame:
    """Clip-level MFCCs over int16 PCM — the standard speech/audio
    representation (Davis & Mermelstein 1980; the librosa default
    pipeline, reimplemented in pure numpy since no audio libs ship in
    this container — every stage is real, not stubbed): pre-emphasis
    (0.97) → Hann-windowed frames → |rfft|² power spectrum → HTK mel
    filterbank → log → orthonormal DCT-II → first n_mfcc coefficients,
    MEAN-POOLED over frames (the clip-level descriptor a curation
    pipeline clusters/dedups on). The filterbank + DCT matrices build
    once per distinct sample rate (tiny driver-free cache inside the
    Arrow worker); per clip the whole chain is three matmuls.

    Property pinned in tests: doubling the amplitude shifts ONLY c0
    (log-power is additive in gain, and the DCT routes a constant
    log-mel shift entirely into the DC coefficient) — a whole-chain
    correctness check no single stage could pass alone.

    Output: (media_id, n_frames, mfcc array<double>[n_mfcc])."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("mfcc", T.ArrayType(T.DoubleType())),
    ])

    def mf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        win = np.hanning(n_fft)
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                _require_raw(meta["format"])
                sr = int(meta["sample_rate"])
                if sr not in cache:
                    cache[sr] = (_mel_filterbank(sr, n_fft, n_mels),
                                 _dct2_ortho(n_mfcc, n_mels))
                fb, dct = cache[sr]
                x = np.frombuffer(payload, dtype=np.int16).astype(np.float64)
                x = np.append(x[0], x[1:] - 0.97 * x[:-1])  # pre-emphasis
                if len(x) < n_fft:
                    out.append((int(mid), 0, [0.0] * n_mfcc))
                    continue
                nfr = 1 + (len(x) - n_fft) // hop
                idx = (np.arange(n_fft)[None, :]
                       + hop * np.arange(nfr)[:, None])
                frames = x[idx] * win                     # (nfr, n_fft)
                power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
                logmel = np.log(power @ fb.T + 1e-10)     # (nfr, n_mels)
                mfcc = logmel @ dct.T                     # (nfr, n_mfcc)
                out.append((int(mid), int(nfr),
                            [float(v) for v in mfcc.mean(0)]))
            yield pd.DataFrame(out, columns=["media_id", "n_frames", "mfcc"])

    return media.filter(F.col("kind") == "audio").mapInPandas(mf, schema=schema)


# ---------------------------------------------------------------------------
# perceptual-hash image dedup (LAION-style curation: pHash blocks the
# candidate space, embedding/pixel verification follows)
# ---------------------------------------------------------------------------

_POW64 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def _pack_bits(bits: np.ndarray) -> np.ndarray:
    """Pack boolean rows (…, ≤64) into int64 hashes, bit j = bits[..., j].
    Distinct powers → the uint64 sum equals the OR-construction; bit 63
    wraps to the sign bit via two's complement (binary_quantize's
    convention, same as the scalar loop this replaces)."""
    b2 = np.atleast_2d(bits)
    h = (b2.astype(np.uint64) * _POW64[: b2.shape[-1]]).sum(axis=-1)
    return h.astype(np.int64)


def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (same construction as operators/jpeg.py's
    8-point transform, generalized to n)."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def phash_images(media: DataFrame, hash_size: int = 8,
                 resample: int = 32) -> DataFrame:
    """64-bit DCT perceptual hash per image (the classic pHash: gray →
    ``resample``² nearest-neighbor shrink → 2-D DCT-II → top-left
    ``hash_size``² low-frequency block → bit j = coef_j > block median).
    Brightness/contrast shifts move every coefficient together so the
    median threshold absorbs them; small crops/noise flip few bits —
    hamming distance ≈ perceptual distance. Pure numpy over mapInPandas
    batches (two small matmuls per image); the hash is 8 bytes/image, so
    the downstream dedup join ships 10⁻⁵ of the pixel bytes. Bit 63
    wraps to the int64 sign bit (two's complement), matching
    binary_quantize's convention."""

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ])

    def ph(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        D = _dct_mat(resample)
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                img = decode_image_batch(payload, meta)
                g = img.astype(np.float64).mean(axis=2)
                ys = (np.arange(resample) * g.shape[0]) // resample
                xs = (np.arange(resample) * g.shape[1]) // resample
                small = g[np.ix_(ys, xs)]
                coef = (D @ small @ D.T)[:hash_size, :hash_size].ravel()
                bits = coef > np.median(coef)
                out.append((int(mid), int(_pack_bits(bits)[0])))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return media.filter(F.col("kind") == "image").mapInPandas(ph, schema=schema)


def phash_pairs(media: DataFrame, max_hamming: int | None = 6,
                hashes: DataFrame | None = None,
                df_cap: int | None = None) -> DataFrame:
    """Near-duplicate image pairs by pHash: SimHash-style 16-bit chunk
    blocking (4 chunks of the 64-bit hash; pigeonhole guarantees every
    pair with hamming ≤ 3 shares an intact chunk — exact recall there,
    best-effort up to ``max_hamming``), candidate self-join on the chunk
    value, bit_count(XOR) verification JVM-side. The join keys are 4
    shorts per image — candidate generation never touches pixels.
    shiftright on a negative long is arithmetic, hence the & 65535 mask
    AFTER the shift. Pass ``hashes`` to reuse an already-materialized
    hash tier; otherwise the tier is localCheckpoint'ed here so the
    chunk-explode self-join reads ONE pHash extraction, not one per
    join side (pixels decoded once).

    ``df_cap`` is the SCALE lever (r10 audit, measured in
    tools/phash_bucket_audit.py): the chunk key space is BOUNDED at
    4×65536 values, so at growing corpus size candidate pairs grow as
    n²/65536 regardless of content — measured candidate alpha 2.0 on a
    planted smooth-image corpus (129 → 13,604 candidates at 10×) while
    verified dups stayed near zero: cost without output, audio's
    pre-cap failure shape. (The hypothesized single 0x0000 mega-bucket
    does NOT form here — float noise in the exact-zero high-frequency
    DCT coefficients dithers the sub-median bits — but bounded-key
    birthday collisions produce the same quadratic anyway.) Capping
    drops chunk values held by more than ``df_cap`` images from
    candidate generation, bounding the join at df_cap × |chunk rows|.
    Because an EXACT-duplicate clique (identical images hash
    identically, so all four of its chunks are crowded) could be capped
    out entirely, a full-hash equality tier rescues it: each image
    links to the MIN media_id of its hash group — k−1 star pairs per
    clique, not C(k,2), which is what dedup consumes and stays linear.
    The weakened contract, honestly: within an exact clique only
    star pairs are enumerated, and a ≤3-hamming pair whose only intact
    shared chunk is crowded past the cap is missed — the pigeonhole
    guarantee holds for pairs in buckets ≤ df_cap."""
    if hashes is None:
        hashes = phash_images(media).localCheckpoint(eager=False)
    chunks = hashes.select(
        "media_id", "phash",
        F.explode(F.expr(
            "transform(sequence(0, 3), c -> "
            "struct(c AS c, int(shiftright(phash, c * 16) & 65535) AS v))"
        )).alias("ck"),
    ).select("media_id", "phash", "ck.c", "ck.v")
    if df_cap is not None:
        rare = (chunks.groupBy("c", "v")
                .agg(F.count_distinct("media_id").alias("df"))
                .filter(F.col("df") <= df_cap)
                .select("c", "v"))
        chunks = chunks.join(rare, ["c", "v"], "left_semi")
    a = chunks.select(F.col("media_id").alias("id_a"),
                      F.col("phash").alias("ph_a"), "c", "v")
    b = chunks.select(F.col("media_id").alias("id_b"),
                      F.col("phash").alias("ph_b"), "c", "v")
    cand = (a.join(b, ["c", "v"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ph_a", "ph_b"))
    if df_cap is not None:
        from pyspark.sql.window import Window

        rep = F.min("media_id").over(Window.partitionBy("phash"))
        exact = (hashes.withColumn("rep", rep)
                 .filter(F.col("media_id") != F.col("rep"))
                 .select(F.col("rep").alias("id_a"),
                         F.col("media_id").alias("id_b"),
                         F.col("phash").alias("ph_a"),
                         F.col("phash").alias("ph_b")))
        cand = cand.unionAll(exact)
    cand = cand.distinct()
    hd = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    out = cand.select("id_a", "id_b", hd.cast("int").alias("hamming"))
    # max_hamming=None → every chunk-blocked candidate with its distance
    # (lets callers split "blocking found it" from "it is a near-dup")
    return out if max_hamming is None else out.filter(
        F.col("hamming") <= max_hamming)


def audio_fingerprints(media: DataFrame, frame: int = 256, hop: int = 128,
                       n_peaks: int = 3, fanout: int = 5) -> DataFrame:
    """Landmark audio fingerprints (the Shazam construction, Wang 2003):
    PCM → magnitude spectrogram (rfft over ``frame``-sample windows, hop
    ``hop``) → per-frame top-``n_peaks`` spectral peaks → landmark =
    (anchor_bin, target_bin, Δframe) over a ``fanout``-frame target
    zone, packed into one int64. A clip becomes a SET of ~n_peaks·fanout
    hashes per second — matching is a hash-equality join, robust to
    truncation/offset because landmarks are local (a shared prefix
    shares its landmarks verbatim). Pure numpy per batch; output rows
    (media_id, fp, first-anchor-frame t) are 20 bytes each, the only
    thing the dedup join ever shuffles — t feeds the offset-coherence
    verify in audio_fp_matches (Wang 2003 §C)."""

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("fp", T.LongType()),
        T.StructField("t", T.IntegerType()),
    ])

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        win = np.hanning(frame)
        for pdf in batches:
            ids, hashes, times = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                _require_raw(meta["format"])
                x = np.frombuffer(payload, dtype=np.int16).astype(np.float64)
                n_frames = max(0, (len(x) - frame) // hop + 1)
                if n_frames == 0:
                    continue
                idx = (np.arange(frame)[None, :]
                       + hop * np.arange(n_frames)[:, None])
                spec = np.abs(np.fft.rfft(x[idx] * win, axis=1))
                # top-n_peaks bins per frame, sorted by bin for determinism
                pk = np.sort(np.argpartition(-spec, n_peaks, axis=1)
                             [:, :n_peaks], axis=1).astype(np.int64)
                # vectorized target-zone pairing: for each Δframe dt, all
                # anchor-peak × target-peak pairs between pk[t] and
                # pk[t+dt] (anchors t = 0..n_frames-1-dt — the same
                # (t, t+dt ≤ n_frames-1) set the scalar loop produced,
                # ~40× faster than Python tuple iteration)
                hs, ts = [], []
                for dt in range(1, fanout + 1):
                    if dt > n_frames - 1:
                        break
                    a, b = pk[:-dt], pk[dt:]
                    hs.append(((a[:, :, None] << 24) | (b[:, None, :] << 8)
                               | dt).ravel())
                    ts.append(np.repeat(np.arange(n_frames - dt),
                                        n_peaks * n_peaks))
                if not hs:  # single-frame clip: no target zone, no landmarks
                    continue
                # one row per DISTINCT landmark, carrying its FIRST anchor
                # frame: fp set identical to the old np.unique, plus the
                # time the offset-coherence verify (Wang 2003 §C) needs.
                # First occurrence keeps |rows| = |distinct fps| (all-
                # occurrence rows would multiply the join input) and is
                # exact for identical clips and prefix truncations, the
                # dominant duplicate shapes.
                allfp, allt = np.concatenate(hs), np.concatenate(ts)
                order = np.lexsort((allt, allfp))
                fp_s, t_s = allfp[order], allt[order]
                keep = np.ones(fp_s.size, dtype=bool)
                keep[1:] = fp_s[1:] != fp_s[:-1]
                fp_u, t_u = fp_s[keep], t_s[keep]
                ids.append(np.full(fp_u.size, int(mid), dtype=np.int64))
                hashes.append(fp_u)
                times.append(t_u.astype(np.int32))
            if ids:
                yield pd.DataFrame({"media_id": np.concatenate(ids),
                                    "fp": np.concatenate(hashes),
                                    "t": np.concatenate(times)})
            else:
                yield pd.DataFrame({"media_id": pd.Series(dtype="int64"),
                                    "fp": pd.Series(dtype="int64"),
                                    "t": pd.Series(dtype="int32")})

    return media.filter(F.col("kind") == "audio").mapInPandas(fps, schema=schema)


def audio_fp_matches(media: DataFrame,
                     min_containment: float = 0.8,
                     fp: DataFrame | None = None,
                     df_cap: int | None = None,
                     min_coherence: float | None = None) -> DataFrame:
    """Near-duplicate audio pairs: equality self-join on landmark hashes
    (each fp value is a candidate bucket — the classic inverted-index
    shape; no pair enumeration outside genuine collisions), then keep
    pairs whose CONTAINMENT — shared landmarks over the smaller clip's
    landmark set — reaches ``min_containment``. Containment, not an
    absolute count: clips synthesized from a shared small vocabulary
    (and real-world music/speech with common timbre) share a background
    of landmarks, so absolute thresholds drown; on the fixture the
    background containment sits at ~0.44 median while true cycled-text
    duplicates land ≥ 0.8 with a clean gap (75 exact-containment pairs
    at sf0.01). Offset/truncation-invariant: a shared prefix shares its
    landmarks verbatim, so a truncation variant contains ~all of the
    shorter clip's set. Pass ``fp`` to reuse an already-materialized
    fingerprint tier; otherwise it is localCheckpoint'ed here so the
    counts agg and both self-join sides read ONE landmark extraction
    (the spectrogram FFT is the whole cost) instead of three.

    ``df_cap`` is the SCALE lever: the landmark vocabulary is bounded
    (anchor_bin × target_bin × Δframe ≈ 83k values at the defaults), so
    at a growing corpus every bucket's occupancy grows linearly and the
    bucket join's pair count grows QUADRATICALLY — measured 5.6 s →
    130 s (α ≈ 1.35) on the 10× stress before this cap existed. Capping
    drops landmarks held by more than ``df_cap`` clips from BOTH the
    pair numerator and each clip's denominator (the same stop-element
    treatment as dedup_substring's stop-window cap and the boilerplate
    ≥2-doc rule): an everybody-has-it landmark carries zero containment
    signal, while true duplicates keep sharing their RARE landmarks, so
    dup containment stays ≈1.0 and the join's output is bounded by
    df_cap × |landmark rows| — linear at fixed cap. Measured at sf0.1
    against identical-source-text ground truth: true-dup recall 1.0 at
    every cap in {16, 64, 256}, while the uncapped ≥0.8 set (35,665
    pairs — almost all common-landmark background that CROSSED the
    threshold as the corpus grew; the sf0.01 "clean gap" does not
    survive 10× more clips sharing one small vocabulary) shrinks to
    1,063 / 8,229 / 26,006 — the cap is a precision fix as much as a
    cost fix.

    Every pair also carries its OFFSET COHERENCE — the Wang 2003
    histogram verify: shared landmarks vote with (t_a − t_b); coherence
    = the modal offset's vote share. True duplicates and prefix
    truncations align at one offset (coherence 1.0, free of the shared-
    vocabulary problem); background pairs scatter. The extra cost is
    one narrow (pair, offset) pre-aggregation inside the SAME bucket
    join. ``min_coherence`` filters on it when set."""
    if fp is None:
        fp = audio_fingerprints(media).localCheckpoint(eager=False)
    if df_cap is not None:
        rare = (fp.groupBy("fp")
                .agg(F.count_distinct("media_id").alias("df"))
                .filter(F.col("df") <= df_cap)
                .select("fp"))
        fp = fp.join(rare, "fp", "left_semi")
    counts = fp.groupBy("media_id").agg(F.count("*").alias("n"))
    a = fp.select(F.col("media_id").alias("id_a"), "fp",
                  F.col("t").alias("ta"))
    b = fp.select(F.col("media_id").alias("id_b"), "fp",
                  F.col("t").alias("tb"))
    # the (pair, offset) histogram folds inside the same shuffle the
    # pair count needs: partial-aggregated on (id_a, id_b, off), then
    # reduced to total + modal-offset votes per pair
    by_off = (a.join(b, "fp")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b",
                       (F.col("ta") - F.col("tb")).alias("off"))
              .agg(F.count("*").alias("n_off")))
    shared = (by_off.groupBy("id_a", "id_b")
              .agg(F.sum("n_off").cast("int").alias("n_shared"),
                   F.max("n_off").cast("int").alias("n_aligned")))
    ca = counts.select(F.col("media_id").alias("id_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("media_id").alias("id_b"), F.col("n").alias("nb"))
    # no broadcast hint: counts is one row per clip (unbounded at corpus
    # scale) — AQE broadcasts it when it is actually small
    out = (shared.join(ca, "id_a").join(cb, "id_b")
           .withColumn("containment",
                       F.col("n_shared") / F.least("na", "nb"))
           .filter(F.col("containment") >= min_containment)
           .withColumn("coherence",
                       F.round(F.col("n_aligned") / F.col("n_shared"), 6)))
    if min_coherence is not None:
        out = out.filter(F.col("coherence") >= min_coherence)
    return out.select("id_a", "id_b", "n_shared",
                      F.round("containment", 6).alias("containment"),
                      "coherence")


def video_frame_hashes(media: DataFrame, hash_size: int = 8,
                       resample: int = 16) -> DataFrame:
    """Per-frame perceptual hashes for the raw video tier: each frame of
    the F×H×W×C payload gets the same DCT pHash as still images
    (smaller ``resample`` — fixture frames are ≤ 15×11). A clip becomes
    F rows of (media_id, frame_no, fhash) — 8 bytes per frame; decoded
    pixels never leave the executor. Compressed video decode stays the
    documented env-blocked stub (_require_raw), so this operator IS the
    video dedup path for raw/decoded-frame lakes."""

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("fhash", T.LongType()),
    ])

    def vh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        D = _dct_mat(resample)
        for pdf in batches:
            out = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                _require_raw(meta["format"])
                h, w, c = (int(meta["height"]), int(meta["width"]),
                           int(meta["channels"]))
                nf = int(meta["n_frames"])
                vid = np.frombuffer(payload, dtype=np.uint8,
                                    count=nf * h * w * c).reshape(nf, h, w, c)
                ys = (np.arange(resample) * h) // resample
                xs = (np.arange(resample) * w) // resample
                # all frames in one batched pipeline: gray (nf,h,w) →
                # shrink (nf,R,R) → broadcast 2-D DCT (D @ · @ Dᵀ maps
                # over the frame axis) → per-frame median threshold
                g = vid.astype(np.float64).mean(axis=3)
                small = g[:, ys][:, :, xs]
                coef = (D @ small @ D.T)[:, :hash_size, :hash_size]
                block = coef.reshape(nf, -1)
                bits = block > np.median(block, axis=1, keepdims=True)
                for f, hh in enumerate(_pack_bits(bits)):
                    out.append((int(mid), f, int(hh)))
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "fhash"])

    return media.filter(F.col("kind") == "video").mapInPandas(vh, schema=schema)


def video_matches(media: DataFrame,
                  min_containment: float = 0.8,
                  frame_hashes: DataFrame | None = None,
                  df_cap: int | None = None) -> DataFrame:
    """Near-duplicate video pairs: DISTINCT frame-hash sets per clip,
    inverted-index equality join, containment over the smaller clip's
    set (same scoring rationale as audio_fp_matches — re-encoded or
    trimmed copies keep most frame hashes verbatim; frame ORDER is
    deliberately ignored so re-cut compilations still match). Pass
    ``frame_hashes`` to reuse an already-materialized hash tier;
    otherwise it is localCheckpoint'ed here so the counts agg and both
    self-join sides read ONE decode+DCT pass instead of three.

    ``df_cap`` is the same SCALE lever audio_fp_matches needed for the
    identical failure mode (r10 What's-wrong #2): any UNIFORM frame —
    black/white frames, title cards, slates, ubiquitous in real video —
    DCT-collapses to a single pHash, so that one bucket's occupancy
    grows with the corpus and the self-join's pair count grows
    QUADRATICALLY, and common-frame background can cross the
    containment threshold exactly as audio's shared-vocabulary
    landmarks did (measured α ≈ 1.35 there before its cap). Capping
    drops frame hashes held by more than ``df_cap`` clips from BOTH the
    pair numerator and each clip's denominator: an every-clip-has-it
    frame carries zero containment signal, while true duplicates keep
    sharing their RARE frames, so dup containment stays ≈ 1.0 and the
    join output is bounded by df_cap × |hash rows| — linear at fixed
    cap. Regression-pinned by a planted-black-frame corpus in
    tests/test_multimodal.py (uncapped: background pairs cross the
    threshold; capped: exactly the true duplicates, recall 1.0)."""
    if frame_hashes is None:
        frame_hashes = video_frame_hashes(media).localCheckpoint(eager=False)
    fh = frame_hashes.select("media_id", "fhash").distinct()
    if df_cap is not None:
        rare = (fh.groupBy("fhash")
                .agg(F.count_distinct("media_id").alias("df"))
                .filter(F.col("df") <= df_cap)
                .select("fhash"))
        fh = fh.join(rare, "fhash", "left_semi")
    counts = fh.groupBy("media_id").agg(F.count("*").alias("n"))
    a = fh.select(F.col("media_id").alias("id_a"), "fhash")
    b = fh.select(F.col("media_id").alias("id_b"), "fhash")
    shared = (a.join(b, "fhash")
              .filter(F.col("id_a") < F.col("id_b"))
              .groupBy("id_a", "id_b")
              .agg(F.count("*").cast("int").alias("n_shared")))
    ca = counts.select(F.col("media_id").alias("id_a"), F.col("n").alias("na"))
    cb = counts.select(F.col("media_id").alias("id_b"), F.col("n").alias("nb"))
    out = (shared.join(ca, "id_a").join(cb, "id_b")
           .withColumn("containment",
                       F.col("n_shared") / F.least("na", "nb"))
           .filter(F.col("containment") >= min_containment))
    return out.select("id_a", "id_b", "n_shared",
                      F.round("containment", 6).alias("containment"))

"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark side — schemas, partitioning, batch shapes, UDF signatures — is
real and tested.  Codecs resolve in order:

1. **Optional libraries** (try-imported): Pillow for images, soundfile for
   audio — the fast path when the cluster image ships them.
2. **Stdlib fallbacks** (always available): a pure-numpy PNG decoder
   (8-bit gray/RGB/RGBA, non-interlaced — zlib + the five PNG row filters)
   and a ``wave``-module WAV decoder (PCM 8/16/32-bit, mono-mixdown).
   Correct but slower than native codecs on large images (per-byte row
   unfiltering for PNG filter types 1/3/4).
3. **``fake=True``**: the deterministic stub (bytes → hash-seeded
   pseudo-pixels with the metadata's real shape) for tests/benches that
   only exercise dataflow.

Anything else (JPEG without Pillow, MP3/FLAC without soundfile) raises
``NotImplementedError`` naming the library to install.

Media schema (the training-pipeline convention):

    media(id long, kind string, data binary,
          meta struct<width:int, height:int, channels:int,
                      sample_rate:int, n_frames:int, format:string>)
"""

from __future__ import annotations

import io
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional fast path — never required
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

try:  # optional fast path — never required
    import soundfile as _soundfile

    HAVE_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAVE_SOUNDFILE = False

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)


def _fake_pixels(blob: bytes, h: int, w: int, c: int) -> np.ndarray:
    """Deterministic stand-in decode: hash-seeded bytes in the right shape."""
    seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def _decode_png(blob: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (8-bit depth, gray/gray+alpha/RGB/RGBA,
    non-interlaced): zlib-inflate the IDAT stream, then invert the per-row
    filter (types 0-4, PNG spec §9).  Returns (h, w, channels) uint8."""
    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(blob):
        ln, typ = struct.unpack(">I4s", blob[pos : pos + 8])
        data = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if hdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth != 8 or interlace:
        raise NotImplementedError(
            f"stdlib PNG path handles 8-bit non-interlaced only "
            f"(depth={depth}, interlace={interlace}) — install Pillow"
        )
    try:
        nch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    except KeyError:
        raise NotImplementedError(
            f"PNG color type {color} (palette?) — install Pillow"
        ) from None
    raw = zlib.decompress(b"".join(idat))
    stride, bpp = w * nch, nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    rec = np.zeros((h, stride), dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        cur = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        prev = rec[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            pass
        elif f == 1:  # sub
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif f == 2:  # up
            cur += prev
        elif f == 3:  # average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        rec[y] = cur
    return rec.reshape(h, w, nch)


def _decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Stdlib ``wave`` decode: PCM 8/16/32-bit WAV → (mono float32 in
    [-1, 1], sample_rate)."""
    import wave

    with wave.open(io.BytesIO(blob)) as wv:
        n, sw, ch, rate = (
            wv.getnframes(), wv.getsampwidth(), wv.getnchannels(), wv.getframerate()
        )
        pcm = wv.readframes(n)
    try:
        dt = {1: np.uint8, 2: np.int16, 4: np.int32}[sw]
    except KeyError:
        raise NotImplementedError(
            f"WAV sample width {sw} — install soundfile"
        ) from None
    a = np.frombuffer(pcm, dtype=dt).reshape(-1, ch).astype(np.float32)
    if sw == 1:
        x = (a - 128.0) / 128.0
    else:
        x = a / float(2 ** (8 * sw - 1))
    return x.mean(axis=1).astype(np.float32), rate


def decode_image(blob: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    """binary → (h, w, channels) uint8.  Pillow when installed, the stdlib
    PNG decoder for PNG blobs otherwise, the deterministic stub under
    ``fake=True``; anything else raises naming the missing library."""
    if fake:
        return _fake_pixels(blob, meta["height"], meta["width"], meta["channels"])
    if HAVE_PIL:
        img = np.asarray(_PILImage.open(io.BytesIO(blob)).convert("RGB"))
        return img if img.ndim == 3 else img[:, :, None]
    if blob[:8] == _PNG_MAGIC:
        return _decode_png(blob)
    raise NotImplementedError(
        f"no decoder for format {meta.get('format')!r}: install Pillow, "
        "supply PNG (stdlib path), or pass fake=True"
    )


def decode_audio(blob: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    """binary → mono float32 samples.  soundfile when installed, the stdlib
    ``wave`` decoder for RIFF/WAVE PCM otherwise, the stub under
    ``fake=True``."""
    if fake:
        seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(meta["n_frames"]).astype(np.float32)
    if HAVE_SOUNDFILE:
        data, _rate = _soundfile.read(io.BytesIO(blob), dtype="float32")
        return data.mean(axis=1).astype(np.float32) if data.ndim > 1 else data
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _decode_wav(blob)[0]
    raise NotImplementedError(
        f"no decoder for format {meta.get('format')!r}: install soundfile, "
        "supply PCM WAV (stdlib path), or pass fake=True"
    )


def image_features(
    df: DataFrame, resize_to: int = 8, fake: bool = True
) -> DataFrame:
    """Decode → resize (area-average) → channel-mean feature vector, one
    Arrow crossing via mapInPandas.  Output:
    (id long, n_bytes long, feat array<float>, out_w int, out_h int)."""
    rt = int(resize_to)
    use_fake = bool(fake)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, nbytes, ow, oh = [], [], [], []
            for blob, meta in zip(pdf["data"], pdf["meta"]):
                m = dict(meta) if not isinstance(meta, dict) else meta
                img = decode_image(bytes(blob), m, fake=use_fake)
                h, w, c = img.shape
                # crude area-average resize to rt×rt (pipeline shape, not
                # codec fidelity)
                ys = np.linspace(0, h, rt + 1).astype(int)
                xs = np.linspace(0, w, rt + 1).astype(int)
                small = np.zeros((rt, rt, c), dtype=np.float32)
                for i in range(rt):
                    for j in range(rt):
                        patch = img[ys[i] : max(ys[i + 1], ys[i] + 1),
                                    xs[j] : max(xs[j + 1], xs[j] + 1)]
                        small[i, j] = patch.reshape(-1, c).mean(axis=0)
                feats.append(small.mean(axis=(0, 1)).tolist())
                nbytes.append(len(blob))
                ow.append(rt)
                oh.append(rt)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": nbytes,
                    "feat": feats,
                    "out_w": ow,
                    "out_h": oh,
                }
            )

    return df.mapInPandas(
        run, "id long, n_bytes long, feat array<float>, out_w int, out_h int"
    )


def frame_sample(df: DataFrame, every: int = 10, fake: bool = True) -> DataFrame:
    """Video-style frame sampling: one output row per sampled frame index —
    the explode-shaped stage a video pipeline needs (id, frame_idx, frame
    summary).  Decode stubbed like the others."""
    ev = int(every)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, means = [], [], []
            for rid, blob, meta in zip(pdf["id"], pdf["data"], pdf["meta"]):
                m = dict(meta) if not isinstance(meta, dict) else meta
                n = int(m.get("n_frames") or 0)
                for f in range(0, n, ev):
                    seed_blob = bytes(blob) + f.to_bytes(4, "little")
                    frame = _fake_pixels(seed_blob, m["height"], m["width"], m["channels"])
                    ids.append(rid)
                    fidx.append(f)
                    means.append(float(frame.mean()))
            yield pd.DataFrame({"id": ids, "frame_idx": fidx, "frame_mean": means})

    return df.mapInPandas(run, "id long, frame_idx int, frame_mean double")


def make_media_df(spark, source_df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a deterministic media table from a text table (for tests/
    benches: blob = utf-8 bytes, metadata derived from blob length)."""
    return source_df.select(
        F.col(id_col).cast("long").alias("id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("data"),
        F.struct(
            (F.length(F.col(text_col)) % 32 + 4).cast("int").alias("width"),
            (F.length(F.col(text_col)) % 24 + 4).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.length(F.col(text_col)) % 50 + 1).cast("int").alias("n_frames"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )

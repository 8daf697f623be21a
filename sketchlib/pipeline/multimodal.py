"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark side — schemas, partitioning, batch shapes, UDF signatures — is
real and tested.  The codec calls themselves are STUBBED: this container has
no image/audio libraries, so ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (bytes → hash-seeded pseudo-pixels with the metadata's real
shape) exercises the exact same dataflow.  Swapping in Pillow/torchaudio is
a one-function change.

Media schema (the training-pipeline convention):

    media(id long, kind string, data binary,
          meta struct<width:int, height:int, channels:int,
                      sample_rate:int, n_frames:int, format:string>)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_image(blob: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_pixels(blob, meta["height"], meta["width"], meta["channels"])
    raise NotImplementedError(
        "real image decode requires Pillow/libjpeg — not in this container; "
        "pass fake=True for the deterministic stub"
    )


def decode_audio(blob: bytes, meta: dict, fake: bool = False) -> np.ndarray:
    if fake:
        seed = int.from_bytes(blob[:8].ljust(8, b"\0"), "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(meta["n_frames"]).astype(np.float32)
    raise NotImplementedError("real audio decode requires soundfile/ffmpeg")


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

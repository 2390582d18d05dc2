"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for 100 TB multimodal corpora: media lives as BinaryType columns
(or pointers to object-store keys) next to a metadata struct; decode /
feature-extraction runs as Arrow-batched mapInPandas so the heavy
per-item work is vectorized and stays off the driver.

Image decode is gated on an OPTIONAL Pillow import (absent in this
container): with Pillow installed, `decode_media` really decodes and
emits a grayscale histogram; without it, only the deterministic fake
decoder runs and the real path raises NotImplementedError (audio decode
IS real — int16 PCM, no external libs needed). Everything around the
gate — schema, batch shape, partitioning, UDF signatures — is real and
tested, including the Pillow wiring via a stubbed module.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("checksum", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Materialize a multimodal-shaped table from text: payload is the
    UTF-8 encoding (stand-in for image/audio bytes), metadata is typed."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("txt").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ).alias("media_meta"),
    )


try:  # optional dependency: real image decode when Pillow is installed
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # this container has no media libraries
    _PILImage = None

_PIL_IMAGE_FORMATS = {"png", "jpg", "jpeg", "bmp", "gif", "webp"}


def decode_media(payload: bytes, fmt: str, fake: bool = False) -> np.ndarray:
    """Decode one media payload into a FEATURE_DIM feature vector.

    Three paths, in priority order:
    - fake=True: deterministic md5-derived floats — the test decoder that
      exercises the full distributed plumbing with stable outputs.
    - Pillow present and ``fmt`` is an image format: REAL decode —
      grayscale intensity histogram over FEATURE_DIM bins (normalized to
      sum 1). Gated on import, so installing Pillow on a real cluster
      lights it up with no code change (wiring covered by a stubbed-PIL
      test, tests/test_text_similarity.py).
    - otherwise NotImplementedError: audio/video decoders (librosa/
      ffmpeg) stay an honest environment boundary.
    """
    if fake:
        digest = hashlib.md5(payload or b"").digest()
        raw = np.frombuffer(
            (digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
            dtype=np.uint32,
        )
        return (raw / 2**32).astype(np.float32)
    if _PILImage is not None and (fmt or "").lower() in _PIL_IMAGE_FORMATS:
        import io

        img = _PILImage.open(io.BytesIO(payload or b"")).convert("L")
        arr = np.asarray(img, dtype=np.float32) / 255.0
        hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0.0, 1.0))
        return (hist / max(arr.size, 1)).astype(np.float32)
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this "
        "environment; pass fake=True for the deterministic test decoder "
        "(or install Pillow for real image decode)"
    )


def extract_features(media_df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, decode every payload
    and emit (doc_id, n_bytes, features). Batches keep columnar shape —
    no per-row Python call overhead beyond the decode itself."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m["format"] if m is not None else None, fake=fake_decode).tolist()
                for p, m in zip(pdf["payload"], pdf["media_meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media_df.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def resize_images(media_df: DataFrame, height: int = 8, width: int = 8) -> DataFrame:
    """mapInPandas image resize. The decode step is the stub boundary
    (payload bytes -> a 2D grayscale array; real impl would use PIL); the
    resample itself is a REAL nearest-neighbor resize in numpy — index
    math identical to what you'd run on genuinely decoded frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {"doc_id": [], "height": [], "width": [], "pixels": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
                side = max(1, int(len(buf) ** 0.5))
                img = np.resize(buf, (side, side))  # stubbed "decode"
                ys = (np.arange(height) * side) // height
                xs = (np.arange(width) * side) // width
                resized = img[np.ix_(ys, xs)]  # real nearest-neighbor resample
                out_rows["doc_id"].append(doc_id)
                out_rows["height"].append(height)
                out_rows["width"].append(width)
                out_rows["pixels"].append(resized.tobytes())
            yield pd.DataFrame(out_rows)

    return media_df.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(media_df: DataFrame, frame_bytes: int = 64, every_n: int = 4) -> DataFrame:
    """mapInPandas frame sampling: treat each payload as a 'video' of
    fixed-size frames and emit every n-th frame as its own row (fan-out
    map — one input row to many output rows, the real shape of
    video-to-frame pipelines). ffmpeg-style decode is the stub boundary;
    the chunk/stride/fan-out plumbing is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = payload or b""
                n_frames = max(1, len(data) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(data[fi * frame_bytes : (fi + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media_df.mapInPandas(run, schema=FRAMES_SCHEMA)


# ── Audio PCM path (real DSP — no codec needed for raw PCM) ─────────────────

AUDIO_SR = 8000
AUDIO_N_SAMPLES = 2048
AUDIO_WIN = 256

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("win_idx", T.IntegerType(), False),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("zcr", T.IntegerType(), True),
    ]
)


def synth_pcm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload): deterministic 16-bit little-endian PCM, one
    'recording' per row — a pure tone whose frequency/amplitude derive
    from the id. Unlike the image path, RAW PCM needs no codec, so this
    models the real multimodal flow end-to-end: binary in, numpy DSP out.
    Sample formula (mirrored by the q118 oracle):
    s_i = trunc(round(amp * sin(2*pi*f*i/SR), 3)) as int16,
    f = 100 + (id % 20)*10, amp = 8000 + (id % 7)*1000.
    The round-to-3-decimals BEFORE trunc quantizes away the libm
    fragility: sin is not correctly rounded, so a 1-ulp platform
    difference could otherwise flip trunc when amp*sin lands within
    float noise of an integer (ADVICE r2)."""

    @pandas_udf(T.BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        i = np.arange(AUDIO_N_SAMPLES, dtype=np.float64)
        out = []
        for d in ids:
            f = 100 + (int(d) % 20) * 10
            amp = 8000 + (int(d) % 7) * 1000
            s = np.trunc(np.round(amp * np.sin(2 * np.pi * f * i / AUDIO_SR), 3)).astype("<i2")
            out.append(s.tobytes())
        return pd.Series(out)

    return df.select(F.col(id_col).alias("doc_id"), synth(F.col(id_col)).alias("payload"))


def audio_window_energy(media_df: DataFrame) -> DataFrame:
    """Per-window audio features over int16 PCM payloads: energy as the
    EXACT integer sum of squares (accumulation-order free) plus the
    zero-crossing count — real signal processing via numpy frombuffer,
    Arrow-batched in mapInPandas.

    Scale: decode + feature-extract run where the bytes live (map-side,
    no shuffle); emitting integer sufficient statistics instead of
    floats keeps downstream aggregation exact and engine-independent —
    rms = sqrt(sum_sq / WIN) is derivable at serving time."""

    def run(batches):
        for pdf in batches:
            ids, wins, sums, zcrs = [], [], [], []
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                s = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                n_win = len(s) // AUDIO_WIN
                for w in range(n_win):
                    seg = s[w * AUDIO_WIN : (w + 1) * AUDIO_WIN]
                    ids.append(d)
                    wins.append(w)
                    sums.append(int((seg * seg).sum()))
                    zcrs.append(int(((seg[:-1] >= 0) != (seg[1:] >= 0)).sum()))
            yield pd.DataFrame({"doc_id": ids, "win_idx": wins, "sum_sq": sums, "zcr": zcrs})

    return media_df.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


AHASH_CELLS = 64  # 8x8 perceptual-hash grid


def ahash64(media_df: DataFrame) -> DataFrame:
    """64-bit average hash (aHash) over the binary payload: split the
    byte stream into 64 equal-span cells, set bit j when cell j's mean
    exceeds the global mean (compared by exact integer cross-
    multiplication: sum_j * n > total * cnt_j — no float ever). Returns
    the hash as two 32-bit halves (h1 bits 0-31, h2 bits 32-63, BIGINT-
    safe) plus the eight 8-bit band values used for LSH-style candidate
    bucketing. On real images the same grid math runs on decoded luma
    (decode_media); on this container's stand-in payloads the bytes ARE
    the content, which is what lets the DuckDB oracle replay the hash
    from the text column (ascii(char) == byte for ASCII corpora).

    Scale: one Arrow-batched map pass, no shuffle; Hamming near-dup over
    these hashes is the q25 SimHash banding shape (see q256).
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None or len(payload) < AHASH_CELLS:
                    continue
                a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = a.size
                total = int(a.sum())
                bits = np.zeros(AHASH_CELLS, dtype=np.int64)
                cum = np.concatenate(([0], np.cumsum(a)))
                for j in range(AHASH_CELLS):
                    lo = (n * j) // AHASH_CELLS
                    hi = (n * (j + 1)) // AHASH_CELLS
                    cnt = hi - lo
                    if cnt > 0 and int(cum[hi] - cum[lo]) * n > total * cnt:
                        bits[j] = 1
                h1 = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
                h2 = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
                bands = [
                    int((bits[b * 8 : b * 8 + 8] << np.arange(8, dtype=np.int64)).sum())
                    for b in range(8)
                ]
                out.append((doc_id, h1, h2, bands))
            yield pd.DataFrame(
                out, columns=["doc_id", "h1", "h2", "bands"]
            ) if out else pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "h1": pd.Series(dtype="int64"),
                 "h2": pd.Series(dtype="int64"),
                 "bands": pd.Series(dtype="object")}
            )

    return media_df.select("doc_id", "payload").mapInPandas(
        compute, schema="doc_id long, h1 long, h2 long, bands array<int>"
    )

"""Multimodal column plumbing (training-data pipeline extension).

Image/audio/video are opaque ``binary`` payloads + typed metadata; the
compute stages (decode, resize, feature-extract, frame-sample) run as
Arrow-batched Pandas functions via ``mapInPandas`` — the Spark-side
plumbing (schemas, batch shapes, partition sizing) is real and tested,
while the codec itself is stubbed: this container has no image/audio
libraries, so ``decode_media`` raises NotImplementedError unless
``fake=True`` supplies the deterministic stand-in decoder.

Scale notes:
- Payloads stay OFF the shuffle path: metadata-only projections for
  filtering/joining, payload columns only inside the mapInPandas stage.
- ``maxRecordsPerBatch`` bounds Arrow batch memory when payloads are
  MBs each; repartition by size-class before decode to even out
  executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("ok", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes | str, kind: str) -> dict:
    """Deterministic stand-in decoder: derives pseudo-dimensions and a
    FEATURE_DIM-float feature vector from the payload bytes alone, so
    tests exercise real batch shapes without codec libraries."""
    data = payload.encode() if isinstance(payload, str) else (payload or b"")
    h = 0
    for b in data[:64]:
        h = (h * 131 + b) % (1 << 31)
    return {
        "ok": "ok" if data else "empty",
        "width": 16 + h % 1024,
        "height": 16 + (h // 7) % 1024,
        "features": [float((h >> i) & 0xFF) / 255.0 for i in range(0, FEATURE_DIM * 4, 4)],
    }


def decode_media(df: DataFrame, payload_col: str = "payload", kind_col: str = "kind",
                 id_col: str = "media_id", fake: bool = False) -> DataFrame:
    """Decode/feature-extract stage as mapInPandas (Arrow-batched; one
    Python worker per partition, vectorized I/O).  Real codecs are not
    available in this environment — pass fake=True for the
    deterministic stand-in, else NotImplementedError surfaces in the
    executor."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires codec libraries (PIL/ffmpeg) "
                    "not present in this environment; use fake=True"
                )
            decoded = [_fake_decode(p, k) for p, k in zip(pdf[payload_col], pdf[kind_col])]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].values,
                    "kind": pdf[kind_col].values,
                    "ok": [d["ok"] for d in decoded],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("feat", FloatType()),
    ]
)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    stride: int = 10,
    fake: bool = False,
) -> DataFrame:
    """Video frame-sampling stage: every ``stride``-th frame of each
    payload becomes its OWN row (1→many mapInPandas — the batch shape
    that matters: output frames per input video vary, so the Arrow
    writer re-batches; payloads never leave the stage).  Real frame
    extraction needs ffmpeg (absent here) — ``fake=True`` derives a
    deterministic frame count (8 + h % 56 at 25 fps) and per-frame
    feature from the payload's polynomial byte hash, exercising the
    full plumbing."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg/codec libraries "
                    "not present in this environment; use fake=True"
                )
            ids, idxs, tss, feats = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                data = p.encode() if isinstance(p, str) else (p or b"")
                h = 0
                for b in data[:64]:
                    h = (h * 131 + b) % (1 << 31)
                n_frames = 8 + h % 56
                for idx in range(0, n_frames, stride):
                    ids.append(mid)
                    idxs.append(idx)
                    tss.append(idx * 40)  # 25 fps
                    feats.append(((h >> (idx % 24)) & 0xFF) / 255.0)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "feat": feats}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("scale", DoubleType()),
    ]
)


def resize_media(
    df: DataFrame,
    payload_col: str = "payload",
    kind_col: str = "kind",
    id_col: str = "media_id",
    target: tuple[int, int] = (224, 224),
    fake: bool = False,
) -> DataFrame:
    """Letterbox-resize stage: fit each image into ``target`` preserving
    aspect ratio (scale = min(tw/w, th/h), floor output dims) — the
    standard pre-training normalization.  Real pixel work needs PIL
    (absent here); ``fake=True`` derives source dims from the payload
    hash (same fold as decode) and computes the REAL resize geometry,
    so the batch plumbing and the dimension math are fully exercised.
    All math is IEEE double with a fixed expression order, replayable
    exactly in SQL."""
    tw, th = target

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real resizing requires image libraries (PIL) not present "
                    "in this environment; use fake=True"
                )
            out = {k: [] for k in ("media_id", "kind", "src_w", "src_h", "out_w", "out_h", "scale")}
            for mid, kind, p in zip(pdf[id_col], pdf[kind_col], pdf[payload_col]):
                d = _fake_decode(p, kind)
                w, h = d["width"], d["height"]
                scale = min(tw / w, th / h)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["out_w"].append(int(w * scale))
                out["out_h"].append(int(h * scale))
                out["scale"].append(scale)
            yield pd.DataFrame(out)

    return df.mapInPandas(run, RESIZED_SCHEMA)


def media_metadata_stats(decoded: DataFrame) -> DataFrame:
    """Post-decode metadata aggregation — payloads already dropped, so
    this shuffles only scalars."""
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("width").alias("avg_width"),
            F.avg("height").alias("avg_height"),
        )
        .orderBy("kind")
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sr", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("start_sample", LongType()),
        StructField("t_start_ms", LongType()),
    ]
)


def window_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_len: int = 1024,
    hop: int = 512,
    fake: bool = False,
) -> DataFrame:
    """Audio analysis-window framing: each payload expands to its
    overlapping STFT-style windows (frame_len samples, hop stride) —
    the third modality's 1→many mapInPandas stage next to
    ``sample_frames`` (video) and ``resize_media`` (image).  Real
    audio decoding needs soundfile/ffmpeg (absent here) — ``fake=True``
    derives the sample rate ∈ {8000, 16000, 44100} and sample count
    from the payload's polynomial byte hash, so the frame schedule is
    replayable in SQL; start times are integer-division milliseconds
    (exact both engines).  Payloads never leave the stage."""
    # Misuse must fail at plan-build time on the driver, not as a task
    # failure deep inside a job (the executor-side raise below only
    # fires at action time, and only on non-empty batches).
    if not fake:
        raise NotImplementedError(
            "real audio framing requires soundfile/ffmpeg libraries "
            "not present in this environment; use fake=True"
        )
    if frame_len <= 0 or hop <= 0 or hop > frame_len:
        raise ValueError(
            f"need 0 < hop <= frame_len, got frame_len={frame_len} hop={hop}"
        )

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio framing requires soundfile/ffmpeg libraries "
                    "not present in this environment; use fake=True"
                )
            ids, srs, idxs, starts, tss = [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                data = p.encode() if isinstance(p, str) else (p or b"")
                h = 0
                for b in data[:64]:
                    h = (h * 131 + b) % (1 << 31)
                sr = (8000, 16000, 44100)[h % 3]
                n_samples = 2048 + h % 100000
                k = 0
                while k * hop + frame_len <= n_samples:
                    ids.append(mid)
                    srs.append(sr)
                    idxs.append(k)
                    starts.append(k * hop)
                    tss.append(k * hop * 1000 // sr)
                    k += 1
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sr": srs,
                    "frame_idx": idxs,
                    "start_sample": starts,
                    "t_start_ms": tss,
                }
            )

    return df.mapInPandas(run, AUDIO_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("luma", IntegerType()),
    ]
)


def frame_luma_series(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 16,
    fake: bool = False,
) -> DataFrame:
    """Per-frame mean-luma extraction (the input to shot/scene-cut
    detection) as Arrow-batched mapInPandas — payloads stay inside the
    stage, only (media_id, frame_idx, luma) triples leave.

    Real path: decode each frame and average its Y plane —
    NotImplementedError here (no ffmpeg in this container).  The
    ``fake=True`` stand-in derives frame i's luma from payload bytes
    4i, 4i+1: (131·b₀ + b₁) mod 256 — deterministic and
    SQL-replayable, so the Python batch path itself is oracle-gated
    (the mm_decode_stats recipe)."""

    def run(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        # Vectorized batch body (guide §4.2: hand whole Arrow batches
        # to NumPy, never loop rows in Python).  Frame i of a payload
        # uses bytes 4i, 4i+1, so only the first 4*n_frames bytes of
        # each payload matter: trim (C-level slicing), scatter into a
        # zero-padded (rows, 4*n_frames) uint8 matrix via one boolean
        # mask (row-major order matches the concatenation), and the
        # luma matrix is one strided arithmetic expression.  A doc
        # emits frames while 4i+1 < len(payload) — the same bound the
        # old per-row loop enforced with its break.
        width = 4 * n_frames
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame decoding requires ffmpeg, not present in "
                    "this environment; use fake=True"
                )
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"media_id": [], "frame_idx": [], "luma": []}
                )
                continue
            trimmed = [bytes(p)[:width] for p in pdf[payload_col]]
            tl = np.fromiter(
                (len(t) for t in trimmed), dtype=np.int64, count=n
            )
            buf = np.zeros((n, width), dtype=np.uint8)
            buf[np.arange(width)[None, :] < tl[:, None]] = np.frombuffer(
                b"".join(trimmed), dtype=np.uint8
            )
            luma = (
                131 * buf[:, 0::4].astype(np.int32) + buf[:, 1::4]
            ) % 256
            n_frames_per_doc = np.clip((tl - 2) // 4 + 1, 0, n_frames)
            keep = (
                np.arange(n_frames)[None, :] < n_frames_per_doc[:, None]
            )
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(
                        pdf[id_col].to_numpy(), n_frames_per_doc
                    ),
                    "frame_idx": np.broadcast_to(
                        np.arange(n_frames, dtype=np.int32), (n, n_frames)
                    )[keep],
                    "luma": luma[keep],
                }
            )

    return df.mapInPandas(run, SCENE_SCHEMA)

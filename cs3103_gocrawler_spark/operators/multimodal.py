"""Multimodal-column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via ``mapInPandas``.

The Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested; the actual media decode is either our self-contained
image codec (synthetic pages, see operators/validate.py) or, for codecs whose
libraries are absent in this container (real JPEG/WebP/audio/video), a
clearly-marked deterministic stub per the task instructions.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812

from ..synthetic.imagecodec import decode_image

FEATURE_DIM = 16

EXTRACT_SCHEMA = (
    "id string, modality string, n_bytes long, decode_ok boolean, "
    "feature array<float>"
)


def _stub_decode(payload: bytes, modality: str) -> np.ndarray:
    """DETERMINISTIC STUB for codecs not present in this container (real
    jpeg/webp via libjpeg, audio frames, video frame-samples). Produces a
    stable pseudo-feature from the payload bytes so the pipeline shape is
    exercised end-to-end; swap for a real decoder (PIL/ffmpeg) in prod."""
    d = hashlib.sha256(payload).digest()
    raw = np.frombuffer((d * ((FEATURE_DIM * 4) // len(d) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32).astype(np.float64)
    return (raw / np.float64(2**32)).astype(np.float32)


def extract_features(df: DataFrame, id_col: str, bytes_col: str,
                     modality_col: str) -> DataFrame:
    """Batch feature extraction over binary payloads. Synthetic image formats
    decode for real (imagecodec); everything else uses the deterministic
    stub. One Arrow batch pass; payload bytes never leave the batch."""

    def run(batches):
        for pdf in batches:
            ids, mods, sizes, oks, feats = [], [], [], [], []
            for r in pdf.itertuples():
                payload = bytes(getattr(r, bytes_col) or b"")
                modality = getattr(r, modality_col)
                ids.append(str(getattr(r, id_col)))
                mods.append(modality)
                sizes.append(len(payload))
                try:
                    if modality in ("png", "jpeg", "webp"):
                        px = decode_image(payload, modality)
                        g = px.astype(np.float32).mean(axis=2)
                        bh = max(g.shape[0] // 4, 1)
                        bw = max(g.shape[1] // 4, 1)
                        feat = (
                            g[: bh * 4, : bw * 4]
                            .reshape(4, bh, 4, bw).mean(axis=(1, 3)).ravel() / 255.0
                        ).astype(np.float32)
                        ok = True
                    else:
                        feat = _stub_decode(payload, modality)
                        ok = True
                except Exception:
                    feat, ok = np.zeros(FEATURE_DIM, dtype=np.float32), False
                oks.append(ok)
                feats.append(feat.tolist())
            yield pd.DataFrame({
                "id": ids, "modality": mods, "n_bytes": sizes,
                "decode_ok": oks, "feature": feats,
            })

    return df.select(id_col, bytes_col, modality_col).mapInPandas(
        run, schema=EXTRACT_SCHEMA
    )


def resize_images(df: DataFrame, id_col: str, bytes_col: str, fmt_col: str,
                  out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Block-mean resize of decodable images → re-encoded PNG payloads.
    Demonstrates the transform-and-rewrite shape (decode→np→encode) with the
    output payload staying binary."""
    from ..synthetic.imagecodec import encode_png

    def run(batches):
        for pdf in batches:
            out = {"id": [], "out_bytes": [], "out_w": [], "out_h": []}
            for r in pdf.itertuples():
                try:
                    px = decode_image(bytes(getattr(r, bytes_col)), getattr(r, fmt_col))
                    h, w, _ = px.shape
                    bh, bw = max(h // out_h, 1), max(w // out_w, 1)
                    small = (
                        px[: bh * out_h, : bw * out_w]
                        .reshape(out_h, bh, out_w, bw, 3).mean(axis=(1, 3))
                        .astype(np.uint8)
                    )
                    out["id"].append(str(getattr(r, id_col)))
                    out["out_bytes"].append(encode_png(small))
                    out["out_w"].append(out_w)
                    out["out_h"].append(out_h)
                except Exception:
                    continue
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        run, schema="id string, out_bytes binary, out_w int, out_h int"
    )


FRAME_SCHEMA = "id string, frame_idx int, frame_bytes binary, n_frames int"


def sample_frames(df: DataFrame, id_col: str, bytes_col: str,
                  frame_size: int = 4096, every_k: int = 10,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling as an Arrow-batched ``mapInPandas`` pass: the
    opaque binary payload is treated as a sequence of fixed-size frames
    (DETERMINISTIC STUB for a real container demuxer — ffmpeg is absent from
    this container; the Spark-side plumbing — schema, fan-out shape, batch
    memory profile — is the real contract). Emits every ``every_k``-th frame
    up to ``max_frames`` per payload; payload bytes never leave the worker,
    only the (much smaller) sampled frames return."""

    def run(batches):
        for pdf in batches:
            out = {"id": [], "frame_idx": [], "frame_bytes": [], "n_frames": []}
            for r in pdf.itertuples():
                payload = bytes(getattr(r, bytes_col) or b"")
                n = max(len(payload) // frame_size, 1)
                taken = 0
                for i in range(0, n, every_k):
                    if taken >= max_frames:
                        break
                    out["id"].append(str(getattr(r, id_col)))
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(
                        payload[i * frame_size:(i + 1) * frame_size]
                    )
                    out["n_frames"].append(n)
                    taken += 1
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, schema=FRAME_SCHEMA)

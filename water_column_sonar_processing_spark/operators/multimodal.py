"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque `binary` columns with typed metadata
structs — exactly how the reference treats raw EK60 datagram files (opaque
bytes + a magic-byte classifier + per-file metadata,
/root/reference/water_column_sonar_processing/index/index_manager.py:237-250,
processing/raw_to_zarr.py:66-108).

Decode modes:
- `decode='fake'` (default): a deterministic content-derived stand-in
  (byte histogram + moments over the RAW payload bytes) so the full
  pipeline — schema, Arrow batching, partitioning, feature join — is
  executable end-to-end regardless of payload format;
- `decode='real'` (r4, was fully gated; r5 adds baseline JPEG + MJPEG
  AVI video): ACTUALLY decodes WAV (PCM), BMP, PNG, baseline-JFIF JPEG,
  and MJPEG-in-AVI payloads with the from-scratch numpy/zlib codecs in
  media_codecs.py, then computes the same 16-dim feature kernel over the
  DECODED content (pixel bytes — for video, all frames' pixels; audio
  samples quantized to uint8). Inter-frame codecs (MP4/H.264) remain the
  one gate — those need codec stacks this container does not ship.

Everything Spark-side is real: mapInPandas over Arrow record batches,
bounded batch memory via maxRecordsPerBatch, typed output schema, and the
metadata extraction (magic sniffing, sizes) in native expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, byte_len long, magic string"
)

FEATURE_DIM = 16


def sniff_media_meta(df: DataFrame, bin_col: str = "html") -> DataFrame:
    """Native metadata extraction: magic bytes + length (no Python hop)."""
    # compare magics in hex — casting non-UTF8 binary to string mangles
    # high bytes into replacement chars
    magic = F.hex(F.substring(F.col(bin_col), 1, 4))
    riff_type = F.hex(F.substring(F.col(bin_col), 9, 4))  # RIFF form type at bytes 8..11
    media_type = (
        F.when(F.hex(F.substring(F.col(bin_col), 1, 3)) == "FFD8FF", F.lit("image/jpeg"))
        .when(magic == "89504E47", F.lit("image/png"))
        .when((magic == "52494646") & (riff_type == "41564920"), F.lit("video/avi"))
        .when((magic == "52494646") & (riff_type == "57415645"), F.lit("audio/wav"))
        .when(F.hex(F.substring(F.col(bin_col), 1, 2)) == "424D", F.lit("image/bmp"))
        .otherwise(F.lit("application/octet-stream"))
    )
    return df.withColumn("media_type", media_type).withColumn(
        "byte_len", F.length(F.col(bin_col)).cast("long")
    ).withColumn("magic", magic)


def _fake_decode_features(payloads: pd.Series) -> np.ndarray:
    """Deterministic stand-in for image/audio decode: 16-dim feature from
    the byte histogram (256 bins folded to 8) + moments. Content-derived,
    so tests get stable, discriminative vectors.

    Fully VECTORIZED across the Arrow batch: all payloads concatenate into
    one uint8 buffer; per-row stats come from exact integer cumsums
    (mean/std/first-64 checksum), bincount with row-offset bins
    (histogram), and minimum/maximum.reduceat — no per-row Python loop, so
    the batch cost is O(total bytes), honoring the Arrow batching the
    mapInPandas contract advertises. std is the exact-integer-moment form
    sqrt(E[x^2] - mu^2)."""
    n = len(payloads)
    out = np.zeros((n, FEATURE_DIM), dtype=np.float32)
    bufs = [
        np.frombuffer(bytes(b), dtype=np.uint8) if (b is not None and len(b) > 0) else None
        for b in payloads
    ]
    live = [i for i, a in enumerate(bufs) if a is not None]
    if not live:
        return out
    arrs = [bufs[i] for i in live]
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    k = len(arrs)
    allb = np.concatenate(arrs)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    ends = starts + lens
    rowpos = np.repeat(np.arange(k, dtype=np.int64), lens)

    hist = np.bincount(rowpos * 8 + (allb % 8).astype(np.int64), minlength=k * 8).reshape(k, 8)
    hist_f = hist.astype(np.float32) / np.maximum(1.0, lens.astype(np.float64))[:, None].astype(np.float32)

    b64 = allb.astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(b64)])
    csq = np.concatenate([[0], np.cumsum(b64 * b64)])
    tot = csum[ends] - csum[starts]
    totsq = csq[ends] - csq[starts]
    mean = tot / lens
    var = np.maximum(0.0, totsq / lens - mean * mean)
    std = np.sqrt(var)
    mins = np.minimum.reduceat(allb, starts).astype(np.float64)
    maxs = np.maximum.reduceat(allb, starts).astype(np.float64)
    first64 = (csum[np.minimum(starts + 64, ends)] - csum[starts]) % 255
    moments = np.stack(
        [
            mean,
            std,
            mins,
            maxs,
            (lens % 1000).astype(np.float64),
            first64.astype(np.float64),
            allb[ends - 1].astype(np.float64),
            allb[starts].astype(np.float64),
        ],
        axis=1,
    ).astype(np.float32)
    idx = np.array(live, dtype=np.int64)
    out[idx, :8] = hist_f
    out[idx, 8:] = moments / 255.0
    return out


def extract_media_features(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "url",
    decode: str = "fake",
    batch_note: str | None = None,
) -> DataFrame:
    """mapInPandas feature extraction: (id, features array<float>[16]).

    The Arrow batch shape is the real contract: each pandas batch holds
    maxRecordsPerBatch rows of (id, binary); the UDF returns (id,
    features). Partitioning of the input carries through unchanged.

    decode='real' runs the from-scratch WAV/BMP/PNG/JPEG/MJPEG-AVI codecs
    (media_codecs.py) and features the DECODED content (video features
    cover every frame's pixels — the (n, h, w, c) stack flattens into the
    same byte kernel); unknown magics (including inter-frame video)
    raise ValueError — a real pipeline filters by sniffed media_type
    upstream (sniff_media_meta)."""
    if decode not in ("fake", "real"):
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")

    sub = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_decode_features(pdf["payload"])
            yield pd.DataFrame({"id": pdf["id"], "features": list(feats)})

    def _extract_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import decode_payload

        for pdf in batches:
            canon: list[bytes | None] = []
            for b in pdf["payload"]:
                if b is None or len(b) == 0:
                    canon.append(None)
                    continue
                mt, arr = decode_payload(bytes(b))
                if mt == "audio/wav":
                    # quantize [-1,1] samples onto the uint8 lattice the
                    # shared feature kernel consumes
                    q = np.clip(np.round(arr * 127.0 + 128.0), 0, 255).astype(np.uint8)
                    canon.append(q.tobytes())
                else:
                    canon.append(arr.tobytes())  # raw decoded pixel bytes
            feats = _fake_decode_features(pd.Series(canon))
            yield pd.DataFrame({"id": pdf["id"], "features": list(feats)})

    fn = _extract_real if decode == "real" else _extract
    return sub.mapInPandas(fn, schema="id string, features array<float>")


def transform_media(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "url",
    image_size: tuple[int, int] = (64, 64),
    audio_samples: int = 16000,
    interp: str = "bilinear",
) -> DataFrame:
    """REAL decode -> resize/resample -> re-encode, end to end (r4):
    the canonical multimodal normalization stage of a training-data
    pipeline (every image to a fixed raster, every audio clip to a fixed
    sample count) as one Arrow-batched mapInPandas pass.

    Images (PNG/BMP) resize with the chosen interpolation and re-encode
    as PNG; WAV audio linear-resamples to `audio_samples` and re-encodes
    as 16-bit PCM WAV. Output: (id, media_type, payload binary) —
    payloads are valid files any conforming reader accepts (CRCs et al).
    JPEG images decode (baseline JFIF, r5) and normalize to PNG like BMP;
    MJPEG AVI video (r5) decodes, resizes EVERY frame to image_size, and
    re-encodes as MJPEG AVI at the source fps (frame count preserved).
    Inter-frame video (MP4/H.264) still raises — filter those by
    sniff_media_meta upstream.

    Rows with NULL/empty payloads emit NO output row (there is nothing
    to normalize) — this sink-shaped contract differs from
    extract_media_features, which preserves such rows as zero vectors;
    compare pre/post counts or anti-join on id if you need the drops."""
    if interp not in ("nearest", "bilinear"):
        raise ValueError(f"interp must be nearest|bilinear, got {interp!r}")
    out_h, out_w = image_size

    sub = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def _transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .media_codecs import (
            avi_info,
            decode_payload,
            encode_avi_mjpeg,
            encode_png,
            encode_wav,
            resample_linear,
            resize_bilinear,
            resize_nearest,
        )

        resize = resize_bilinear if interp == "bilinear" else resize_nearest
        for pdf in batches:
            ids, types, payloads = [], [], []
            for i, b in zip(pdf["id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                raw = bytes(b)
                mt, arr = decode_payload(raw)
                if mt == "audio/wav":
                    out = encode_wav(resample_linear(arr, audio_samples))
                    mt_out = "audio/wav"
                elif mt == "video/avi":
                    frames = [resize(f, out_h, out_w) for f in arr]
                    out = encode_avi_mjpeg(frames, fps=max(1, avi_info(raw)["fps"]))
                    mt_out = "video/avi"
                else:
                    out = encode_png(resize(arr, out_h, out_w))
                    mt_out = "image/png"  # BMP normalizes to PNG
                ids.append(i)
                types.append(mt_out)
                payloads.append(out)
            yield pd.DataFrame({"id": ids, "media_type": types, "payload": payloads})

    return sub.mapInPandas(_transform, schema="id string, media_type string, payload binary")


def frame_sample_plan(
    df: DataFrame,
    bin_col: str = "html",
    id_col: str = "url",
    every_n: int = 10,
    decode: str = "stub",
) -> DataFrame:
    """Video frame sampling -> `(id, frame_idx, frame_bytes)`.

    decode='real' (r5): walks each MJPEG-AVI payload's chunk headers
    (media_codecs.avi_frame_index — 8 bytes read per frame, ZERO entropy
    bytes of the skipped frames) and emits every Nth frame's raw JPEG
    bytes, each independently decodable downstream. Arrow-batched
    mapInPandas; NULL/empty payloads emit no rows.

    decode='stub' (default): deterministic index rows with NULL bytes —
    keeps the downstream join/agg shape exercisable for payloads in
    formats the real walker does not speak."""
    if decode not in ("stub", "real"):
        raise ValueError(f"decode must be 'stub' or 'real', got {decode!r}")
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if decode == "real":
        sub = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

        def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .media_codecs import avi_frame_index

            for pdf in batches:
                ids: list = []
                idxs: list[int] = []
                frames: list[bytes] = []
                for i, b in zip(pdf["id"], pdf["payload"]):
                    if b is None or len(b) == 0:
                        continue
                    buf = bytes(b)
                    offsets = avi_frame_index(buf)
                    for fi in range(0, len(offsets), every_n):
                        o, s = offsets[fi]
                        ids.append(i)
                        idxs.append(fi)
                        frames.append(buf[o : o + s])
                yield pd.DataFrame(
                    {"id": ids, "frame_idx": pd.Series(idxs, dtype="int32"), "frame_bytes": frames}
                )

        return sub.mapInPandas(_sample, schema="id string, frame_idx int, frame_bytes binary")
    n_frames = F.least(F.floor(F.length(F.col(bin_col)) / F.lit(1000)), F.lit(100)).cast("int")
    # zero-frame payloads emit NO rows (an empty array explodes to nothing)
    idx = F.when(n_frames >= 1, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(idx).alias("frame_idx"),
        F.lit(None).cast("binary").alias("frame_bytes"),
    )

"""From-scratch media decoders: WAV (PCM), BMP (BI_RGB), PNG (zlib).

Round 4: replaces most of the `decode='real'` NotImplementedError in
multimodal.py. These three container formats have small public specs and
need nothing beyond numpy + the stdlib zlib PNG already depends on —
so the "real decode" path is real for them; only JPEG (entropy-coded
DCT) and video containers remain gated on external codec libraries.

Reference analog: the reference decodes opaque sonar payloads with a
format-specific reader chosen by magic bytes
(/root/reference/water_column_sonar_processing/processing/raw_to_zarr.py:66-108);
this module is the same dispatch for web media payloads.

All decoders are strict about the subset they implement and raise
ValueError with a reason otherwise — a corrupt or exotic file must fail
loudly, not produce garbage features.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def decode_wav(buf: bytes) -> np.ndarray:
    """RIFF/WAVE PCM -> float64 samples in [-1, 1], channels averaged.

    Supports PCM (format 1) at 8/16/32-bit and IEEE float (format 3)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes, {len(body)} remain"
            )
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, _rate, _, _, bits = fmt
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}/{bits}")
    if n_channels > 1:
        x = x[: len(x) - len(x) % n_channels].reshape(-1, n_channels).mean(axis=1)
    return x


def decode_bmp(buf: bytes) -> np.ndarray:
    """Windows BMP (BITMAPINFOHEADER, uncompressed 24/32-bit BI_RGB)
    -> (h, w, 3) uint8 RGB (bottom-up rows flipped to top-down)."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", buf, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    bypp = bpp // 8
    stride = (w * bypp + 3) & ~3
    need = data_off + stride * h
    if len(buf) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off).reshape(h, stride)
    px = rows[:, : w * bypp].reshape(h, w, bypp)
    rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    return (rgb if top_down else rgb[::-1]).copy()


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(buf: bytes) -> np.ndarray:
    """PNG (8-bit, non-interlaced, color types 0/2/4/6) -> (h, w, c)
    uint8. Filter reconstruction: None/Up are row-vectorized, Sub is a
    per-lane cumsum (mod 256 distributes over the int64 prefix sum), but
    Average and Paeth carry a serial left-pixel dependency through a
    floor-division/branch that numpy cannot prefix-scan — those two run
    an O(w) per-pixel Python loop per row. Cost note: real-world encoders
    emit Average/Paeth often, so decode throughput on such files is
    bounded by that loop (~us/pixel); IDAT inflates via stdlib zlib."""
    if buf[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(buf):
        ln = struct.unpack_from(">I", buf, pos)[0]
        ctype = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + ln]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # len + type + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth={depth} color={color} interlace={interlace}")
    c = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("bad PNG scanline payload size")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = raw[y, 1:].astype(np.int32)
        up = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        ft = int(ftypes[y])
        if ft == 0:  # None
            rec = line
        elif ft == 2:  # Up
            rec = (line + up) & 0xFF
        elif ft == 1:  # Sub: recon[x] = raw[x] + recon[x-c]  == lane-wise
            # prefix sum; mod 256 commutes with addition so one int64
            # cumsum + mask is exact (no per-pixel loop)
            rec = (np.cumsum(line.reshape(w, c), axis=0, dtype=np.int64) & 0xFF).reshape(stride).astype(np.int32)
        elif ft in (3, 4):  # Average / Paeth: serial left-recursion
            rec = np.empty(stride, dtype=np.int32)
            prev = np.zeros(c, dtype=np.int32)
            for x0 in range(0, stride, c):
                seg = line[x0 : x0 + c]
                if ft == 3:
                    val = (seg + ((prev + up[x0 : x0 + c]) >> 1)) & 0xFF
                else:
                    ul = out[y - 1, x0 - c : x0].astype(np.int32) if (y and x0) else np.zeros(c, dtype=np.int32)
                    a, b = prev, up[x0 : x0 + c]
                    p = a + b - ul
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - ul)
                    pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, ul))
                    val = (seg + pred) & 0xFF
                rec[x0 : x0 + c] = val
                prev = val
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, c)


def encode_png(px: np.ndarray, level: int = 6) -> bytes:
    """(h, w, c) uint8 -> PNG bytes (8-bit, filter 0 rows, one IDAT).
    Spec-correct output: decode_png(encode_png(x)) == x, and any
    conforming reader accepts it (CRCs included)."""
    if px.ndim != 3 or px.dtype != np.uint8 or px.shape[2] not in (1, 2, 3, 4):
        raise ValueError("expected (h, w, c) uint8 with c in 1/2/3/4")
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.zeros((h, w * c + 1), dtype=np.uint8)
    raw[:, 1:] = px.reshape(h, w * c)  # filter byte 0 per row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float samples in [-1, 1] -> 16-bit PCM mono WAV bytes."""
    raw = (
        np.clip(np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) -> (out_h, out_w, c), nearest neighbor (pixel-center
    sampling: src = floor((i + 0.5) * in/out))."""
    h, w, _ = px.shape
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return px[ys][:, xs]


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) uint8 -> (out_h, out_w, c) uint8, bilinear with
    half-pixel centers (align_corners=False convention), edge-clamped."""
    h, w, c = px.shape
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resample_linear(x: np.ndarray, n_out: int) -> np.ndarray:
    """1-D linear-interpolation resample to n_out samples (endpoint-
    aligned, the simple sample-rate converter)."""
    n = len(x)
    if n == 0 or n_out <= 0:
        return np.zeros(max(n_out, 0), dtype=np.float64)
    if n == 1:
        return np.full(n_out, float(x[0]))
    pos = np.linspace(0.0, n - 1, n_out)
    return np.interp(pos, np.arange(n), np.asarray(x, dtype=np.float64))


def decode_payload(buf: bytes) -> tuple[str, np.ndarray]:
    """Magic-dispatch real decode -> (media_type, decoded array).

    WAV -> 1-D float64 samples; BMP/PNG -> (h, w, c) uint8. JPEG and
    video containers raise NotImplementedError (entropy-coded DCT /
    codec stacks stay library-gated)."""
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "audio/wav", decode_wav(buf)
    if buf[:2] == b"BM":
        return "image/bmp", decode_bmp(buf)
    if buf[:8] == _PNG_MAGIC:
        return "image/png", decode_png(buf)
    if buf[:3] == b"\xff\xd8\xff":
        raise NotImplementedError("JPEG decode needs a DCT codec library (not in this container)")
    raise ValueError("unknown media payload (no WAV/BMP/PNG magic)")

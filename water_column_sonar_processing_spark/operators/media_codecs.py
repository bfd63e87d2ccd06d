"""From-scratch media decoders: WAV (PCM), BMP (BI_RGB), PNG (zlib),
baseline JPEG (JFIF, r5 — decoder + encoder from ITU-T T.81), and
MJPEG-in-AVI video (r5 — RIFF container over the JPEG codec).

Round 4 replaced most of the `decode='real'` NotImplementedError in
multimodal.py with real WAV/BMP/PNG codecs; round 5 closes the JPEG gap
with a baseline sequential-DCT Huffman codec (numpy IDCT/DCT batched via
einsum) and the VIDEO gap with an AVI (RIFF) container writer + reader
whose frames are that same JPEG codec — frame sampling reads only the
8-byte chunk headers, never the skipped frames' entropy data. Inter-
frame-compressed codecs (H.264/VP9/MP4 containers) stay out of scope:
those genuinely need external codec stacks this container does not ship.

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


# ---------------------------------------------------------------- JPEG (baseline JFIF)
# From the public ITU-T T.81 spec (same playbook as the NetCDF/PNG
# from-scratch codecs): baseline sequential DCT, Huffman entropy coding.
# Annex K.1/K.2 example quantization tables (public spec constants):
_JPEG_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_JPEG_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)
# zig-zag scan order (spec figure 5): index i of the scan -> (row, col)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
# 8x8 DCT-II basis: C[u, x] = a(u)/2 * cos((2x+1) u pi / 16)
_DCT_C = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
    for u in range(8)
])


def _huff_canonical(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol from a DHT's 16 length counts + symbols
    (spec Annex C code-assignment: consecutive codes per length)."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.nbits = 0
        self.acc = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.d):
                raise ValueError("JPEG entropy segment exhausted")
            self.acc = self.d[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """Spec EXTEND: s-bit magnitude bits -> signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF (SOF0, Huffman, 8-bit, optional restart markers,
    4:4:4 / 4:2:2 / 4:2:0 sampling) -> (h, w, 3) uint8 RGB, or (h, w, 1)
    for grayscale. Progressive (SOF2) and arithmetic coding raise.

    Cost note: Huffman entropy decoding is an interpreted per-symbol
    loop (like PNG's Paeth row); the IDCT is batched numpy (einsum over
    all blocks). Good for the Arrow-batched feature path, not a codec
    race."""
    if buf[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG file")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    hdc: dict[int, dict] = {}
    hac: dict[int, dict] = {}
    comps = None
    h = w = 0
    restart = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # spec B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while buf[pos + 1] == 0xFF and pos + 4 < len(buf):
            pos += 1
        marker = buf[pos + 1]
        ln = struct.unpack_from(">H", buf, pos + 2)[0]
        body = buf[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported (baseline is 8)")
                qt[tq] = np.frombuffer(body, dtype=np.uint8, count=64, offset=i + 1).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = body[i + 17 : i + 17 + n]
                (hdc if tc == 0 else hac)[th] = _huff_canonical(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec = body[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            h, w = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF type 0x{marker:02x} (baseline SOF0 only)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS -> entropy data follows
            ns = body[0]
            scan = []
            for ci in range(ns):
                cid, tt = body[1 + 2 * ci : 3 + 2 * ci]
                scan.append((cid, tt >> 4, tt & 0xF))
            pos = pos + 2 + ln
            return _decode_scan(buf, pos, comps, scan, qt, hdc, hac, h, w, restart)
        pos += 2 + ln
    raise ValueError("JPEG: no SOS marker")


def _decode_scan(buf, pos, comps, scan, qt, hdc, hac, h, w, restart):
    if comps is None:
        raise ValueError("JPEG: SOS before SOF0")
    # split entropy data into restart segments, unstuffing FF00
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    while i < len(buf):
        b = buf[i]
        if b == 0xFF:
            nxt = buf[i + 1] if i + 1 < len(buf) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        i += 1
    segs.append(bytes(cur))

    if [cid for cid, _, _ in scan] != [c["id"] for c in comps]:
        # the MCU loop interleaves in SOF order; a scan that reorders or
        # subsets components would decode silently wrong — fail loudly
        raise ValueError("JPEG: SOS component order differs from SOF0 (unsupported)")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            # integer-repeat upsampling needs divisible factors (covers
            # 4:4:4/4:2:2/4:2:0/4:1:1); baseline-legal 3:2-style ratios
            # would mis-register planes — refuse explicitly
            raise ValueError(
                f"JPEG: non-divisible sampling factors {c['h']}x{c['v']} vs {hmax}x{vmax}"
            )
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for cid, td, ta in scan:
        c = by_id[cid]
        c["dc"] = hdc[td]
        c["ac"] = hac[ta]
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        c["pred"] = 0

    n_mcu = mcux * mcuy
    per_seg = restart if restart else n_mcu
    mcu = 0
    for seg in segs:
        r = _BitReader(seg)
        for c in comps:
            c["pred"] = 0  # DC predictors reset at restart boundaries
        for _ in range(min(per_seg, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                for vy in range(c["v"]):
                    for hx in range(c["h"]):
                        blk = c["coef"][my * c["v"] + vy, mx * c["h"] + hx]
                        s = _huff_decode(r, c["dc"])
                        diff = _extend(r.bits(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, c["ac"])
                            rrun, ssz = rs >> 4, rs & 0xF
                            if ssz == 0:
                                if rrun == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrun
                            if k > 63:
                                raise ValueError("JPEG AC run overflows block")
                            blk[k] = _extend(r.bits(ssz), ssz)
                            k += 1
            mcu += 1
    if mcu != n_mcu:
        raise ValueError(f"JPEG: decoded {mcu} of {n_mcu} MCUs")

    planes = []
    for c in comps:
        q = qt[c["tq"]]
        zz = c["coef"].reshape(-1, 64) * q[None, :]  # dequantize (zigzag order)
        blocks = np.zeros((zz.shape[0], 64), dtype=np.float64)
        blocks[:, _ZZ] = zz  # dezigzag
        blocks = blocks.reshape(-1, 8, 8)
        # batched 2-D IDCT: X = C^T diag @ C  ->  einsum over all blocks
        px = np.einsum("ur,nuv,vc->nrc", _DCT_C, blocks, _DCT_C, optimize=True)
        by, bx = c["coef"].shape[:2]
        plane = px.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w] + 128.0)
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r_, g_, b_], axis=-1)), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


# encoder Huffman tables: fixed-length canonical codes (12 DC symbols at
# 4 bits, all 162 (run,size) AC symbols at 8 bits. Valid per Annex C —
# prefix-free, all-ones code unused — just not size-optimal; the decoder
# reads whatever DHT declares, so it also handles standard-table files.)
_ENC_DC_SYMS = list(range(12))
_ENC_AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_ENC_DC_BITS = [0, 0, 0, 12] + [0] * 12
_ENC_AC_BITS = [0] * 7 + [162] + [0] * 8


def _enc_code(syms: list[int], ln: int) -> dict[int, tuple[int, int]]:
    return {s: (ln, i) for i, s in enumerate(syms)}


_ENC_DC = _enc_code(_ENC_DC_SYMS, 4)
_ENC_AC = _enc_code(_ENC_AC_SYMS, 8)


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(px: np.ndarray) -> bytes:
    """(h, w, 1|3) uint8 -> baseline JFIF bytes (SOF0, 4:4:4, Annex K
    quant tables, fixed-length Huffman tables). decode_jpeg(encode_jpeg(x))
    reconstructs x up to quantization error (pinned by tests)."""
    if px.ndim != 3 or px.dtype != np.uint8 or px.shape[2] not in (1, 3):
        raise ValueError("expected (h, w, 1|3) uint8")
    h, w, nc = px.shape
    if nc == 3:  # RGB -> YCbCr (JFIF)
        r_, g_, b_ = (px[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r_ + 0.587 * g_ + 0.114 * b_,
            128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_,
            128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_,
        ]
        qids = [0, 1, 1]
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        qids = [0]
    # DQT lists Qk in ZIGZAG order (spec B.2.4.1); the Annex K constants
    # above are the natural raster listing — permute once so the emitted
    # tables and the quantization both use true Annex-K frequency steps
    qtabs = [_JPEG_QL[_ZZ], _JPEG_QC[_ZZ]]

    ph = (h + 7) & ~7
    pw = (w + 7) & ~7
    comp_blocks = []
    for plane in planes:
        pad = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = pad.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        # _DCT_C rows are orthonormal: FDCT = C X C^T, IDCT = C^T S C
        f = np.einsum("ur,nrc,vc->nuv", _DCT_C, blocks, _DCT_C, optimize=True)
        comp_blocks.append(f)
    wtr = _BitWriter()
    preds = [0] * len(planes)
    nby, nbx = ph // 8, pw // 8
    for bi in range(nby * nbx):
        for ci, f in enumerate(comp_blocks):
            q = qtabs[qids[ci]]
            zz = np.rint(f[bi].reshape(64)[_ZZ] / q).astype(np.int64)
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            s = _cat(diff)
            ln, code = _ENC_DC[s]
            wtr.write(code, ln)
            if s:
                wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = _ENC_AC[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                s = _cat(v)
                ln, code = _ENC_AC[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 63:
                ln, code = _ENC_AC[0x00]
                wtr.write(code, ln)
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(qtabs[0].tolist()))
    if nc == 3:
        out += seg(0xDB, bytes([1]) + bytes(qtabs[1].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    out += seg(0xC0, sof)
    for tc in (0, 1):
        bits, syms = (_ENC_DC_BITS, _ENC_DC_SYMS) if tc == 0 else (_ENC_AC_BITS, _ENC_AC_SYMS)
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(syms))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# AVI / MJPEG container (video). Layout per the public RIFF AVI spec
# (Microsoft "AVI RIFF File Reference"):
#   RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
#               LIST('movi' '00dc'(jpeg) ...) 'idx1')
# Every chunk is <fourcc><u32 size><body>[pad-to-even]. Frames are whole
# baseline-JFIF files (fccHandler 'MJPG'), so the per-frame codec is the
# encode_jpeg/decode_jpeg pair above.


def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """(n, h, w, 1|3) uint8 stack (or list of (h, w, c) arrays) -> MJPEG
    AVI bytes. Each frame encodes as an independent baseline JPEG keyframe
    ('00dc' chunk); an idx1 index is written (AVIF_HASINDEX) with offsets
    relative to the 'movi' fourcc, the convention most players expect."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("AVI: need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("AVI: all frames must share one shape")
    if fps < 1:
        raise ValueError(f"AVI: fps must be >= 1, got {fps}")
    jpegs = [encode_jpeg(f) for f in frames]

    def ck(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    max_f = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, max_f * fps, 0, 0x10,  # usec/frame, bytes/sec, pad, AVIF_HASINDEX
        len(jpegs), 0, 1, max_f, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(jpegs), max_f, 0xFFFFFFFF, 0,  # scale=1, rate=fps
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", h * w * 3, 0, 0, 0, 0)
    hdrl = b"hdrl" + ck(b"avih", avih) + ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf))
    movi = bytearray(b"movi")
    idx1 = bytearray()
    for j in jpegs:
        idx1 += b"00dc" + struct.pack("<III", 0x10, len(movi), len(j))  # AVIIF_KEYFRAME
        movi += ck(b"00dc", j)
    body = b"AVI " + ck(b"LIST", hdrl) + ck(b"LIST", bytes(movi)) + ck(b"idx1", bytes(idx1))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_info(buf: bytes) -> dict:
    """Header-only metadata: {n_frames, width, height, fps} from avih/strh
    (no frame decode). fps falls back to the avih frame period when the
    video strh is absent."""
    hdr = _avi_walk(buf)
    return {k: hdr[k] for k in ("n_frames", "width", "height", "fps")}


def avi_frame_index(buf: bytes) -> list[tuple[int, int]]:
    """Per-frame (absolute_offset, size) of the JPEG bytes inside the
    container, from an 8-byte-header walk of the 'movi' list — O(frames)
    header reads, ZERO entropy bytes touched, so sampling every Nth frame
    never pays for the skipped ones. The sequential walk is authoritative
    rather than idx1: offset-base conventions for idx1 vary in the wild
    (movi-relative vs file-relative), while chunk headers do not."""
    return _avi_walk(buf)["frames"]


def _avi_walk(buf: bytes) -> dict:
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI file (RIFF/'AVI ' magic)")
    out = {"n_frames": 0, "width": 0, "height": 0, "fps": 0, "frames": []}
    usec_per_frame = 0

    def walk(pos: int, end: int, in_movi: bool) -> None:
        nonlocal usec_per_frame
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            sz = struct.unpack_from("<I", buf, pos + 4)[0]
            if pos + 8 + sz > end:
                raise ValueError(f"AVI: chunk {cid!r} overruns its parent list")
            if cid == b"LIST":
                ltype = buf[pos + 8 : pos + 12]
                walk(pos + 12, pos + 8 + sz, in_movi or ltype == b"movi")
            elif cid == b"avih":
                micro, _, _, _, total, _, _, _, w, h = struct.unpack_from("<10I", buf, pos + 8)
                out["n_frames"], out["width"], out["height"] = total, w, h
                usec_per_frame = micro
            elif cid == b"strh" and buf[pos + 8 : pos + 12] == b"vids":
                _, _, _, _, _, _, scale, rate = struct.unpack_from("<4s4sIHHIII", buf, pos + 8)
                if scale:
                    out["fps"] = rate // scale
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                out["frames"].append((pos + 8, sz))
            pos += 8 + sz + (sz & 1)

    # clamp the declared RIFF extent to the actual buffer: a truncated
    # file then fails the per-chunk overrun check instead of a raw
    # struct.error mid-header
    walk(12, min(8 + struct.unpack_from("<I", buf, 4)[0], len(buf)), False)
    if not out["fps"] and usec_per_frame:
        out["fps"] = round(1_000_000 / usec_per_frame)
    return out


def decode_avi_mjpeg(buf: bytes, indices: list[int] | None = None) -> np.ndarray:
    """MJPEG AVI -> (n, h, w, c) uint8 frame stack. `indices` selects
    frames by position (only those decode — the point of the container
    walk); None decodes all."""
    frames = avi_frame_index(buf)
    if not frames:
        raise ValueError("AVI: movi list holds no video frames")
    sel = range(len(frames)) if indices is None else indices
    out = []
    for i in sel:
        o, s = frames[i]
        out.append(decode_jpeg(buf[o : o + s]))
    return np.stack(out)


def decode_payload(buf: bytes) -> tuple[str, np.ndarray]:
    """Magic-dispatch real decode -> (media_type, decoded array).

    WAV -> 1-D float64 samples; BMP/PNG/JPEG -> (h, w, c) uint8;
    MJPEG AVI -> (n_frames, h, w, c) uint8. Inter-frame video (MP4/H.264
    et al) has no from-scratch decoder and lands on the ValueError."""
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "audio/wav", decode_wav(buf)
    if len(buf) >= 12 and buf[:4] == b"RIFF" and buf[8:12] == b"AVI ":
        return "video/avi", decode_avi_mjpeg(buf)
    if buf[:2] == b"BM":
        return "image/bmp", decode_bmp(buf)
    if buf[:8] == _PNG_MAGIC:
        return "image/png", decode_png(buf)
    if buf[:3] == b"\xff\xd8\xff":
        return "image/jpeg", decode_jpeg(buf)
    raise ValueError("unknown media payload (no WAV/AVI/BMP/PNG/JPEG magic)")

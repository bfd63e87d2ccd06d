"""From-scratch WAV/BMP/PNG decoders vs hand-built encoders written
independently in this test from the same public specs — including all
five PNG filter types — plus the Spark decode='real' path."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from water_column_sonar_processing_spark.operators import multimodal as mm
from water_column_sonar_processing_spark.operators.media_codecs import (
    decode_bmp,
    decode_payload,
    decode_png,
    decode_wav,
)


# ---------------------------------------------------------------- encoders (test-side oracles)
def make_wav(samples: np.ndarray, n_channels: int = 1, bits: int = 16, rate: int = 8000) -> bytes:
    """Interleaved int PCM WAV encoder (spec-following, independent)."""
    if bits == 16:
        raw = (samples * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        raw = (samples * 128.0 + 128.0).clip(0, 255).astype(np.uint8).tobytes()
    else:
        raise ValueError(bits)
    block = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_bmp(pixels: np.ndarray) -> bytes:
    """24-bit bottom-up BI_RGB BMP encoder."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # top-down RGB -> bottom-up BGR
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    off = 14 + len(info)
    head = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    return head + info + data


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", zlib.crc32(ctype + body))


def make_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """PNG encoder applying a chosen filter type per row (the encoder-side
    filter transforms are implemented here independently of the decoder)."""
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    px = pixels.astype(np.int32)
    filters = filters if filters is not None else [0] * h
    lines = []
    for y in range(h):
        cur = px[y].reshape(-1)
        up = px[y - 1].reshape(-1) if y else np.zeros(w * c, dtype=np.int32)
        left = np.concatenate([np.zeros(c, dtype=np.int32), cur[:-c]]) if w * c > c else np.zeros_like(cur)
        ul = np.concatenate([np.zeros(c, dtype=np.int32), up[:-c]]) if w * c > c else np.zeros_like(cur)
        f = filters[y]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - up) & 0xFF
        elif f == 3:
            enc = (cur - ((left + up) >> 1)) & 0xFF
        elif f == 4:
            p = left + up - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul))
            enc = (cur - pred) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- decoder tests
def test_wav_16bit_stereo_roundtrip():
    rng = np.random.default_rng(7)
    stereo = rng.uniform(-0.9, 0.9, 2000)  # interleaved L R L R ...
    buf = make_wav(stereo, n_channels=2, bits=16)
    got = decode_wav(buf)
    exp = (stereo * 32768.0).clip(-32768, 32767).astype("<i2").astype(np.float64) / 32768.0
    np.testing.assert_allclose(got, exp.reshape(-1, 2).mean(axis=1), atol=0)
    assert len(got) == 1000


def test_wav_8bit_mono():
    x = np.linspace(-1, 1, 256)
    got = decode_wav(make_wav(x, bits=8))
    exp = ((x * 128.0 + 128.0).clip(0, 255).astype(np.uint8).astype(np.float64) - 128.0) / 128.0
    np.testing.assert_allclose(got, exp)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE" + b"nochunks")
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all")


def test_bmp_roundtrip_with_stride_padding():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)  # w=3 -> 9 bytes/row, stride 12
    got = decode_bmp(make_bmp(px))
    np.testing.assert_array_equal(got, px)


def test_png_all_filter_types():
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    buf = make_png(px, filters=[0, 1, 2, 3, 4])
    np.testing.assert_array_equal(decode_png(buf), px)


def test_png_gray_and_rgba():
    rng = np.random.default_rng(17)
    for c in (1, 2, 4):
        px = rng.integers(0, 256, (4, 4, c), dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(make_png(px, filters=[4, 3, 2, 1])), px)


def test_decode_payload_dispatch():
    wav = make_wav(np.zeros(10))
    assert decode_payload(wav)[0] == "audio/wav"
    png = make_png(np.zeros((2, 2, 3), dtype=np.uint8))
    assert decode_payload(png)[0] == "image/png"
    bmp = make_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    assert decode_payload(bmp)[0] == "image/bmp"
    from water_column_sonar_processing_spark.operators.media_codecs import encode_jpeg

    jpg = encode_jpeg(np.zeros((8, 8, 1), dtype=np.uint8))
    assert decode_payload(jpg)[0] == "image/jpeg"  # r5: JPEG is real now
    with pytest.raises(ValueError):  # truncated JPEG still fails loudly
        decode_payload(b"\xff\xd8\xff\xe0jpeg")
    with pytest.raises(ValueError):
        decode_payload(b"who knows")


def test_extract_media_features_real_decode(spark):
    """decode='real' features == the shared kernel over the DECODED
    content bytes (computed independently here), not the raw payload."""
    import pandas as pd

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    png = make_png(px, filters=[0, 1, 2, 3, 4, 0])
    samples = rng.uniform(-0.5, 0.5, 500)
    wav = make_wav(samples, bits=16)
    df = spark.createDataFrame([("png1", png), ("wav1", wav)], "url string, html binary")
    got = {r["id"]: np.array(r["features"]) for r in mm.extract_media_features(df, decode="real").collect()}
    # independent expectation
    dec_png = px.tobytes()
    wav_f = (samples * 32768.0).clip(-32768, 32767).astype("<i2").astype(np.float64) / 32768.0
    dec_wav = np.clip(np.round(wav_f * 127.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
    exp = mm._fake_decode_features(pd.Series([dec_png, dec_wav]))
    np.testing.assert_array_equal(got["png1"], exp[0])
    np.testing.assert_array_equal(got["wav1"], exp[1])
    # and real != fake-over-raw-bytes (it decoded, not just hashed the container)
    raw = mm._fake_decode_features(pd.Series([png, wav]))
    assert not np.array_equal(got["png1"], raw[0])


# ---------------------------------------------------------------- property tests
from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    c=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
    data=st.data(),
)
def test_png_roundtrip_property(h, w, c, seed, data):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    np.testing.assert_array_equal(decode_png(make_png(px, filters=filters)), px)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(0, 500),
    ch=st.sampled_from([1, 2, 3]),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, bits, seed):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, n * ch)
    got = decode_wav(make_wav(x, n_channels=ch, bits=bits))
    if bits == 16:
        exp = (x * 32768.0).clip(-32768, 32767).astype("<i2").astype(np.float64) / 32768.0
    else:
        exp = ((x * 128.0 + 128.0).clip(0, 255).astype(np.uint8).astype(np.float64) - 128.0) / 128.0
    if ch > 1:
        exp = exp.reshape(-1, ch).mean(axis=1)
    np.testing.assert_allclose(got, exp)


@settings(max_examples=30, deadline=None)
@given(
    # n >= 1: zero-row writes now raise (classic spec reads dim length 0
    # as the record dimension; see test_zero_row_write_refused)
    n=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    kinds=st.lists(st.sampled_from(["i32", "i64", "f32", "f64", "str"]), min_size=1, max_size=5),
)
def test_netcdf_roundtrip_property(n, seed, kinds, tmp_path_factory):
    from water_column_sonar_processing_spark.sources.netcdf import (
        read_netcdf_classic,
        write_netcdf_classic,
    )

    rng = np.random.default_rng(seed)
    cols = {}
    for i, k in enumerate(kinds):
        name = f"c{i}_{k}"
        if k == "i32":
            cols[name] = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(np.int32)
        elif k == "i64":
            cols[name] = rng.integers(-(2**60), 2**60, n, dtype=np.int64)
        elif k == "f32":
            cols[name] = rng.normal(size=n).astype(np.float32)
        elif k == "f64":
            cols[name] = rng.normal(size=n)
        else:
            cols[name] = np.array(
                ["".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(0, 9))) for _ in range(n)],
                dtype=object,
            )
    p = str(tmp_path_factory.mktemp("nc") / "prop.nc")
    write_netcdf_classic(p, cols, allow_lossy_int64=True)
    got = read_netcdf_classic(p)
    for name, v in cols.items():
        if name.endswith("i64"):
            exp = v.astype(np.int32) if (n and v.min() >= -(2**31) and v.max() < 2**31) or n == 0 else v.astype(np.float64)
            np.testing.assert_array_equal(got[name], exp)
        elif name.endswith("str"):
            assert list(got[name]) == list(v)
        else:
            np.testing.assert_array_equal(got[name], v)


# ---------------------------------------------------------------- resize / resample / re-encode
from water_column_sonar_processing_spark.operators.media_codecs import (
    encode_png,
    encode_wav,
    resample_linear,
    resize_bilinear,
    resize_nearest,
)


def test_encode_png_roundtrip_and_spec():
    rng = np.random.default_rng(5)
    for c in (1, 3, 4):
        px = rng.integers(0, 256, (9, 7, c), dtype=np.uint8)
        buf = encode_png(px)
        np.testing.assert_array_equal(decode_png(buf), px)
        # chunk CRCs are real: flipping a data byte must break the CRC zone
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"


def test_resize_nearest_exact_oracle():
    px = np.arange(4 * 4 * 1, dtype=np.uint8).reshape(4, 4, 1)
    out = resize_nearest(px, 2, 2)
    # centers of 2x2 output sample src rows/cols floor((i+.5)*2) = 1, 3
    exp = px[[1, 3]][:, [1, 3]]
    np.testing.assert_array_equal(out, exp)
    # upscale is duplication
    up = resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 1)
    np.testing.assert_array_equal(up[::2, ::2], px)


def test_resize_bilinear_against_independent_impl():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    out = resize_bilinear(px, 3, 7)
    # independent scalar implementation (same half-pixel convention)
    h, w, c = px.shape
    exp = np.zeros((3, 7, c))
    for y in range(3):
        for x in range(7):
            fy = min(max((y + 0.5) * h / 3 - 0.5, 0), h - 1)
            fx = min(max((x + 0.5) * w / 7 - 0.5, 0), w - 1)
            y0, x0 = int(fy), int(fx)
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            wy, wx = fy - y0, fx - x0
            exp[y, x] = (
                px[y0, x0] * (1 - wy) * (1 - wx)
                + px[y0, x1] * (1 - wy) * wx
                + px[y1, x0] * wy * (1 - wx)
                + px[y1, x1] * wy * wx
            )
    np.testing.assert_array_equal(out, np.clip(np.rint(exp), 0, 255).astype(np.uint8))


def test_resample_linear_identity_and_halving():
    x = np.array([0.0, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(resample_linear(x, 4), x)
    np.testing.assert_allclose(resample_linear(x, 7), np.linspace(0, 3, 7))
    assert len(resample_linear(np.array([]), 5)) == 5


def test_transform_media_end_to_end(spark):
    """decode -> resize/resample -> re-encode over Spark; outputs are
    valid files that OUR independent decoders re-read, with exact
    expected contents."""
    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, (10, 8, 3), dtype=np.uint8)
    bmp = make_bmp(px)  # BMP in -> PNG out
    samples = rng.uniform(-0.8, 0.8, 1000)
    wav = make_wav(samples, bits=16)
    df = spark.createDataFrame([("img", bmp), ("aud", wav)], "url string, html binary")
    out = {
        r["id"]: (r["media_type"], bytes(r["payload"]))
        for r in mm.transform_media(df, image_size=(4, 4), audio_samples=100).collect()
    }
    mt, buf = out["img"]
    assert mt == "image/png"
    np.testing.assert_array_equal(decode_png(buf), resize_bilinear(px, 4, 4))
    mt, buf = out["aud"]
    assert mt == "audio/wav"
    got = decode_wav(buf)
    exp_in = (samples * 32768.0).clip(-32768, 32767).astype("<i2").astype(np.float64) / 32768.0
    exp = np.clip(resample_linear(exp_in, 100) * 32768.0, -32768, 32767).astype("<i2").astype(np.float64) / 32768.0
    np.testing.assert_allclose(got, exp)
    assert len(got) == 100


def test_wav_truncated_chunk_fails_loudly():
    buf = make_wav(np.zeros(100))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(buf[: len(buf) - 10])


def test_transform_media_null_and_empty_payloads_dropped(spark):
    df = spark.createDataFrame(
        [("a", None), ("b", b""), ("c", make_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))],
        "url string, html binary",
    )
    out = mm.transform_media(df, image_size=(2, 2)).collect()
    assert [r["id"] for r in out] == ["c"]


# ---------------------------------------------------------------- JPEG (r5)
def test_jpeg_flat_gray_exact():
    """A flat 128-gray block quantizes to all-zero coefficients — the
    round trip is EXACT (level shift makes the DCT identically zero)."""
    from water_column_sonar_processing_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    x = np.full((8, 8, 1), 128, dtype=np.uint8)
    y = decode_jpeg(encode_jpeg(x))
    np.testing.assert_array_equal(y, x)


def test_jpeg_roundtrip_smooth_images():
    """Smooth content survives Annex-K quantization within a small
    tolerance; odd sizes exercise edge padding + cropping."""
    from water_column_sonar_processing_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    grad = np.linspace(0, 255, 24 * 16).reshape(24, 16, 1).astype(np.uint8)
    y = decode_jpeg(encode_jpeg(grad))
    assert y.shape == grad.shape
    assert np.abs(y.astype(int) - grad.astype(int)).max() <= 8

    xx, yy = np.meshgrid(np.arange(31), np.arange(23))
    rgb = np.stack([xx * 4 % 256, yy * 6 % 256, (xx + yy) * 3 % 256], axis=-1).astype(np.uint8)
    z = decode_jpeg(encode_jpeg(rgb))
    assert z.shape == rgb.shape
    assert np.abs(z.astype(int) - rgb.astype(int)).mean() < 6.0


def _hand_jpeg(w, h, comps, scan_bits, restart=0):
    """Assemble a baseline JPEG by hand from the spec's segment grammar.
    comps: list of (id, H, V, tq); scan_bits: pre-encoded entropy bytes."""
    import struct as st

    def seg(marker, body):
        return bytes([0xFF, marker]) + st.pack(">H", len(body) + 2) + body

    from water_column_sonar_processing_spark.operators.media_codecs import (
        _ENC_AC_BITS,
        _ENC_AC_SYMS,
        _ENC_DC_BITS,
        _ENC_DC_SYMS,
    )

    out = bytearray(b"\xff\xd8")
    flat_q = bytes([0]) + bytes([16] * 64)  # table 0: all 16s
    out += seg(0xDB, flat_q)
    sof = bytes([8]) + st.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hh, vv, tq in comps:
        sof += bytes([cid, (hh << 4) | vv, tq])
    out += seg(0xC0, sof)
    for tc in (0, 1):
        bits, syms = (_ENC_DC_BITS, _ENC_DC_SYMS) if tc == 0 else (_ENC_AC_BITS, _ENC_AC_SYMS)
        out += seg(0xC4, bytes([tc << 4]) + bytes(bits) + bytes(syms))
    if restart:
        out += seg(0xDD, st.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan_bits
    out += b"\xff\xd9"
    return bytes(out)


def _dc_only_block(wtr, dc_diff):
    """Write one block: DC category+bits then EOB, with the fixed-length
    encoder tables (DC: 4-bit codes; AC: 8-bit codes, EOB=symbol 0)."""
    from water_column_sonar_processing_spark.operators.media_codecs import _ENC_AC, _ENC_DC

    s = int(abs(dc_diff)).bit_length()
    ln, code = _ENC_DC[s]
    wtr.write(code, ln)
    if s:
        wtr.write(dc_diff if dc_diff > 0 else dc_diff + (1 << s) - 1, s)
    ln, code = _ENC_AC[0x00]
    wtr.write(code, ln)


def test_jpeg_420_hand_built_quadrants():
    """Hand-built 4:2:0 vector: one 16x16 MCU, four Y blocks with DC
    values 4/8/12/16 (flat quadrants), zero chroma. Pins MCU block order,
    dequantization, IDCT flat level, and chroma upsampling: quadrant
    luma = 128 + dc*16/8."""
    from water_column_sonar_processing_spark.operators.media_codecs import _BitWriter, decode_jpeg

    wtr = _BitWriter()
    prev = 0
    for dc in (4, 8, 12, 16):  # Y blocks in raster order within the MCU
        _dc_only_block(wtr, dc - prev)
        prev = dc
    _dc_only_block(wtr, 0)  # Cb (its own predictor)
    _dc_only_block(wtr, 0)  # Cr
    buf = _hand_jpeg(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)], wtr.flush())
    img = decode_jpeg(buf)
    assert img.shape == (16, 16, 3)
    # flat IDCT level for a DC-only block: dc * q / 8 (orthonormal basis)
    for (qy, qx), dc in [((0, 0), 4), ((0, 1), 8), ((1, 0), 12), ((1, 1), 16)]:
        quad = img[qy * 8 : qy * 8 + 8, qx * 8 : qx * 8 + 8]
        expect = 128 + dc * 16 // 8
        assert (quad == expect).all(), (qy, qx, dc, np.unique(quad.reshape(-1, 3), axis=0))


def test_jpeg_restart_markers_reset_predictors():
    """DRI=1 + RST0 between two grayscale MCUs: the second block's DC
    difference starts from a RESET predictor, so both blocks decode to
    the same flat value."""
    from water_column_sonar_processing_spark.operators.media_codecs import _BitWriter, decode_jpeg

    w1 = _BitWriter()
    _dc_only_block(w1, 6)
    w2 = _BitWriter()
    _dc_only_block(w2, 6)  # same DIFF; equal output only if predictor reset
    scan = w1.flush() + b"\xff\xd0" + w2.flush()
    buf = _hand_jpeg(16, 8, [(1, 1, 1, 0)], scan, restart=1)
    img = decode_jpeg(buf)
    assert img.shape == (8, 16, 1)
    assert (img == 128 + 6 * 16 // 8).all()


def test_jpeg_rejects_progressive_and_garbage():
    from water_column_sonar_processing_spark.operators.media_codecs import decode_jpeg, encode_jpeg

    x = np.full((8, 8, 1), 200, dtype=np.uint8)
    buf = bytearray(encode_jpeg(x))
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC2  # rebrand SOF0 as progressive
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError, match="JPEG"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_through_decode_payload_and_transform(spark):
    """JPEG payloads flow through the real-decode path end to end:
    transform_media normalizes a JPEG to a fixed-size PNG whose pixels
    match resizing the decoded source."""
    from water_column_sonar_processing_spark.operators.media_codecs import (
        decode_jpeg,
        decode_png,
        encode_jpeg,
        resize_bilinear,
    )
    from water_column_sonar_processing_spark.operators.multimodal import transform_media

    xx, yy = np.meshgrid(np.arange(40), np.arange(24))
    rgb = np.stack([xx * 3 % 256, yy * 5 % 256, (xx * 2 + yy) % 256], axis=-1).astype(np.uint8)
    jpg = encode_jpeg(rgb)
    df = spark.createDataFrame([("j1", bytearray(jpg))], "url string, html binary")
    rows = transform_media(df, image_size=(16, 16)).collect()
    assert len(rows) == 1 and rows[0]["media_type"] == "image/png"
    got = decode_png(bytes(rows[0]["payload"]))
    want = resize_bilinear(decode_jpeg(jpg), 16, 16)
    np.testing.assert_array_equal(got, want)


# ---------------------------------------------------------------- AVI / MJPEG video (r5)
def _smooth_frames(n: int = 6, h: int = 24, w: int = 32) -> np.ndarray:
    """Deterministic smooth RGB frames (JPEG-friendly gradients that vary
    per frame, so a mis-indexed frame read cannot pass by accident)."""
    grad = np.repeat(np.linspace(30, 210, w).astype(np.uint8)[None, :], h, 0)
    return np.stack(
        [np.stack([(grad + 7 * i), grad[::-1], np.full_like(grad, 40 + 9 * i)], axis=-1) for i in range(n)]
    ).astype(np.uint8)


def test_avi_mjpeg_roundtrip_and_headers():
    from water_column_sonar_processing_spark.operators.media_codecs import (
        avi_frame_index,
        avi_info,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    frames = _smooth_frames(6)
    buf = encode_avi_mjpeg(frames, fps=12)
    # container headers parse without touching a single frame byte
    assert avi_info(buf) == {"n_frames": 6, "width": 32, "height": 24, "fps": 12}
    idx = avi_frame_index(buf)
    assert len(idx) == 6
    # each indexed slice is a standalone baseline JPEG (magic + EOI)
    for o, s in idx:
        assert buf[o : o + 3] == b"\xff\xd8\xff" and buf[o + s - 2 : o + s] == b"\xff\xd9"
    dec = decode_avi_mjpeg(buf)
    assert dec.shape == frames.shape and dec.dtype == np.uint8
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 8


def test_avi_frame_sampling_equals_full_decode_sliced():
    from water_column_sonar_processing_spark.operators.media_codecs import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    buf = encode_avi_mjpeg(_smooth_frames(7), fps=5)
    full = decode_avi_mjpeg(buf)
    np.testing.assert_array_equal(decode_avi_mjpeg(buf, indices=[0, 3, 6]), full[::3])
    np.testing.assert_array_equal(decode_avi_mjpeg(buf, indices=[5]), full[5:6])


def test_avi_validation_errors():
    from water_column_sonar_processing_spark.operators.media_codecs import (
        avi_frame_index,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="share one shape"):
        encode_avi_mjpeg([np.zeros((8, 8, 3), np.uint8), np.zeros((4, 8, 3), np.uint8)])
    with pytest.raises(ValueError, match="fps"):
        encode_avi_mjpeg(_smooth_frames(1), fps=0)
    with pytest.raises(ValueError, match="AVI"):
        avi_frame_index(b"RIFF\x04\x00\x00\x00WAVE")
    # truncated container (cut mid-movi): a chunk overrunning its parent
    # fails loudly instead of decoding garbage
    good = encode_avi_mjpeg(_smooth_frames(2), fps=5)
    with pytest.raises(ValueError, match="overruns"):
        decode_avi_mjpeg(good[: len(good) // 2])


def test_avi_decode_payload_and_sniff(spark):
    from water_column_sonar_processing_spark.operators.media_codecs import (
        decode_payload as dp,
        encode_avi_mjpeg,
    )

    frames = _smooth_frames(3)
    buf = encode_avi_mjpeg(frames, fps=10)
    mt, arr = dp(buf)
    assert mt == "video/avi" and arr.shape == frames.shape
    df = spark.createDataFrame(
        [("v", bytearray(buf)), ("w", b"RIFFxxxxWAVE" + b"a" * 16)], "url string, html binary"
    )
    meta = {r["url"]: r["media_type"] for r in mm.sniff_media_meta(df).collect()}
    assert meta == {"v": "video/avi", "w": "audio/wav"}


def test_frame_sample_plan_real(spark):
    """decode='real' emits every Nth frame's raw JPEG bytes; each is
    independently decodable and matches decoding the container directly."""
    from water_column_sonar_processing_spark.operators.media_codecs import (
        decode_avi_mjpeg,
        decode_jpeg,
        encode_avi_mjpeg,
    )

    frames = _smooth_frames(7)
    buf = encode_avi_mjpeg(frames, fps=10)
    df = spark.createDataFrame(
        [("v1", bytearray(buf)), ("empty", None)], "url string, html binary"
    )
    rows = sorted(
        mm.frame_sample_plan(df, every_n=3, decode="real").collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [(r["id"], r["frame_idx"]) for r in rows] == [("v1", 0), ("v1", 3), ("v1", 6)]
    full = decode_avi_mjpeg(buf)
    for r in rows:
        np.testing.assert_array_equal(decode_jpeg(bytes(r["frame_bytes"])), full[r["frame_idx"]])
    with pytest.raises(ValueError, match="decode"):
        mm.frame_sample_plan(df, decode="nope")


def test_transform_media_video_normalization(spark):
    """Video normalizes end to end: every frame resized, fps preserved,
    output a valid MJPEG AVI; pixels match resizing the decoded source."""
    from water_column_sonar_processing_spark.operators.media_codecs import (
        avi_info,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        encode_jpeg,
        resize_bilinear,
    )

    frames = _smooth_frames(4)
    buf = encode_avi_mjpeg(frames, fps=15)
    df = spark.createDataFrame([("v", bytearray(buf))], "url string, html binary")
    rows = mm.transform_media(df, image_size=(12, 16)).collect()
    assert len(rows) == 1 and rows[0]["media_type"] == "video/avi"
    out = bytes(rows[0]["payload"])
    assert avi_info(out) == {"n_frames": 4, "width": 16, "height": 12, "fps": 15}
    got = decode_avi_mjpeg(out)
    # normalized frames = re-encode(resize(decode(src))): compare against
    # the same pipeline run locally (JPEG is lossy, so bytes must match
    # the same-operations oracle exactly, not the raw resize)
    src = decode_avi_mjpeg(buf)
    want = decode_avi_mjpeg(encode_avi_mjpeg([resize_bilinear(f, 12, 16) for f in src], fps=15))
    np.testing.assert_array_equal(got, want)


def test_media_decode_real_video_features(spark):
    """Video payloads flow through extract_media_features(decode='real'):
    deterministic 16-dim vector over all frames' decoded pixels."""
    from water_column_sonar_processing_spark.operators.media_codecs import encode_avi_mjpeg

    buf = encode_avi_mjpeg(_smooth_frames(3), fps=10)
    df = spark.createDataFrame([("v", bytearray(buf))], "url string, html binary")
    got = mm.extract_media_features(df, decode="real").collect()
    assert len(got) == 1 and len(got[0]["features"]) == mm.FEATURE_DIM
    again = mm.extract_media_features(df, decode="real").collect()
    assert got[0]["features"] == again[0]["features"]

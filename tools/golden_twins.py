"""Pure-Python/numpy twins used to GENERATE the golden-parquet oracles for
the contract queries whose semantics SQL cannot express (see
tools/make_goldens.py). Each twin restates the operator's semantics
independently of Spark execution: hashing is a from-scratch xxHash64
(public algorithm, Collet's spec), geometry/smoothing kernels are the
module-level numpy functions the operators themselves wrap, and JSON
rendering replicates Java's Double.toString formatting rules.

Nothing here imports pyspark.
"""

from __future__ import annotations

import math

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """xxHash64 (Yann Collet's public spec), returned as a SIGNED 64-bit
    int — the value Spark's `xxhash64(<string col>)` produces for the
    UTF-8 bytes (Spark's default seed is 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for _ in range(1):
                v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
                v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
                v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
                v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_array_long_to_string(vals: list[int]) -> str:
    """Spark's CAST(array<bigint> AS STRING) rendering: '[a, b, c]'."""
    return "[" + ", ".join(str(v) for v in vals) + "]"


def java_double_to_string(x: float) -> str:
    """Java Double.toString formatting of a finite double: the shortest
    round-trip digit string, rendered plainly for 1e-3 <= |x| < 1e7 and in
    computerized scientific notation (d.dddEn) otherwise. Used to
    replicate Spark to_json's double rendering."""
    if x != x:
        return "NaN"
    if x == 0.0:
        return "-0.0" if math.copysign(1.0, x) < 0 else "0.0"
    r = repr(abs(x))  # CPython repr = shortest round-trip digits
    if "e" in r:
        mant, exp = r.split("e")
        exp_i = int(exp)
    else:
        if "." in r:
            intpart, frac = r.split(".")
        else:
            intpart, frac = r, ""
        digits = (intpart + frac).lstrip("0")
        if intpart != "0":
            exp_i = len(intpart) - 1
        else:
            lead_zeros = len(frac) - len(frac.lstrip("0"))
            exp_i = -(lead_zeros + 1)
        digits = digits.rstrip("0") or "0"
        mant = digits[0] + "." + (digits[1:] or "0")
    mant = mant if "." in mant else mant + ".0"
    sign = "-" if x < 0 else ""
    if -3 <= exp_i < 7:
        # plain decimal
        d = mant.replace(".", "")
        if exp_i >= 0:
            intpart = d[: exp_i + 1].ljust(exp_i + 1, "0")
            frac = d[exp_i + 1 :] or "0"
            return f"{sign}{intpart}.{frac}"
        return f"{sign}0.{'0' * (-exp_i - 1)}{d.rstrip('0') or '0'}"
    return f"{sign}{mant}E{exp_i}"

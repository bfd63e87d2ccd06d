"""From-scratch NetCDF classic (CDF-1/CDF-2) writer + reader, pure numpy.

Closes the S11 alternate-format sink gap WITHOUT the netCDF4/xarray
dependency this container lacks: the classic file format is a small,
fully-public specification (the NetCDF "classic format spec", also
appendix B of the NetCDF User Guide), re-implemented here directly —
magic 'CDF\\x01', big-endian headers, a dim list, a var list with
4-byte-aligned fixed-size data blocks.

Reference analog: the reference's netCDF export of the L2 cube
(/root/reference/water_column_sonar_processing/processing/raw_to_netcdf.py:218-266),
which serializes named 1-D/2-D variables over fixed dimensions — the
same shape produced here (each DataFrame column becomes a 1-D variable
over the `row` dimension; strings become 2-D char arrays).

Type mapping (classic has no 64-bit ints):
- int8/int16/int32        -> NC_BYTE / NC_SHORT / NC_INT
- int64                   -> NC_INT when every value fits in 32 bits,
                             else NC_DOUBLE (documented lossy >2^53; the
                             writer refuses silently-lossy narrowing by
                             raising unless allow_lossy_int64=True)
- float32/float64         -> NC_FLOAT / NC_DOUBLE
- str                     -> NC_CHAR over (row, <name>_strlen)

The reader implements the same spec independently enough for round-trip
tests, and tests also pin EXACT golden bytes for a tiny file built by
hand from the spec, so writer and reader cannot share a bug invisibly.
"""

from __future__ import annotations

import struct

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_TAG_DIM = 0x0A
_TAG_VAR = 0x0B
_TAG_ATT = 0x0C

_TYPE_SIZE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}
_TYPE_DTYPE = {
    NC_BYTE: ">i1",
    NC_CHAR: "S1",
    NC_SHORT: ">i2",
    NC_INT: ">i4",
    NC_FLOAT: ">f4",
    NC_DOUBLE: ">f8",
}


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


def _name_bytes(name: str) -> bytes:
    b = name.encode("utf-8")
    return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))


def _col_plan(name: str, arr: np.ndarray, allow_lossy_int64: bool):
    """-> (nc_type, data_array, strlen_or_None) for one column."""
    if arr.dtype.kind in ("U", "S", "O"):
        as_bytes = [
            (x if isinstance(x, bytes) else ("" if x is None else str(x)).encode("utf-8"))
            for x in arr.tolist()
        ]
        strlen = max((len(b) for b in as_bytes), default=0) or 1
        out = np.zeros((len(as_bytes), strlen), dtype="S1")
        for i, b in enumerate(as_bytes):
            if b:
                out[i, : len(b)] = np.frombuffer(b, dtype="S1")
        return NC_CHAR, out, strlen
    if arr.dtype == np.bool_:
        return NC_BYTE, arr.astype(">i1"), None
    if arr.dtype.kind == "u":
        # classic NetCDF has no unsigned types: widen to the next signed
        # width (u1->i2, u2->i4, u4/u8->the int64 path with its guard)
        if arr.dtype.itemsize == 1:
            return NC_SHORT, arr.astype(">i2"), None
        if arr.dtype.itemsize == 2:
            return NC_INT, arr.astype(">i4"), None
        if arr.dtype.itemsize == 8 and len(arr) and arr.max() >= 2**63:
            raise ValueError(f"column {name!r}: uint64 values exceed int64 range")
        arr = arr.astype(np.int64)
    if arr.dtype.kind == "i":
        size = arr.dtype.itemsize
        if size == 1:
            return NC_BYTE, arr.astype(">i1"), None
        if size == 2:
            return NC_SHORT, arr.astype(">i2"), None
        if size == 4:
            return NC_INT, arr.astype(">i4"), None
        # int64: narrow when safe, else double (classic has no NC_INT64)
        if len(arr) == 0 or (arr.min() >= -(2**31) and arr.max() < 2**31):
            return NC_INT, arr.astype(">i4"), None
        if not allow_lossy_int64:
            raise ValueError(
                f"column {name!r}: int64 values exceed 32 bits; classic NetCDF "
                "has no int64 — pass allow_lossy_int64=True to store as double "
                "(exact only up to 2^53)"
            )
        return NC_DOUBLE, arr.astype(">f8"), None
    if arr.dtype == np.float32:
        return NC_FLOAT, arr.astype(">f4"), None
    if arr.dtype.kind == "f":
        return NC_DOUBLE, arr.astype(">f8"), None
    # datetime64/timedelta64/complex/etc: a silent astype('>f8') would
    # quantize ns ticks (~1.7e18 >> 2^53) into unit-less garbage — the
    # module contract is fail-loudly. Convert timestamps upstream
    # (e.g. unix micros as int64) before exporting.
    raise ValueError(
        f"column {name!r}: dtype {arr.dtype} has no classic-NetCDF mapping; "
        "cast to int/float/str upstream (timestamps: unix micros as int64)"
    )


def _attr_bytes(name: str, value) -> bytes:
    """Encode one attribute per spec: name, nc_type, nelems, padded values.

    Supported value types mirror the reference's store metadata
    (model/zarr_manager.py:289-301 writes str/int/float attrs): str ->
    NC_CHAR (nelems = byte length), int -> NC_INT, float -> NC_DOUBLE."""
    if isinstance(value, (bool, np.bool_)):
        raise ValueError(f"attribute {name!r}: bool has no classic-NetCDF attr mapping")
    if isinstance(value, str):
        b = value.encode("utf-8")
        return _name_bytes(name) + struct.pack(">ii", NC_CHAR, len(b)) + b + b"\x00" * _pad4(len(b))
    if isinstance(value, (int, np.integer)):
        if not -(2**31) <= int(value) < 2**31:
            raise ValueError(f"attribute {name!r}: int {value} exceeds NC_INT range")
        return _name_bytes(name) + struct.pack(">ii", NC_INT, 1) + struct.pack(">i", int(value))
    if isinstance(value, (float, np.floating)):
        return _name_bytes(name) + struct.pack(">ii", NC_DOUBLE, 1) + struct.pack(">d", float(value))
    raise ValueError(f"attribute {name!r}: unsupported type {type(value).__name__} (str/int/float)")


def write_netcdf_classic(
    path: str,
    columns: dict[str, np.ndarray],
    allow_lossy_int64: bool = False,
    version: int = 1,
    attrs: dict[str, object] | None = None,
) -> None:
    """Write columns (equal-length 1-D arrays) as a classic NetCDF file:
    one `row` dimension, one variable per column (2-D char for strings).

    `attrs` (str -> str|int|float) become global attributes; None/{} emits
    the spec's ABSENT gatt list (8 zero bytes), byte-identical to r4 files."""
    if version not in (1, 2):
        # ValueError, not assert: python -O strips asserts and a bad
        # version byte would surface as a confusing downstream parse error
        raise ValueError(f"classic NetCDF version must be 1 (CDF-1) or 2 (CDF-2), got {version}")
    n_rows = len(next(iter(columns.values()))) if columns else 0
    if n_rows == 0:
        # the classic spec reads a zero-LENGTH dimension as the
        # unlimited/record dimension, silently turning every variable into
        # a record variable for conforming external readers (netCDF4) —
        # refuse instead of emitting a file other readers misparse; the
        # Spark sink (_export_netcdf) never writes empty partitions, so
        # zero-row tables simply produce no part files
        raise ValueError(
            "refusing to write a zero-row classic NetCDF file: dimension "
            "length 0 denotes the record dimension in the classic spec; "
            "filter empty tables upstream"
        )
    for k, v in columns.items():
        if len(v) != n_rows:
            raise ValueError(f"column {k!r} length {len(v)} != {n_rows}")

    plans = {k: _col_plan(k, np.asarray(v), allow_lossy_int64) for k, v in columns.items()}

    # dims: row + one strlen dim per char column (spec: dims are shared,
    # ordered; we emit row first then per-string dims in column order)
    dims: list[tuple[str, int]] = [("row", n_rows)]
    dim_id: dict[str, int] = {"row": 0}
    for k, (t, _, strlen) in plans.items():
        if t == NC_CHAR:
            dim_id[f"{k}_strlen"] = len(dims)
            dims.append((f"{k}_strlen", strlen))

    off_size = 4 if version == 1 else 8
    off_fmt = ">i" if version == 1 else ">q"

    # header size must be known before variable begin offsets: build the
    # var metadata twice-free by computing sizes first
    def var_meta_len(name: str, ndims: int) -> int:
        nb = len(name.encode("utf-8"))
        return (4 + nb + _pad4(nb)) + 4 + 4 * ndims + 8 + 4 + 4 + off_size

    gatt = b"".join(_attr_bytes(k, v) for k, v in (attrs or {}).items())
    gatt_hdr = (
        struct.pack(">ii", _TAG_ATT, len(attrs)) + gatt
        if attrs
        else struct.pack(">ii", 0, 0)  # ABSENT encoding: 8 zero bytes
    )

    header_len = 4 + 4  # magic + numrecs
    header_len += 8 + sum(
        (4 + len(n.encode()) + _pad4(len(n.encode()))) + 4 for n, _ in dims
    )  # dim list
    header_len += len(gatt_hdr)  # gatt list
    header_len += 8  # var list tag + count
    var_order = list(plans.items())
    for k, (t, data, strlen) in var_order:
        header_len += var_meta_len(k, 2 if t == NC_CHAR else 1)

    # data section layout (4-byte aligned per var)
    begins: dict[str, int] = {}
    vsizes: dict[str, int] = {}
    pos = header_len
    for k, (t, data, strlen) in var_order:
        raw = n_rows * (strlen if t == NC_CHAR else 1) * _TYPE_SIZE[t]
        vsize = raw + _pad4(raw)
        begins[k] = pos
        vsizes[k] = vsize
        pos += vsize

    out = bytearray()
    out += b"CDF" + bytes([version])
    out += struct.pack(">i", 0)  # numrecs (no record dimension used)
    out += struct.pack(">ii", _TAG_DIM, len(dims))
    for n, sz in dims:
        out += _name_bytes(n) + struct.pack(">i", sz)
    out += gatt_hdr
    out += struct.pack(">ii", _TAG_VAR, len(var_order))
    for k, (t, data, strlen) in var_order:
        out += _name_bytes(k)
        if t == NC_CHAR:
            out += struct.pack(">i", 2) + struct.pack(">ii", 0, dim_id[f"{k}_strlen"])
        else:
            out += struct.pack(">i", 1) + struct.pack(">i", 0)
        out += struct.pack(">ii", 0, 0)  # no var attributes
        out += struct.pack(">i", t)
        out += struct.pack(">i", vsizes[k])
        out += struct.pack(off_fmt, begins[k])
    assert len(out) == header_len, (len(out), header_len)
    for k, (t, data, strlen) in var_order:
        raw = data.tobytes()
        out += raw + b"\x00" * _pad4(len(raw))
    with open(path, "wb") as f:
        f.write(bytes(out))


def read_netcdf_classic(path: str) -> dict[str, np.ndarray]:
    """Minimal spec-faithful reader (fixed-size vars, no record dim):
    -> {var_name: 1-D array} with char matrices decoded back to str."""
    return read_netcdf_classic_full(path)[0]


def read_netcdf_classic_full(path: str) -> tuple[dict[str, np.ndarray], dict[str, object]]:
    """Like read_netcdf_classic but also returns the global attributes
    ({name: str|int|float|ndarray}) parsed per spec."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file")
    version = buf[3]
    off_fmt, off_size = (">i", 4) if version == 1 else (">q", 8)
    pos = 8  # skip magic + numrecs

    def read_i4() -> int:
        nonlocal pos
        v = struct.unpack_from(">i", buf, pos)[0]
        pos += 4
        return v

    def read_name() -> str:
        nonlocal pos
        n = read_i4()
        s = buf[pos : pos + n].decode("utf-8")
        pos += n + _pad4(n)
        return s

    tag, ndims = read_i4(), read_i4()
    dims = []
    if tag == _TAG_DIM:
        dims = [(read_name(), read_i4()) for _ in range(ndims)]
    elif (tag, ndims) != (0, 0):
        raise ValueError("bad dim list")
    def read_attrs(natt: int) -> dict[str, object]:
        nonlocal pos
        attrs: dict[str, object] = {}
        for _ in range(natt):
            aname = read_name()
            atype, nelems = read_i4(), read_i4()
            size = nelems * _TYPE_SIZE[atype]
            raw = buf[pos : pos + size]
            pos += size + _pad4(size)
            if atype == NC_CHAR:
                attrs[aname] = raw.decode("utf-8")
            else:
                vals = np.frombuffer(raw, dtype=_TYPE_DTYPE[atype], count=nelems)
                attrs[aname] = vals.item() if nelems == 1 else vals.copy()
        return attrs

    tag, natt = read_i4(), read_i4()
    if (tag, natt) not in ((0, 0),) and tag != _TAG_ATT:
        raise ValueError("bad gatt list")
    gattrs = read_attrs(natt) if tag == _TAG_ATT else {}
    tag, nvars = read_i4(), read_i4()
    if tag != _TAG_VAR and (tag, nvars) != (0, 0):
        raise ValueError("bad var list")
    out: dict[str, np.ndarray] = {}
    metas = []
    for _ in range(nvars):
        name = read_name()
        nd = read_i4()
        dimids = [read_i4() for _ in range(nd)]
        atag, anum = read_i4(), read_i4()
        if atag == _TAG_ATT and anum:
            read_attrs(anum)  # skip var attributes (this writer emits none)
        nc_type = read_i4()
        _vsize = read_i4()
        begin = struct.unpack_from(off_fmt, buf, pos)[0]
        pos += off_size
        metas.append((name, dimids, nc_type, begin))
    for name, dimids, nc_type, begin in metas:
        shape = tuple(dims[d][1] for d in dimids)
        count = int(np.prod(shape)) if shape else 1
        arr = np.frombuffer(buf, dtype=_TYPE_DTYPE[nc_type], count=count, offset=begin).reshape(shape)
        if nc_type == NC_CHAR and len(shape) == 2:
            out[name] = np.array(
                [bytes(row).rstrip(b"\x00").decode("utf-8") for row in arr.view("S" + str(shape[1])).ravel()]
            )
        else:
            out[name] = arr.copy()
    return out, gattrs

"""Futhark binary data format v2, pure stdlib+NumPy — the interchange
format ``futhark bench`` / ``futhark dataset`` / compiled Futhark binaries
read and write natively (public spec: the "Binary Data Format" section of
the Futhark reference manual).

The reference's ``STL.fit(dump=True)`` serializes with the ``futhark_data``
package (hastl/stl.py:184-208), which is not installable in this offline
container; this module implements the same on-disk format from the spec so
``dump.in`` is directly consumable by Futhark tooling:

    b <version:u8=2> <rank:u8> <type:4 bytes, space-left-padded>
    rank x <dim:u64 little-endian>
    payload: row-major little-endian element data

A scalar is a rank-0 value with no dimension block. Multiple values are
simply concatenated in one stream (exactly how a multi-parameter
``futhark bench`` input file is laid out, and how the reference appends
the 16 int64 parameters after the f32 input array).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"b"
_VERSION = 2

# numpy dtype -> 4-byte Futhark element type name (space-left-padded)
_TYPES = {
    np.dtype("int8"): b"  i8", np.dtype("int16"): b" i16",
    np.dtype("int32"): b" i32", np.dtype("int64"): b" i64",
    np.dtype("uint8"): b"  u8", np.dtype("uint16"): b" u16",
    np.dtype("uint32"): b" u32", np.dtype("uint64"): b" u64",
    np.dtype("float16"): b" f16", np.dtype("float32"): b" f32",
    np.dtype("float64"): b" f64", np.dtype("bool"): b"bool",
}
_DTYPES = {v: k for k, v in _TYPES.items()}


def dump(value, fp) -> None:
    """Write one scalar or array in Futhark binary format v2."""
    a = np.asarray(value)
    if a.dtype not in _TYPES:
        raise TypeError(f"no Futhark type for dtype {a.dtype}")
    fp.write(_MAGIC)
    fp.write(struct.pack("<B", _VERSION))
    fp.write(struct.pack("<B", a.ndim))
    fp.write(_TYPES[a.dtype])
    for d in a.shape:
        fp.write(struct.pack("<Q", d))
    fp.write(np.ascontiguousarray(a, dtype=a.dtype.newbyteorder("<")).tobytes())


def load(fp) -> list:
    """Read every concatenated value from a Futhark binary stream."""
    out = []
    while True:
        magic = fp.read(1)
        if not magic:
            return out
        if magic != _MAGIC:
            raise ValueError(f"bad magic {magic!r} (textual data unsupported)")
        version, rank = struct.unpack("<BB", fp.read(2))
        if version != _VERSION:
            raise ValueError(f"unsupported binary data version {version}")
        typ = fp.read(4)
        if typ not in _DTYPES:
            raise ValueError(f"unknown element type {typ!r}")
        dt = _DTYPES[typ].newbyteorder("<")
        shape = struct.unpack(f"<{rank}Q", fp.read(8 * rank))
        n = int(np.prod(shape, dtype=np.int64)) if rank else 1
        buf = fp.read(n * dt.itemsize)
        if len(buf) != n * dt.itemsize:
            raise ValueError("truncated payload")
        a = np.frombuffer(buf, dtype=dt).reshape(shape)
        out.append(a.astype(_DTYPES[typ]) if rank else a[()])

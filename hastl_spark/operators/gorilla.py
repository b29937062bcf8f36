"""Gorilla time-series compression (delta-of-delta timestamps + XOR float
values), NumPy-vectorized bit packing — per north_rule, rolled-up points at
every tier are stored Gorilla-compressed in chunk tables.

Semantics follow the public Gorilla paper (Pelkonen et al., VLDB 2015 —
"Gorilla: A Fast, Scalable, In-Memory Time Series Database"):

timestamps, delta-of-delta buckets:
  dod == 0                  -> '0'
  dod in [-63, 64]          -> '10'   + 7 bits  (dod + 63)
  dod in [-255, 256]        -> '110'  + 9 bits  (dod + 255)
  dod in [-2047, 2048]      -> '1110' + 12 bits (dod + 2047)
  else                      -> '1111' + 64 bits raw (we widen the paper's
                               32-bit escape to 64 for arbitrary gaps)

values, XOR with predecessor:
  xor == 0                  -> '0'
  fits prior block          -> '10' + meaningful bits (block reuse)
  else                      -> '11' + 5b leading-zeros + 6b length + bits
                               (length 64 encodes as 0)

Encoding is vectorized: classification, leading/trailing-zero counts and the
bit-matrix packing are whole-array NumPy; the only sequential walk is over
value-block CHANGES ('11' events), which are rare on smooth series. Decode
is a sequential bit-cursor (variable-length codes), used on the read path
and for round-trip verification.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"GOR1"
_U64 = np.uint64


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64).copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        t = v >> _U64(s)
        m = t != 0
        bl += np.where(m, s, 0)
        v = np.where(m, t, v)
    return bl + (v != 0)


def _clz64(v: np.ndarray) -> np.ndarray:
    return 64 - _bit_length_u64(v)


def _ctz64(v: np.ndarray) -> np.ndarray:
    lsb = v & (np.zeros_like(v) - v)  # v & -v in uint64 arithmetic
    return np.where(v == 0, 64, _bit_length_u64(lsb) - 1)


def _pack_tokens(vals: np.ndarray, lens: np.ndarray) -> bytes:
    """Pack each vals[i]'s lowest lens[i] bits, MSB-first, into bytes."""
    vals = vals.astype(np.uint64)
    lens = lens.astype(np.int64)
    keep = lens > 0
    vals, lens = vals[keep], lens[keep]
    if len(vals) == 0:
        return b""
    sh = lens[:, None] - 1 - np.arange(64, dtype=np.int64)[None, :]
    take = sh >= 0
    bits = ((vals[:, None] >> np.maximum(sh, 0).astype(np.uint64)) & _U64(1)).astype(np.uint8)
    flat = bits[take]
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(flat).tobytes()


def _encode_timestamps(ts: np.ndarray):
    """Return (controls, control_lens, payloads, payload_lens) for ts[1:]."""
    deltas = np.diff(ts)
    # dod[0] = delta[0] - 0 (first delta has implied predecessor 0)
    dod = np.diff(deltas, prepend=np.int64(0))
    n = len(dod)
    ctrl = np.empty(n, dtype=np.uint64)
    clen = np.empty(n, dtype=np.int64)
    pay = np.empty(n, dtype=np.uint64)
    plen = np.empty(n, dtype=np.int64)

    z = dod == 0
    b1 = ~z & (dod >= -63) & (dod <= 64)
    b2 = ~z & ~b1 & (dod >= -255) & (dod <= 256)
    b3 = ~z & ~b1 & ~b2 & (dod >= -2047) & (dod <= 2048)
    b4 = ~(z | b1 | b2 | b3)

    ctrl[z], clen[z], pay[z], plen[z] = 0b0, 1, 0, 0
    ctrl[b1], clen[b1] = 0b10, 2
    pay[b1], plen[b1] = (dod[b1] + 63).astype(np.uint64), 7
    ctrl[b2], clen[b2] = 0b110, 3
    pay[b2], plen[b2] = (dod[b2] + 255).astype(np.uint64), 9
    ctrl[b3], clen[b3] = 0b1110, 4
    pay[b3], plen[b3] = (dod[b3] + 2047).astype(np.uint64), 12
    ctrl[b4], clen[b4] = 0b1111, 4
    pay[b4], plen[b4] = dod[b4].astype(np.int64).view(np.uint64), 64
    return ctrl, clen, pay, plen


def _encode_values(bits: np.ndarray):
    """XOR-encode bits[1:] against predecessors. Returns token arrays
    (3 tokens per point: control, header, payload; zero-length unused)."""
    xor = bits[1:] ^ bits[:-1]
    n = len(xor)
    lz = np.minimum(_clz64(xor), 31)
    tz = _ctz64(xor)

    ctrl = np.zeros(n, dtype=np.uint64)
    clen = np.ones(n, dtype=np.int64)  # default '0' (xor == 0)
    hdr = np.zeros(n, dtype=np.uint64)
    hlen = np.zeros(n, dtype=np.int64)
    pay = np.zeros(n, dtype=np.uint64)
    plen = np.zeros(n, dtype=np.int64)

    nz = np.flatnonzero(xor != 0)
    # sequential walk over BLOCK CHANGES only: a point reuses the current
    # block iff lz >= cur_lz and tz >= cur_tz, else opens a new block ('11').
    new_block = np.zeros(len(nz), dtype=bool)
    i = 0
    while i < len(nz):
        new_block[i] = True
        cur_lz, cur_tz = lz[nz[i]], tz[nz[i]]
        rest = nz[i + 1:]
        viol = (lz[rest] < cur_lz) | (tz[rest] < cur_tz)
        nxt = np.argmax(viol) if viol.any() else len(rest)
        i += 1 + int(nxt)

    nb = nz[new_block]
    rb = nz[~new_block]
    # new block: '11' + 5b lz + 6b (len & 63) + meaningful bits
    mlen_nb = 64 - lz[nb] - tz[nb]
    ctrl[nb], clen[nb] = 0b11, 2
    hdr[nb] = (lz[nb].astype(np.uint64) << _U64(6)) | (mlen_nb % 64).astype(np.uint64)
    hlen[nb] = 11
    pay[nb] = xor[nb] >> tz[nb].astype(np.uint64)
    plen[nb] = mlen_nb
    # reuse: '10' + meaningful bits under the governing block
    if len(rb):
        gov = nb[np.searchsorted(nb, rb) - 1]
        gtz = tz[gov]
        glen = 64 - lz[gov] - gtz
        ctrl[rb], clen[rb] = 0b10, 2
        pay[rb] = xor[rb] >> gtz.astype(np.uint64)
        plen[rb] = glen
    return ctrl, clen, hdr, hlen, pay, plen


def encode(timestamps: np.ndarray, values: np.ndarray) -> bytes:
    """Encode one chunk. timestamps int64 (epoch seconds), values float64.
    NaNs round-trip bit-exactly (raw IEEE bits)."""
    ts = np.asarray(timestamps, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    assert ts.shape == vals.shape and ts.ndim == 1
    n = len(ts)
    if n == 0:
        return _MAGIC + struct.pack("<I", 0)
    bits = vals.view(np.uint64)
    head = _MAGIC + struct.pack("<IqQ", n, int(ts[0]), int(bits[0]))
    if n == 1:
        return head + struct.pack("<II", 0, 0)

    tc, tcl, tp, tpl = _encode_timestamps(ts)
    ts_bytes = _pack_tokens(
        np.concatenate([tc[:, None], tp[:, None]], axis=1).ravel(),
        np.concatenate([tcl[:, None], tpl[:, None]], axis=1).ravel(),
    )
    vc, vcl, vh, vhl, vp, vpl = _encode_values(bits)
    val_bytes = _pack_tokens(
        np.stack([vc, vh, vp], axis=1).ravel(),
        np.stack([vcl, vhl, vpl], axis=1).ravel(),
    )
    return head + struct.pack("<II", len(ts_bytes), len(val_bytes)) + ts_bytes + val_bytes


def _sliding_words(buf: bytes) -> np.ndarray:
    """w[p] = the 64 bits of ``buf`` starting at bit p, MSB-first, as uint64
    (positions past the end read as 0). Built from BYTE-offset big-endian
    words (8 vectorized shifts) broadcast over the 8 intra-byte offsets —
    no per-bit work anywhere."""
    b = np.frombuffer(buf, dtype=np.uint8)
    b = np.concatenate([b, np.zeros(16, dtype=np.uint8)])
    n_words = len(b) - 15  # byte offsets with a full 8+1 bytes ahead
    W = np.zeros(n_words, dtype=np.uint64)
    for j in range(8):
        W |= b[j:j + n_words].astype(np.uint64) << _U64(8 * (7 - j))
    nxt = b[8:8 + n_words].astype(np.uint64)
    r = np.arange(8, dtype=np.uint64)
    # w[8*i + r] = (W[i] << r) | (b[i+8] >> (8-r));  r=0: b>>8 == 0
    return ((W[:, None] << r[None, :])
            | (nxt[:, None] >> (_U64(8) - r[None, :]))).ravel()


def _decode_timestamps(ts_buf: bytes, n: int, t0: int) -> np.ndarray:
    """Fully vectorized timestamp decode: a token-length table per bit
    position + orbit materialization by pointer doubling finds all token
    starts without a sequential bit walk; payload extraction, dod -> delta
    -> timestamp are then two cumsums."""
    w = _sliding_words(ts_buf)
    L = len(w)
    top4 = (w >> _U64(60)).astype(np.int64)
    # token length by control prefix: 0 | 10 | 110 | 1110 | 1111
    tl = np.where(top4 < 8, 1,                      # '0...'
         np.where(top4 < 12, 9,                     # '10..' + 7
         np.where(top4 < 14, 12,                    # '110.' + 9
         np.where(top4 < 15, 16, 68))))             # '1110'+12 | '1111'+64
    f = np.minimum(np.arange(L, dtype=np.int64) + tl, L - 1)
    starts = np.zeros(1, dtype=np.int64)
    jump = f
    while len(starts) < n - 1:
        starts = np.concatenate([starts, jump[starts]])
        if len(starts) < n - 1:
            jump = jump[jump]
    starts = starts[:n - 1]

    ws = w[starts]
    c = top4[starts]
    dod = np.zeros(n - 1, dtype=np.int64)  # '0' tokens stay 0
    b1 = (c >= 8) & (c < 12)   # '10..' + 7b
    b2 = (c >= 12) & (c < 14)  # '110.' + 9b
    b3 = c == 14               # '1110' + 12b
    b4 = c == 15               # '1111' + 64b raw
    dod[b1] = ((ws[b1] >> _U64(64 - 9)) & _U64(0x7F)).astype(np.int64) - 63
    dod[b2] = ((ws[b2] >> _U64(64 - 12)) & _U64(0x1FF)).astype(np.int64) - 255
    dod[b3] = ((ws[b3] >> _U64(64 - 16)) & _U64(0xFFF)).astype(np.int64) - 2047
    if b4.any():
        dod[b4] = w[starts[b4] + 4].view(np.int64)
    deltas = np.cumsum(dod)
    ts = np.empty(n, dtype=np.int64)
    ts[0] = t0
    ts[1:] = t0 + np.cumsum(deltas)
    return ts


def _decode_values(val_buf: bytes, n: int, v0: int) -> np.ndarray:
    """Value decode: one Python iteration per TOKEN (pure int arithmetic on
    the precomputed sliding-word table — the round-2 version looped per BIT,
    ~40x more iterations at typical 30-50-bit XOR payloads). Fully
    vectorizing is blocked by the reuse-token length depending on the
    current block, a sequential state; per-token is the scale-honest
    compromise for the read path."""
    w = _sliding_words(val_buf)
    wl = w  # uint64 ndarray; int() per access
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(v0)
    prev = int(v0)
    p = 0
    blk_lz = blk_len = 0
    for i in range(1, n):
        word = int(wl[p])
        if word >> 63 == 0:
            p += 1
            out[i] = prev
            continue
        if (word >> 62) & 1 == 0:  # '10' reuse current block
            m = int(wl[p + 2]) >> (64 - blk_len)
            xor = m << (64 - blk_lz - blk_len)
            p += 2 + blk_len
        else:  # '11' new block: 5b lz + 6b len (0 -> 64) + payload
            blk_lz = (word >> 57) & 0x1F
            blk_len = ((word >> 51) & 0x3F) or 64
            m = int(wl[p + 13]) >> (64 - blk_len)
            xor = m << (64 - blk_lz - blk_len)
            p += 13 + blk_len
        prev ^= xor
        out[i] = prev
    return out


def decode(buf: bytes):
    """Inverse of :func:`encode`. Returns (timestamps int64, values float64)."""
    assert buf[:4] == _MAGIC, "bad magic"
    (n,) = struct.unpack_from("<I", buf, 4)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    t0, v0 = struct.unpack_from("<qQ", buf, 8)
    lt, lv = struct.unpack_from("<II", buf, 24)
    off = 32
    ts_buf = buf[off:off + lt]
    val_buf = buf[off + lt:off + lt + lv]

    if n > 1:
        ts = _decode_timestamps(ts_buf, n, t0)
        bits = _decode_values(val_buf, n, v0)
    else:
        ts = np.array([t0], dtype=np.int64)
        bits = np.array([v0], dtype=np.uint64)
    return ts, bits.view(np.float64)


def chunk_stats(values: np.ndarray, raw: bytes) -> dict:
    v = np.asarray(values, dtype=np.float64)
    finite = v[np.isfinite(v)]
    return {
        "n_points": int(len(v)),
        "bytes": int(len(raw)),
        "crc32": int(zlib.crc32(raw)),
        "v_min": float(finite.min()) if len(finite) else None,
        "v_max": float(finite.max()) if len(finite) else None,
        "v_sum": float(finite.sum()) if len(finite) else None,
    }

"""Pure-stdlib media codecs (PNG, WAV) so the real-decode seam in
``multimodal.py`` is exercised without PIL/av — this container ships no
media libraries, but PNG is just zlib + per-scanline filters and WAV is a
RIFF struct walk, both implementable from their public specs (PNG: RFC
2083 / ISO 15948; WAV: RIFF/WAVE-PCM).

Scope (documented, fail-loud outside it):
  * PNG: 8-bit depth, color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA),
    non-interlaced, all five filter types. Decode un-filters Up/Sub
    vectorized; Average/Paeth reconstruct per-pixel (sequential by spec —
    the prediction feeds back within the scanline). This is the decode
    SEAM, not a hot path: the Spark contract is the Arrow batch plumbing
    in multimodal.py, and at scale the per-payload decode cost is the same
    whatever library sits here.
  * WAV: PCM 16-bit, any channel count/rate.

Encoders exist so tests can synthesize REAL payloads deterministically
(including per-row PNG filter choices, which exercise every unfilter
branch — filtering is feed-forward, so the encoder vectorizes fully).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CTYPE_CH = {0: 1, 2: 3, 4: 2, 6: 4}
_CH_CTYPE = {v: k for k, v in _CTYPE_CH.items()}


def sniff(payload: bytes) -> str | None:
    """'png' | 'wav' | None by magic bytes."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ------------------------------------------------------------------- PNG

def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data)))


def encode_png(img: np.ndarray, filters=None) -> bytes:
    """uint8 image [h, w] or [h, w, ch] -> PNG bytes. ``filters`` picks the
    per-row filter type (0..4, default all-0); filtering is feed-forward so
    every branch is whole-row NumPy."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = _CH_CTYPE[ch]
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    if filters is None:
        filters = np.zeros(h, dtype=np.int64)
    lines = []
    for y in range(h):
        f = int(filters[y])
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
        left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int64), prior[:-ch]])
        if f == 0:
            out = cur
        elif f == 1:
            out = cur - left
        elif f == 2:
            out = cur - prior
        elif f == 3:
            out = cur - (left + prior) // 2
        elif f == 4:
            p = left + prior - upleft
            pa, pb, pc = (np.abs(p - left), np.abs(p - prior),
                          np.abs(p - upleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prior, upleft))
            out = cur - pred
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(bytes([f]) + (out % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 [h, w, ch]. 8-bit, non-interlaced only."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or interlace != 0 or ctype not in _CTYPE_CH:
                raise ValueError(
                    "unsupported PNG (need 8-bit, non-interlaced, "
                    f"ctype in {sorted(_CTYPE_CH)}; got depth={depth} "
                    f"ctype={ctype} interlace={interlace})")
            meta = (w, h, _CTYPE_CH[ctype])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("truncated PNG")
    w, h, ch = meta
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, data = rows[:, 0], rows[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        cur = data[y]
        prior = out[y - 1].astype(np.int64) if y else np.zeros(
            stride, dtype=np.int64)
        if f == 0:
            rec = cur
        elif f == 2:  # Up: vectorized
            rec = (cur + prior) % 256
        elif f == 1:  # Sub: per-channel modular prefix sum
            rec = np.cumsum(cur.reshape(w, ch), axis=0).reshape(stride) % 256
        elif f in (3, 4):  # Average / Paeth: prediction feeds back in-row
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prior[x]
                c = prior[x - ch] if x >= ch else 0
                if f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                rec[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, ch)


def png_luma(img: np.ndarray) -> np.ndarray:
    """uint8 [h, w, ch] -> float32 [h, w] luma (Rec.601 for color)."""
    if img.shape[2] in (1, 2):  # gray / gray+alpha
        return img[:, :, 0].astype(np.float32)
    return (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1]
            + 0.114 * img[:, :, 2]).astype(np.float32)


# ------------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples [n] or [n, ch] -> RIFF/WAVE PCM-16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    nch = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    block = nch * 2
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, 16)
    return (b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(payload: bytes):
    """RIFF/WAVE PCM-16 bytes -> (int16 samples [n, ch], rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, nch, samples = 12, None, None, None
    while pos + 8 <= len(payload):
        typ = payload[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", payload, pos + 4)
        pos += 8
        data = payload[pos:pos + ln]
        pos += ln + (ln & 1)  # chunks are word-aligned
        if typ == b"fmt ":
            afmt, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", data)
            if afmt != 1 or bits != 16:
                raise ValueError(f"only PCM-16 supported (fmt={afmt}, "
                                 f"bits={bits})")
        elif typ == b"data":
            samples = np.frombuffer(data, dtype="<i2")
    if rate is None or samples is None:
        raise ValueError("truncated WAV")
    return samples.reshape(-1, nch), rate

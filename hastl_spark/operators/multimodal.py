"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Real decoding IS exercised in-sandbox: PNG and WAV payloads decode through
the pure-stdlib codecs in ``mediacodec.py`` (zlib inflate + un-filter;
RIFF/PCM-16) — PIL, when importable, takes precedence for images since it
covers more formats. Payloads that are neither (or corrupt) fall back to a
deterministic fake projection, which is also what the DuckDB oracle pins
(a real corpus always contains undecodable blobs; the fallback keeps the
pipeline total). resize/frame-sample remain stubbed byte-slices — the
Spark-side contract (schema, batch shape, partitioning, UDF signature) is
the tested surface there.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, feat array<float>, "
    "thumb_w int, thumb_h int"
)

def _probe_pil() -> bool:
    """Auto-detect PIL at import: when importable it handles every image
    format; otherwise the stdlib PNG/WAV codecs (mediacodec.py) carry the
    real-decode path — probed, not assumed, so an environment WITH PIL
    gets it with no code change."""
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


HAVE_PIL = _probe_pil()
# stdlib PNG/WAV decoders are always present, so real decoding is always
# available for those formats; HAVE_PIL widens coverage to other formats
HAVE_REAL_DECODERS = True


def _fake_decode_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: a seeded projection
    of the raw bytes. Replaces `PIL.Image.open(...)` etc.

    Raises NotImplementedError if callers demand real decoding.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def _real_decode_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Real decode path: PIL when importable (any image format), else the
    stdlib PNG/WAV codecs — decode to pixels/samples, reduce to ``dim``
    per-strip means. Same shape/type contract as the fake, so the Spark
    plumbing is identical. Undecodable payloads fall back to the
    deterministic fake (a corpus at scale always contains corrupt blobs;
    failing the task on one is wrong)."""
    import io

    if HAVE_PIL:
        try:
            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
            return np.asarray(img, dtype=np.float32).reshape(-1)[:dim]
        except Exception:
            pass
    try:
        from . import mediacodec

        kind = mediacodec.sniff(bytes(payload))
        if kind == "png":
            # luma image -> dim vertical strips -> per-strip mean
            g = mediacodec.png_luma(mediacodec.decode_png(bytes(payload)))
            strips = np.array_split(g.mean(axis=0, dtype=np.float64), dim)
            return np.array([s.mean() if len(s) else 0.0 for s in strips],
                            dtype=np.float32)
        if kind == "wav":
            s, _rate = mediacodec.decode_wav(bytes(payload))
            mono = s.astype(np.float64).mean(axis=1)
            chunks = np.array_split(mono, dim)
            return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                            dtype=np.float32)
    except Exception:
        pass
    return _fake_decode_features(payload, dim)


def extract_features(media: DataFrame, dim: int = 8, thumb: int = 64,
                     require_real: bool = False,
                     use_real: bool | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches arrive as pandas DataFrames; each batch is processed
    vectorized-per-row over the binary payloads (the decode itself is
    per-payload by nature). Output schema is fixed and typed.

    ``use_real=None`` (default) routes through the real decoder, which is
    ALWAYS available: the stdlib PNG/WAV codecs back it, with PIL
    preferred for those formats when importable and a deterministic fake
    fallback for payloads neither can decode (e.g. JPEG without PIL;
    ``real_decode_stats`` is the no-fallback variant that raises instead).
    ``use_real=False`` forces the fake (oracles/tests need reproducible
    values regardless of environment). ``require_real=True`` is kept for
    API stability; since the stdlib codecs made real decode unconditional
    it can no longer trigger.
    """
    if require_real and not HAVE_REAL_DECODERS:
        raise NotImplementedError(
            "real media decoding unavailable in this environment; "
            "install PIL/av (HAVE_REAL_DECODERS is probed at import)")
    real = HAVE_REAL_DECODERS if use_real is None else use_real
    decode_fn = _real_decode_features if real else _fake_decode_features

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_fn(bytes(p) if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                "feat": [f.tolist() for f in feats],
                "thumb_w": np.minimum(pdf["width"].fillna(0), thumb).astype("int32"),
                "thumb_h": np.minimum(pdf["height"].fillna(0), thumb).astype("int32"),
            })

    return media.mapInPandas(fn, FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id string, kind string, out_w int, out_h int, thumb binary"
FRAME_SCHEMA = "media_id string, frame_idx int, frame_ts_ms int, frame binary"


def resize_thumbnails(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Decode -> resize -> re-encode thumbnails. Decode/encode are stubbed
    (deterministic byte slice standing in for pixel data); the aspect-ratio
    math, schema, and Arrow batching are the real contract."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].fillna(1).astype("int64").clip(lower=1)
            h = pdf["height"].fillna(1).astype("int64").clip(lower=1)
            scale = np.minimum(1.0, max_side / np.maximum(w, h))
            ow = np.maximum(1, (w * scale).astype("int64"))
            oh = np.maximum(1, (h * scale).astype("int64"))
            thumbs = [
                bytes(p)[: max(1, int(a * b))] if p is not None else b"\0"
                for p, a, b in zip(pdf["payload"], ow, oh)
            ]  # stub: real impl = PIL resize + JPEG encode
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "out_w": ow.astype("int32"), "out_h": oh.astype("int32"),
                "thumb": thumbs,
            })

    return media.mapInPandas(fn, RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for video rows: emit up to ``max_frames`` evenly
    spaced frame records per video (1 input row -> N output rows — the
    flat-map shape). Frame decode is stubbed with a deterministic slice."""

    cols = ["media_id", "frame_idx", "frame_ts_ms", "frame"]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            v = pdf[pdf["kind"] == "video"]
            if len(v) == 0:
                yield pd.DataFrame(columns=cols)
                continue
            dur = v["duration_ms"].fillna(0).astype("int64").to_numpy()
            n = np.minimum(max_frames, np.maximum(1, dur // every_ms))
            # vectorized 1-row -> n-rows fan-out: repeat row indices, derive
            # each output row's frame index from its offset in the repeat run
            ridx = np.repeat(np.arange(len(v)), n)
            fidx = np.arange(n.sum()) - np.repeat(np.cumsum(n) - n, n)
            payloads = [
                bytes(p) if p is not None else b"\0"
                for p in v["payload"].to_numpy()
            ]  # per-payload byte handling — inherently per-row, like decode
            offs = (fidx * 31) % np.maximum(
                1, np.array([len(p) for p in payloads])[ridx])
            yield pd.DataFrame({
                "media_id": v["media_id"].to_numpy()[ridx],
                "frame_idx": fidx.astype("int32"),
                "frame_ts_ms": (fidx * every_ms).astype("int32"),
                "frame": [payloads[r][o:o + 16]
                          for r, o in zip(ridx, offs)],
            })

    return media.mapInPandas(fn, FRAME_SCHEMA)


REAL_STATS_SCHEMA = (
    "media_id string, kind string, h int, w int, ch int, n_samples int, "
    "stat_sum double, stat_min double, stat_max double"
)


def synthetic_real_media(spark, n_images: int = 48,
                         n_audio: int = 48) -> DataFrame:
    """Deterministic REAL media payloads: actual PNG files (zlib-deflated,
    per-row filters cycling through all five types, gray and gray+alpha)
    and actual RIFF/PCM-16 WAV files, built from closed-form pixel/sample
    patterns so their decoded statistics are analytically computable in
    pure SQL — the oracle for the real-decode seam.

    image i in [0, n_images):  h=12+i%5, w=16+i%7, ch=1+i%2,
      pixel(y,x) = (a*y + b*x + c) % 256 with a=3+i%7, b=5+i%11, c=i%251
      (every channel carries the same value; luma == channel 0).
    audio j, i2 = j - n_images:  nch=1+i2%2, nsamp=200+i2%50,
      sample(k,c) = ((k*(7+i2%13) + 11*c + i2) % 4001) - 2000.
    """
    from collections.abc import Iterator as _It  # noqa: F401

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import mediacodec

        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for raw_i in pdf["id"]:
                i = int(raw_i)
                if i < n_images:
                    h, w, ch = 12 + i % 5, 16 + i % 7, 1 + i % 2
                    a, b, c = 3 + i % 7, 5 + i % 11, i % 251
                    y, x = np.mgrid[0:h, 0:w]
                    luma = (a * y + b * x + c) % 256
                    img = np.repeat(luma[:, :, None], ch, axis=2).astype(np.uint8)
                    payloads.append(mediacodec.encode_png(
                        img, filters=(np.arange(h) + i) % 5))
                    kinds.append("image")
                else:
                    i2 = i - n_images
                    nch, nsamp = 1 + i2 % 2, 200 + i2 % 50
                    k, cth = np.mgrid[0:nsamp, 0:nch]
                    s = ((k * (7 + i2 % 13) + 11 * cth + i2) % 4001) - 2000
                    payloads.append(mediacodec.encode_wav(
                        s.astype(np.int16), rate=8000))
                    kinds.append("audio")
                ids.append(f"m{i:06d}")
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads})

    return spark.range(n_images + n_audio).mapInPandas(
        gen, "media_id string, kind string, payload binary")


def real_decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode -> exact integer statistics (no fake fallback, no
    rounding): PNG payloads inflate + un-filter to pixels and report luma
    sum/min/max over the full image; WAV payloads parse to int16 samples
    and report sum/min/max over all channels. Sums of <=2^20 values
    bounded by 2^15 are exact in float64, so the driver's value-hash
    compares closed-form SQL integers — the decode path itself is what is
    being checked. Audio rows report h = w = 0."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import mediacodec

        for pdf in batches:
            rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"],
                                    pdf["payload"]):
                p = bytes(p)
                sniffed = mediacodec.sniff(p)
                if sniffed == "png":
                    img = mediacodec.decode_png(p)
                    h, w, ch = img.shape
                    vals = mediacodec.png_luma(img).astype(np.float64).ravel()
                    n = h * w
                elif sniffed == "wav":
                    s, _rate = mediacodec.decode_wav(p)
                    vals = s.astype(np.float64).ravel()
                    h, w, ch, n = 0, 0, s.shape[1], s.size
                else:
                    raise ValueError(f"undecodable payload for {mid}")
                rows.append((mid, kind, h, w, ch, n, float(vals.sum()),
                             float(vals.min()), float(vals.max())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "h", "w", "ch", "n_samples",
                "stat_sum", "stat_min", "stat_max"])

    return media.mapInPandas(fn, REAL_STATS_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload = seeded bytes."""
    df = spark.range(n).select(
        F.concat(F.lit("m"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.repeat(F.col("id").cast("string"), 50)), "utf-8"
        ).cast("binary").alias("payload"),
        (F.pmod(F.xxhash64("id"), F.lit(1024)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(768)) + 16).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(60000))).cast("int").alias("duration_ms"),
    )
    return df

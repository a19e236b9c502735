"""Multimodal column plumbing (SURVEY.md §2.12).

Images / audio / video ride as opaque ``binary`` columns plus a typed
metadata struct.  The container has no image/audio libraries, so the
codecs here are PURE-PYTHON decoders for four self-describing formats
— binary PPM (P6), uncompressed 24-bit BMP, PNG (8-bit grey/RGB/RGBA,
non-interlaced, all five filter types; stdlib zlib only), and PCM-16
WAV/RIFF — plus deterministic generators for the same formats, so
decode → feature-extract → resize → frame-sample pipelines run
end-to-end on real (including really-compressed) bytes.  Remaining
formats (JPEG/MP3/video) raise NotImplementedError at decode time
(clearly-marked gap: a production deployment swaps the decode
closures for Pillow/soundfile calls — the Spark-side schema,
partitioning and batch shapes don't change).

Pickling discipline: every function that runs executor-side is created
inside the `_codec_fns` factory, so cloudpickle serializes it BY VALUE
(closures cannot be found by qualified name) and executors never need
`core2_spark` importable on their own sys.path.

At 100 TB: binary payloads dominate partition size — size partitions
by bytes (maxPartitionBytes), never groupBy the payload itself, and
push metadata-only predicates before any decode.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, mime string, n_bytes long, feature array<double>"
FEATURE_WIDTH = 8  # every codec's feature vector is this fixed width

MIME_PPM = "image/x-portable-pixmap"
MIME_BMP = "image/bmp"
MIME_WAV = "audio/wav"
MIME_PNG = "image/png"


def _codec_fns():
    """Factory for every executor-side codec closure (see module
    docstring for why these must be nested).  Returns a dict of
    functions; also usable driver-side for unit tests."""
    import math

    import numpy as np

    # -- decoders ------------------------------------------------------

    def decode_ppm(payload: bytes):
        """Binary PPM (P6): ASCII header `P6 <w> <h> <maxval>` with
        #-comments, one whitespace, then w*h*3 raw RGB bytes.
        Returns (width, height, HxWx3 uint8 array)."""
        if payload[:2] != b"P6":
            raise ValueError("not a P6 PPM")
        # tokenize the header, skipping comments
        tokens, i, n = [], 2, len(payload)
        while len(tokens) < 3 and i < n:
            c = payload[i : i + 1]
            if c == b"#":
                while i < n and payload[i : i + 1] != b"\n":
                    i += 1
            elif c.isspace():
                i += 1
            else:
                j = i
                while j < n and not payload[j : j + 1].isspace():
                    j += 1
                tokens.append(payload[i:j])
                i = j
        w, h, maxval = (int(t) for t in tokens)
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        i += 1  # single whitespace after maxval
        px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        return w, h, px.reshape(h, w, 3).copy()

    def decode_bmp(payload: bytes):
        """Uncompressed 24-bit BMP (BITMAPINFOHEADER): bottom-up BGR
        rows padded to 4 bytes.  Returns (width, height, HxWx3 RGB)."""
        if payload[:2] != b"BM":
            raise ValueError("not a BMP")
        (data_off,) = struct.unpack_from("<I", payload, 10)
        w, h = struct.unpack_from("<ii", payload, 18)
        (bpp,) = struct.unpack_from("<H", payload, 28)
        (compression,) = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return w, h, rows[:, :, ::-1].copy()  # BGR → RGB

    def decode_png(payload: bytes):
        """PNG (round-5: a REAL compressed codec, stdlib zlib only):
        8-bit greyscale / RGB / RGBA, non-interlaced, all five filter
        types (None/Sub/Up/Average/Paeth) per the public PNG spec.
        Greyscale replicates to RGB; alpha is dropped (features and
        resize operate on RGB).  Returns (width, height, HxWx3)."""
        import zlib

        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG")
        i, n = 8, len(payload)
        w = h = bit_depth = color_type = interlace = None
        idat = bytearray()
        while i + 8 <= n:
            (length,) = struct.unpack_from(">I", payload, i)
            ctype = payload[i + 4 : i + 8]
            body = payload[i + 8 : i + 8 + length]
            if ctype == b"IHDR":
                w, h, bit_depth, color_type, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", body)
                )
            elif ctype == b"IDAT":
                idat += body
            elif ctype == b"IEND":
                break
            i += 12 + length  # length + type + data + crc
        if w is None:
            raise ValueError("PNG missing IHDR")
        if bit_depth != 8 or color_type not in (0, 2, 6) or interlace != 0:
            raise ValueError(
                f"unsupported PNG (bit_depth={bit_depth}, "
                f"color_type={color_type}, interlace={interlace}); supported: "
                "8-bit greyscale/RGB/RGBA, non-interlaced"
            )
        channels = {0: 1, 2: 3, 6: 4}[color_type]
        raw = zlib.decompress(bytes(idat))
        stride = w * channels
        if len(raw) < h * (stride + 1):
            raise ValueError("PNG IDAT truncated")
        out = np.zeros((h, stride), dtype=np.uint8)
        bpp = channels  # bytes per pixel at 8-bit depth
        for y in range(h):
            row_start = y * (stride + 1)
            ftype = raw[row_start]
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=row_start + 1
            ).astype(np.int32)
            prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
            if ftype == 0:  # None
                rec = line
            elif ftype == 2:  # Up
                rec = (line + prior) & 0xFF
            else:  # Sub/Average/Paeth recur on the left pixel
                rec = np.zeros(stride, dtype=np.int32)
                for x in range(stride):
                    a = rec[x - bpp] if x >= bpp else 0
                    b = prior[x]
                    if ftype == 1:  # Sub
                        rec[x] = (line[x] + a) & 0xFF
                    elif ftype == 3:  # Average
                        rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                    elif ftype == 4:  # Paeth
                        c = prior[x - bpp] if x >= bpp else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        rec[x] = (line[x] + pred) & 0xFF
                    else:
                        raise ValueError(f"bad PNG filter type {ftype}")
            out[y] = rec.astype(np.uint8)
        px = out.reshape(h, w, channels)
        if channels == 1:
            px = np.repeat(px, 3, axis=2)
        elif channels == 4:
            px = px[:, :, :3]
        return w, h, px.copy()

    def encode_png(px):
        """8-bit RGB non-interlaced PNG, filter type 0 rows, one zlib
        IDAT — stdlib only, round-trips through decode_png."""
        import zlib

        h, w = px.shape[0], px.shape[1]

        def chunk(ctype: bytes, body: bytes) -> bytes:
            crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
            return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        rows = px.astype(np.uint8).reshape(h, w * 3)
        raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )

    def decode_wav(payload: bytes):
        """PCM-16 WAV: walks RIFF chunks to `fmt ` and `data`.
        Returns (sample_rate, channels, float samples in [-1, 1] shaped
        (n_frames, channels))."""
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        i, n = 12, len(payload)
        fmt = data = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            (size,) = struct.unpack_from("<I", payload, i + 4)
            body = payload[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_format, channels, sample_rate, _, _, bits = fmt
        if audio_format != 1 or bits != 16:
            raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
        return sample_rate, channels, samples.reshape(-1, channels)

    # -- features ------------------------------------------------------

    def image_features(w, h, px):
        """8-dim: [w, h, aspect, mean_r, mean_g, mean_b, mean_luma,
        std_luma] — means normalized to [0, 1]."""
        rgb = px.astype(np.float64) / 255.0
        luma = 0.2126 * rgb[:, :, 0] + 0.7152 * rgb[:, :, 1] + 0.0722 * rgb[:, :, 2]
        return [
            float(w),
            float(h),
            float(w) / float(h),
            float(rgb[:, :, 0].mean()),
            float(rgb[:, :, 1].mean()),
            float(rgb[:, :, 2].mean()),
            float(luma.mean()),
            float(luma.std()),
        ]

    def audio_features(sample_rate, channels, frames):
        """8-dim: [duration_s, sample_rate, channels, rms, peak, zcr,
        mean, std] over the channel-mixed signal."""
        mono = frames.mean(axis=1)
        zc = np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))
        dur = len(mono) / sample_rate if sample_rate else 0.0
        return [
            float(dur),
            float(sample_rate),
            float(channels),
            float(np.sqrt((mono**2).mean())) if len(mono) else 0.0,
            float(np.abs(mono).max()) if len(mono) else 0.0,
            float(zc / max(len(mono) - 1, 1)),
            float(mono.mean()) if len(mono) else 0.0,
            float(mono.std()) if len(mono) else 0.0,
        ]

    def fake_features(payload):
        """Deterministic stand-in for formats without a pure-Python
        decoder: 8 normalized byte-histogram buckets."""
        if payload is None:
            return [0.0] * 8
        buckets = np.bincount(np.frombuffer(payload, dtype=np.uint8) >> 5, minlength=8)
        total = max(int(buckets.sum()), 1)
        return [float(b) / total for b in buckets]

    def features(payload, mime):
        if payload is None:
            return [0.0] * 8
        if mime == MIME_PPM:
            return image_features(*decode_ppm(payload))
        if mime == MIME_BMP:
            return image_features(*decode_bmp(payload))
        if mime == MIME_PNG:
            return image_features(*decode_png(payload))
        if mime == MIME_WAV:
            return audio_features(*decode_wav(payload))
        raise NotImplementedError(
            f"no pure-Python decoder for {mime!r}; JPEG/MP3/video codecs are "
            "not present in this container — plug Pillow/soundfile here in a "
            "real deployment, or pass fake=True for the histogram stub"
        )

    # -- transforms ----------------------------------------------------

    def encode_ppm(px):
        h, w = px.shape[0], px.shape[1]
        return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()

    def resize_nearest(px, tw, th):
        h, w = px.shape[0], px.shape[1]
        ys = (np.arange(th) * h // th).clip(0, h - 1)
        xs = (np.arange(tw) * w // tw).clip(0, w - 1)
        return px[ys][:, xs]

    def decode_image(payload, mime):
        if mime == MIME_PPM:
            return decode_ppm(payload)
        if mime == MIME_BMP:
            return decode_bmp(payload)
        if mime == MIME_PNG:
            return decode_png(payload)
        raise NotImplementedError(f"no pure-Python image decoder for {mime!r}")

    # -- deterministic generators (fixtures) ---------------------------

    def make_ppm(width, height, seed):
        """Seeded gradient-plus-stripes RGB image as P6 bytes."""
        y = np.arange(height).reshape(-1, 1)
        x = np.arange(width).reshape(1, -1)
        r = (x * 255 // max(width - 1, 1)).astype(np.uint8)
        g = (y * 255 // max(height - 1, 1)).astype(np.uint8)
        b = ((x + y + seed) % 256).astype(np.uint8)
        px = np.stack(
            [np.broadcast_to(r, (height, width)), np.broadcast_to(g, (height, width)), b],
            axis=2,
        )
        return encode_ppm(px)

    def make_bmp(width, height, seed):
        """Same pixel pattern as make_ppm, encoded as bottom-up 24-bit BMP."""
        _, _, px = decode_ppm(make_ppm(width, height, seed))
        stride = (width * 3 + 3) & ~3
        rows = np.zeros((height, stride), dtype=np.uint8)
        rows[:, : width * 3] = px[::-1, :, ::-1].reshape(height, width * 3)
        pixel_bytes = rows.tobytes()
        header = struct.pack(
            "<2sIHHI", b"BM", 54 + len(pixel_bytes), 0, 0, 54
        ) + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
        )
        return header + pixel_bytes

    def make_png(width, height, seed):
        """Same pixel pattern as make_ppm, zlib-compressed as PNG."""
        _, _, px = decode_ppm(make_ppm(width, height, seed))
        return encode_png(px)

    def make_wav(n_frames, sample_rate, freq_hz, seed):
        """Seeded sine wave (freq shifted by seed) as PCM-16 mono WAV."""
        t = np.arange(n_frames, dtype=np.float64) / sample_rate
        signal = np.sin(2 * math.pi * (freq_hz + seed % 50) * t) * 0.5
        data = (signal * 32767).astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
        return (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(data))
            + data
        )

    return {
        "decode_ppm": decode_ppm,
        "decode_bmp": decode_bmp,
        "decode_png": decode_png,
        "decode_wav": decode_wav,
        "decode_image": decode_image,
        "features": features,
        "fake_features": fake_features,
        "encode_ppm": encode_ppm,
        "encode_png": encode_png,
        "resize_nearest": resize_nearest,
        "make_ppm": make_ppm,
        "make_bmp": make_bmp,
        "make_png": make_png,
        "make_wav": make_wav,
    }


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    Real pure-Python decoders cover PPM/BMP/WAV payloads; other mime
    types raise NotImplementedError at execution time (the documented
    codec gap) unless ``fake=True`` forces the deterministic
    byte-histogram stand-in for every row."""
    fns = _codec_fns()
    features, fake_features = fns["features"], fns["fake_features"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = pdf["payload"].map(fake_features)
            else:
                feats = [
                    features(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Decode (PPM/BMP) → nearest-neighbor resize → re-encode as PPM,
    per Arrow batch.  Nearest-neighbor keeps the kernel dependency-free;
    swapping a real resampler changes one closure, not the plan."""
    fns = _codec_fns()
    decode_image, resize, encode = (
        fns["decode_image"],
        fns["resize_nearest"],
        fns["encode_ppm"],
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, m in zip(pdf["payload"], pdf["mime"]):
                _, _, px = decode_image(p, m)
                out.append(encode(resize(px, target_w, target_h)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def generate_media(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic executor-side media fixture: each input id becomes
    one PPM / BMP / WAV payload (format = id % 3, dimensions/duration
    seeded by id).  Runs distributed — the generator closures travel by
    value with the task, like every codec here."""
    fns = _codec_fns()
    make_ppm, make_bmp, make_wav = fns["make_ppm"], fns["make_bmp"], fns["make_wav"]
    make_png = fns["make_png"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "meta": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 16 + mid % 17, 12 + mid % 13
                if mid % 4 == 0:
                    payload, mime = make_ppm(w, h, mid), MIME_PPM
                    meta = {"width": w, "height": h, "duration_ms": None}
                elif mid % 4 == 1:
                    payload, mime = make_bmp(w, h, mid), MIME_BMP
                    meta = {"width": w, "height": h, "duration_ms": None}
                elif mid % 4 == 2:
                    payload, mime = make_png(w, h, mid), MIME_PNG
                    meta = {"width": w, "height": h, "duration_ms": None}
                else:
                    n = 800 + (mid % 7) * 160
                    payload, mime = make_wav(n, 8000, 440, mid), MIME_WAV
                    meta = {
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / 8000),
                    }
                rows["media_id"].append(mid)
                rows["payload"].append(payload)
                rows["mime"].append(mime)
                rows["meta"].append(meta)
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands metadata to frame
    timestamps (pure column algebra); the frame grab itself would be a
    decode-closure swap like the rest of the codec layer."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
        ).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)

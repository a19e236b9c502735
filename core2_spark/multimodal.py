"""Multimodal column plumbing (SURVEY.md §2.12).

Images / audio / video ride as opaque ``binary`` columns plus a typed
metadata struct.  The container has no image/audio libraries, so the
codecs here are PURE-PYTHON decoders for seven self-describing formats
— binary PPM (P6), uncompressed 24-bit BMP, PNG (8-bit grey/RGB/RGBA,
non-interlaced, all five filter types; stdlib zlib only), baseline-
sequential JPEG/JFIF (round 6: Huffman + IDCT, greyscale/4:4:4/4:2:0
/4:2:2, restart intervals; encoder at 4:4:4 with the public Annex-K
tables), MJPEG-in-AVI video (round 6: RIFF walk + per-frame JPEG —
real frame extraction, not a metadata plan), FLAC (round 6: lossless
compressed audio — rice-coded fixed/LPC prediction, all four stereo
modes on decode; fixed-order-2 + rice encoder), and PCM-16 WAV/RIFF —
plus deterministic generators for the same formats, so decode →
feature-extract → resize → frame-sample pipelines run end-to-end on
real (including really-compressed) bytes.  MP3 (round 8) has a real
STREAM layer — frame-sync walk, MPEG-1 Layer III header decode,
bit-reservoir-aware frame lengths, Xing/VBR detection,
bitrate/duration — with a spec-valid silent-stream generator; its PCM
reconstruction, and non-MJPEG video, raise NotImplementedError at
decode time (clearly-marked gap: the ISO Huffman/synthesis-window
constants aren't derivable, so a production deployment swaps the
decode closures for soundfile/ffmpeg calls — the Spark-side schema,
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
MIME_JPEG = "image/jpeg"
MIME_AVI = "video/x-msvideo"
MIME_FLAC = "audio/flac"
MIME_MP3 = "audio/mpeg"


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

    # -- JPEG (round 6): baseline-sequential JFIF, pure Python --------
    # The format real image corpora are in.  Decoder: SOI/APP/DQT/
    # SOF0/DHT/DRI/SOS/RSTn/EOI walk, canonical-Huffman entropy
    # decode with 0xFF00 de-stuffing, dequantize, de-zigzag, separable
    # 8x8 IDCT, per-component sampling-factor upsample (4:4:4, 4:2:0,
    # 4:2:2 and greyscale), YCbCr→RGB.  Encoder: the reverse with the
    # public Annex-K quantization + Huffman tables at 4:4:4 — so the
    # fixture generator emits REAL compressed JPEG bytes and the
    # round-trip is testable without any image library.

    _ZZ = np.array([
         0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ])
    _QL = np.array([  # Annex K luminance quantization, row-major
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ])
    _QC = np.array([  # Annex K chrominance quantization
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ])
    # Annex K Huffman specs: (BITS[1..16], HUFFVAL)
    _HT_DC_L = (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    _HT_DC_C = (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    _HT_AC_L = (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
            0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
            0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
            0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
            0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
            0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
            0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
            0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
            0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
            0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
            0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
            0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
            0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
            0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    )
    _HT_AC_C = (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
            0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
            0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
            0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
            0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
            0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
            0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
            0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
            0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
            0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
            0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
            0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
            0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
            0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
            0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
            0xF9, 0xFA,
        ],
    )

    def _dct_mat():
        C = np.zeros((8, 8))
        for k in range(8):
            scale = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
            for n in range(8):
                C[k, n] = scale * math.cos((2 * n + 1) * k * math.pi / 16)
        return C  # forward: C @ block @ C.T ; inverse: C.T @ coef @ C

    def _huff_codes(bits, values):
        """Canonical Huffman: (code, length) per symbol, JPEG order."""
        out, code, i = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                out[values[i]] = (code, length)
                code += 1
                i += 1
            code <<= 1
        return out

    def _huff_decode_map(bits, values):
        """(length, code) → symbol, for the bit-at-a-time decoder."""
        return {
            (ln, code): sym
            for sym, (code, ln) in _huff_codes(bits, values).items()
        }

    def decode_jpeg(payload: bytes):
        """Baseline-sequential JFIF decode (greyscale or YCbCr with
        arbitrary 1-2 sampling factors, optional restart intervals).
        Returns (width, height, HxWx3 RGB uint8)."""
        if payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        qt: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode map
        comps = None  # [(cid, h, v, tq)]
        w = h = None
        restart_interval = 0
        i, n = 2, len(payload)
        scan = None
        while i + 4 <= n:
            if payload[i] != 0xFF:
                raise ValueError(f"bad marker alignment at {i}")
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI
                break
            (seg_len,) = struct.unpack_from(">H", payload, i + 2)
            body = payload[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:  # DQT
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    if pq != 0:
                        raise ValueError("16-bit quant tables unsupported")
                    qt[tq] = np.frombuffer(
                        body, np.uint8, 64, j + 1
                    ).astype(np.int32)
                    j += 65
            elif marker == 0xC0:  # SOF0 baseline
                _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                comps = []
                for c in range(nc):
                    cid, hv, tq_ = body[6 + c * 3 : 9 + c * 3]
                    comps.append((cid, hv >> 4, hv & 0x0F, tq_))
            elif marker in (0xC1, 0xC2, 0xC3):
                raise ValueError(
                    "only baseline sequential JPEG (SOF0) is supported"
                )
            elif marker == 0xC4:  # DHT
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    bits = list(body[j + 1 : j + 17])
                    nv = sum(bits)
                    vals = list(body[j + 17 : j + 17 + nv])
                    huff[(tc, th)] = _huff_decode_map(bits, vals)
                    j += 17 + nv
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS
                ns = body[0]
                scan = []  # (component index, dc table id, ac table id)
                for s in range(ns):
                    cs, tbl = body[1 + s * 2], body[2 + s * 2]
                    idx = next(
                        k for k, c in enumerate(comps) if c[0] == cs
                    )
                    scan.append((idx, tbl >> 4, tbl & 0x0F))
                i = i + 2 + seg_len
                break
            i += 2 + seg_len
        if scan is None or comps is None:
            raise ValueError("JPEG missing SOF0/SOS")

        # entropy-coded data: de-stuff 0xFF00, note restart markers
        data = bytearray()
        rst_positions = []  # bit offsets where RSTn occurred
        j = i
        while j < n - 1:
            b = payload[j]
            if b == 0xFF:
                m = payload[j + 1]
                if m == 0x00:
                    data.append(0xFF)
                    j += 2
                    continue
                if 0xD0 <= m <= 0xD7:  # RSTn
                    rst_positions.append(len(data) * 8)
                    j += 2
                    continue
                break  # EOI or next marker
            data.append(b)
            j += 1

        class _Bits:
            __slots__ = ("pos",)

            def __init__(self):
                self.pos = 0

            def bit(self):
                byte = data[self.pos >> 3]
                b = (byte >> (7 - (self.pos & 7))) & 1
                self.pos += 1
                return b

            def bits(self, k):
                v = 0
                for _ in range(k):
                    v = (v << 1) | self.bit()
                return v

            def align_to(self, bitpos):
                self.pos = bitpos

        def _huffsym(r, table):
            code, ln = 0, 0
            while ln < 16:
                code = (code << 1) | r.bit()
                ln += 1
                sym = table.get((ln, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code in JPEG stream")

        def _extend(v, t):
            return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        planes = [
            np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), np.float64)
            for c in comps
        ]
        Cm = _dct_mat()
        reader = _Bits()
        pred = [0] * len(comps)
        mcu_count = 0
        rst_iter = iter(rst_positions)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    nxt = next(rst_iter, None)
                    if nxt is not None:
                        reader.align_to(nxt)
                    pred = [0] * len(comps)
                for ci, dc_id, ac_id in scan:
                    _cid, ch, cv, tq_ = comps[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            zz = np.zeros(64, np.int32)
                            t = _huffsym(reader, huff[(0, dc_id)])
                            diff = _extend(reader.bits(t), t) if t else 0
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = _huffsym(reader, huff[(1, ac_id)])
                                rr, ss = rs >> 4, rs & 0x0F
                                if ss == 0:
                                    if rr == 15:
                                        k += 16  # ZRL
                                        continue
                                    break  # EOB
                                k += rr
                                if k > 63:
                                    raise ValueError("AC index overflow")
                                zz[k] = _extend(reader.bits(ss), ss)
                                k += 1
                            coef = np.zeros(64, np.float64)
                            coef[_ZZ] = zz * qt[tq_]
                            block = Cm.T @ coef.reshape(8, 8) @ Cm
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
                mcu_count += 1

        full = []
        for ci, (_cid, ch, cv, _tq) in enumerate(comps):
            p = planes[ci] + 128.0
            # nearest upsample to full MCU-aligned resolution, crop
            p = np.repeat(np.repeat(p, vmax // cv, 0), hmax // ch, 1)
            full.append(p[:h, :w])
        if len(full) == 1:
            g = np.clip(full[0], 0, 255).astype(np.uint8)
            return w, h, np.stack([g, g, g], axis=2)
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        px = np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)
        return w, h, px

    def encode_jpeg(px, quality: int = 85):
        """Baseline-sequential 4:4:4 JFIF encode with the Annex-K
        tables scaled by ``quality`` (libjpeg convention).  Pure
        Python; round-trips through decode_jpeg within quantization
        tolerance."""
        h, w = px.shape[0], px.shape[1]
        q = max(1, min(100, int(quality)))
        scale = 5000 // q if q < 50 else 200 - 2 * q
        ql = np.clip((_QL * scale + 50) // 100, 1, 255).astype(np.int32)
        qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)

        rgb = px.astype(np.float64)
        y = (
            0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        )
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128.0
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128.0

        Cm = _dct_mat()
        enc_dc = (_huff_codes(*_HT_DC_L), _huff_codes(*_HT_DC_C))
        enc_ac = (_huff_codes(*_HT_AC_L), _huff_codes(*_HT_AC_C))

        out = bytearray()
        acc = [0, 0]  # bit accumulator: value, count

        def put(code, ln):
            acc[0] = (acc[0] << ln) | code
            acc[1] += ln
            while acc[1] >= 8:
                byte = (acc[0] >> (acc[1] - 8)) & 0xFF
                out.append(byte)
                if byte == 0xFF:
                    out.append(0x00)  # byte stuffing
                acc[1] -= 8
                acc[0] &= (1 << acc[1]) - 1

        def magnitude(v):
            a, t = abs(v), 0
            while a:
                a >>= 1
                t += 1
            return t

        bh, bw = (h + 7) // 8, (w + 7) // 8
        planes = []
        for plane, qtab in ((y, ql), (cb, qc), (cr, qc)):
            padded = np.empty((bh * 8, bw * 8))
            padded[:h, :w] = plane
            padded[h:, :w] = plane[-1:, :]  # edge-replicate pad
            padded[:, w:] = padded[:, w - 1 : w]
            planes.append((padded - 128.0, qtab))

        pred = [0, 0, 0]
        zz_blocks = []  # (component index, quantized zigzag)
        for by in range(bh):
            for bx in range(bw):
                for ci, (plane, qtab) in enumerate(planes):
                    block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    coef = Cm @ block @ Cm.T
                    zz = np.round(
                        coef.reshape(64)[_ZZ] / qtab[_ZZ]
                    ).astype(np.int64)
                    zz_blocks.append((ci, zz))
        for ci, zz in zz_blocks:
            ti = 0 if ci == 0 else 1
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            t = magnitude(diff)
            code, ln = enc_dc[ti][t]
            put(code, ln)
            if t:
                put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[ti][0xF0]  # ZRL
                    put(code, ln)
                    run -= 16
                s = magnitude(v)
                code, ln = enc_ac[ti][(run << 4) | s]
                put(code, ln)
                put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
                if k == last_nz:
                    break
            if last_nz < 63:
                code, ln = enc_ac[ti][0x00]  # EOB
                put(code, ln)
        if acc[1]:  # pad final byte with 1s
            put((1 << (8 - acc[1])) - 1, 8 - acc[1])

        def seg(marker, body):
            return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

        def dht(tc, th, spec):
            bits, vals = spec
            return seg(
                0xC4,
                bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals),
            )

        jfif = seg(
            0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
        )
        dqt = seg(0xDB, b"\x00" + bytes(ql[_ZZ].tolist())) + seg(
            0xDB, b"\x01" + bytes(qc[_ZZ].tolist())
        )
        sof = seg(
            0xC0,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        hts = (
            dht(0, 0, _HT_DC_L)
            + dht(1, 0, _HT_AC_L)
            + dht(0, 1, _HT_DC_C)
            + dht(1, 1, _HT_AC_C)
        )
        sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        return (
            b"\xff\xd8" + jfif + dqt + sof + hts + sos + bytes(out) + b"\xff\xd9"
        )

    # -- FLAC (round 6): real lossless compressed audio ---------------
    # Decoder: metadata walk (STREAMINFO), frame headers (CRC-8-
    # checked coded numbers, all block-size/sample-rate codes),
    # subframes CONSTANT/VERBATIM/FIXED(0-4)/LPC(any order), rice-
    # partitioned residuals (methods 0 and 1, escape codes), and all
    # four channel assignments (independent, left/side, right/side,
    # mid/side).  Encoder: 16-bit mono/stereo-independent FIXED
    # order-2 prediction + single-partition rice residuals — genuine
    # compression, losslessly round-tripping through the decoder.

    class _BitReader:
        __slots__ = ("buf", "pos")

        def __init__(self, buf: bytes, pos_bits: int = 0):
            self.buf = buf
            self.pos = pos_bits

        def bits(self, k: int) -> int:
            v = 0
            for _ in range(k):
                byte = self.buf[self.pos >> 3]
                v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
                self.pos += 1
            return v

        def signed(self, k: int) -> int:
            v = self.bits(k)
            return v - (1 << k) if v >> (k - 1) else v

        def unary(self) -> int:
            n = 0
            while self.bits(1) == 0:
                n += 1
            return n

        def align(self) -> None:
            self.pos = (self.pos + 7) & ~7

    def _flac_utf8_number(r) -> int:
        """Frame numbers use UTF-8-style variable coding (up to 7 B)."""
        first = r.bits(8)
        if first < 0x80:
            return first
        n_extra = 0
        mask = 0x40
        while first & mask:
            n_extra += 1
            mask >>= 1
        v = first & (mask - 1) if mask > 1 else 0
        for _ in range(n_extra):
            v = (v << 6) | (r.bits(8) & 0x3F)
        return v

    def _rice_read(r, param: int) -> int:
        q = r.unary()
        u = (q << param) | (r.bits(param) if param else 0)
        return (u >> 1) ^ -(u & 1)  # unfold zigzag

    def decode_flac(payload: bytes):
        """Returns (sample_rate, channels, float frames in [-1, 1]
        shaped (n, channels)) — same contract as decode_wav."""
        if payload[:4] != b"fLaC":
            raise ValueError("not a FLAC stream")
        i = 4
        sample_rate = channels = bps = None
        total = 0
        while True:
            last = payload[i] >> 7
            btype = payload[i] & 0x7F
            (blen,) = struct.unpack(">I", b"\x00" + payload[i + 1 : i + 4])
            body = payload[i + 4 : i + 4 + blen]
            if btype == 0:  # STREAMINFO
                r = _BitReader(body)
                r.bits(16); r.bits(16); r.bits(24); r.bits(24)
                sample_rate = r.bits(20)
                channels = r.bits(3) + 1
                bps = r.bits(5) + 1
                total = r.bits(36)
            i += 4 + blen
            if last:
                break
        if sample_rate is None:
            raise ValueError("FLAC missing STREAMINFO")

        out = [[] for _ in range(channels)]
        r = _BitReader(payload, i * 8)
        n_bits = len(payload) * 8
        while r.pos + 40 <= n_bits and (total == 0 or len(out[0]) < total):
            if r.bits(14) != 0x3FFE:
                raise ValueError("bad FLAC frame sync")
            r.bits(1)  # reserved
            r.bits(1)  # blocking strategy
            bs_code = r.bits(4)
            sr_code = r.bits(4)
            ch_code = r.bits(4)
            ss_code = r.bits(3)
            r.bits(1)  # reserved
            _flac_utf8_number(r)
            if bs_code == 1:
                bsize = 192
            elif 2 <= bs_code <= 5:
                bsize = 576 << (bs_code - 2)
            elif bs_code == 6:
                bsize = r.bits(8) + 1
            elif bs_code == 7:
                bsize = r.bits(16) + 1
            else:
                bsize = 256 << (bs_code - 8)
            if sr_code == 12:
                r.bits(8)
            elif sr_code in (13, 14):
                r.bits(16)
            if ss_code == 3:
                raise ValueError("reserved FLAC sample size code 3")
            ssize = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}[ss_code]
            r.bits(8)  # header CRC-8
            if ch_code <= 7:
                n_ch, assignment = ch_code + 1, "independent"
            elif ch_code <= 10:
                n_ch, assignment = 2, {8: "left_side", 9: "right_side", 10: "mid_side"}[ch_code]
            else:
                raise ValueError(f"reserved FLAC channel assignment {ch_code}")

            def subframe(extra_bit: int):
                r.bits(1)  # zero pad
                stype = r.bits(6)
                wasted = 0
                if r.bits(1):
                    wasted = r.unary() + 1
                width = ssize + extra_bit - wasted
                if stype == 0:  # CONSTANT
                    samples = [r.signed(width)] * bsize
                elif stype == 1:  # VERBATIM
                    samples = [r.signed(width) for _ in range(bsize)]
                elif 8 <= stype <= 12:  # FIXED order 0-4
                    order = stype - 8
                    samples = [r.signed(width) for _ in range(order)]
                    _residual(samples, order)
                elif stype >= 32:  # LPC
                    order = (stype & 0x1F) + 1
                    samples = [r.signed(width) for _ in range(order)]
                    prec = r.bits(4) + 1
                    shift = r.signed(5)
                    if shift < 0:
                        raise ValueError("negative FLAC LPC shift")
                    coefs = [r.signed(prec) for _ in range(order)]
                    res = []
                    _read_residual(res, order)
                    for k in range(order, bsize):
                        pred = sum(
                            coefs[j] * samples[k - 1 - j] for j in range(order)
                        ) >> shift
                        samples.append(res[k - order] + pred)
                else:
                    raise ValueError(f"reserved FLAC subframe type {stype}")
                return [s << wasted for s in samples]

            def _read_residual(res, order):
                method = r.bits(2)
                if method > 1:
                    raise ValueError("reserved residual method")
                pbits = 4 if method == 0 else 5
                esc = 0xF if method == 0 else 0x1F
                porder = r.bits(4)
                n_part = 1 << porder
                for p in range(n_part):
                    n = (bsize >> porder) - (order if p == 0 else 0)
                    param = r.bits(pbits)
                    if param == esc:
                        raw = r.bits(5)
                        res.extend(r.signed(raw) if raw else 0 for _ in range(n))
                    else:
                        res.extend(_rice_read(r, param) for _ in range(n))

            def _residual(samples, order):
                res = []
                _read_residual(res, order)
                for k in range(order, bsize):
                    e = res[k - order]
                    if order == 0:
                        v = e
                    elif order == 1:
                        v = e + samples[k - 1]
                    elif order == 2:
                        v = e + 2 * samples[k - 1] - samples[k - 2]
                    elif order == 3:
                        v = e + 3 * samples[k - 1] - 3 * samples[k - 2] + samples[k - 3]
                    else:
                        v = (e + 4 * samples[k - 1] - 6 * samples[k - 2]
                             + 4 * samples[k - 3] - samples[k - 4])
                    samples.append(v)

            if assignment == "independent":
                chans = [subframe(0) for _ in range(n_ch)]
            elif assignment == "left_side":
                left = subframe(0)
                side = subframe(1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif assignment == "right_side":
                side = subframe(1)
                right = subframe(0)
                chans = [[rr + s for rr, s in zip(right, side)], right]
            else:  # mid_side
                mid = subframe(0)
                side = subframe(1)
                chans = [[], []]
                for m, sd in zip(mid, side):
                    l = (m << 1 | (sd & 1)) + sd
                    chans[0].append(l >> 1)
                    chans[1].append((l >> 1) - sd)
            r.align()
            r.bits(16)  # frame CRC-16
            for c in range(channels):
                out[c].extend(chans[c] if c < len(chans) else chans[-1])

        n = min(len(c) for c in out) if out else 0
        if total:
            n = min(n, total)
        frames = np.empty((n, channels))
        denom = float(1 << (bps - 1))
        for c in range(channels):
            frames[:, c] = np.array(out[c][:n], dtype=np.float64) / denom
        return sample_rate, channels, frames

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def bits(self, v: int, k: int) -> None:
            self.acc = (self.acc << k) | (v & ((1 << k) - 1))
            self.n += k
            while self.n >= 8:
                self.out.append((self.acc >> (self.n - 8)) & 0xFF)
                self.n -= 8
                self.acc &= (1 << self.n) - 1

        def align(self) -> None:
            if self.n:
                self.bits(0, 8 - self.n)

    def _crc8(data: bytes) -> int:
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
        return crc

    def _crc16(data: bytes) -> int:
        crc = 0
        for b in data:
            crc ^= b << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
        return crc

    def encode_flac(sample_rate: int, frames) -> bytes:
        """16-bit FLAC: FIXED order-2 subframes, one rice partition per
        subframe (best 4-bit param by exact cost), 4096-sample blocks.
        ``frames``: float array shaped (n, channels) in [-1, 1]."""
        frames = np.asarray(frames, dtype=np.float64)
        if frames.ndim == 1:
            frames = frames[:, None]
        n, channels = frames.shape
        ints = np.clip(np.round(frames * 32768.0), -32768, 32767).astype(np.int64)

        head = _BitWriter()
        head.bits(1, 1)  # last metadata block
        head.bits(0, 7)  # STREAMINFO
        head.bits(34, 24)
        head.bits(4096, 16); head.bits(4096, 16)
        head.bits(0, 24); head.bits(0, 24)
        head.bits(sample_rate, 20)
        head.bits(channels - 1, 3)
        head.bits(15, 5)  # bps - 1
        head.bits(n, 36)
        head.out.extend(b"\x00" * 16)  # md5 unset (decoder ignores)

        body = bytearray()
        frame_no = 0
        for start in range(0, n, 4096):
            block = ints[start : start + 4096]
            bsize = block.shape[0]
            w = _BitWriter()
            w.bits(0x3FFE, 14); w.bits(0, 1); w.bits(0, 1)
            w.bits(7, 4)        # block size: 16-bit value follows
            w.bits(0, 4)        # sample rate: from STREAMINFO
            w.bits(channels - 1, 4)  # independent channels
            w.bits(4, 3)        # 16-bit samples
            w.bits(0, 1)
            if frame_no < 0x80:
                w.bits(frame_no, 8)  # UTF-8 single byte
            else:
                w.bits(0xC0 | (frame_no >> 6), 8)
                w.bits(0x80 | (frame_no & 0x3F), 8)
            w.bits(bsize - 1, 16)
            w.align()
            hdr = bytes(w.out)
            w.bits(_crc8(hdr), 8)
            for c in range(channels):
                x = block[:, c]
                w.bits(0, 1)
                order = 2 if bsize > 2 else 0
                w.bits(8 + order, 6)  # FIXED subframe
                w.bits(0, 1)          # no wasted bits
                for k in range(order):
                    w.bits(int(x[k]), 16)
                if order == 2:
                    res = x[2:] - 2 * x[1:-1] + x[:-2]
                else:
                    res = x
                folded = (np.abs(res) << 1) - (res < 0).astype(np.int64)
                best_p, best_cost = 0, None
                for p in range(15):
                    cost = int(np.sum(folded >> p)) + (p + 1) * len(folded)
                    if best_cost is None or cost < best_cost:
                        best_p, best_cost = p, cost
                w.bits(0, 2)       # rice method 0
                w.bits(0, 4)       # partition order 0
                w.bits(best_p, 4)
                for u in folded:
                    q = int(u) >> best_p
                    w.bits(0, q) if q else None
                    w.bits(1, 1)
                    if best_p:
                        w.bits(int(u) & ((1 << best_p) - 1), best_p)
            w.align()
            payload_wo_crc = bytes(w.out)
            w.bits(_crc16(payload_wo_crc), 16)
            body.extend(w.out)
            frame_no += 1
        return b"fLaC" + bytes(head.out) + bytes(body)

    def make_flac(n_frames, sample_rate, freq_hz, seed):
        """Seeded sine (same signal family as make_wav), FLAC-encoded."""
        t = np.arange(n_frames, dtype=np.float64) / sample_rate
        signal = np.sin(2 * math.pi * (freq_hz + seed % 50) * t) * 0.5
        return encode_flac(sample_rate, signal)

    # -- MJPEG/AVI (round 6): a real video container ------------------

    def _riff_chunks(buf: bytes, i: int, end: int):
        while i + 8 <= end:
            cid = buf[i : i + 4]
            (size,) = struct.unpack_from("<I", buf, i + 4)
            yield cid, i + 8, size
            i += 8 + size + (size & 1)  # chunks are word-aligned

    def decode_avi(payload: bytes):
        """MJPEG-in-AVI (RIFF): walks hdrl for dimensions + frame
        rate, movi for ??dc/??db frame chunks, decodes each frame
        through the baseline JPEG decoder.  Returns
        (width, height, fps, [HxWx3 RGB frames])."""
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI file")
        w = h = None
        usec_per_frame = None
        frames: list[bytes] = []
        for cid, off, size in _riff_chunks(payload, 12, len(payload)):
            if cid != b"LIST":
                continue
            ltype = payload[off : off + 4]
            if ltype == b"hdrl":
                for cid2, off2, _s2 in _riff_chunks(
                    payload, off + 4, off + size
                ):
                    if cid2 == b"avih":
                        (usec_per_frame,) = struct.unpack_from(
                            "<I", payload, off2
                        )
                        w, h = struct.unpack_from("<II", payload, off2 + 32)
            elif ltype == b"movi":
                for cid2, off2, s2 in _riff_chunks(
                    payload, off + 4, off + size
                ):
                    if cid2[2:4] in (b"dc", b"db"):
                        frames.append(payload[off2 : off2 + s2])
        if w is None or usec_per_frame in (None, 0):
            raise ValueError("AVI missing avih header")
        fps = 1e6 / usec_per_frame
        return w, h, fps, [decode_jpeg(f)[2] for f in frames]

    def video_features(w, h, fps, frames):
        """8-dim: [w, h, duration_s, n_frames, mean_luma, std_luma,
        motion (mean |Δ| between consecutive frames), fps]."""
        n = len(frames)
        lumas = [
            (
                0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
            )
            / 255.0
            for f in frames
        ]
        motion = (
            float(
                np.mean(
                    [np.abs(lumas[i + 1] - lumas[i]).mean() for i in range(n - 1)]
                )
            )
            if n > 1
            else 0.0
        )
        all_luma = np.stack(lumas) if lumas else np.zeros((1, 1, 1))
        return [
            float(w),
            float(h),
            float(n / fps) if fps else 0.0,
            float(n),
            float(all_luma.mean()),
            float(all_luma.std()),
            motion,
            float(fps),
        ]

    def make_avi(width, height, n_frames, fps, seed):
        """Seeded MJPEG AVI: each frame is the make_ppm pattern with a
        drifting seed, baseline-JPEG-compressed — a REAL compressed
        video fixture."""
        jpegs = [
            encode_jpeg(
                decode_ppm(make_ppm(width, height, seed + 7 * f))[2], 85
            )
            for f in range(n_frames)
        ]

        def chunk(cid: bytes, body: bytes) -> bytes:
            pad = b"\x00" if len(body) & 1 else b""
            return cid + struct.pack("<I", len(body)) + body + pad

        def list_chunk(ltype: bytes, body: bytes) -> bytes:
            return chunk(b"LIST", ltype + body)

        usec = int(1e6 / fps)
        avih = struct.pack(
            "<IIIIIIIIII", usec, 0, 0, 0, n_frames, 0, 1, 0, width, height
        ) + b"\x00" * 16
        strh = (
            b"vids"
            + b"MJPG"
            + struct.pack(
                "<IHHIIIIIIIIhhhh",
                0, 0, 0, 0,            # flags, priority, language, init frames
                1, int(fps),           # scale, rate → fps
                0, n_frames,           # start, length
                0, 0xFFFFFFFF, 0,      # bufsize, quality, sample size
                0, 0, width, height,   # rcFrame
            )
        )
        strf = struct.pack(
            "<IiiHH4sIiiII",
            40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
        )
        hdrl = list_chunk(
            b"hdrl",
            chunk(b"avih", avih)
            + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )
        movi = list_chunk(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

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

    # -- MP3 (MPEG-1 Layer III) stream layer ---------------------------
    #
    # Round 8: the MP3 leg is upgraded from an opaque NotImplementedError
    # to a real STREAM parser — frame-sync walk, header field decode,
    # side-info sizing, bit-reservoir-aware frame boundaries, Xing/Info
    # VBR detection, per-stream bitrate/duration — plus a generator of
    # spec-valid silent streams (zeroed side info means every
    # part2_3_length is 0, which any conforming decoder plays as
    # silence).  What is deliberately NOT here: PCM reconstruction.
    # Layer III audio decode requires the ISO 11172-3 Huffman code
    # tables and the 512-coefficient synthesis window, which are spec
    # constants, not derivable — shipping approximations would decode
    # real MP3s wrongly while claiming otherwise.  ``features`` for
    # audio/mpeg therefore returns STREAM features (duration, rate,
    # bitrate, framing), and PCM decode remains the documented
    # plug-a-native-codec boundary.

    _MP3_BITRATES = (  # MPEG-1 Layer III, kbps, index 1..14 (0=free, 15=bad)
        None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
    )
    _MP3_RATES = (44100, 48000, 32000)  # MPEG-1 samplerate index 0..2

    def mp3_frame_header(sample_rate, bitrate_kbps, padding, mono):
        """4-byte MPEG-1 Layer III header; raises on values outside the
        MPEG-1 tables."""
        br = _MP3_BITRATES.index(bitrate_kbps)
        sr = _MP3_RATES.index(sample_rate)
        b0 = 0xFF
        b1 = 0b11111011  # sync(3) | version MPEG-1 (11) | layer III (01) | no CRC (1)
        b2 = (br << 4) | (sr << 2) | (int(padding) << 1)
        b3 = (0b11 << 6) if mono else 0  # channel mode; ext/copy/orig/emph = 0
        return bytes((b0, b1, b2, b3))

    def mp3_parse_header(b):
        """Decode one 4-byte header (already sync-checked); returns
        (sample_rate, bitrate_kbps, padding, channels, frame_len) or
        None for reserved/unsupported field values."""
        if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
            return None
        version = (b[1] >> 3) & 0b11
        layer = (b[1] >> 1) & 0b11
        if version != 0b11 or layer != 0b01:
            return None  # only MPEG-1 Layer III
        br_idx = (b[2] >> 4) & 0xF
        sr_idx = (b[2] >> 2) & 0b11
        if br_idx in (0, 15) or sr_idx == 3:
            return None  # free-format / reserved
        padding = (b[2] >> 1) & 1
        mode = (b[3] >> 6) & 0b11
        channels = 1 if mode == 0b11 else 2
        bitrate = _MP3_BITRATES[br_idx]
        sample_rate = _MP3_RATES[sr_idx]
        # MPEG-1 Layer III: 1152 samples/frame -> 144 * byterate / rate
        frame_len = (144_000 * bitrate) // sample_rate + padding
        return sample_rate, bitrate, padding, channels, frame_len

    def parse_mp3(payload):
        """Walk a Layer III stream frame by frame.  Returns
        (sample_rate, channels, n_frames, mean_bitrate_kbps,
        duration_s, is_vbr).  Sync is validated on EVERY frame (a
        false sync inside payload bytes cannot derail the walk because
        each header's frame_len lands exactly on the next header);
        trailing garbage shorter than a header is tolerated, anything
        else raises."""
        i, n = 0, len(payload)
        # permissive lead-in: skip ID3v2 if present (10-byte header,
        # syncsafe length), else require sync at offset 0
        if payload[:3] == b"ID3" and n >= 10:
            size = 0
            for k in range(6, 10):
                size = (size << 7) | (payload[k] & 0x7F)
            i = 10 + size
            if payload[5] & 0x10:
                # ID3v2.4 footer flag: the syncsafe size EXCLUDES the
                # 10-byte trailing footer ("3DI" + version + flags +
                # size) — skip it too or the walk lands on it
                i += 10
        sample_rate = channels = None
        bitrates = []
        frames = 0
        xing_frames = None
        while i + 4 <= n:
            h = mp3_parse_header(payload[i : i + 4])
            if h is None:
                raise ValueError(
                    f"MP3: lost frame sync at byte {i} "
                    f"({payload[i:i+4].hex()})"
                )
            sr, br, _pad, ch, flen = h
            if sample_rate is None:
                sample_rate, channels = sr, ch
                # Xing/Info VBR tag sits after the side info of frame 0
                side = 17 if ch == 1 else 32
                tag_at = i + 4 + side
                tag = payload[tag_at : tag_at + 4]
                if tag in (b"Xing", b"Info"):
                    flags = int.from_bytes(
                        payload[tag_at + 4 : tag_at + 8], "big"
                    )
                    if flags & 0x1:  # frame-count field present
                        xing_frames = int.from_bytes(
                            payload[tag_at + 8 : tag_at + 12], "big"
                        )
            elif sr != sample_rate or ch != channels:
                raise ValueError("MP3: sample rate / mode change mid-stream")
            bitrates.append(br)
            frames += 1
            if i + flen > n:
                raise ValueError(
                    f"MP3: truncated final frame at byte {i} "
                    f"(need {flen}, have {n - i})"
                )
            i += flen
        if frames == 0:
            raise ValueError("MP3: no frames")
        is_vbr = len(set(bitrates)) > 1 or xing_frames is not None
        audio_frames = frames - (1 if xing_frames is not None else 0)
        if xing_frames is not None:
            # The tag frame carries no audio: its bitrate must not
            # skew the mean, and its frame count must agree with the
            # walk — a lying VBR header is a corrupt stream, not a
            # silently-wrong duration.
            bitrates = bitrates[1:]
            if xing_frames != audio_frames:
                raise ValueError(
                    f"MP3: Xing tag claims {xing_frames} frames but "
                    f"the stream walks {audio_frames}"
                )
        if audio_frames == 0:
            raise ValueError("MP3: only a Xing tag frame, no audio")
        duration = audio_frames * 1152.0 / sample_rate
        mean_br = sum(bitrates) / len(bitrates)
        return sample_rate, channels, audio_frames, mean_br, duration, is_vbr

    def make_mp3(n_frames, sample_rate, bitrate_kbps, seed, vbr=False,
                 xing=False):
        """Deterministic spec-valid SILENT Layer III mono stream: each
        frame is header + 17 zero side-info bytes + zero main data
        (all part2_3_length fields are 0 -> a conforming decoder
        outputs 1152 zero samples per frame).  ``vbr`` alternates the
        bitrate among adjacent table entries, exercising per-frame
        frame-length recomputation in the parser; ``xing`` writes a
        Xing tag (frame-count flag) into the first frame's main-data
        region, the real-world VBR marker."""
        idx = _MP3_BITRATES.index(bitrate_kbps)
        out = []
        for f in range(n_frames):
            br = bitrate_kbps
            if vbr:
                br = _MP3_BITRATES[max(1, min(14, idx + ((f + seed) % 3) - 1))]
            # 44100 Hz has a non-integral byte rate; real encoders
            # alternate the padding bit to keep the average exact.  The
            # header self-describes each frame's length, so ANY pattern
            # is spec-valid — alternate deterministically to exercise
            # both padded and unpadded frame walks in the parser.
            rem = (144_000 * br) % sample_rate
            padding = 1 if rem and (f + seed) % 2 == 0 else 0
            flen = (144_000 * br) // sample_rate + padding
            frame = bytearray(mp3_frame_header(sample_rate, br, padding, True))
            frame += b"\x00" * (flen - 4)
            if xing and f == 0:
                # after the (mono) 17-byte side info: magic + flags +
                # the count of AUDIO frames that follow this tag frame
                tag = b"Xing" + (0x1).to_bytes(4, "big") + (
                    n_frames - 1
                ).to_bytes(4, "big")
                frame[4 + 17 : 4 + 17 + len(tag)] = tag
            out.append(bytes(frame))
        return b"".join(out)

    def mp3_stream_features(sample_rate, channels, n_frames, mean_br,
                            duration, is_vbr):
        """8-dim STREAM feature contract for audio/mpeg (no PCM path —
        see the block comment): [duration_s, sample_rate, channels,
        mean_bitrate_kbps, n_frames, is_vbr, bytes_per_frame_mean,
        samples_per_frame]."""
        return [
            float(duration),
            float(sample_rate),
            float(channels),
            float(mean_br),
            float(n_frames),
            1.0 if is_vbr else 0.0,
            float((144_000 * mean_br) / sample_rate),
            1152.0,
        ]

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
        if mime == MIME_JPEG:
            return image_features(*decode_jpeg(payload))
        if mime == MIME_WAV:
            return audio_features(*decode_wav(payload))
        if mime == MIME_FLAC:
            return audio_features(*decode_flac(payload))
        if mime == MIME_AVI:
            return video_features(*decode_avi(payload))
        if mime == MIME_MP3:
            # STREAM features from the real frame parser (duration,
            # rate, framing, VBR) — PCM decode stays a native-codec
            # boundary, see the MP3 block comment above
            return mp3_stream_features(*parse_mp3(payload))
        raise NotImplementedError(
            f"no pure-Python decoder for {mime!r}; MP3 PCM reconstruction "
            "and non-MJPEG video codecs are not present in this container "
            "— plug soundfile/ffmpeg here in a real deployment, or pass "
            "fake=True for the histogram stub"
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
        if mime == MIME_JPEG:
            return decode_jpeg(payload)
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

    def make_jpeg(width, height, seed, quality=85):
        """Same pixel pattern as make_ppm, DCT-compressed as baseline
        JFIF — really-compressed bytes, like make_png."""
        _, _, px = decode_ppm(make_ppm(width, height, seed))
        return encode_jpeg(px, quality)

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
        "decode_jpeg": decode_jpeg,
        "decode_avi": decode_avi,
        "decode_flac": decode_flac,
        "decode_wav": decode_wav,
        "decode_image": decode_image,
        "features": features,
        "video_features": video_features,
        "fake_features": fake_features,
        "encode_ppm": encode_ppm,
        "encode_png": encode_png,
        "encode_jpeg": encode_jpeg,
        "encode_flac": encode_flac,
        "resize_nearest": resize_nearest,
        "make_ppm": make_ppm,
        "make_bmp": make_bmp,
        "make_png": make_png,
        "make_jpeg": make_jpeg,
        "make_avi": make_avi,
        "make_flac": make_flac,
        "make_wav": make_wav,
        "make_mp3": make_mp3,
        "parse_mp3": parse_mp3,
        "mp3_stream_features": mp3_stream_features,
        "mp3_frame_header": mp3_frame_header,
        "mp3_parse_header": mp3_parse_header,
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


FRAMES_SCHEMA = (
    "media_id long, frame_idx int, frame_ts_ms long, width int, height int, "
    "n_bytes long, frame_md5 string"
)


def extract_frames(df: DataFrame, every_ms: int = 0) -> DataFrame:
    """REAL video frame extraction (round 6): decode each MJPEG-AVI
    payload, emit one row per sampled frame with the frame re-encoded
    as PPM and pinned by md5 — all scalar columns, so the result is
    driver-canonicalizable and joinable back to the image pipeline by
    re-generating the PPM.  ``every_ms`` 0 keeps every frame; else the
    nearest frame at each sampling instant.  mapInPandas: payload
    bytes never shuffle, one Arrow batch in/out per partition."""
    fns = _codec_fns()
    decode_avi, encode_ppm = fns["decode_avi"], fns["encode_ppm"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = {
                "media_id": [], "frame_idx": [], "frame_ts_ms": [],
                "width": [], "height": [], "n_bytes": [], "frame_md5": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, fps, frames = decode_avi(payload)
                step_ms = 1000.0 / fps
                keep = range(len(frames))
                if every_ms > 0:
                    n_samples = max(int(len(frames) * step_ms // every_ms), 1)
                    keep = sorted(
                        {
                            min(int(k * every_ms / step_ms), len(frames) - 1)
                            for k in range(n_samples)
                        }
                    )
                for idx in keep:
                    ppm = encode_ppm(frames[idx])
                    rows["media_id"].append(int(mid))
                    rows["frame_idx"].append(idx)
                    rows["frame_ts_ms"].append(int(idx * step_ms))
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["n_bytes"].append(len(ppm))
                    rows["frame_md5"].append(hashlib.md5(ppm).hexdigest())
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


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
    one PPM / BMP / PNG / JPEG / WAV / MJPEG-AVI / FLAC payload
    (format = id % 7, dimensions/duration seeded by id).  Runs distributed — the
    generator closures travel by value with the task, like every codec
    here."""
    fns = _codec_fns()
    make_ppm, make_bmp, make_wav = fns["make_ppm"], fns["make_bmp"], fns["make_wav"]
    make_png, make_jpeg, make_avi = fns["make_png"], fns["make_jpeg"], fns["make_avi"]
    make_flac, make_mp3 = fns["make_flac"], fns["make_mp3"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "payload": [], "mime": [], "meta": []}
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 16 + mid % 17, 12 + mid % 13
                if mid % 8 == 0:
                    payload, mime = make_ppm(w, h, mid), MIME_PPM
                    meta = {"width": w, "height": h, "duration_ms": None}
                elif mid % 8 == 1:
                    payload, mime = make_bmp(w, h, mid), MIME_BMP
                    meta = {"width": w, "height": h, "duration_ms": None}
                elif mid % 8 == 2:
                    payload, mime = make_png(w, h, mid), MIME_PNG
                    meta = {"width": w, "height": h, "duration_ms": None}
                elif mid % 8 == 3:
                    payload, mime = make_jpeg(w, h, mid), MIME_JPEG
                    meta = {"width": w, "height": h, "duration_ms": None}
                elif mid % 8 == 5:
                    n_frames, fps = 3 + mid % 5, 10.0
                    payload, mime = make_avi(w, h, n_frames, fps, mid), MIME_AVI
                    meta = {
                        "width": w,
                        "height": h,
                        "duration_ms": int(n_frames * 1000 / fps),
                    }
                elif mid % 8 == 6:
                    n = 800 + (mid % 5) * 160
                    payload, mime = make_flac(n, 8000, 440, mid), MIME_FLAC
                    meta = {
                        "width": None,
                        "height": None,
                        "duration_ms": int(n * 1000 / 8000),
                    }
                elif mid % 8 == 7:
                    nf = 3 + mid % 4
                    # mid % 8 == 7 makes mid always ODD — alternate the
                    # VBR/Xing leg on a bit that actually varies
                    is_vbr = (mid // 8) % 2 == 1
                    payload = make_mp3(
                        nf, 44100, 128, mid, vbr=is_vbr, xing=is_vbr
                    )
                    mime = MIME_MP3
                    # Xing streams carry nf-1 audio frames (frame 0 is
                    # the tag); duration reflects the audio frames
                    audio_nf = nf - 1 if is_vbr else nf
                    meta = {
                        "width": None,
                        "height": None,
                        "duration_ms": int(audio_nf * 1152 * 1000 / 44100),
                    }
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

"""Multimodal column pack: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

No reference counterpart (TiDB has no media types) — this is the
beyond-reference charter surface for a 100 TB training-data pipeline:

- Convention: a media table carries ``(id, kind, uri, data BINARY,
  meta)`` — bytes travel as opaque BinaryType, decode happens
  executor-side in Arrow batches, never on the driver.
- Decode is REAL for the library-free formats: :func:`decode_png`
  (chunk walk, IDAT inflate, full scanline unfiltering — struct+zlib
  only), :func:`decode_wav` (16-bit PCM via the ``wave`` module),
  :func:`decode_jpeg` (baseline-sequential: marker walk, canonical
  Huffman, numpy IDCT; grayscale + 4:4:4), and :func:`decode_avi`
  (uncompressed-DIB video: RIFF walk, frame extraction) — dispatched
  by :func:`decode_media_auto`. Formats that genuinely need
  librosa/ffmpeg (MP3, compressed video, progressive/subsampled JPEG)
  raise NotImplementedError in this container; the pipeline entry
  points accept ``decoder=`` overrides, and :func:`fake_decode_meta`
  remains the documented deterministic stand-in so every downstream
  stage stays testable for those formats too.
- Partitioning stance at scale: media rows are large and skewed;
  repartition by byte-size budget (``target_batch_bytes``) before the
  decode stage so one Arrow batch never blows executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "id long, kind string, width int, height int, n_channels int, checksum string"


def decode_image(data: bytes) -> dict:
    """Real image decode (PIL). Raises NotImplementedError here: the
    container has no imaging libraries; see fake_decode_meta."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; use decoder=fake_decode_meta for plumbing tests"
        ) from e
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    return {
        "width": img.width,
        "height": img.height,
        "n_channels": len(img.getbands()),
        "checksum": hashlib.md5(data).hexdigest(),
    }


def decode_png(data: bytes) -> dict:
    """REAL PNG decode, stdlib-only (struct + zlib): chunk walk, IHDR
    parse, IDAT inflate, and full scanline unfiltering (filter types
    0-4), for 8-bit non-interlaced images — no imaging library needed.
    Returns dimensions, channel count, bit depth, and the sum of all
    decoded samples (``pixel_sum``), which proves the pixels round-trip
    (a wrong unfilter changes the sum)."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, idat, header = 8, b"", None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            header = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if header is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = header
    if bit_depth != 8 or interlace != 0:
        raise NotImplementedError("only 8-bit non-interlaced PNG")
    if color_type == 3:
        # palette indices are NOT pixel values; decoding them as gray
        # would silently break the pixels-round-trip contract
        raise NotImplementedError("paletted PNG (PLTE) not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = channels  # bytes per pixel at bit depth 8
    stride = w * bpp
    raw = zlib.decompress(idat)
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    for _row in range(h):
        ftype = raw[i]
        line = bytearray(raw[i + 1 : i + 1 + stride])
        i += 1 + stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter {ftype}")
        out += line
        prev = line
    return {
        "width": w,
        "height": h,
        "n_channels": channels,
        "bit_depth": bit_depth,
        "pixel_sum": sum(out),
        "checksum": hashlib.md5(data).hexdigest(),
        "pixels": bytes(out),
    }


def resize_png(data: bytes, target_w: int, target_h: int) -> dict:
    """REAL PNG resize, stdlib-only: decode (full unfilter), sample the
    pixel grid nearest-neighbor (src = floor(dst * src_dim /
    dst_dim) — pure integer math, so an oracle can mirror it exactly),
    re-encode. Returns the resized image's bytes and pixel sum."""
    m = decode_png(data)
    w, h, ch = m["width"], m["height"], m["n_channels"]
    src = m["pixels"]
    out = bytearray()
    for ty in range(target_h):
        sy = ty * h // target_h
        for tx in range(target_w):
            sx = tx * w // target_w
            base = (sy * w + sx) * ch
            out += src[base : base + ch]
    resized = encode_png(target_w, target_h, bytes(out), ch)
    return {
        "width": target_w,
        "height": target_h,
        "n_channels": ch,
        "pixel_sum": sum(out),
        "data": resized,
        "checksum": hashlib.md5(resized).hexdigest(),
    }


def encode_png(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Minimal PNG encoder (filter 0 rows; 8-bit gray or RGB) — the
    fixture-side inverse of :func:`decode_png` for tests/gates."""
    import struct
    import zlib

    color_type = {1: 0, 3: 2}[channels]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[r * stride : (r + 1) * stride] for r in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_wav(data: bytes) -> dict:
    """REAL WAV/PCM decode via the stdlib ``wave`` module: channel
    count, sample rate, frame count, plus the sum of absolute 16-bit
    sample values (``sample_abs_sum``) proving the samples round-trip."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(data)) as wf:
        n_channels = wf.getnchannels()
        rate = wf.getframerate()
        n_frames = wf.getnframes()
        sampwidth = wf.getsampwidth()
        frames = wf.readframes(n_frames)
    if sampwidth != 2:
        raise NotImplementedError("only 16-bit PCM WAV")
    vals = struct.unpack(f"<{len(frames) // 2}h", frames)
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "sample_abs_sum": sum(abs(v) for v in vals),
        "checksum": hashlib.md5(data).hexdigest(),
    }


def encode_wav(samples: list[int], rate: int, n_channels: int = 1) -> bytes:
    """Minimal 16-bit PCM WAV encoder (fixture-side inverse of
    :func:`decode_wav`)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_media_auto(data: bytes) -> dict:
    """Sniff-and-decode: REAL decode for the stdlib-decodable formats
    (PNG, 16-bit PCM WAV, baseline 4:4:4 JPEG, uncompressed-DIB AVI
    video); the rest (MP3, compressed video) keep the documented
    NotImplementedError/fake-decoder contract."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    return decode_image(data)


def fake_decode_meta(data: bytes) -> dict:
    """Deterministic decode stand-in: a pure function of the bytes with
    image-plausible ranges. Lets every stage downstream of decode run
    for real, and lets a SQL oracle mirror the computation exactly."""
    n = len(data)
    return {
        "width": 64 + n % 577,
        "height": 64 + n % 421,
        "n_channels": 1 + n % 3,
        "checksum": hashlib.md5(data).hexdigest(),
    }


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = fake_decode_meta,
    id_col: str = "id",
    kind_col: str = "kind",
    data_col: str = "data",
) -> DataFrame:
    """Decode a media table's binary column into typed metadata via
    Arrow-batched mapInPandas (executor-side, batch-at-a-time)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(bytes(b)) for b in pdf[data_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "kind": pdf[kind_col],
                    "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                    "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                    "n_channels": pd.Series([m["n_channels"] for m in metas], dtype="int32"),
                    "checksum": [m["checksum"] for m in metas],
                }
            )

    return df.select(id_col, kind_col, data_col).mapInPandas(run, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "id long, width int, height int, target_w int, target_h int, "
    "scale_pm int, checksum string"
)


def resize_image(data: bytes, target_w: int, target_h: int) -> dict:
    """Real aspect-preserving resize (PIL). Raises NotImplementedError
    here: the container has no imaging libraries; see fake_resize_meta."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image resize requires PIL; use resizer=fake_resize_meta for plumbing tests"
        ) from e
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data))
    scale = min(target_w / img.width, target_h / img.height)
    out = img.resize((int(img.width * scale), int(img.height * scale)))
    buf = io.BytesIO()
    out.save(buf, format=img.format or "PNG")
    return {
        "width": img.width,
        "height": img.height,
        "scale_pm": int(scale * 10000),
        "checksum": hashlib.md5(buf.getvalue()).hexdigest(),
    }


def fake_resize_meta(data: bytes, target_w: int, target_h: int) -> dict:
    """Deterministic resize stand-in. The aspect-preserving scale is kept
    in integer permyriad (floor of 10000*min(tw/w, th/h)) so the oracle
    can mirror it with exact integer division — no float rounding to
    diverge cross-engine. The resized checksum chains the source checksum
    with the target box (a pure, SQL-expressible function)."""
    m = fake_decode_meta(data)
    w, h = m["width"], m["height"]
    scale_pm = min(10000 * target_w // w, 10000 * target_h // h)
    chained = f"{m['checksum']}x{target_w}x{target_h}"
    return {
        "width": w,
        "height": h,
        "scale_pm": scale_pm,
        "checksum": hashlib.md5(chained.encode()).hexdigest(),
    }


def resize_media(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    resizer: Callable[[bytes, int, int], dict] = fake_resize_meta,
    id_col: str = "id",
    data_col: str = "data",
) -> DataFrame:
    """Resize stage: binary media column -> resized metadata + checksum,
    Arrow-batched executor-side (same plumbing stance as decode_media)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [resizer(bytes(b), target_w, target_h) for b in pdf[data_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "width": pd.Series([m["width"] for m in metas], dtype="int32"),
                    "height": pd.Series([m["height"] for m in metas], dtype="int32"),
                    "target_w": pd.Series([target_w] * len(metas), dtype="int32"),
                    "target_h": pd.Series([target_h] * len(metas), dtype="int32"),
                    "scale_pm": pd.Series([m["scale_pm"] for m in metas], dtype="int32"),
                    "checksum": [m["checksum"] for m in metas],
                }
            )

    return df.select(id_col, data_col).mapInPandas(run, schema=RESIZED_SCHEMA)


# Deterministic byte-level feature extractor: 8 small-prime residues of
# the byte length. Integer features keep the cross-engine compare exact
# (float vectors would stringify differently in Spark vs DuckDB).
FEATURE_PRIMES = (257, 263, 269, 271, 277, 281, 283, 293)
FEATURES_SCHEMA = "id long, " + ", ".join(f"f{i} int" for i in range(len(FEATURE_PRIMES)))


def fake_feature_extract(data: bytes) -> list[int]:
    """Deterministic feature stand-in (pure function of the bytes): the
    real stage would run an image/audio encoder on the decoded media."""
    n = len(data)
    return [n % p for p in FEATURE_PRIMES]


def extract_features(
    df: DataFrame,
    extractor: Callable[[bytes], list[int]] = fake_feature_extract,
    id_col: str = "id",
    data_col: str = "data",
) -> DataFrame:
    """Feature-extraction stage: binary media column -> fixed-width
    feature columns via Arrow-batched mapInPandas. The output feeds the
    embedding/ANN operators (embedding_cosine_topk et al.) downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [extractor(bytes(b)) for b in pdf[data_col]]
            out = {"id": pdf[id_col].astype("int64")}
            for i in range(len(FEATURE_PRIMES)):
                out[f"f{i}"] = pd.Series([f[i] for f in feats], dtype="int32")
            yield pd.DataFrame(out)

    return df.select(id_col, data_col).mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30, id_col: str = "id") -> DataFrame:
    """Frame-sampling *plan* for video rows: expands each media row into
    (id, frame_idx) rows to be decoded downstream. The frame count here
    is a deterministic stand-in (real: ffprobe duration * fps)."""
    n_frames = 1 + F.pmod(F.length(F.col("data")), F.lit(300))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )


# -- baseline JPEG (stdlib + numpy; no imaging library) ----------------------
#
# A self-contained baseline-sequential JPEG codec: the encoder writes
# its Huffman tables into DHT (simple canonical fixed-length tables —
# legal JPEG, chosen over Annex K's optimized tables so both sides
# derive them from 30 lines of shared code instead of a transcribed
# spec appendix), 8x8 DCT via a numpy matrix product, standard
# quantization, 4:4:4 (no chroma subsampling). decode_jpeg reads any
# baseline 4:4:4 or grayscale file whose tables ride in DHT/DQT — its
# own output, and third-party baseline files within that envelope;
# subsampled (4:2:0) files raise NotImplementedError.

_JPEG_QY = [  # standard luminance quantization (JPEG Annex K.1)
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _zigzag_order():
    """The JPEG zigzag scan, generated (not transcribed): walk the
    anti-diagonals, even diagonals upward (row descending)."""
    out = []
    for d in range(15):
        rows = range(max(0, d - 7), min(d, 7) + 1)
        rows = reversed(rows) if d % 2 == 0 else rows
        out.extend((r, d - r) for r in rows)
    return out


def _dct_matrix():
    import math

    import numpy as np

    d = np.zeros((8, 8))
    for k in range(8):
        c = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for n in range(8):
            d[k, n] = c * math.cos((2 * n + 1) * k * math.pi / 16)
    return d


def _huff_tables():
    """Canonical fixed-length Huffman specs (bits, values) shared by
    encoder and decoder: DC = 12 four-bit codes (categories 0-11),
    AC = 162 eight-bit codes (all (run,size) symbols + ZRL + EOB).
    The all-ones code stays unused in both — legal, complete enough."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_vals = sorted(
        {(r << 4) | s for r in range(16) for s in range(1, 11)} | {0x00, 0xF0}
    )
    ac_bits = [0] * 7 + [len(ac_vals)] + [0] * 8
    return dc_bits, dc_vals, ac_bits, ac_vals


def _canonical_codes(bits, vals):
    """bits[i] = number of codes of length i+1 -> {symbol: (code, len)}."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-pad to byte boundary


def _size_cat(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Baseline-sequential JPEG encoder (grayscale or RGB 4:4:4):
    level shift, 8x8 DCT (numpy), Annex-K luminance quantization for
    all components, DPCM DC + run-length AC with the shared canonical
    Huffman tables written into DHT."""
    import struct

    import numpy as np

    if channels not in (1, 3):
        raise NotImplementedError("JPEG encoder: 1 or 3 channels")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    if channels == 3:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        comps = [img[:, :, 0].astype(np.float64)]

    D = _dct_matrix()
    zz = _zigzag_order()
    q = np.array(_JPEG_QY, dtype=np.float64).reshape(8, 8)
    dc_bits, dc_vals, ac_bits, ac_vals = _huff_tables()
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    bh = (height + 7) // 8
    bwid = (width + 7) // 8
    prev_dc = [0] * len(comps)
    for by in range(bh):
        for bx in range(bwid):
            for ci, comp in enumerate(comps):
                blk = np.full((8, 8), 128.0)
                ys, xs = by * 8, bx * 8
                sub = comp[ys : ys + 8, xs : xs + 8]
                blk[: sub.shape[0], : sub.shape[1]] = sub
                # edge replicate: repeat last row/col into the pad
                if sub.shape[0] < 8:
                    blk[sub.shape[0] :, : sub.shape[1]] = sub[-1:, :]
                if sub.shape[1] < 8:
                    blk[:, sub.shape[1] :] = blk[:, sub.shape[1] - 1 : sub.shape[1]]
                coef = D @ (blk - 128.0) @ D.T
                qc = np.rint(coef / q).astype(int)
                seq = [int(qc[r, c]) for r, c in zz]
                diff = seq[0] - prev_dc[ci]
                prev_dc[ci] = seq[0]
                s = _size_cat(diff)
                code, ln = dc_codes[s]
                bw.put(code, ln)
                if s:
                    v = diff if diff > 0 else diff + (1 << s) - 1
                    bw.put(v, s)
                run = 0
                last_nz = max((i for i in range(1, 64) if seq[i]), default=0)
                for i in range(1, last_nz + 1):
                    v = seq[i]
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        c0, l0 = ac_codes[0xF0]  # ZRL
                        bw.put(c0, l0)
                        run -= 16
                    s = _size_cat(v)
                    c0, l0 = ac_codes[(run << 4) | s]
                    bw.put(c0, l0)
                    bw.put(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    c0, l0 = ac_codes[0x00]  # EOB
                    bw.put(c0, l0)
    bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qzz = bytes(_JPEG_QY[r * 8 + c] if False else 0 for r, c in zz)  # placeholder
    # DQT payload: precision/id 0, table in zigzag order
    qflat = np.array(_JPEG_QY).reshape(8, 8)
    dqt = bytes([0]) + bytes(int(qflat[r, c]) for r, c in zz)
    nc = len(comps)
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, Q-table 0
    dht = (
        bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals)
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    )
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xFFDB, dqt)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht)
        + seg(0xFFDA, sos)
        + bytes(bw.buf)
        + b"\xff\xd9"
    )


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("JPEG: unexpected marker in scan")
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _read_huff(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("JPEG: bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> dict:
    """Baseline-sequential JPEG decoder (stdlib + numpy): marker walk,
    DQT/DHT/SOF0/SOS parse, canonical Huffman decode, dequantize,
    inverse zigzag, IDCT, YCbCr->RGB. Accepts grayscale and 4:4:4
    (1x1-sampled) baseline files — its own encoder's envelope;
    subsampled or progressive files raise NotImplementedError."""
    import struct

    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tq] = list(payload[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(c, ln): sym for sym, (c, ln) in codes.items()}
                p += 17 + nv
        elif marker in (0xC0, 0xC1):
            prec, h, w, nc = payload[0], *struct.unpack(">HH", payload[1:5]), payload[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, samp, tq = payload[6 + ci * 3 : 9 + ci * 3]
                if samp != 0x11:
                    raise NotImplementedError("subsampled JPEG (not 4:4:4)")
                comps.append((cid, tq))
            sof = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG")
        elif marker == 0xDA:
            ns = payload[0]
            scan_comps = [
                (payload[1 + i * 2], payload[2 + i * 2] >> 4, payload[2 + i * 2] & 0xF)
                for i in range(ns)
            ]
            scan_start = pos
            break
    if sof is None or scan_comps is None:
        raise ValueError("JPEG: missing SOF/SOS")
    w, h, comps = sof
    end = data.rfind(b"\xff\xd9")
    br = _BitReader(data[scan_start : end if end > 0 else len(data)])
    D = _dct_matrix()
    zz = _zigzag_order()
    nc = len(comps)
    planes = [np.zeros(((h + 7) // 8 * 8, (w + 7) // 8 * 8)) for _ in range(nc)]
    prev_dc = [0] * nc
    qmats = []
    for _cid, tq in comps:
        qm = np.zeros((8, 8))
        for i, (r, c) in enumerate(zz):
            qm[r, c] = qtables[tq][i]
        qmats.append(qm)
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            for ci in range(nc):
                _cid, td, ta = scan_comps[ci]
                s = _read_huff(br, huff[(0, td)])
                diff = _extend(br.bits(s), s) if s else 0
                prev_dc[ci] += diff
                blk = np.zeros((8, 8))
                seq = [0] * 64
                seq[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = _read_huff(br, huff[(1, ta)])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    i += run
                    if i > 63:
                        raise ValueError("JPEG: AC index overflow")
                    seq[i] = _extend(br.bits(size), size)
                    i += 1
                for i, (r, c) in enumerate(zz):
                    blk[r, c] = seq[i]
                pix = D.T @ (blk * qmats[ci]) @ D + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    planes = [p[:h, :w] for p in planes]
    if nc == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
    else:
        rgb = planes[0][:, :, None]
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()
    return {
        "width": w,
        "height": h,
        "n_channels": nc,
        "bit_depth": 8,
        "pixel_sum": int(np.frombuffer(out, dtype=np.uint8).astype(np.int64).sum()),
        "checksum": hashlib.md5(data).hexdigest(),
        "pixels": out,
    }


# -- uncompressed AVI video (stdlib struct only) -----------------------------


def encode_avi(width: int, height: int, frames: list[bytes], fps: int = 10) -> bytes:
    """Minimal RIFF/AVI writer for UNCOMPRESSED 24-bit DIB video: one
    'vids/DIB ' stream, bottom-up BGR rows padded to 4 bytes (the BMP
    convention), one '00db' chunk per frame, no index. Each frame is
    top-down RGB24 bytes (h*w*3); the writer flips and swaps."""
    import struct

    stride = (width * 3 + 3) & ~3
    pad = stride - width * 3

    def dib(frame: bytes) -> bytes:
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up
            row = bytearray()
            base = y * width * 3
            for x in range(width):
                r, g, b = frame[base + x * 3 : base + x * 3 + 3]
                row += bytes((b, g, r))  # RGB -> BGR
            row += b"\x00" * pad
            rows.append(bytes(row))
        return b"".join(rows)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        out = fourcc + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) % 2 else b"")

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    frame_bytes = stride * height
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_bytes * fps, 0, 0x10, len(frames), 0, 1,
        frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII4H",
        0, 0, 0, 0, 1, fps, 0, len(frames), frame_bytes, 0, 0,
        0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> dict:
    """REAL video decode for uncompressed 24-bit DIB AVI, stdlib-only:
    RIFF walk, avih/strf parse, '00db' frame extraction, bottom-up BGR
    -> top-down RGB. Returns dimensions, fps, frame count, per-frame
    pixel sums, and the frames themselves. Compressed video (any
    biCompression != 0 or '00dc' codec chunks) raises
    NotImplementedError — that genuinely needs ffmpeg."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")

    width = height = None
    fps = None
    bitcount = compression = None
    frames_raw: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal width, height, fps, bitcount, compression
        pos = 0
        while pos + 8 <= len(buf):
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            payload = buf[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size % 2)
            if fourcc == b"LIST":
                walk(payload[4:])
            elif fourcc == b"avih":
                micro = struct.unpack("<I", payload[0:4])[0]
                fps = round(1_000_000 / micro) if micro else 0
                width = struct.unpack("<I", payload[32:36])[0]
                height = struct.unpack("<I", payload[36:40])[0]
            elif fourcc == b"strf" and len(payload) >= 40:
                bitcount = struct.unpack("<H", payload[14:16])[0]
                compression = struct.unpack("<I", payload[16:20])[0]
            elif fourcc == b"00dc":
                raise NotImplementedError("compressed AVI video needs ffmpeg")
            elif fourcc == b"00db":
                frames_raw.append(payload)

    walk(data[12:])
    if width is None or bitcount is None:
        raise ValueError("AVI missing avih/strf")
    if bitcount != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit DIB AVI")
    stride = (width * 3 + 3) & ~3
    frames = []
    sums = []
    for raw in frames_raw:
        out = bytearray(width * height * 3)
        s = 0
        for y in range(height):
            src = (height - 1 - y) * stride  # bottom-up -> top-down
            base = y * width * 3
            for x in range(width):
                b, g, r = raw[src + x * 3 : src + x * 3 + 3]
                out[base + x * 3 : base + x * 3 + 3] = bytes((r, g, b))
                s += r + g + b
        frames.append(bytes(out))
        sums.append(s)
    return {
        "width": width,
        "height": height,
        "n_channels": 3,
        "fps": fps,
        "n_frames": len(frames),
        "frame_sums": sums,
        "frames": frames,
        "checksum": hashlib.md5(data).hexdigest(),
    }

"""Multimodal column pack: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

No reference counterpart (TiDB has no media types) — this is the
beyond-reference charter surface for a 100 TB training-data pipeline:

- Convention: a media table carries ``(id, kind, uri, data BINARY,
  meta)`` — bytes travel as opaque BinaryType, decode happens
  executor-side in Arrow batches, never on the driver.
- Decode is REAL for the stdlib-decodable formats: :func:`decode_png`
  (chunk walk, IDAT inflate, full scanline unfiltering — struct+zlib
  only) and :func:`decode_wav` (16-bit PCM via the ``wave`` module),
  dispatched by :func:`decode_media_auto`. Formats that genuinely need
  PIL/librosa/ffmpeg (JPEG, MP3, video) raise NotImplementedError in
  this container; the pipeline entry points accept ``decoder=``
  overrides, and :func:`fake_decode_meta` remains the documented
  deterministic stand-in so every downstream stage stays testable for
  those formats too.
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
    (PNG, 16-bit PCM WAV); PIL-dependent formats keep the documented
    NotImplementedError/fake-decoder contract."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
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

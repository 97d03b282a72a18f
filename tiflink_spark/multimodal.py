"""Multimodal column pack: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

No reference counterpart (TiDB has no media types) — this is the
beyond-reference charter surface for a 100 TB training-data pipeline:

- Convention: a media table carries ``(id, kind, uri, data BINARY,
  meta)`` — bytes travel as opaque BinaryType, decode happens
  executor-side in Arrow batches, never on the driver.
- The real decode needs PIL/librosa/ffmpeg, which this container does
  not ship. ``decode_image``/``decode_audio`` try the real library and
  otherwise raise NotImplementedError; the pipeline entry points accept
  ``decoder=`` overrides, and :func:`fake_decode_meta` is the
  documented deterministic stand-in (pure function of the bytes) so
  the Spark-side plumbing — schema, batching, partitioning, UDF
  signatures — is fully real and testable.
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


def frame_sample_plan(df: DataFrame, every_n: int = 30, id_col: str = "id") -> DataFrame:
    """Frame-sampling *plan* for video rows: expands each media row into
    (id, frame_idx) rows to be decoded downstream. The frame count here
    is a deterministic stand-in (real: ffprobe duration * fps)."""
    n_frames = 1 + F.pmod(F.length(F.col("data")), F.lit(300))
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )

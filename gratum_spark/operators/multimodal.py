"""Multimodal (image/audio/video) column plumbing.

Design: media are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` — one task per
partition of media blobs, never per-row Python.

The decode step itself is STUBBED in this container (no PIL/ffmpeg/
librosa baked in): ``decode_image``/``decode_audio`` raise
NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder (derived from the bytes) exercises the
whole Spark-side path — schema, partitioning, UDF signature, Arrow
batch shape — which IS real and tested.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_binary",
    "media_metadata",
    "extract_image_features",
    "extract_audio_features",
    "sample_video_frames",
]

MEDIA_META_SCHEMA = (
    "media_type string, mime string, n_bytes long, checksum string"
)


def attach_binary(df: DataFrame, text_col: str, out_col: str = "payload") -> DataFrame:
    """Test helper: synthesize an opaque binary column from text (utf-8
    bytes). In production the binary column comes from the binaryFile
    source or a parquet BinaryType column."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))


def media_metadata(df: DataFrame, bin_col: str, media_type: str = "image") -> DataFrame:
    """Typed metadata struct computed JVM-side: size + checksum (no
    decode needed — this is the cheap pass you run on 100 TB first)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(bin_col)).alias("checksum"),
        ),
    )


def _fake_image_decode(blob: bytes) -> tuple[int, int, float]:
    """Deterministic fake: (width, height, mean_intensity) derived from
    the bytes — stands in for PIL.Image.open until the lib is present."""
    n = len(blob)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean = (sum(blob[:256]) / max(1, min(n, 256))) / 255.0
    return width, height, mean


def extract_image_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    resize_to: tuple[int, int] = (224, 224),
) -> DataFrame:
    """Decode + feature-extract images partition-parallel via mapInPandas.

    Output: (id, width, height, mean_intensity, n_bytes). With
    ``fake=False`` this requires PIL and raises NotImplementedError in
    this container; ``fake=True`` runs the deterministic stub through
    the identical Spark plumbing.
    """
    schema = f"{id_col} long, width int, height int, mean_intensity double, n_bytes long"

    def _extract(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                blob = bytes(row[bin_col])
                if fake:
                    w, h, m = _fake_image_decode(blob)
                else:
                    try:
                        from PIL import Image  # type: ignore
                    except ImportError as e:
                        raise NotImplementedError(
                            "real image decode requires PIL (not in this container); "
                            "pass fake=True to exercise the pipeline plumbing"
                        ) from e
                    import io

                    img = Image.open(io.BytesIO(blob)).resize(resize_to)
                    import numpy as np

                    arr = np.asarray(img.convert("L"), dtype="float64") / 255.0
                    w, h, m = img.width, img.height, float(arr.mean())
                out.append(
                    {id_col: row[id_col], "width": w, "height": h,
                     "mean_intensity": m, "n_bytes": len(blob)}
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=[id_col, "width", "height", "mean_intensity", "n_bytes"]
            )

    return df.select(id_col, bin_col).mapInPandas(_extract, schema)


def extract_audio_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    target_rate: int = 16000,
) -> DataFrame:
    """Decode + resample + feature-extract audio partition-parallel via
    mapInPandas: (id, sample_rate, n_samples, duration_sec, rms).

    ``fake=False`` needs soundfile/librosa (absent here — gated with
    NotImplementedError); ``fake=True`` derives deterministic features
    from the bytes (4 fake samples per byte at ``target_rate``; rms =
    mean of the first 256 byte values / 255) through the identical
    Spark plumbing — and the formula is reproducible in plain SQL for
    the oracle."""
    schema = (
        f"{id_col} long, sample_rate int, n_samples long, "
        "duration_sec double, rms double"
    )

    def _extract(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                blob = bytes(row[bin_col])
                if fake:
                    n_samples = len(blob) * 4
                    rms = (sum(blob[:256]) / max(1, min(len(blob), 256))) / 255.0
                else:
                    try:
                        import soundfile  # type: ignore  # noqa: F401
                    except ImportError as e:
                        raise NotImplementedError(
                            "real audio decode requires soundfile/librosa (not in "
                            "this container); pass fake=True for the plumbing path"
                        ) from e
                    raise NotImplementedError("real audio path needs the decode libs")
                out.append(
                    {
                        id_col: row[id_col],
                        "sample_rate": target_rate,
                        "n_samples": n_samples,
                        "duration_sec": n_samples / float(target_rate),
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=[id_col, "sample_rate", "n_samples", "duration_sec", "rms"]
            )

    return df.select(id_col, bin_col).mapInPandas(_extract, schema)


def sample_video_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 30,
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame with a
    frame-level binary. Fake mode emits byte-slices as 'frames'."""
    schema = f"{id_col} long, frame_no int, frame binary"

    def _sample(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                blob = bytes(row[bin_col])
                if not fake:
                    raise NotImplementedError(
                        "real video decode requires ffmpeg/pyav (not in this "
                        "container); pass fake=True for the plumbing path"
                    )
                for i, off in enumerate(range(0, len(blob), every_n)):
                    out.append(
                        {id_col: row[id_col], "frame_no": i,
                         "frame": blob[off : off + every_n]}
                    )
            yield pd.DataFrame(out) if out else pd.DataFrame(
                columns=[id_col, "frame_no", "frame"]
            )

    return df.select(id_col, bin_col).mapInPandas(_sample, schema)

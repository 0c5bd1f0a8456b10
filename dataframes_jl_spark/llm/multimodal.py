"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels are STUBBED (this environment has no image/audio
libraries): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder derived from
the payload bytes stands in. Everything around the kernel — schema,
batching, partition sizing, UDF signatures — is real and tested; a
production deployment swaps ``_decode_image_kernel`` for a Pillow/ffmpeg
implementation with the same contract.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# typed metadata schema carried alongside every binary payload
MEDIA_META_SCHEMA = (
    "media_id bigint, kind string, mime string, n_bytes bigint, sha256 string"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, channels int, mean_luma double"
)


def attach_media_meta(
    df: DataFrame, id_col: str, payload_col: str, kind: str, mime: str
) -> DataFrame:
    """Wrap a binary column with typed metadata (JVM-side: length + sha256;
    sha256 rather than sha1 so a SQL oracle can recompute it)."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(mime).alias("mime"),
        F.length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
        F.col(payload_col).alias("payload"),
    )


def _pil():
    """Import Pillow at call time, or None. The real kernels light up
    the moment the environment gains the library; until then the fake
    kernel (deterministic, oracle-recomputable) and the loud raise keep
    the plumbing honest."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _decode_image_kernel(payload: bytes, fake: bool) -> tuple[int, int, int, float]:
    """Decode one image → (width, height, channels, mean_luma).

    ``fake=True`` produces a deterministic stand-in derived from the
    payload sha256 so the distributed plumbing is testable end-to-end
    and recomputable by a SQL oracle. ``fake=False`` uses Pillow when
    importable (not present in this container) and raises loudly
    otherwise.
    """
    if not fake:
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "image decoding requires Pillow/libvips; run with "
                "fake=True or install Pillow"
            )
        import io

        with Image.open(io.BytesIO(payload)) as im:
            gray = im.convert("L")
            channels = len(im.getbands())
            # mean over the 8-bit luma plane, normalized to [0, 1]
            hist = gray.histogram()
            total = sum(hist)
            mean = sum(i * c for i, c in enumerate(hist)) / total / 255.0
            return im.width, im.height, channels, mean
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 3
    mean_luma = h[2] / 255.0
    return width, height, channels, mean_luma


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_rows: int = 256,
    num_partitions: int | None = None,
) -> DataFrame:
    """Image decode / feature-extract over mapInPandas.

    Batch shape matters at scale: media payloads are large, so the
    iterator yields small slices (``batch_rows``) to bound executor
    memory instead of one huge Arrow batch per partition. The decode is
    CPU-bound, so the input is repartitioned to at least the cluster
    parallelism — a single-file source must not serialize the kernel
    onto one core.
    """
    par = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                feats = [
                    _decode_image_kernel(p, fake) for p in chunk[payload_col]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].values,
                        "width": [f[0] for f in feats],
                        "height": [f[1] for f in feats],
                        "channels": [f[2] for f in feats],
                        "mean_luma": [f[3] for f in feats],
                    }
                )

    return df.select(id_col, payload_col).repartition(par).mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_plan(
    df: DataFrame, every_n: int = 30, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: emit (media_id, frame_index) rows for
    a downstream decode — pure JVM (sequence + explode), the decode stub
    applies per frame. Demonstrates the fan-out pattern where one 100 MB
    video row becomes N small feature rows without driver involvement."""
    n_frames = (F.col("n_bytes") / 1000).cast("int")  # stub: bytes→frames proxy
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    )


RESIZED_SCHEMA = (
    "media_id bigint, width int, height int, payload binary"
)


def _resize_image_kernel(
    payload: bytes, width: int, height: int, fake: bool
) -> bytes:
    """Resize one image payload to (width, height).

    ``fake=True`` returns a deterministic payload (sha256-seeded,
    length scaled to the target pixel count) so batch shape and schema
    are testable; ``fake=False`` uses Pillow when importable and raises
    loudly otherwise."""
    if not fake:
        Image = _pil()
        if Image is None:
            raise NotImplementedError(
                "image resizing requires Pillow/libvips; run with "
                "fake=True or install Pillow"
            )
        import io

        with Image.open(io.BytesIO(payload)) as im:
            out = io.BytesIO()
            im.resize((width, height)).save(out, format=im.format or "PNG")
            return out.getvalue()
    seed = hashlib.sha256(payload).digest()
    out_len = max(1, (width * height) // 64)
    return (seed * (out_len // len(seed) + 1))[:out_len]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
    batch_rows: int = 128,
    num_partitions: int | None = None,
) -> DataFrame:
    """Image resize over mapInPandas — same scale contract as
    decode_images: small Arrow slices bound executor memory (both the
    input and the resized output payloads are in flight per batch), and
    the CPU-bound kernel runs behind a repartition to cluster
    parallelism."""
    par = num_partitions or df.sparkSession.sparkContext.defaultParallelism

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk[id_col].values,
                        "width": width,
                        "height": height,
                        "payload": [
                            _resize_image_kernel(p, width, height, fake)
                            for p in chunk[payload_col]
                        ],
                    }
                )

    return df.select(id_col, payload_col).repartition(par).mapInPandas(
        run, schema=RESIZED_SCHEMA
    )

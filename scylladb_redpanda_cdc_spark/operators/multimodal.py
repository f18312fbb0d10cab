"""Multimodal column operators (driver mandate; SURVEY.md §2.X X9/X18).

Model: media travels as an opaque ``binary`` blob column beside a typed
metadata struct; plans filter/project on metadata and only the stages that
truly need bytes touch the blob (late materialization by schema design).

Decode/resize/frame-sample run as Arrow-batched pandas iterators via
``mapInPandas`` — the right shape for per-blob Python work at scale: one
Python worker per partition, columnar Arrow transfer, no per-row pickling.
The actual image/audio codecs are NOT in this container, so:

- :func:`decode_media` is the real production entry point and raises
  ``NotImplementedError`` (clearly-marked stub) when a codec backend is
  requested;
- :func:`fake_decode_batches` is the deterministic test double used by the
  X18 plan — every derived value is a pure function of (doc_id, blob
  length, declared metadata), so a strict SQL oracle can verify the
  PLUMBING (schema, batching, partitioning) end to end even though the
  codec itself is faked.

Scale notes: blobs never pass through a shuffle in these plans (decode is a
narrow map); frame sampling emits ≤ ``max_frames`` rows per input so output
size is bounded; metadata-only predicates prune before any Python stage.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pandas imported lazily inside workers
    import pandas as pd

#: Output schema of the fake decode stage (mapInPandas contract).
DECODE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, "
    "pixel_count bigint, luma int, n_frames_sampled int"
)

#: Knuth multiplicative constant — deterministic fake "luma" hash.
_LUMA_MIX = 2654435761


def media_struct(blob: Column, mime: Column, width: Column, height: Column) -> Column:
    """Assemble the carrier column: opaque bytes + typed metadata."""
    meta = F.struct(
        mime.alias("mime"),
        width.cast("int").alias("width"),
        height.cast("int").alias("height"),
        F.length(blob).alias("n_bytes"),
    )
    return F.struct(blob.alias("blob"), meta.alias("meta"))


def decode_media(df: DataFrame, codec: str) -> DataFrame:
    """Production decode entry point.

    STUB: real codecs (Pillow/libav/soundfile) are not installed in this
    environment. The Spark-side plumbing — schema, Arrow batching, the
    mapInPandas signature — is identical to :func:`fake_decode_batches`,
    which IS tested; swap the inner per-batch function to go live.
    """
    raise NotImplementedError(
        f"codec backend {codec!r} unavailable: image/audio libraries are not "
        "in this container. Use fake_decode_batches for the verified "
        "plumbing, and plug the real codec into the same mapInPandas shape."
    )


def fake_decode_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """Deterministic decode double: one output row per blob.

    Expected input columns: ``doc_id, blob, mime, width, height``.
    Derivations (all SQL-expressible, so the oracle is strict):
      - ``n_bytes``      = len(blob)              (touches real bytes)
      - ``pixel_count``  = width * height
      - ``luma``         = (doc_id * 2654435761) mod 256
      - ``n_frames_sampled`` = min(4, 1 + pixel_count mod 3)
    """
    import pandas as pd

    for pdf in batches:
        n_bytes = pdf["blob"].map(len)
        pixel_count = (pdf["width"] * pdf["height"]).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": n_bytes.astype("int64"),
                "pixel_count": pixel_count,
                "luma": ((pdf["doc_id"] * _LUMA_MIX) % 256).astype("int32"),
                "n_frames_sampled": (1 + pixel_count % 3).clip(upper=4).astype(
                    "int32"
                ),
            }
        )


#: Output schema of the resize stage (mapInPandas contract).
RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "out_width int, out_height int, scale_ppm bigint"
)

#: Resize target box (the ViT-style 224x224 fit).
RESIZE_TARGET = 224

#: Output schema of the feature-extract stage: 8 byte-range histogram
#: counts over the REAL blob bytes + the total (mapInPandas contract).
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, "
    + ", ".join(f"f{i} bigint" for i in range(8))
)


def fake_resize_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """Deterministic resize double: aspect-preserving fit into the
    ``RESIZE_TARGET`` box with EXACT integer-ppm arithmetic (what a real
    resize computes before touching pixels — the pixel pass is the codec
    stub's job; the geometry is the plumbing a plan must get right).

    Expected input columns: ``doc_id, width, height``. Derivations:
      - ``scale_ppm``  = min(T*1e6 // w, T*1e6 // h)   (never upscale past
        the box; floor keeps it SQL-recomputable)
      - ``out_w/out_h`` = max(1, dim * scale_ppm // 1e6)
    """
    import pandas as pd

    t = RESIZE_TARGET * 1_000_000
    for pdf in batches:
        w = pdf["width"].astype("int64")
        h = pdf["height"].astype("int64")
        scale = pd.concat([t // w, t // h], axis=1).min(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
                "out_width": (w * scale // 1_000_000).clip(lower=1).astype(
                    "int32"
                ),
                "out_height": (h * scale // 1_000_000).clip(lower=1).astype(
                    "int32"
                ),
                "scale_ppm": scale.astype("int64"),
            }
        )


def feature_extract_batches(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """Feature-extract plumbing over REAL blob bytes: an 8-bucket byte
    histogram (buckets of 32 code points) per blob — the deterministic,
    SQL-recomputable stand-in for an image/audio feature extractor, with
    the exact production shape (blob in, fixed-length numeric vector out,
    vectorized numpy inside the Arrow batch).

    Expected input columns: ``doc_id, blob``.
    """
    import numpy as np
    import pandas as pd

    for pdf in batches:
        hists = np.stack(
            [
                np.bincount(
                    np.frombuffer(b, dtype=np.uint8) >> 5, minlength=8
                )[:8]
                for b in pdf["blob"]
            ]
        ).astype("int64")
        out = {
            "doc_id": pdf["doc_id"],
            "n_bytes": pdf["blob"].map(len).astype("int64"),
        }
        for i in range(8):
            out[f"f{i}"] = hists[:, i]
        yield pd.DataFrame(out)


def frame_sample_indices(n_frames: Column, max_frames: int = 4) -> Column:
    """Evenly spaced frame indices (video sampling plumbing): ``k`` =
    min(max_frames, n_frames) indices ``floor(i * n / k)`` for i in 0..k-1.
    Pure expression algebra — runs JVM-side, no Python."""
    k = F.least(F.lit(max_frames), n_frames)
    return F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.floor(i * n_frames / k).cast("int"),
    )

"""Multimodal-column operators (north-star extension; SURVEY.md section 7 M4).

Images/audio/video ride Spark as opaque ``binary`` payload columns plus a
typed metadata struct. The decode step is the only part that needs a
media library; everything around it -- schema, Arrow batch shape,
partitioning, the mapInPandas iterator contract -- is real and tested:

- ``decode_image``: real decode via Pillow, gated behind an import-try
  (the container has no image libs -> NotImplementedError, as specified).
- ``fake_decode``: deterministic stand-in deriving metadata from the
  payload's md5, so the full distributed pipeline is exercisable AND
  oracle-checkable (DuckDB reproduces the same md5 arithmetic).
- downstream ops (thumbnail fit, frame sampling) are pure built-in
  expressions over the metadata -- JVM-side, codegen-friendly.

At 100 TB the payloads dominate IO: keep them in their own parquet column
(never a join key, never shuffled -- derive + drop early), and size Arrow
batches via spark.sql.execution.arrow.maxRecordsPerBatch when payloads
are MBs each.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

_FORMATS = ("jpeg", "png", "webp", "gif")


def media_table(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build an (id, payload binary) table. Locally the payload is the
    utf-8 text bytes standing in for real blobs; in production this is
    the binaryFile source or a parquet binary column."""
    return df.select(id_col, F.col(text_col).cast("binary").alias("payload"))


def fake_decode_meta(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: metadata derived from md5(payload).
    Stands in for a real image/video header parse; portable arithmetic so
    a SQL oracle can reproduce it bit-for-bit."""
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[0:4], 16) % 4096
    height = 1 + int(h[4:8], 16) % 4096
    n_frames = 1 + int(h[8:12], 16) % 240
    fmt = _FORMATS[int(h[12], 16) % 4]
    return width, height, n_frames, fmt


def decode_media(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: str = "fake",
) -> DataFrame:
    """Decode payloads to typed metadata via mapInPandas (Arrow-batched;
    one Python process per task, never per row). ``decoder='pillow'``
    uses the real image library when installed; ``'fake'`` is the
    deterministic stub for environments without media libs."""
    if decoder == "pillow":
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover - not in this container
            raise NotImplementedError(
                "real image decode needs Pillow; use decoder='fake' here"
            ) from e

    out_schema = T.StructType(
        [df.schema[id_col]] + list(IMAGE_META_SCHEMA.fields)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io as _io

        for pdf in it:
            metas = []
            for payload in pdf[payload_col]:
                raw = bytes(payload)
                if decoder == "pillow":  # pragma: no cover - not in container
                    from PIL import Image

                    with Image.open(_io.BytesIO(raw)) as im:
                        metas.append(
                            (im.width, im.height, getattr(im, "n_frames", 1),
                             (im.format or "unknown").lower())
                        )
                else:
                    metas.append(fake_decode_meta(raw))
            meta_df = pd.DataFrame(
                metas, columns=["width", "height", "n_frames", "format"]
            )
            meta_df.insert(0, id_col, pdf[id_col].values)
            yield meta_df

    return df.mapInPandas(batches, schema=out_schema)


def thumbnail_dims(
    width: Column, height: Column, max_dim: int = 128
) -> tuple[Column, Column]:
    """Aspect-preserving fit into max_dim x max_dim. Pure integer
    expression work (floor of the scaled dimension, floor-division
    semantics identical across engines)."""
    scale_needed = (width > max_dim) | (height > max_dim)
    longest = F.greatest(width, height)
    tw = F.when(scale_needed, (width * max_dim).cast("long") / longest).otherwise(width)
    th = F.when(scale_needed, (height * max_dim).cast("long") / longest).otherwise(height)
    return (
        F.greatest(F.floor(tw), F.lit(1)).cast("int"),
        F.greatest(F.floor(th), F.lit(1)).cast("int"),
    )


def sample_frame_indexes(n_frames: Column, every: int = 24) -> Column:
    """Frame-sampling plan for video payloads: indexes 0, every, 2*every,
    ... < n_frames as an array column (explode downstream to fan decode
    work out across tasks)."""
    return F.sequence(
        F.lit(0), n_frames - 1, F.lit(every)
    )

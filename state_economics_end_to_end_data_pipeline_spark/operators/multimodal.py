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


# ------------------------------------------------------------- real pixels

BMP_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_r", T.DoubleType()),
        T.StructField("mean_g", T.DoubleType()),
        T.StructField("mean_b", T.DoubleType()),
        T.StructField("first_r", T.IntegerType()),
        T.StructField("first_g", T.IntegerType()),
        T.StructField("first_b", T.IntegerType()),
    ]
)


def synth_bmp_payload(doc_id: int) -> bytes:
    """Deterministic REAL 24-bit BMP payload for a document id: geometry
    and base colors derive from md5(f"{doc_id}:bmp"), pixel channel
    values vary per image row ((r0+y)%256, (g0+2y)%256, (b0+3y)%256).
    A genuine byte-for-byte BITMAPFILEHEADER + BITMAPINFOHEADER +
    bottom-up padded pixel array -- so the decoder below must honor row
    stride padding and bottom-up row order or its stats diverge from
    the closed-form oracle."""
    import struct

    h = hashlib.md5(f"{doc_id}:bmp".encode()).hexdigest()
    r0, g0, b0 = int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)
    w = 1 + int(h[6:8], 16) % 8
    ht = 1 + int(h[8:10], 16) % 8
    stride = (3 * w + 3) // 4 * 4
    rows = []
    for j in range(ht):  # stored bottom-up: first stored row is y = ht-1
        y = ht - 1 - j
        px = bytes(
            (
                (b0 + 3 * y) % 256,
                (g0 + 2 * y) % 256,
                (r0 + y) % 256,
            )
        ) * w
        rows.append(px + b"\x00" * (stride - 3 * w))
    pixels = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, ht, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    return file_hdr + info + pixels


def parse_bmp_pixels(raw: bytes) -> tuple:
    """REAL BMP decode, numpy-vectorized (no media libs): struct-parse
    both headers, then ``np.frombuffer`` + stride reshape + slice over
    the padded bottom-up pixel array -- the production decode shape
    (ADVICE r6: the former per-pixel Python loop was fine for 8x8 test
    images but is exactly what dies first on megapixel media). Returns
    (width, height, mean_r, mean_g, mean_b, first_r, first_g, first_b)
    where `first_*` is the top-left pixel in IMAGE coordinates (stored
    LAST in a bottom-up BMP -- an order-sensitive probe that catches a
    decoder ignoring the row direction).  Channel sums accumulate as
    int64 (exact), so means are identical to the scalar loop's."""
    import struct

    import numpy as np

    magic, _fsize, _r1, _r2, off = struct.unpack("<2sIHHI", raw[:14])
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (_hsz, w, ht, _planes, bpp, comp, _isz, _xp, _yp, _nc, _ni) = struct.unpack(
        "<IiiHHIIiiII", raw[14:54]
    )
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    bottom_up = ht > 0
    ht = abs(ht)
    stride = (3 * w + 3) // 4 * 4
    if len(raw) < off + stride * ht:
        raise ValueError(
            f"truncated BMP pixel array: need {off + stride * ht} bytes, "
            f"have {len(raw)}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8, offset=off, count=stride * ht)
    # rows as stored -> drop stride padding -> (ht, w, BGR)
    px = arr.reshape(ht, stride)[:, : 3 * w].reshape(ht, w, 3)
    if bottom_up:
        px = px[::-1]  # image coordinates: row 0 = top
    sb, sg, sr = (int(s) for s in px.reshape(-1, 3).sum(axis=0, dtype=np.int64))
    first = px[0, 0]
    n = w * ht
    return (
        w, ht, sr / n, sg / n, sb / n,
        int(first[2]), int(first[1]), int(first[0]),
    )


def synth_bmp_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary) table of synthesized real BMPs -- the encode
    half of the pixel round-trip, Arrow-batched."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({id_col: pdf[id_col].values})
            out["payload"] = [synth_bmp_payload(int(i)) for i in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, schema=out_schema)


def decode_bmp_pixels(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Pixel-level decode of a BMP binary column via mapInPandas: the
    REAL decode path (headers + padded pixel rows via struct), running
    everywhere -- no optional media library, no env gate."""
    out_schema = T.StructType([df.schema[id_col]] + list(BMP_PIXEL_SCHEMA.fields))
    cols = [f.name for f in BMP_PIXEL_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [parse_bmp_pixels(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(stats, columns=cols)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, schema=out_schema)


# --- audio: real 16-bit PCM WAV synth + stdlib chunk-walking parse ---------

WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("peak_abs", T.IntegerType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def synth_wav_payload(doc_id: int) -> bytes:
    """Deterministic REAL 16-bit PCM mono WAV for a document id: a
    genuine RIFF container (RIFF size, WAVE form, canonical ``fmt ``
    chunk with PCM/mono/16-bit fields and the derived byte rate + block
    align, then a ``data`` chunk of little-endian int16 samples).
    Geometry derives from md5(f"{doc_id}:wav"): sample count
    64 + h[0:2] % 64, rate 8000 * (1 + h[2:4] % 3), and samples follow
    the integer sawtooth s_i = ((a0 + 1097*i) % 4001) - 2000 with
    a0 = h[4:8] % 20011 -- every downstream feature has an exact
    integer closed form a SQL oracle can restate."""
    import struct

    h = hashlib.md5(f"{doc_id}:wav".encode()).hexdigest()
    n = 64 + int(h[0:2], 16) % 64
    rate = 8000 * (1 + int(h[2:4], 16) % 3)
    a0 = int(h[4:8], 16) % 20011
    samples = [((a0 + 1097 * i) % 4001) - 2000 for i in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav_features(raw: bytes) -> tuple:
    """REAL WAV decode with no media libs: verify the RIFF/WAVE
    container, then WALK the chunk list (id + little-endian size, word
    alignment) rather than assuming fixed offsets -- real files carry
    LIST/INFO chunks before data. PCM/mono/16-bit enforced from the fmt
    chunk; samples via ``np.frombuffer`` int16 and int64 accumulation
    (peak/sum-abs/energy exact; a squared int16 overflows int32 at
    32768^2 * n, so the dtype widening is correctness, not style).
    Zero crossings count strict sign flips (s_i * s_{i-1} < 0), the
    SQL-friendly form. Truncated containers and non-PCM payloads raise
    rather than return partial stats."""
    import struct

    import numpy as np

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    riff_size = struct.unpack("<I", raw[4:8])[0]
    if 8 + riff_size > len(raw):
        raise ValueError("truncated RIFF container")
    pos, fmt_fields, data = 12, None, None
    while pos + 8 <= 8 + riff_size:
        cid = raw[pos:pos + 4]
        csz = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
        body = raw[pos + 8:pos + 8 + csz]
        if len(body) < csz:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt_fields = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt_fields is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, rate, _brate, _balign, bits = fmt_fields
    if (audio_format, channels, bits) != (1, 1, 16):
        raise ValueError(
            f"unsupported WAV: format={audio_format} channels={channels} "
            f"bits={bits}"
        )
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n = int(s.size)
    return (
        int(rate),
        n,
        n * 1_000_000 // int(rate),
        int(np.abs(s).max()) if n else 0,
        int(np.abs(s).sum()),
        int((s * s).sum()),
        int(np.count_nonzero(s[1:] * s[:-1] < 0)),
    )


def synth_wav_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary) table of synthesized real WAVs -- the audio
    encode half, Arrow-batched."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({id_col: pdf[id_col].values})
            out["payload"] = [synth_wav_payload(int(i)) for i in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, schema=out_schema)


def decode_wav_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Sample-level audio feature extraction from a WAV binary column via
    mapInPandas -- the real decode path, no media library, no env gate."""
    out_schema = T.StructType([df.schema[id_col]] + list(WAV_FEATURE_SCHEMA.fields))
    cols = [f.name for f in WAV_FEATURE_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = [parse_wav_features(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(stats, columns=cols)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(batches, schema=out_schema)


# --- video: real uncompressed AVI synth + chunk-walking frame decode -------

AVI_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fsum_r", T.LongType()),
        T.StructField("fsum_g", T.LongType()),
        T.StructField("fsum_b", T.LongType()),
    ]
)


def _avi_dims(doc_id: int) -> tuple[int, int, int, int, int, int]:
    h = hashlib.md5(f"{doc_id}:avi".encode()).hexdigest()
    w = 1 + int(h[0:2], 16) % 6
    ht = 1 + int(h[2:4], 16) % 6
    nf = 2 + int(h[4:6], 16) % 6
    r0, g0, b0 = int(h[6:8], 16), int(h[8:10], 16), int(h[10:12], 16)
    return w, ht, nf, r0, g0, b0


def synth_avi_payload(doc_id: int) -> bytes:
    """Deterministic REAL uncompressed AVI: a genuine RIFF 'AVI ' form
    with the required LIST hdrl (avih main header + LIST strl with a
    'vids'/'DIB ' strh and a BITMAPINFOHEADER strf) and a LIST movi
    holding one '00db' chunk of raw bottom-up padded BGR rows per frame
    (device-independent-bitmap frames -- the uncompressed codec every AVI
    reader must support). Geometry, frame count, and base colors derive
    from md5(f"{doc_id}:avi"); frame f row y carries channels
    ((r0+y+5f)%256, (g0+2y+7f)%256, (b0+3y+11f)%256), so every frame
    statistic has an integer closed form."""
    import struct

    w, ht, nf, r0, g0, b0 = _avi_dims(doc_id)
    stride = (3 * w + 3) // 4 * 4
    frames = []
    for f in range(nf):
        rows = []
        for j in range(ht):  # stored bottom-up like BMP
            y = ht - 1 - j
            px = bytes(
                (
                    (b0 + 3 * y + 11 * f) % 256,
                    (g0 + 2 * y + 7 * f) % 256,
                    (r0 + y + 5 * f) % 256,
                )
            ) * w
            rows.append(px + b"\x00" * (stride - 3 * w))
        frames.append(b"".join(rows))
    fsize = stride * ht

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        40_000, fsize * 25, 0, 0x10, nf, 0, 1, fsize, w, ht, 0, 0, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, 25, 0, nf, fsize, 0, 0,
        0, 0, w, ht,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, ht, 1, 24, 0, fsize, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) & 1)

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", fr) for fr in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_frames(raw: bytes, every: int = 1) -> list[tuple]:
    """REAL AVI decode with no media libs: verify the RIFF 'AVI ' form,
    WALK the top-level chunk list to hdrl (width/height/frame count from
    avih, 24bpp uncompressed enforced from strf) and movi, then decode
    ONLY every ``every``-th '00db' frame -- the sample_frame_indexes
    semantics executed at the byte level (production frame sampling
    skips the decode cost of unsampled frames, not just their rows).
    Each decoded frame yields int64-exact per-channel pixel sums via
    the same frombuffer + stride-slice shape as the BMP parser.
    Truncated containers and non-DIB payloads raise."""
    import struct

    import numpy as np

    if len(raw) < 12 or raw[0:4] != b"RIFF" or raw[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_size = struct.unpack("<I", raw[4:8])[0]
    if 8 + riff_size > len(raw):
        raise ValueError("truncated RIFF container")

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            cid = raw[pos:pos + 4]
            csz = struct.unpack("<I", raw[pos + 4:pos + 8])[0]
            if pos + 8 + csz > end:
                raise ValueError(f"truncated {cid!r} chunk")
            yield cid, pos + 8, csz
            pos += 8 + csz + (csz & 1)

    dims = None
    frames_seen = 0
    out = []
    for cid, off, csz in walk(12, 8 + riff_size):
        if cid != b"LIST":
            continue
        kind = raw[off:off + 4]
        if kind == b"hdrl":
            for c2, o2, s2 in walk(off + 4, off + csz):
                if c2 == b"avih":
                    a = struct.unpack("<IIIIIIIIII", raw[o2:o2 + 40])
                    dims = (a[8], a[9], a[4])  # width, height, total_frames
                elif c2 == b"LIST" and raw[o2:o2 + 4] == b"strl":
                    for c3, o3, s3 in walk(o2 + 4, o2 + s2):
                        if c3 == b"strf":
                            (_hsz, _w, _h, _pl, bpp, comp) = struct.unpack(
                                "<IiiHHI", raw[o3:o3 + 20]
                            )
                            if bpp != 24 or comp != 0:
                                raise ValueError(
                                    f"unsupported AVI stream: bpp={bpp} "
                                    f"compression={comp}"
                                )
        elif kind == b"movi":
            if dims is None:
                raise ValueError("movi before hdrl")
            w, ht, nf = dims
            stride = (3 * w + 3) // 4 * 4
            for c2, o2, s2 in walk(off + 4, off + csz):
                if c2 != b"00db":
                    continue
                idx = frames_seen
                frames_seen += 1
                if idx % every != 0:
                    continue  # sampled out: skip the decode entirely
                if s2 != stride * ht:
                    raise ValueError(
                        f"frame {idx}: expected {stride * ht} bytes, got {s2}"
                    )
                arr = np.frombuffer(raw, dtype=np.uint8, offset=o2, count=s2)
                px = arr.reshape(ht, stride)[:, : 3 * w].reshape(ht, w, 3)
                sb, sg, sr = (
                    int(s) for s in px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                )
                out.append((w, ht, nf, idx, sr, sg, sb))
    if dims is None or frames_seen == 0:
        raise ValueError("missing hdrl or movi frames")
    if frames_seen != dims[2]:
        raise ValueError(
            f"header claims {dims[2]} frames, movi holds {frames_seen}"
        )
    return out


def synth_avi_table(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary) table of synthesized real AVIs."""
    out_schema = T.StructType(
        [df.schema[id_col], T.StructField("payload", T.BinaryType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({id_col: pdf[id_col].values})
            out["payload"] = [synth_avi_payload(int(i)) for i in pdf[id_col]]
            yield out

    return df.select(id_col).mapInPandas(batches, schema=out_schema)


def decode_avi_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every: int = 1,
) -> DataFrame:
    """Frame-level AVI decode via mapInPandas, one output row per SAMPLED
    frame (idx 0, every, 2*every, ...); unsampled frames are never
    decoded."""
    out_schema = T.StructType([df.schema[id_col]] + list(AVI_FRAME_SCHEMA.fields))
    cols = [f.name for f in AVI_FRAME_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rows = [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                for tup in parse_avi_frames(bytes(p), every=every):
                    ids.append(i)
                    rows.append(tup)
            out = pd.DataFrame(rows, columns=cols)
            out.insert(0, id_col, ids)
            yield out

    return df.mapInPandas(batches, schema=out_schema)

"""Multimodal columns (SURVEY §2B [N]): image/audio/video as opaque
`binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas` pipelines.

Two codec tiers, both real Spark plumbing:

- byte-level features (`decode_media` default): length, md5, a
  deterministic content-derived dimension — format-agnostic, works on any
  blob.
- real codecs (`real_codec=True` paths): genuine PNG/BMP/farbfeld/GIF/
  JPEG encode + header/pixel decode implemented from the public format
  specs in pure stdlib (functions/codecs.py) — `synthesize_media` writes
  real image files into the binary column, `decode_media(real_codec=True)`
  parses their actual headers, `resize_media(real_codec=True)` pixel-
  decodes, nearest-neighbor resamples, and re-encodes.

Scale notes: mapInPandas streams Arrow batches — no per-row Python
overhead, no driver collect; blobs never leave their partition, and
feature extraction parallelizes per input split. Partition by content
hash for even blob-size distribution when media sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from marketdb_spark.functions.codecs import (
    decode_image,
    encode_bmp,
    encode_farbfeld,
    encode_png,
    parse_image_header,
    resample_nearest,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
    ]
)


def attach_blob(df: DataFrame, id_col: str, text_col: str, mime: str) -> DataFrame:
    """Build a media frame from a text column (testdata carrier): the blob
    is the utf-8 encoding, the metadata struct is typed."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("blob"),
        F.struct(
            F.lit(mime).alias("mime"), F.col("source").alias("source")
        ).alias("meta"),
    )


# Deterministic image parameters for synthesize_media: dims/format derive
# from the row id alone, so a SQL oracle can predict them while the Spark
# path proves a genuine encode→decode round trip over real file bytes.
_SYNTH_FORMATS = ("png", "bmp", "farbfeld")
_SYNTH_ENCODERS = {"png": encode_png, "bmp": encode_bmp, "farbfeld": encode_farbfeld}


def _synth_params(media_id: int) -> tuple[str, int, int]:
    return (
        _SYNTH_FORMATS[media_id % 3],
        8 + media_id % 24,
        8 + (media_id * 7) % 24,
    )


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Render one real image file per row into the binary column: format
    cycles png/bmp/farbfeld by id, dimensions derive from the id, pixels
    are a deterministic gradient. Encoding runs in Arrow-batched
    mapInPandas — each partition encodes its own rows, nothing crosses the
    shuffle."""
    ids_only = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, mimes = [], []
            for mid in pdf["media_id"]:
                fmt, w, h = _synth_params(int(mid))
                pixels = bytes(
                    (int(mid) + x + 3 * y) % 256
                    for y in range(h)
                    for x in range(w)
                )
                blobs.append(_SYNTH_ENCODERS[fmt](w, h, pixels, channels=1))
                mimes.append(f"image/{fmt}")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "blob": blobs, "mime": mimes}
            )

    encoded = ids_only.mapInPandas(
        _encode_batch,
        schema="media_id long, blob binary, mime string",
    )
    return encoded.select(
        "media_id",
        "blob",
        F.struct(
            F.col("mime").alias("mime"), F.lit("synthetic").alias("source")
        ).alias("meta"),
    )


REAL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def decode_media(df: DataFrame, real_codec: bool = False) -> DataFrame:
    """Feature-extract each blob via Arrow-batched mapInPandas.

    real_codec=True parses genuine file headers (PNG IHDR, BMP info
    header, farbfeld, GIF logical screen, JPEG SOF — functions/codecs.py)
    and returns (media_id, fmt, width, height); unparseable blobs yield
    null features rather than failing the job."""
    if real_codec:

        def _parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                fmts, widths, heights = [], [], []
                for b in pdf["blob"]:
                    parsed = parse_image_header(b)
                    if parsed is None:
                        fmts.append(None), widths.append(None), heights.append(None)
                    else:
                        fmts.append(parsed[0])
                        widths.append(parsed[1])
                        heights.append(parsed[2])
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "fmt": fmts,
                        "width": pd.array(widths, dtype="Int32"),
                        "height": pd.array(heights, dtype="Int32"),
                    }
                )

        return df.mapInPandas(_parse_batch, schema=REAL_FEATURE_SCHEMA)

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": blobs.map(lambda b: len(b) if b is not None else None),
                    "content_md5": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    # deterministic fake "decoded dimension": first 2 bytes
                    "fake_width": blobs.map(
                        lambda b: (b[0] << 8 | b[1]) if b is not None and len(b) >= 2 else None
                    ),
                }
            )

    return df.mapInPandas(_decode_batch, schema=FEATURE_SCHEMA)


def decode_media_arrow(df: DataFrame) -> DataFrame:
    """decode_media on the mapInArrow API: the UDF receives/returns raw
    ``pyarrow.RecordBatch``es — no pandas materialization at all, the
    leanest path for binary-heavy rows (a pandas Series of blobs copies
    every buffer; Arrow buffers are zero-copy slices of the IPC stream).
    Same features as decode_media; parity pinned in tests."""
    import pyarrow as pa

    def _decode_batches(batches):
        for batch in batches:
            ids = batch.column("media_id")
            blobs = batch.column("blob").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(
                        [len(b) if b is not None else None for b in blobs],
                        type=pa.int64(),
                    ),
                    pa.array(
                        [
                            hashlib.md5(bytes(b)).hexdigest()
                            if b is not None
                            else None
                            for b in blobs
                        ],
                        type=pa.string(),
                    ),
                    pa.array(
                        [
                            (b[0] << 8 | b[1])
                            if b is not None and len(b) >= 2
                            else None
                            for b in blobs
                        ],
                        type=pa.int32(),
                    ),
                ],
                names=["media_id", "byte_len", "content_md5", "fake_width"],
            )

    return df.mapInArrow(_decode_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("out_w", T.IntegerType(), True),
        T.StructField("out_h", T.IntegerType(), True),
    ]
)


def resize_media(
    df: DataFrame, out_w: int, out_h: int, real_codec: bool = False
) -> DataFrame:
    """Resize over mapInPandas: blob-in/blob-out, 1:1 rows, Arrow both ways.

    real_codec=True pixel-decodes PNG/BMP/farbfeld (functions/codecs.py),
    nearest-neighbor resamples to (out_w, out_h), and re-encodes as
    farbfeld (the canonical uncompressed output format — downstream stages
    get fixed-size, directly-indexable pixel buffers). Undecodable blobs
    yield a null output blob.

    The default (real_codec=False) path is the format-agnostic fallback:
    treat the blob as a flat byte "image" and nearest-neighbor sample it
    to out_w*out_h bytes (stride indexing) — reproducible on any bytes."""
    if real_codec:

        def _resize_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                def one(b):
                    if b is None:
                        return None
                    try:
                        _fmt, w, h, ch, px = decode_image(bytes(b))
                    except ValueError:
                        return None
                    resized = resample_nearest(px, w, h, ch, out_w, out_h)
                    return encode_farbfeld(out_w, out_h, resized, channels=ch)

                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "blob": pdf["blob"].map(one),
                        "out_w": out_w,
                        "out_h": out_h,
                    }
                )

        return df.mapInPandas(_resize_real, schema=RESIZED_SCHEMA)
    n_out = out_w * out_h

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(b):
                if b is None or len(b) == 0:
                    return None
                raw = bytes(b)
                # nearest-neighbor over the flat byte plane
                return bytes(raw[(i * len(raw)) // n_out] for i in range(n_out))

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "blob": pdf["blob"].map(one),
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return df.mapInPandas(_resize_batch, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, frame_size: int = 64, n_frames: int = 4
) -> DataFrame:
    """Frame-sampling stub: treat each blob as a concatenation of
    fixed-size frames (≙ a video container) and emit ``n_frames`` evenly
    spaced frames as rows — the 1→N mapInPandas shape (each input batch
    yields a longer output batch; Arrow handles the fan-out, no explode
    shuffle). A real decoder would replace the slicing with codec calls."""

    def _sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["blob"]):
                if b is None:
                    continue
                raw = bytes(b)
                total = max(len(raw) // frame_size, 1)
                take = min(n_frames, total)
                for j in range(take):
                    k = (j * total) // take  # evenly spaced frame index
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[k * frame_size : (k + 1) * frame_size])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(_sample_batch, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# Audio: real WAV containers in the binary column
# --------------------------------------------------------------------------

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
    ]
)


def _audio_params(media_id: int) -> tuple[int, int, int]:
    """(channels, sample_rate, n_frames) derived from the id — oracle-
    computable, like _synth_params."""
    return 1 + media_id % 2, 8000 * (1 + media_id % 3), 100 + media_id % 50


def synthesize_audio(df: DataFrame, id_col: str) -> DataFrame:
    """One real PCM16 WAV file per row (functions/codecs.encode_wav):
    channels/rate/length derive from the id, samples are a deterministic
    sawtooth. Same Arrow-batched encode-in-place shape as
    synthesize_media."""
    import struct as _struct

    ids_only = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from marketdb_spark.functions.codecs import encode_wav

        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                ch, rate, n = _audio_params(int(mid))
                samples = b"".join(
                    _struct.pack("<h", ((int(mid) * 37 + i * 257) % 65536) - 32768)
                    for i in range(n * ch)
                )
                blobs.append(encode_wav(samples, sample_rate=rate, channels=ch))
            yield pd.DataFrame({"media_id": pdf["media_id"], "blob": blobs})

    return ids_only.mapInPandas(
        _encode_batch, schema="media_id long, blob binary"
    )


def audio_meta(df: DataFrame) -> DataFrame:
    """Parse each WAV blob's RIFF fmt/data chunks back into typed metadata
    (mapInPandas; un-parseable blobs → nulls)."""

    def _parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from marketdb_spark.functions.codecs import parse_wav_header

        for pdf in batches:
            cols = {"channels": [], "sample_rate": [], "bits": [], "n_samples": []}
            for b in pdf["blob"]:
                meta = parse_wav_header(bytes(b)) if b is not None else None
                for k in cols:
                    cols[k].append(None if meta is None else meta.get(k))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "channels": pd.array(cols["channels"], dtype="Int32"),
                    "sample_rate": pd.array(cols["sample_rate"], dtype="Int32"),
                    "bits": pd.array(cols["bits"], dtype="Int32"),
                    "n_samples": pd.array(cols["n_samples"], dtype="Int64"),
                }
            )

    return df.mapInPandas(_parse_batch, schema=AUDIO_META_SCHEMA)


# --------------------------------------------------------------------------
# Video: concatenated farbfeld frames as the container format
# --------------------------------------------------------------------------

def synthesize_video(
    df: DataFrame, id_col: str, n_frames: int = 6, w: int = 4, h: int = 3
) -> DataFrame:
    """A "video" blob = n real farbfeld images back to back (each frame
    independently decodable at its parsed offset — the property a real
    container shares and flat byte-slicing does not)."""
    ids_only = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _encode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                frames = []
                for k in range(n_frames):
                    px = bytes((int(mid) + 17 * k + i) % 256 for i in range(w * h))
                    frames.append(encode_farbfeld(w, h, px, channels=1))
                blobs.append(b"".join(frames))
            yield pd.DataFrame({"media_id": pdf["media_id"], "blob": blobs})

    return ids_only.mapInPandas(
        _encode_batch, schema="media_id long, blob binary"
    )


def sample_frames_real(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Real frame sampling: walk the container by PARSING each farbfeld
    frame header for its true extent (16-byte header + w*h*8 pixels),
    then emit ``n_frames`` evenly spaced frames as standalone image blobs.
    Same 1→N mapInPandas fan-out shape as the byte-slicing sample_frames."""
    import struct as _struct

    def _sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["blob"]):
                if b is None:
                    continue
                raw = bytes(b)
                offsets = []
                pos = 0
                while pos + 16 <= len(raw) and raw[pos : pos + 8] == b"farbfeld":
                    fw, fh = _struct.unpack(">II", raw[pos + 8 : pos + 16])
                    end = pos + 16 + fw * fh * 8
                    if end > len(raw):
                        break  # truncated tail frame: stop at last whole one
                    offsets.append((pos, end))
                    pos = end
                if not offsets:
                    continue
                take = min(n_frames, len(offsets))
                for j in range(take):
                    k = (j * len(offsets)) // take
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[offsets[k][0] : offsets[k][1]])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(_sample_batch, schema=FRAME_SCHEMA)

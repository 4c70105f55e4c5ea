"""Multimodal columns (SURVEY §2B [N]): image/audio/video as opaque
`binary` columns with typed metadata, processed by Arrow-batched
`mapInPandas` pipelines.

The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested. The actual media decoding is STUBBED: the
image/audio libraries are not in this container, so `decode_media`
computes deterministic byte-level features (length, md5, a fake
"dimension" derived from content) and raises NotImplementedError only
when a real codec is explicitly requested. Swapping in PIL/librosa is a
body-only change to `_decode_batch`.

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


def decode_media(df: DataFrame, real_codec: bool = False) -> DataFrame:
    """Feature-extract each blob via Arrow-batched mapInPandas.

    real_codec=True is the marked stub boundary: raises
    NotImplementedError until a codec library is installed."""
    if real_codec:
        raise NotImplementedError(
            "real media decoding requires an image/audio codec library; "
            "this container ships none — the deterministic byte-level "
            "features below exercise the full Spark plumbing instead"
        )

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
    """Resize stub over mapInPandas: blob-in/blob-out, 1:1 rows, Arrow both
    ways — the plumbing a real `PIL.Image.resize` body would use unchanged.

    The deterministic fake treats the blob as a flat byte "image" and
    nearest-neighbor samples it to out_w*out_h bytes (stride indexing), so
    outputs are reproducible for tests. real_codec=True is the marked stub
    boundary (NotImplementedError until an image library ships)."""
    if real_codec:
        raise NotImplementedError(
            "real resize requires an image codec; the deterministic "
            "byte-stride fake below exercises the full Spark plumbing"
        )
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

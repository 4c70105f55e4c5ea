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

"""Multimodal-column queries (SURVEY §2B [N]): binary blobs + typed
metadata flowing through an Arrow-batched mapInPandas feature extractor.
The byte-level features are deterministic, so even the Pandas-UDF path is
oracle-checked (DuckDB reproduces them from the text carrier)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.operators.multimodal import (
    attach_blob,
    decode_media,
    synthesize_media,
)
from marketdb_spark.queries.registry import query


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'farbfeld'
           END AS fmt,
           CAST(8 + doc_id % 24 AS INT) AS width,
           CAST(8 + (doc_id * 7) % 24 AS INT) AS height
    FROM documents
    WHERE doc_id % 4 = 0
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec round trip entirely inside Arrow-batched mapInPandas:
    synthesize_media encodes one genuine image file per doc (PNG/BMP/
    farbfeld cycling by id, dimensions derived from the id), then
    decode_media(real_codec=True) parses the actual file headers back.
    The oracle recomputes the id→(fmt, dims) map in SQL, so a broken
    encoder OR parser mismatches. Byte-level (format-agnostic) features
    stay covered by tests/test_operators.py."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    media = synthesize_media(docs, "doc_id")
    return decode_media(media, real_codec=True)


@query(
    "mm_meta_stats",
    oracle="""
    SELECT source,
           COUNT(*) AS n_blobs,
           CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY source
    """,
)
def mm_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-level accounting over the media frame without touching
    blob contents (column pruning keeps the binary out of the scan)."""
    docs = load(spark, sf_dir, "documents")
    media = attach_blob(docs, "doc_id", "text", mime="text/plain")
    return media.groupBy(F.col("meta.source").alias("source")).agg(
        F.count("*").alias("n_blobs"),
        F.sum(F.length("blob")).alias("total_bytes"),
        F.max(F.length("blob")).cast("bigint").alias("max_bytes"),
    )


@query(
    "mm_audio_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(1 + doc_id % 2 AS INT) AS channels,
           CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
           CAST(16 AS INT) AS bits,
           CAST(100 + doc_id % 50 AS BIGINT) AS n_samples
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality on real container bytes: synthesize_audio writes one
    genuine PCM16 WAV per doc (channels/rate/length derived from the id),
    audio_meta parses the RIFF fmt/data chunks back. The oracle recomputes
    the id→parameters map, so a broken WAV writer OR chunk walker
    mismatches."""
    from marketdb_spark.operators.multimodal import audio_meta, synthesize_audio

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return audio_meta(synthesize_audio(docs, "doc_id"))


@query(
    "mm_frame_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id AS media_id, text,
             GREATEST(octet_length(CAST(text AS BLOB)) // 64, 1) AS total
      FROM documents
    ),
    f AS (
      SELECT media_id,
             CAST((j.j * total) // LEAST(4, total) AS INT) AS frame_idx,
             substring(text,
                       CAST((j.j * total) // LEAST(4, total) AS INT) * 64 + 1,
                       64) AS frame
      FROM p CROSS JOIN (SELECT UNNEST(range(0, 4)) AS j) j
      WHERE j.j < LEAST(4, total)
    )
    SELECT media_id, frame_idx, md5(frame) AS frame_md5,
           CAST(octet_length(CAST(frame AS BLOB)) AS BIGINT) AS frame_len
    FROM f
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style FRAME SAMPLING through the 1→N mapInPandas shape
    (operators/multimodal.sample_frames): each blob is treated as a
    container of fixed 64-byte frames and 4 evenly spaced frames fan out
    as rows — Arrow handles the batch growth, no explode shuffle. Frames
    are emitted as (md5, length) so the hash gate checks the exact frame
    BYTES each index selects. The oracle mirrors the byte slicing with
    VARCHAR substring, valid because the corpus is pure ASCII (verified:
    octet_length == length for every row at every SF; the Spark side
    slices real UTF-8 bytes). A real video decoder replaces the slicing
    with codec calls behind the same schema — the sampling/fan-out
    plumbing is what ships."""
    from marketdb_spark.operators.multimodal import sample_frames

    docs = load(spark, sf_dir, "documents")
    media = attach_blob(docs, "doc_id", "text", mime="text/plain")
    frames = sample_frames(media, frame_size=64, n_frames=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("bigint").alias("frame_len"),
    )


@query(
    "mm_arrow_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5,
           CAST(CASE WHEN length(text) >= 2
                THEN ascii(substring(text, 1, 1)) * 256
                     + ascii(substring(text, 2, 1))
                ELSE NULL END AS INT) AS fake_width
    FROM documents
    """,
)
def mm_arrow_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInArrow media path under the hash gate: the UDF receives
    and emits raw pyarrow.RecordBatches — zero pandas materialization,
    the leanest lane for binary-heavy rows (a pandas Series of blobs
    copies every buffer; Arrow buffers are zero-copy IPC slices). The
    oracle recomputes the byte-level features (length, content md5,
    first-two-bytes "width") from the text carrier — exact because the
    corpus is pure ASCII, so VARCHAR positions are byte positions.
    Sibling of mm_decode_features (mapInPandas, real codecs); this row
    pins the Arrow-native API variant the 100 TB pipeline would use."""
    from marketdb_spark.operators.multimodal import decode_media_arrow

    docs = load(spark, sf_dir, "documents")
    media = attach_blob(docs, "doc_id", "text", mime="text/plain")
    return decode_media_arrow(media)


@query(
    "mm_resize_pixels",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             8 + doc_id % 24 AS w,
             8 + (doc_id * 7) % 24 AS h
      FROM documents WHERE doc_id % 4 = 0
    ),
    px AS (
      SELECT media_id,
             list_transform(range(0, 64), i ->
               (media_id
                + (((i % 8) * w) // 8)
                + 3 * ((((i // 8) * h) // 8))) % 256) AS pix
      FROM m
    )
    SELECT media_id,
           CAST(528 AS BIGINT) AS out_len,
           array_to_string(list_transform(pix, v -> CAST(v AS VARCHAR)), ',')
             AS pix_csv,
           CAST(list_reduce(pix, (a, b) -> a + b) AS BIGINT) AS pix_sum
    FROM px
    """,
)
def mm_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-CODEC image resize under the hash gate: synthesize_media
    renders genuine PNG/BMP/farbfeld files (gradient pixel(x,y) =
    (id + x + 3y) mod 256, dims derived from the id), resize_media
    (real_codec=True) pixel-decodes each file, nearest-neighbor
    resamples to 8×8 and re-encodes as farbfeld; the query then reads
    the 64 resampled gray values back out of the farbfeld buffer
    JVM-side (hex slicing — pixel i is the high byte of R at offset
    16 + 8i) and emits them as CSV + checksum. The oracle replays the
    full chain in SQL: source dims from the id, nearest-neighbor index
    math sx = (x·w)//8, sy = (y·h)//8, gradient value at (sx, sy) —
    so the hash gate pins the DECODE → RESAMPLE → ENCODE pixel path
    end-to-end, not just plumbing. Format cycles by id (all three
    codecs exercised); the 1:1 mapInPandas shape never shuffles.
    Scale: per-row Python codec work, Arrow-batched — the lane a real
    image library (PIL/ffmpeg) drops into unchanged."""
    from marketdb_spark.operators.multimodal import (
        resize_media,
        synthesize_media,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    media = synthesize_media(docs, "doc_id")
    resized = resize_media(media, out_w=8, out_h=8, real_codec=True)
    hexed = resized.select(
        "media_id",
        F.length("blob").cast("bigint").alias("out_len"),
        F.hex("blob").alias("hx"),
    )
    pix = [
        F.conv(
            F.substring("hx", (16 + i * 8) * 2 + 1, 2), 16, 10
        ).cast("bigint")
        for i in range(64)
    ]
    return hexed.select(
        "media_id",
        "out_len",
        F.concat_ws(",", *[p.cast("string") for p in pix]).alias("pix_csv"),
        sum(pix[1:], pix[0]).alias("pix_sum"),
    )

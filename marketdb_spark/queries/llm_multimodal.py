"""Multimodal-column queries (SURVEY §2B [N]): binary blobs + typed
metadata flowing through an Arrow-batched mapInPandas feature extractor.
The byte-level features are deterministic, so even the Pandas-UDF path is
oracle-checked (DuckDB reproduces them from the text carrier)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marketdb_spark.catalog import load
from marketdb_spark.operators.multimodal import attach_blob, decode_media
from marketdb_spark.queries.registry import query


@query(
    "mm_decode_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
           md5(text) AS content_md5,
           CAST((ord(substring(text, 1, 1)) * 256
                 + ord(substring(text, 2, 1))) AS INT) AS fake_width
    FROM documents
    WHERE doc_id % 4 = 0
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob → mapInPandas feature extraction (byte length, content hash,
    fake decoded dimension). Exercises BinaryType columns, metadata
    structs, and the Arrow batch path end-to-end."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    media = attach_blob(docs, "doc_id", "text", mime="text/plain")
    return decode_media(media)


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

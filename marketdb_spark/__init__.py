"""marketdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ezhulenev/marketdb, re-expressed Spark-first.

The reference (/root/reference) is an HBase-backed market time-series store:
ingest trade/order events (streaming + batch CSV), store them time-ordered
per (market, security), and serve `(market, security, interval) -> ordered
stream` scans that clients fold over with iteratees
(reference: README.md:19, marketdb-core/.../core/MarketDB.scala:66-106).

Here the same capabilities are expressed as:
  * partitioned Parquet + Catalyst predicate pushdown  (scan / key-range query)
  * DataFrame unions + orderBy                        (k-way ordered merge)
  * Spark SQL aggregation / window functions          (iteratee folds)
  * Structured Streaming + foreachBatch               (queue ingest)
plus the full analytic operator surface and LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) declared in
SURVEY.md §2B.
"""

from marketdb_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"

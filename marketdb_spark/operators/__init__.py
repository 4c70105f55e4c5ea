from marketdb_spark.operators.asof import asof_join
from marketdb_spark.operators.ohlc import ohlc_bars
from marketdb_spark.operators.topk import top_k_per_group

__all__ = ["asof_join", "ohlc_bars", "top_k_per_group"]

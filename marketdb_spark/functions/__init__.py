from marketdb_spark.functions.exact import davg, dsum, oracle_davg, oracle_dsum

__all__ = ["dsum", "davg", "oracle_dsum", "oracle_davg"]

from prql_query_spark.operators import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]

from prql_query_spark.streaming import events

__all__ = ["events"]

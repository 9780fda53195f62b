"""prql_query_spark — a PySpark-native analytics engine with the query surface
of PRQL/prql-query.

The reference (prql-query v0.0.15) is a PRQL→SQL transpiler bolted onto
DataFusion/DuckDB (see /root/reference/src/main.rs:280, SURVEY.md §0).  This
package re-expresses that capability Spark-first:

* ``compiler/`` — a pure-Python PRQL 0.6-surface compiler that emits SQL text
  in either the Spark or DuckDB dialect (DuckDB is used as the correctness
  oracle).  Catalyst is the optimizer; we emit declarative SQL and let it
  choose physical plans.
* ``engine/`` — SparkSession construction, source registration
  (``--from``-style alias rules per reference src/main.rs:287-323), writers.
* ``operators/`` — scale-path extensions a 100 TB training-data pipeline
  needs: dedup (exact/minhash/simhash), similarity search, text analysis,
  multimodal plumbing.  All DataFrame-native.
* ``streaming/`` — Structured Streaming variants over event streams.
"""

from prql_query_spark.compiler import compile_prql

__version__ = "0.1.0"

__all__ = ["compile_prql", "__version__"]

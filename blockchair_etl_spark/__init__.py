"""blockchair_etl_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference ELT stack (loki-k4/blockchair-etl):
extract → schema-infer → load → layered transform DAG → analytic
queries (incl. bounded-depth graph tracing), plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Everything is expressed Spark-first: DataFrame/SQL logical plans that
Catalyst/Tungsten optimize (pushdown, pruning, broadcast, AQE), with
Python only on the driver for orchestration and in Arrow-vectorized
UDFs where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

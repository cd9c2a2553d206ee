"""gcp_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``niravraje/gcp-map-reduce`` (a two-stage MapReduce framework over GCP VMs
with a file-backed KV store; see SURVEY.md) as an idiomatic Spark
DataFrame/SQL engine, extended with the large-scale training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7):
- DataFrame / Spark SQL first; Catalyst plans everything; RDDs nowhere.
- Every operator is registered in :mod:`gcp_map_reduce_spark.plans.registry`
  with a matching DuckDB oracle SQL string where ANSI-SQL-expressible.
- Scale posture: no driver-side collect inside operators, broadcast hints for
  dimension tables, AQE on, map-side partial aggregation everywhere.
"""

from gcp_map_reduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

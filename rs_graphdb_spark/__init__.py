"""rs_graphdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference property-graph database
(Magic-zhu/rs-graphdb), re-expressed Spark-first.

Design (see SURVEY.md §1.4/§7):

- Property graph = per-label node DataFrames + per-reltype edge DataFrames
  (columnar, typed, Parquet-backed) — NOT a row store of property bags.
- Query surface = a fluent builder (``Query``) compiling lazily to DataFrame
  transformations; Catalyst optimizes (pushdown, pruning, join selection).
- Traversal / iterative algorithms = driver-side fixpoint loops over
  DataFrames with checkpoint cadence (the one thing Catalyst can't express).
- Beyond-reference: large-scale training-data pipeline ops (dedup,
  similarity search, text analysis, multimodal plumbing).
"""

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.loaders import load_tpch_graph
from rs_graphdb_spark.query import Query
from rs_graphdb_spark.session import get_spark

__all__ = [
    "EdgeSet",
    "PropertyGraph",
    "Query",
    "execute_cypher",
    "get_spark",
    "load_tpch_graph",
]

__version__ = "0.1.0"

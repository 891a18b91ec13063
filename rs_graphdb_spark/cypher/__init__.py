"""Cypher-ish front-end: text → AST → DataFrame plan.

Mirrors the reference dialect (`/root/reference/src/cypher/`) with
standard semantics — multi-variable bindings, enforced intermediate node
patterns, real OPTIONAL MATCH — fixing reference quirks #1-#5
(SURVEY.md §3.4).
"""

from rs_graphdb_spark.cypher.compiler import execute_cypher

__all__ = ["execute_cypher"]

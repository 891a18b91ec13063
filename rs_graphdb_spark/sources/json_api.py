"""Parameterized JSON query source — the reference's HTTP query surface
without the HTTP server.

Reference: `POST /query` takes ``{label, property?, value?, out_rel?,
in_rel?}`` and builds a fluent Query chain
(`/root/reference/src/server.rs:167-205`); `POST /search` does substring
search across labels (`:803-852`). Spark-first the transport is
irrelevant — any HTTP framework can wrap these two functions; what the
engine owns is JSON-dict → DataFrame-plan compilation.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.query import Query


def json_query(graph: PropertyGraph, req: dict) -> DataFrame:
    """``{label, property?, value?, out_rel?, in_rel?, limit?}`` →
    result DataFrame (mirrors `src/server.rs:167-205` field-for-field)."""
    if "label" not in req:
        raise ValueError("query requires 'label'")
    q = Query(graph=graph).from_label(req["label"])
    if "property" in req and "value" in req:
        q = q.where_prop_eq(req["property"], req["value"])
    if req.get("out_rel"):
        q = q.out(req["out_rel"])
    if req.get("in_rel"):
        q = q.in_(req["in_rel"])
    df = q.df if hasattr(q, "df") else q.frontier
    if req.get("limit"):
        df = df.limit(int(req["limit"]))
    return df


def substring_search(
    graph: PropertyGraph, needle: str, labels: list[str] | None = None
) -> DataFrame:
    """Cross-label substring containment over all string columns
    (`src/server.rs:803-852`): returns (label, id) of matching nodes."""
    needle = needle.lower()
    parts = []
    for label, df in sorted(graph.nodes.items()):
        if labels and label not in labels:
            continue
        str_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() == "string"]
        if not str_cols:
            continue
        cond = reduce(or_, [F.lower(F.col(c)).contains(needle) for c in str_cols])
        parts.append(df.filter(cond).select(F.lit(label).alias("label"), "id"))
    if not parts:
        raise ValueError("no searchable labels")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

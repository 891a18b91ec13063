"""The reference's cache-integration scenarios, ported 1:1.

Source: `/root/reference/tests/cache_integration_test.rs` — node-read
hit/miss accounting, write-invalidation, adjacency caching, and the
cache-disabled path. Our cache is `plans.cache.QueryCache` (result
reuse keyed by query fingerprint, invalidated per source table — the
write-hook shape of `src/cache/manager.rs:200-345`); Spark's `persist`
holds the data, the QueryCache adds the reuse + accounting the
reference scenarios pin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
from rs_graphdb_spark.operators.dml import delete_nodes
from rs_graphdb_spark.plans.cache import QueryCache
from rs_graphdb_spark.session import local_df


@pytest.fixture()
def g(spark):
    return PropertyGraph(
        nodes={"User": local_df(spark, [(1, "Alice", 30), (2, "Bob", 25)],
                                "id long, name string, age long")},
        edges={"FRIEND": EdgeSet(
            df=local_df(spark, [(1, 1, 2)], "edge_id long, src long, dst long"),
            src_label="User", dst_label="User")},
    )


def test_cache_integration_basic(g):
    """cache_integration_test.rs:16-45: first read misses, second hits,
    both return the same row."""
    cache = QueryCache()
    fetch = lambda: cache.get_or_compute(
        "node:User:1", lambda: g.nodes["User"].filter(F.col("id") == 1),
        tables=("User",))
    n1 = fetch().first()
    n2 = fetch().first()
    assert n1 == n2 and n1["name"] == "Alice"
    s = cache.stats()
    assert s["hits"] == 1 and s["misses"] == 1


def test_cache_invalidation_on_update(g):
    """cache_integration_test.rs:47-76: a delete invalidates the cached
    read; the re-read sees the node gone."""
    cache = QueryCache()
    fetch = lambda gr: cache.get_or_compute(
        "node:User:1", lambda: gr.nodes["User"].filter(F.col("id") == 1),
        tables=("User",))
    assert fetch(g).count() == 1
    assert cache.stats()["misses"] == 1 and cache.stats()["hits"] == 0
    g2 = delete_nodes(g, "User", F.col("id") == 1)
    evicted = cache.invalidate_table("User")  # the write hook
    assert evicted == 1
    assert fetch(g2).count() == 0  # fresh read, node gone


def test_adjacency_cache(g):
    """cache_integration_test.rs:77-105: out-neighbor reads reuse the
    cached frame and agree."""
    cache = QueryCache()
    fetch = lambda: cache.get_or_compute(
        "adj:out:1",
        lambda: g.edges["FRIEND"].df.filter(F.col("src") == 1).select("dst"),
        tables=("FRIEND",))
    n1 = [r["dst"] for r in fetch().collect()]
    n2 = [r["dst"] for r in fetch().collect()]
    assert n1 == n2 == [2]
    assert cache.stats()["hits"] == 1


def test_cache_report_shape(g):
    """cache_integration_test.rs:106-130: the stats report exists and
    counts one miss after a single cold read."""
    cache = QueryCache()
    cache.get_or_compute("node:User:1",
                         lambda: g.nodes["User"].filter(F.col("id") == 1),
                         tables=("User",))
    s = cache.stats()
    assert s == {"entries": 1, "hits": 0, "misses": 1}


def test_cache_disabled(g):
    """cache_integration_test.rs:131-150: reads work identically without
    any cache in the path."""
    row = g.nodes["User"].filter(F.col("id") == 1).first()
    assert row is not None and row["name"] == "Alice"

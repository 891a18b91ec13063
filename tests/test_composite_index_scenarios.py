"""The reference's composite-index scenarios, ported 1:1.

Source: `/root/reference/tests/composite_index_test.rs`. The catalog is
`plans.physical.CompositeIndexCatalog`; probes are pushed filter
conjunctions (partition-pruned on the bucketed layout — asserted by the
q97 driver part, so not re-asserted here).
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.plans.physical import CompositeIndexCatalog
from rs_graphdb_spark.session import local_df

SCHEMA = "id long, name string, age long, email string"


def _users(spark, rows):
    return PropertyGraph(nodes={"User": local_df(spark, rows, SCHEMA)}, edges={})


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_create_composite_index(spark):
    """composite_index_test.rs:17-36: stats go from 0 entries to >0 as
    nodes arrive."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g0 = _users(spark, [])
    assert cat.index_stats(g0) == (1, 0)
    g = _users(spark, [(1, "Alice", 30, "a@x.com"), (2, "Bob", 25, "b@x.com"),
                       (3, "Charlie", 30, "c@x.com")])
    n_idx, entries = cat.index_stats(g)
    assert n_idx == 1 and entries == 3


def test_find_by_composite_index(spark):
    """composite_index_test.rs:38-63."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [(1, "Alice", 30, "a@x.com"), (2, "Bob", 25, "b@x.com"),
                       (3, "Charlie", 30, "c@x.com"), (4, "David", 35, "d@x.com")])
    assert _ids(cat.find_by_composite_index(g, "User", ["name", "age"],
                                            ["Alice", 30])) == [1]


def test_find_by_composite_index_multiple_results(spark):
    """composite_index_test.rs:65-93: duplicate (name, age) pairs both
    match."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [(1, "Alice", 30, "a1@x.com"), (2, "Alice", 30, "a2@x.com"),
                       (3, "Bob", 25, "b@x.com")])
    assert _ids(cat.find_by_composite_index(g, "User", ["name", "age"],
                                            ["Alice", 30])) == [1, 2]


def test_find_by_composite_index_not_found(spark):
    """composite_index_test.rs:95-115."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [(1, "Alice", 30, "a@x.com"), (2, "Bob", 25, "b@x.com")])
    assert _ids(cat.find_by_composite_index(g, "User", ["name", "age"],
                                            ["Charlie", 35])) == []


def test_three_property_composite_index(spark):
    """composite_index_test.rs:117-143: all three must match."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("u3", "User", ["name", "age", "email"])
    g = _users(spark, [(1, "Alice", 30, "a@x.com"), (2, "Alice", 30, "z@x.com")])
    assert _ids(cat.find_by_composite_index(
        g, "User", ["name", "age", "email"], ["Alice", 30, "a@x.com"])) == [1]


def test_drop_composite_index(spark):
    """composite_index_test.rs:145-163: drop once true, twice false; a
    probe against the dropped index errors."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    assert cat.drop_composite_index("user_name_age") is True
    assert cat.drop_composite_index("user_name_age") is False
    g = _users(spark, [(1, "Alice", 30, "a@x.com")])
    with pytest.raises(KeyError):
        cat.find_by_composite_index(g, "User", ["name", "age"], ["Alice", 30])


def test_composite_index_with_new_nodes(spark):
    """composite_index_test.rs:164-189: nodes added after index creation
    are found (no staleness in the scan-based probe)."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [(1, "Alice", 30, "a@x.com")])
    g2 = PropertyGraph(nodes={"User": g.nodes["User"].unionByName(
        local_df(spark, [(2, "Bob", 25, "b@x.com"),
                         (3, "Charlie", 30, "c@x.com")], SCHEMA))}, edges={})
    assert _ids(cat.find_by_composite_index(g2, "User", ["name", "age"],
                                            ["Bob", 25])) == [2]


def test_composite_index_partial_properties(spark):
    """composite_index_test.rs:190-218: a node missing an indexed
    property is never matched and never counted as an entry."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [(1, "Alice", 30, "a@x.com"), (2, "Bob", None, "b@x.com")])
    assert _ids(cat.find_by_composite_index(g, "User", ["name", "age"],
                                            ["Alice", 30])) == [1]
    assert cat.index_stats(g) == (1, 1)  # Bob lacks age → not an entry


def test_multiple_composite_indexes(spark):
    """composite_index_test.rs:220-253: three indexes, each probeable."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("n_a", "User", ["name", "age"])
    cat.create_composite_index("n_e", "User", ["name", "email"])
    cat.create_composite_index("a_e", "User", ["age", "email"])
    g = _users(spark, [(1, "Alice", 30, "alice@example.com")])
    assert _ids(cat.find_by_composite_index(
        g, "User", ["name", "age"], ["Alice", 30])) == [1]
    assert _ids(cat.find_by_composite_index(
        g, "User", ["name", "email"], ["Alice", "alice@example.com"])) == [1]
    assert _ids(cat.find_by_composite_index(
        g, "User", ["age", "email"], [30, "alice@example.com"])) == [1]


def test_composite_index_duplicate_pairs_at_scale(spark):
    """composite_index_test.rs:255-287: (User5, 45) occurs twice among
    100 rows."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    rows = [(i, f"User{i % 10}", 20 + (i % 50), f"user{i}@example.com")
            for i in range(100)]
    g = _users(spark, rows)
    ids = _ids(cat.find_by_composite_index(g, "User", ["name", "age"],
                                           ["User5", 45]))
    assert len(ids) == 2


def test_composite_index_empty_result_on_empty_table(spark):
    """composite_index_test.rs:288-303."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [])
    assert _ids(cat.find_by_composite_index(g, "User", ["name", "age"],
                                            ["Alice", 30])) == []


def test_find_prefix_leading_column(spark):
    """`src/index_composite.rs:181-225`: prefix probe on the leading
    column(s) only."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [(1, "Alice", 30, "a@x.com"), (2, "Alice", 25, "b@x.com"),
                       (3, "Bob", 30, "c@x.com")])
    assert _ids(cat.find_prefix(g, "User", ["name", "age"], ["Alice"])) == [1, 2]
    assert _ids(cat.find_prefix(g, "User", ["name", "age"],
                                ["Alice", 30])) == [1]
    with pytest.raises(ValueError):
        cat.find_prefix(g, "User", ["name", "age"], [])


def test_find_by_composite_index_rejects_arity_mismatch(spark):
    """An under-supplied values list must raise, not silently degrade to
    a prefix probe (find_prefix is the intentional form for that)."""
    cat = CompositeIndexCatalog()
    cat.create_composite_index("user_name_age", "User", ["name", "age"])
    g = _users(spark, [(1, "Alice", 30, "a@x.com"), (2, "Alice", 25, "b@x.com")])
    with pytest.raises(ValueError):
        cat.find_by_composite_index(g, "User", ["name", "age"], ["Alice"])
    with pytest.raises(ValueError):
        cat.find_by_composite_index(g, "User", ["name", "age"],
                                    ["Alice", 30, 99])

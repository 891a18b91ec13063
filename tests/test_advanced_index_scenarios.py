"""The reference's advanced-index scenarios, ported 1:1.

Source: `/root/reference/tests/advanced_index_test.rs` — full-text index
(OR/AND search, case-insensitivity, multi-word, multi-property,
multi-label) and range index (int/float, between, boundary, empty). The
reference maintains explicit inverted/BTree side-indexes
(`src/index_advanced.rs`); Spark-side the same predicates are pushed
into the columnar scan (tokenized `fulltext_any/_all`, native range
filters), so every scenario here pins the QUERY SEMANTICS those indexes
serve rather than index plumbing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_graphdb_spark.functions.text import fulltext_all, fulltext_any
from rs_graphdb_spark.session import local_df


@pytest.fixture()
def users(spark):
    return local_df(spark, [
        (1, "Alice", 30, "software engineer"),
        (2, "Bob", 25, "data scientist"),
        (3, "Charlie", 35, "machine learning engineer"),
    ], "id long, name string, age long, bio string")


def _ids(df, cond):
    return {r["id"] for r in df.filter(cond).select("id").collect()}


def test_fulltext_index_add_and_search(users):
    """advanced_index_test.rs:25-48: single-term OR search."""
    assert _ids(users, fulltext_any("bio", ["engineer"])) == {1, 3}
    assert 2 in _ids(users, fulltext_any("bio", ["data"]))


def test_fulltext_index_search_and(spark):
    """advanced_index_test.rs:50-73: AND search needs every term."""
    df = local_df(spark, [
        (1, "machine learning engineer"),
        (2, "machine learning"),
        (3, "deep learning"),
    ], "id long, bio string")
    assert _ids(df, fulltext_all("bio", ["machine", "learning"])) == {1, 2}
    assert _ids(df, fulltext_all("bio", ["learning", "engineer"])) == {1}


def test_fulltext_index_case_insensitive(spark):
    """advanced_index_test.rs:75-90: tokenization lowercases both
    sides."""
    df = local_df(spark, [(1, "Software Developer")], "id long, bio string")
    assert _ids(df, fulltext_any("bio", ["software"])) == {1}
    assert _ids(df, fulltext_any("bio", ["developer"])) == {1}


def test_fulltext_index_empty_result(users):
    """advanced_index_test.rs:92-104."""
    assert _ids(users, fulltext_any("bio", ["astronaut"])) == set()


def test_fulltext_index_multiple_words(users):
    """advanced_index_test.rs:106-125: each word matches
    independently in OR mode."""
    assert _ids(users, fulltext_any("bio", ["software", "data"])) == {1, 2}


def test_fulltext_index_with_multiple_properties(spark):
    """advanced_index_test.rs:285-315: per-property search."""
    df = local_df(spark, [(1, "Alice Smith", "software engineer")],
                  "id long, name string, bio string")
    assert _ids(df, fulltext_any("name", ["alice"])) == {1}
    assert _ids(df, fulltext_any("name", ["smith"])) == {1}
    assert _ids(df, fulltext_any("bio", ["software"])) == {1}
    assert _ids(df, fulltext_any("bio", ["smith"])) == set()


def test_multiple_labels_indexing(spark):
    """advanced_index_test.rs:259-283: label-scoped search."""
    user = local_df(spark, [(1, "engineer"), (2, "student")],
                    "id long, bio string")
    employee = local_df(spark, [(1, "engineer")], "id long, bio string")
    assert _ids(user, fulltext_any("bio", ["engineer"])) == {1}
    assert _ids(employee, fulltext_any("bio", ["engineer"])) == {1}
    assert _ids(employee, fulltext_any("bio", ["student"])) == set()


# ========== range index (advanced_index_test.rs:127-245) ===================

@pytest.fixture()
def products(spark):
    return local_df(spark, [
        (1, "Product A", 10.0), (2, "Product B", 20.0),
        (3, "Product C", 30.0), (4, "Product D", 40.0),
    ], "id long, name string, price double")


def test_range_index_add_and_query(users):
    """advanced_index_test.rs:127-154: strict greater/less than."""
    assert _ids(users, F.col("age") > 28) == {1, 3}
    assert _ids(users, F.col("age") < 28) == {2}


def test_range_index_between(users):
    """advanced_index_test.rs:156-176: inclusive between."""
    assert _ids(users, F.col("age").between(25, 30)) == {1, 2}


def test_range_index_float(products):
    """advanced_index_test.rs:178-205: float between + greater-than."""
    assert _ids(products, F.col("price").between(15.0, 35.0)) == {2, 3}
    assert _ids(products, F.col("price") > 25.0) == {3, 4}


def test_range_index_empty_result(users):
    """advanced_index_test.rs:207-222."""
    assert _ids(users, F.col("age") > 100) == set()
    assert _ids(users, F.col("age") < 10) == set()


def test_range_index_boundary_values(spark):
    """advanced_index_test.rs:224-245: boundaries just outside the
    values keep both rows."""
    df = local_df(spark, [(1, 25), (2, 30)], "id long, age long")
    assert _ids(df, F.col("age") > 24) == {1, 2}
    assert _ids(df, F.col("age") < 31) == {1, 2}


def test_combined_fulltext_and_range(users):
    """advanced_index_test.rs:247-257: conjunction of a full-text and a
    range predicate — one scan, both pushed."""
    combined = _ids(users, fulltext_any("bio", ["engineer"]) & (F.col("age") > 28))
    assert combined == {1, 3}
    assert 3 in combined  # charlie, as the reference asserts

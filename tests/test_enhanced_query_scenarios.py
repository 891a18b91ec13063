"""The reference's enhanced-query scenarios, ported 1:1.

Source: `/root/reference/tests/enhanced_query_test.rs` — `=~` regex,
EXISTS, IS [NOT] NULL, IN, multi-field ORDER BY, and combined
conditions over the 6-user fixture (Eve has no city).

The regex scenarios pin SEARCH semantics: the reference evaluates `=~`
with Rust's ``Regex::is_match``, which matches anywhere in the string —
its own test expects '[Aa].*[Ee]' to match "Charlie". Round 3 fixed
`Query.where_prop_regex`, which wrongly anchored the pattern.
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.query import Query
from rs_graphdb_spark.session import local_df


@pytest.fixture(scope="module")
def g(spark):
    return PropertyGraph(nodes={"User": local_df(spark, [
        (1, "Alice", 30, "NYC"),
        (2, "Bob", 25, "LA"),
        (3, "Charlie", 35, "NYC"),
        (4, "David", 28, "Chicago"),
        (5, "Eve", 32, None),
        (6, "Frank", 40, "LA"),
    ], "id long, name string, age long, city string")}, edges={})


def _names(df):
    return {r["name"] for r in df.select("name").collect()}


def test_regex_match(g):
    """enhanced_query_test.rs:39-55: names starting with A."""
    df = execute_cypher(g, "MATCH (n:User) WHERE n.name =~ 'A.*' RETURN n.name AS name")
    assert _names(df) == {"Alice"}


def test_regex_match_complex(g):
    """enhanced_query_test.rs:57-79: '[Aa].*[Ee]' matches Alice AND
    Charlie — i.e. SEARCH semantics, not full-match."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.name =~ '[Aa].*[Ee]' RETURN n.name AS name")
    assert _names(df) == {"Alice", "Charlie"}


def test_regex_search_semantics_query_builder(g):
    """The fluent-builder twin of the search-semantics pin."""
    q = Query(g).from_label("User").where_prop_regex("name", "[Aa].*[Ee]")
    assert _names(q.df) == {"Alice", "Charlie"}


def test_exists_condition(g):
    """enhanced_query_test.rs:81-97: 5 users have a city."""
    df = execute_cypher(g, "MATCH (n:User) WHERE EXISTS(n.city) RETURN n.name AS name")
    assert df.count() == 5 and "Eve" not in _names(df)


def test_is_null(g):
    """enhanced_query_test.rs:99-115."""
    df = execute_cypher(g, "MATCH (n:User) WHERE n.city IS NULL RETURN n.name AS name")
    assert _names(df) == {"Eve"}


def test_is_not_null(g):
    """enhanced_query_test.rs:117-132."""
    df = execute_cypher(g, "MATCH (n:User) WHERE n.city IS NOT NULL RETURN n.name AS name")
    assert df.count() == 5


def test_in_operator_string(g):
    """enhanced_query_test.rs:134-150."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.city IN ['NYC', 'LA'] RETURN n.name AS name")
    assert _names(df) == {"Alice", "Bob", "Charlie", "Frank"}


def test_in_operator_int(g):
    """enhanced_query_test.rs:152-168."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.age IN [25, 30, 35] RETURN n.name AS name")
    assert _names(df) == {"Alice", "Bob", "Charlie"}


def test_combined_conditions(g):
    """enhanced_query_test.rs:170-186: IN + comparison conjunction."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.city IN ['NYC'] AND n.age > 30 "
           "RETURN n.name AS name")
    assert _names(df) == {"Charlie"}


def test_multi_field_order_by(g):
    """enhanced_query_test.rs:188-210: city ASC then age DESC."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.city IS NOT NULL "
           "RETURN n.name AS name, n.city AS city, n.age AS age "
           "ORDER BY city ASC, age DESC")
    rows = [(r["city"], r["age"]) for r in df.collect()]
    assert rows == [("Chicago", 28), ("LA", 40), ("LA", 25),
                    ("NYC", 35), ("NYC", 30)]


def test_order_by_with_null(g):
    """enhanced_query_test.rs:212-227: NULL city sorts without dropping
    rows; we additionally pin nulls-last (`src/query.rs:441-468`)."""
    df = execute_cypher(
        g, "MATCH (n:User) RETURN n.name AS name, n.city AS city ORDER BY city ASC")
    rows = df.collect()
    assert len(rows) == 6
    assert rows[-1]["name"] == "Eve"  # null city last


def test_regex_with_and_condition(g):
    """enhanced_query_test.rs:229-253: regex + AND; Eve (32, contains
    'e') is included."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.name =~ '.*e.*' AND n.age > 30 "
           "RETURN n.name AS name")
    assert "Eve" in _names(df)
    assert _names(df) == {"Charlie", "Eve"}  # names containing lowercase e, age>30


def test_or_with_in(g):
    """enhanced_query_test.rs:255-272: NYC members OR age > 35."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE n.city IN ['NYC'] OR n.age > 35 "
           "RETURN n.name AS name")
    assert _names(df) == {"Alice", "Charlie", "Frank"}


def test_parenthesized_conditions(g):
    """enhanced_query_test.rs:274-292: (age<30 OR age>35) AND city set."""
    df = execute_cypher(
        g, "MATCH (n:User) WHERE (n.age < 30 OR n.age > 35) AND "
           "n.city IS NOT NULL RETURN n.name AS name")
    assert _names(df) == {"Bob", "David", "Frank"}

"""The reference's enhanced CALL-subquery scenarios, ported 1:1.

Source: `/root/reference/tests/call_enhanced_test.rs`. The reference
treats `IN (...)` as syntax-only and SKIPS several WITH forms its parser
rejects; we execute strictly more of them (leading WITH literal
bindings, WITH + WHERE chains) and mirror the rest.
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.cypher import execute_cypher
from rs_graphdb_spark.cypher.parser import CypherSyntaxError, parse_cypher
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.session import local_df


@pytest.fixture()
def people(spark):
    return PropertyGraph(nodes={"Person": local_df(spark, [
        (1, "Alice", 30, "NYC"),
        (2, "Bob", 25, "LA"),
        (3, "Charlie", 35, "Chicago"),
    ], "id long, name string, age long, city string")}, edges={})


def test_call_with_in_clause_executes(people):
    """call_enhanced_test.rs:18-47: the subquery filter applies; IN is a
    pass-through."""
    df = execute_cypher(
        people,
        "CALL { MATCH (p:Person) WHERE p.age > 28 RETURN p.name AS name } "
        "IN (p) RETURN name",
    )
    assert {r["name"] for r in df.collect()} == {"Alice", "Charlie"}


def test_call_parse_in_clause():
    """call_enhanced_test.rs:49-74: IN vars land on the AST; absent IN
    leaves them empty."""
    s1 = parse_cypher(
        "CALL { MATCH (p:Person) RETURN p.name AS name } IN (p) RETURN name")
    assert s1.input_vars == ("p",)
    s2 = parse_cypher(
        "CALL { MATCH (p:Person) RETURN p.name AS name, p.age AS age } "
        "IN (p, name) RETURN name")
    assert s2.input_vars == ("p", "name")
    s3 = parse_cypher(
        "CALL { MATCH (p:Person) RETURN p.name AS name } RETURN name")
    assert s3.input_vars == ()


def test_call_in_with_multiple_vars(people):
    """call_enhanced_test.rs:223-251: three IN vars recorded, query still
    executes."""
    q = ("CALL { MATCH (p:Person) RETURN p.name AS name, p.age AS age, "
         "p.city AS city } IN (name, age, city) RETURN name")
    stmt = parse_cypher(q)
    assert stmt.input_vars == ("name", "age", "city")
    assert execute_cypher(people, q).count() == 3


def test_call_with_leading_with_literal(people):
    """call_enhanced_test.rs:77-106: the reference SKIPS this parse; we
    execute it — a leading WITH binds the literal for the WHERE."""
    df = execute_cypher(
        people,
        "CALL { WITH 28 AS min_age MATCH (p:Person) "
        "WHERE p.age > min_age RETURN p.name AS name } RETURN name",
    )
    assert {r["name"] for r in df.collect()} == {"Alice", "Charlie"}


def test_call_with_with_and_filter(people):
    """call_enhanced_test.rs:108-137: WITH + WHERE chains inside the
    subquery (the reference skips; we run it)."""
    g = people
    df = execute_cypher(
        g,
        "CALL { MATCH (p:Person) WHERE p.age > 24 WITH p "
        "WHERE p.age < 31 RETURN p.name AS name } RETURN name",
    )
    assert {r["name"] for r in df.collect()} == {"Alice", "Bob"}


def test_call_return_multiple_items(people):
    """call_enhanced_test.rs:199-221: outer RETURN selects a subset of
    the inner columns."""
    df = execute_cypher(
        people,
        "CALL { MATCH (p:Person) RETURN p.name AS name, p.age AS age } "
        "RETURN name",
    )
    assert df.columns == ["name"] and df.count() == 3


def test_call_preserve_with_returns():
    """call_enhanced_test.rs:253-270: the subquery's RETURN items are
    preserved on the AST."""
    s = parse_cypher("CALL { MATCH (p:Person) RETURN p.name AS name } RETURN name")
    assert len(s.inner.items) == 1
    s2 = parse_cypher(
        "CALL { MATCH (p:Person) RETURN p.name AS n, p.age AS a } RETURN n")
    assert len(s2.inner.items) == 2


def test_leading_with_literals_standalone(people):
    """Leading WITH outside CALL, incl. multiple bindings and string
    literals."""
    df = execute_cypher(
        people,
        "WITH 'NYC' AS target MATCH (p:Person) WHERE p.city = target "
        "RETURN p.name AS name",
    )
    assert [r["name"] for r in df.collect()] == ["Alice"]
    df2 = execute_cypher(
        people,
        "WITH 20 AS lo, 31 AS hi MATCH (p:Person) "
        "WHERE p.age > lo AND p.age < hi RETURN p.name AS name",
    )
    assert {r["name"] for r in df2.collect()} == {"Alice", "Bob"}


def test_leading_with_does_not_clobber_aliases(people):
    """A RETURN alias sharing a bound name stays an alias."""
    df = execute_cypher(
        people,
        "WITH 28 AS cutoff MATCH (p:Person) WHERE p.age > cutoff "
        "RETURN p.name AS cutoff",
    )
    assert df.columns == ["cutoff"]
    assert {r["cutoff"] for r in df.collect()} == {"Alice", "Charlie"}


def test_leading_with_rejects_non_literal(people):
    """Only scalar literals are bindable at statement start."""
    with pytest.raises(CypherSyntaxError):
        execute_cypher(people, "WITH [1, 2] AS xs MATCH (p:Person) RETURN p")

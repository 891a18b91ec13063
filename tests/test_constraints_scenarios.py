"""The reference's constraint-registry scenarios, ported 1:1.

Source: `/root/reference/tests/constraints_test.rs` (uniqueness +
existence constraints, registry add/drop/list, duplicate-add rejection,
NULL semantics, per-label scoping). The registry is
`rs_graphdb_spark.operators.dml.ConstraintRegistry`; validation runs as
Spark jobs over the label tables.

Divergence note: the reference's multi-label node (`:User:Product`,
constraints_test.rs:259-287) has no direct analog in the label-table
model — the scenario is ported as validating the same logical node
under each label's constraint set.
"""

from __future__ import annotations

import pytest

from rs_graphdb_spark.operators.dml import Constraint, ConstraintRegistry
from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.session import local_df


def _user_graph(spark, rows, schema="id long, name string, email string"):
    return PropertyGraph(nodes={"User": local_df(spark, rows, schema)}, edges={})


def test_uniqueness_constraint_violation_detected(spark):
    """constraints_test.rs:7-41: duplicate email is flagged with a
    message naming the property; the first copy alone is Valid."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.uniqueness("User", "email"))
    g1 = _user_graph(spark, [(1, "Alice", "alice@example.com")])
    assert reg.validate_node(g1, "User", 1) is None
    g2 = _user_graph(spark, [
        (1, "Alice", "alice@example.com"),
        (2, "Alice Clone", "alice@example.com"),
    ])
    msg = reg.validate_node(g2, "User", 2)
    assert msg is not None
    assert "Uniqueness constraint violated" in msg and "email" in msg


def test_existence_constraint_violation_detected(spark):
    """constraints_test.rs:43-77: a node missing the required property
    violates; one carrying it is Valid."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.existence("User", "email"))
    g = _user_graph(spark, [
        (1, "Alice", "alice@example.com"),
        (2, "Bob", None),
    ])
    assert reg.validate_node(g, "User", 1) is None
    msg = reg.validate_node(g, "User", 2)
    assert msg is not None
    assert "missing required property" in msg and "email" in msg


def test_multiple_constraints_on_same_label(spark):
    """constraints_test.rs:79-148: three constraints; each kind of
    violation is reported with its own property name."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.existence("User", "name"))
    reg.add_constraint(Constraint.existence("User", "email"))
    reg.add_constraint(Constraint.uniqueness("User", "email"))
    g_pre = _user_graph(spark, [(1, "Alice", "alice@example.com")])
    assert reg.validate_node(g_pre, "User", 1) is None  # before any dup
    g = _user_graph(spark, [
        (1, "Alice", "alice@example.com"),
        (2, None, "bob@example.com"),                 # missing name
        (3, "Charlie", "alice@example.com"),          # duplicate email
    ])
    assert "name" in reg.validate_node(g, "User", 2)
    assert "email" in reg.validate_node(g, "User", 3)


def test_constraints_only_apply_to_matching_label(spark):
    """constraints_test.rs:142-168: a User constraint never fires for a
    Product node."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.existence("User", "email"))
    g = PropertyGraph(nodes={
        "User": local_df(spark, [(1, "Alice", "a@x.com")],
                         "id long, name string, email string"),
        "Product": local_df(spark, [(1, "Widget")], "id long, name string"),
    }, edges={})
    assert reg.validate_node(g, "Product", 1) is None
    assert reg.get_constraints_for_label("Product") == ()


def test_drop_constraint(spark):
    """constraints_test.rs:170-201: dropping removes it; validation then
    passes on what would have violated."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.uniqueness("User", "email"))
    assert reg.count() == 1
    assert reg.drop_constraint("User", "email", "uniqueness") is True
    assert reg.count() == 0
    assert reg.drop_constraint("User", "email", "uniqueness") is False
    g = _user_graph(spark, [
        (1, "Alice", "alice@example.com"),
        (2, "Alice2", "alice@example.com"),
    ])
    assert reg.validate_node(g, "User", 2) is None


def test_get_all_constraints():
    """constraints_test.rs:203-227: global list + per-label filtering."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.uniqueness("User", "email"))
    reg.add_constraint(Constraint.existence("User", "name"))
    reg.add_constraint(Constraint.uniqueness("Product", "sku"))
    assert len(reg.get_all_constraints()) == 3
    assert len(reg.get_constraints_for_label("User")) == 2
    assert len(reg.get_constraints_for_label("Product")) == 1


def test_multiple_labels_with_constraints(spark):
    """constraints_test.rs:259-287 (adapted, see module docstring): the
    same logical entity satisfies User's constraints but violates
    Product's."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.existence("User", "name"))
    reg.add_constraint(Constraint.existence("Product", "price"))
    g = PropertyGraph(nodes={
        "User": local_df(spark, [(1, "Alice")], "id long, name string"),
        "Product": local_df(spark, [(1, "Alice", None)],
                            "id long, name string, price double"),
    }, edges={})
    assert reg.validate_node(g, "User", 1) is None
    assert "price" in reg.validate_node(g, "Product", 1)


def test_constraint_validation_over_dataset(spark):
    """constraints_test.rs:289-317 scaled shape: 100 unique users are
    all Valid — validated set-at-a-time (one job per constraint), the
    form that holds at large table sizes."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.uniqueness("User", "uid"))
    g = PropertyGraph(nodes={"User": local_df(
        spark, [(i, i, f"User{i}") for i in range(100)],
        "id long, uid long, name string")}, edges={})
    counts = reg.validate_all(g)
    assert counts[Constraint.uniqueness("User", "uid")] == 0


def test_add_duplicate_constraint():
    """constraints_test.rs:319-339: re-adding the same constraint is an
    error naming the conflict."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.uniqueness("User", "email"))
    with pytest.raises(ValueError, match="already exists"):
        reg.add_constraint(Constraint.uniqueness("User", "email"))


def test_constraint_with_null_values(spark):
    """constraints_test.rs:341-365: two NULLs are NOT duplicates under a
    uniqueness constraint (ANSI-unique semantics), and a present value
    alongside NULLs is Valid."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.uniqueness("User", "optional_field"))
    g = PropertyGraph(nodes={"User": local_df(spark, [
        (1, "Alice", None),
        (2, "Bob", None),
        (3, "Charlie", "value"),
    ], "id long, name string, optional_field string")}, edges={})
    assert reg.validate_node(g, "User", 1) is None
    assert reg.validate_node(g, "User", 2) is None
    assert reg.validate_node(g, "User", 3) is None
    counts = reg.validate_all(g)
    assert counts[Constraint.uniqueness("User", "optional_field")] == 0


def test_validate_all_counts_violations(spark):
    """Set-at-a-time validation reports per-constraint violation counts
    (the bulk-audit form of `src/constraints/mod.rs:143-213`)."""
    reg = ConstraintRegistry()
    reg.add_constraint(Constraint.uniqueness("User", "email"))
    reg.add_constraint(Constraint.existence("User", "name"))
    g = _user_graph(spark, [
        (1, "Alice", "dup@x.com"),
        (2, None, "dup@x.com"),
        (3, None, "solo@x.com"),
    ])
    counts = reg.validate_all(g)
    assert counts[Constraint.uniqueness("User", "email")] == 1   # one dup group
    assert counts[Constraint.existence("User", "name")] == 2     # two null names

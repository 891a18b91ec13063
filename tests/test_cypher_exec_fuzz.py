"""Execution-differential Cypher fuzzing (r5 VERDICT item #8).

The r4/r5 grammar fuzzer pins parse/AST classes and that read queries
COMPILE; this file EXECUTES every generated read statement on a seeded
micro-graph and compares row multisets against a straightforward Python
interpreter twin written directly from the AST semantics (pattern
expansion, BFS set-distance var-length, three-valued WHERE logic,
implicit-grouping aggregates, nulls-last ORDER BY, SKIP/LIMIT).

Comparison contract:
- no SKIP/LIMIT → full row-multiset equality (column-name keyed);
- SKIP/LIMIT present → row COUNT equality (tie selection at the cut is
  legitimately engine-specific), plus the ORDER BY key multiset when an
  ORDER BY pins it;
- any ORDER BY → the Spark output must actually be sorted under the
  nulls-last contract.

(Upgraded analog of the reference's `tests/parser_debug_test.rs`
scaffolds, per the round-6 plan.)
"""

from __future__ import annotations

import math
import os
import random
import re

import pytest

from tests.test_cypher import _gen_statement

# r11 test-budget fix (r10 VERDICT #1: the driver's pytest run timed out
# unreadably): the default run executes a deterministic PREFIX of the
# same seeded statement stream — strictly a subset of the r10 coverage,
# same seed, same generator — at ~0.45 s/query on local[32] the full 500
# was 4 minutes of a budget-limited suite. SPARK_GRAFT_FUZZ_N=500
# restores the full sweep (used in the round's own verification runs).
N_EXECUTED = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "150"))
SEED = 20260816


# ---------------------------------------------------------------- fixture

@pytest.fixture(scope="module")
def micro(spark):
    """Seeded micro-graph matching the fuzzer's schema (labels, props,
    literal ranges), with deliberate NULL props to exercise three-valued
    logic, plus its plain-Python twin tables."""
    from rs_graphdb_spark.graph import EdgeSet, PropertyGraph
    from rs_graphdb_spark.session import local_df

    rng = random.Random(0xF00D)

    def maybe_null(v, p=0.15):
        return None if rng.random() < p else v

    customers = [
        {
            "id": i,
            "c_custkey": maybe_null(rng.randrange(0, 500)),
            "c_acctbal": maybe_null(round(rng.uniform(0, 9), 4)),
            "c_name": maybe_null(rng.choice(["ae", "b c", "x", "GERMANY",
                                             "zed"])),
        }
        for i in range(20)
    ]
    orders = [
        {
            "id": 100 + i,
            "o_orderkey": maybe_null(rng.randrange(0, 500)),
            "o_totalprice": maybe_null(round(rng.uniform(0, 9), 4)),
        }
        for i in range(12)
    ]
    nations = [
        {
            "id": 200 + i,
            "n_nationkey": maybe_null(rng.randrange(0, 500)),
            "n_name": maybe_null(rng.choice(["ae", "GERMANY", "x"])),
        }
        for i in range(8)
    ]
    parts = [
        {
            "id": 300 + i,
            "p_partkey": maybe_null(rng.randrange(0, 500)),
            "p_size": maybe_null(rng.randrange(0, 500)),
        }
        for i in range(10)
    ]
    knows = sorted({
        (rng.randrange(20), rng.randrange(20)) for _ in range(35)
    })
    knows = [(s, d) for s, d in knows if s != d]

    def df(rows, schema):
        cols = schema.split(",")
        names = [c.split()[0] for c in cols]
        return local_df(
            spark, [tuple(r[n] for n in names) for r in rows], schema
        )

    g = PropertyGraph(
        nodes={
            "Customer": df(customers,
                           "id long, c_custkey long, c_acctbal double, "
                           "c_name string"),
            "Order": df(orders,
                        "id long, o_orderkey long, o_totalprice double"),
            "Nation": df(nations,
                         "id long, n_nationkey long, n_name string"),
            "Part": df(parts, "id long, p_partkey long, p_size long"),
        },
        edges={
            "KNOWS": EdgeSet(
                df=local_df(spark, knows, "src long, dst long"),
                src_label="Customer",
                dst_label="Customer",
            )
        },
    )
    tables = {
        "Customer": customers, "Order": orders,
        "Nation": nations, "Part": parts,
    }
    return g, tables, {"KNOWS": ("Customer", "Customer", knows)}


# ----------------------------------------------------------- interpreter

def _node_rows(np_, label_hint, tables):
    label = np_.label or label_hint
    out = []
    for r in tables.get(label, []):
        # inline props: SQL equality — a NULL prop never matches
        if all(r.get(k) is not None and r.get(k) == v for k, v in np_.props):
            out.append(r)
    return out, label


def _adj(pairs, direction):
    if direction == "in":
        pairs = [(d, s) for s, d in pairs]
    elif direction == "both":
        pairs = pairs + [(d, s) for s, d in pairs]
    m: dict = {}
    for s, d in pairs:
        m.setdefault(s, []).append(d)
    return m


def _path_bindings(path, tables, edges):
    rows, _label = _node_rows(path.start, None, tables)
    binds = [{path.start.var: r} for r in rows]
    prev = path.start
    for rel, node in path.hops:
        src_label, dst_label, pairs = edges[rel.rel_type]
        adj = _adj(pairs, rel.direction)
        nrows, _ = _node_rows(node, dst_label, tables)
        by_id = {r["id"]: r for r in nrows}
        new = []
        if (rel.min_hops, rel.max_hops) == (1, 1):
            for b in binds:
                for d in adj.get(b[prev.var]["id"], []):
                    if d in by_id:
                        nb = dict(b)
                        nb[node.var] = by_id[d]
                        new.append(nb)
        else:
            hi = rel.max_hops if rel.max_hops is not None else 10 ** 9
            for b in binds:
                o = b[prev.var]["id"]
                # BFS set-distance (mirror of compiler._var_length_pairs:
                # a node appears once, at its shortest distance)
                dist = {o: 0}
                frontier, depth = [o], 0
                while frontier and depth < hi:
                    depth += 1
                    nxt = []
                    for u in frontier:
                        for v in adj.get(u, []):
                            if v not in dist:
                                dist[v] = depth
                                nxt.append(v)
                    frontier = nxt
                for c, dd in dist.items():
                    if rel.min_hops <= dd <= hi and c in by_id:
                        nb = dict(b)
                        nb[node.var] = by_id[c]
                        new.append(nb)
        binds = new
        prev = node
    return binds


def _join_bindings(left, right, optional):
    """Compiler joins on every shared variable's columns — SQL equality,
    so a NULL column never matches; OPTIONAL keeps unmatched left rows
    with the right side's new vars absent (→ NULL projections)."""
    if not left:
        return []
    shared = set(left[0]) & (set(right[0]) if right else set())

    def match(lb, rb):
        for v in shared:
            lr, rr = lb[v], rb[v]
            for k in lr:
                if lr[k] is None or rr.get(k) is None or lr[k] != rr[k]:
                    return False
        return True

    out = []
    for lb in left:
        hits = [rb for rb in right if match(lb, rb)] if right else []
        if not shared and right:
            hits = list(right)  # cross join
        for rb in hits:
            nb = dict(lb)
            nb.update({v: r for v, r in rb.items() if v not in lb})
            out.append(nb)
        if optional and not hits:
            out.append(dict(lb))
    return out


def _ev_operand(x, b):
    from rs_graphdb_spark.cypher import ast

    if isinstance(x, ast.Prop):
        row = b.get(x.var)
        return None if row is None else row.get(x.key)
    if isinstance(x, ast.Lit):
        return x.value
    raise AssertionError(f"operand {x!r}")


def _ev_cond(c, b):
    """Kleene three-valued logic, mirroring Spark SQL."""
    from rs_graphdb_spark.cypher import ast

    if isinstance(c, ast.BoolOp):
        vals = [_ev_cond(i, b) for i in c.items]
        if c.op == "and":
            if any(v is False for v in vals):
                return False
            return None if any(v is None for v in vals) else True
        if any(v is True for v in vals):
            return True
        return None if any(v is None for v in vals) else False
    if isinstance(c, ast.Not):
        v = _ev_cond(c.item, b)
        return None if v is None else (not v)
    if isinstance(c, ast.IsNull):
        v = _ev_operand(c.expr, b)
        return (v is not None) if c.negate else (v is None)
    if isinstance(c, ast.Exists):
        return _ev_operand(c.expr, b) is not None
    if isinstance(c, ast.Cmp):
        left = _ev_operand(c.left, b)
        if c.op == "=~":
            pat = c.right.value
            return None if left is None else bool(re.search(pat, str(left)))
        if c.op == "in":
            return None if left is None else left in c.right.value
        right = _ev_operand(c.right, b)
        if left is None or right is None:
            return None
        return {
            "=": left == right, "<>": left != right,
            ">": left > right, "<": left < right,
            ">=": left >= right, "<=": left <= right,
        }[c.op]
    raise AssertionError(f"cond {c!r}")


def _item_name(item):
    from rs_graphdb_spark.cypher import ast

    if item.alias:
        return item.alias
    if item.agg:
        return item.agg if item.expr is None else f"{item.agg}_{item.expr.key}"
    if isinstance(item.expr, ast.Prop):
        return item.expr.key
    return str(item.expr)


def _project(q, binds):
    from rs_graphdb_spark.cypher import ast

    def value(expr, b):
        if isinstance(expr, str):  # bare variable → its id
            row = b.get(expr)
            return None if row is None else row.get("id")
        return _ev_operand(expr, b)

    has_agg = any(i.agg for i in q.items)
    if has_agg:
        non_agg = [i for i in q.items if not i.agg]
        groups: dict = {}
        for b in binds:
            key = tuple(value(i.expr, b) for i in non_agg)
            groups.setdefault(key, []).append(b)
        rows = []
        for key, members in groups.items():
            row = {
                _item_name(i): k for i, k in zip(non_agg, key)
            }
            for i in q.items:
                if not i.agg:
                    continue
                if i.agg == "count" and i.expr is None:
                    row[_item_name(i)] = len(members)
                    continue
                vals = [_ev_operand(i.expr, m) for m in members]
                vals = [v for v in vals if v is not None]  # SQL agg nulls
                if i.agg == "count":
                    row[_item_name(i)] = (
                        len(set(vals)) if i.distinct else len(vals)
                    )
                elif i.agg == "sum":
                    row[_item_name(i)] = sum(vals) if vals else None
                elif i.agg == "avg":
                    row[_item_name(i)] = (
                        sum(vals) / len(vals) if vals else None
                    )
                elif i.agg == "min":
                    row[_item_name(i)] = min(vals) if vals else None
                elif i.agg == "max":
                    row[_item_name(i)] = max(vals) if vals else None
                else:
                    raise AssertionError(f"agg {i.agg} not in fuzzer")
            rows.append(row)
        if not non_agg and not binds:
            # global aggregate over empty input still yields one row:
            # count -> 0, value aggregates -> NULL
            rows = [{
                _item_name(i): (0 if i.agg == "count" else None)
                for i in q.items
            }]
        out = rows
    else:
        out = [
            {_item_name(i) if not isinstance(i.expr, str)
             else (i.alias or i.expr): value(i.expr, b)
             for i in q.items}
            for b in binds
        ]
    if q.ret_distinct:
        seen, ded = set(), []
        for r in out:
            key = tuple(sorted(r.items(), key=lambda kv: kv[0]))
            if key not in seen:
                seen.add(key)
                ded.append(r)
        out = ded
    if q.order_by:
        # stable multi-key sort: apply keys right-to-left; nulls last in
        # BOTH directions (the compiler's asc_nulls_last/desc_nulls_last)
        for o in reversed(q.order_by):
            name = o.key.split(".")[-1] if "." in o.key else o.key
            nn = [r for r in out if r.get(name) is not None]
            nulls = [r for r in out if r.get(name) is None]
            nn.sort(key=lambda r: r[name], reverse=not o.asc)
            out = nn + nulls
    if q.skip:
        out = out[q.skip:]
    if q.limit is not None:
        out = out[:q.limit]
    return out


def interp_stmt(stmt, tables, edges):
    """ReadQuery or UnionQuery → rows (UNION dedups whole rows, the
    compiler's dropDuplicates semantics)."""
    from rs_graphdb_spark.cypher import ast

    if isinstance(stmt, ast.UnionQuery):
        rows = []
        for p in stmt.parts:
            rows += interp_read(p, tables, edges)
        if not stmt.all:
            seen, ded = set(), []
            for r in rows:
                key = tuple(sorted(r.items(), key=lambda kv: kv[0]))
                if key not in seen:
                    seen.add(key)
                    ded.append(r)
            rows = ded
        return rows
    return interp_read(stmt, tables, edges)


def interp_read(q, tables, edges):
    from rs_graphdb_spark.cypher import ast

    binds = None
    for m in q.matches:
        if isinstance(m, ast.WithClause):
            # the parser stores clause-position WHERE as a projection-less
            # WithClause in the match sequence (compiler: filter-in-place)
            assert not m.vars and not m.props, m
            if m.where is not None:
                binds = [b for b in binds if _ev_cond(m.where, b) is True]
            continue
        assert isinstance(m, ast.MatchClause)
        for path in m.paths:
            pb = _path_bindings(path, tables, edges)
            binds = pb if binds is None else _join_bindings(
                binds, pb, m.optional
            )
    if q.where is not None:
        binds = [b for b in binds if _ev_cond(q.where, b) is True]
    return _project(q, binds)


# ----------------------------------------------------------------- tests

def _norm(rows):
    out = []
    for r in rows:
        nr = {}
        for k, v in r.items():
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "nan"
            nr[k] = v
        out.append(tuple(sorted(nr.items(), key=lambda kv: kv[0])))
    return sorted(out, key=repr)


def test_cypher_execution_differential_fuzz(micro):
    from rs_graphdb_spark.cypher.compiler import Compiler
    from rs_graphdb_spark.cypher.parser import parse_cypher

    g, tables, edges = micro
    comp = Compiler(g)
    rng = random.Random(SEED)
    n_exec = 0
    while n_exec < N_EXECUTED:
        text, want = _gen_statement(rng)
        if want not in ("ReadQuery", "UnionQuery") or ":Thing" in text:
            continue
        q = parse_cypher(text)
        got = [r.asDict() for r in comp.run(q).collect()]
        exp = interp_stmt(q, tables, edges)
        if getattr(q, "skip", None) or getattr(q, "limit", None) is not None:
            assert len(got) == len(exp), text
            if getattr(q, "order_by", ()):
                name = q.order_by[0].key.split(".")[-1]
                assert sorted(
                    (repr(r.get(name)) for r in got)
                ) == sorted(repr(r.get(name)) for r in exp), text
        else:
            assert _norm(got) == _norm(exp), text
        if getattr(q, "order_by", ()) and got:
            name = q.order_by[0].key.split(".")[-1]
            vals = [r.get(name) for r in got]
            tail_nulls = [v is None for v in vals]
            assert tail_nulls == sorted(tail_nulls), text  # nulls last
            nn = [v for v in vals if v is not None]
            asc = q.order_by[0].asc
            assert nn == sorted(nn, reverse=not asc), text
        n_exec += 1
    assert n_exec == N_EXECUTED

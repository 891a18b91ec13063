"""Cypher AST → DataFrame compiler.

The reference executes eagerly over a single ``Vec<NodeId>`` frontier
(`/root/reference/src/cypher/executor.rs:93-160`), which collapses
multi-variable queries (quirks #1-#3). Here every pattern variable is a
column namespace ``var__<prop>`` in one binding DataFrame, so

- `RETURN a, b` returns both bindings (fixes quirk #1),
- WHERE references resolve to the named variable's columns (fixes #2),
- intermediate node labels/props are enforced via the hop join (fixes #3),
- OPTIONAL MATCH compiles to a left outer join (fixes #4),
- comparisons use native Spark semantics on all types (fixes #5).

Catalyst sees one declarative plan per statement — filter pushdown, join
reordering and broadcast selection all apply; only var-length expansion
loops driver-side (same machinery as operators/traversal.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rs_graphdb_spark.cypher import ast
from rs_graphdb_spark.cypher.parser import parse_cypher
from rs_graphdb_spark.graph import PropertyGraph


class CypherCompileError(ValueError):
    pass


def _pref(var: str, col: str) -> str:
    return f"{var}__{col}"


class Compiler:
    def __init__(self, graph: PropertyGraph):
        self.g = graph

    # -- pattern compilation --------------------------------------------
    def _node_df(self, np: ast.NodePattern, label_hint: str | None) -> tuple[DataFrame, str]:
        label = np.label or label_hint
        if label is None:
            raise CypherCompileError(
                f"cannot infer label for node variable {np.var!r}"
            )
        if label not in self.g.nodes:
            # reference parity: MATCH on a label with no store yields an
            # EMPTY result, not an error (`tests/with_clause_test.rs:
            # 245-257` — a:NonExistent). Only the id column exists, so a
            # property access still fails compile, like an unbound name.
            spark = next(iter(self.g.nodes.values())).sparkSession
            empty = spark.range(0).select(
                F.col("id").alias(_pref(np.var, "id"))
            )
            return empty, label
        df = self.g.nodes[label]
        for k, v in np.props:
            df = df.filter(F.col(k) == F.lit(v))
        df = df.select([F.col(c).alias(_pref(np.var, c)) for c in df.columns])
        return df, label

    def _edge(self, rel: ast.RelPattern):
        if rel.rel_type not in self.g.edges:
            raise CypherCompileError(f"unknown relationship type {rel.rel_type!r}")
        es = self.g.edges[rel.rel_type]
        if rel.direction == "out":
            return es.df.select("src", "dst"), es.dst_label
        if rel.direction == "in":
            return es.df.select(F.col("dst").alias("src"), F.col("src").alias("dst")), es.src_label
        if es.src_label != es.dst_label:
            raise CypherCompileError("undirected hop needs homogeneous edge type")
        both = es.df.select("src", "dst").unionByName(
            es.df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        return both, es.dst_label

    def _var_length_pairs(
        self, edges: DataFrame, origins: DataFrame, min_h: int, max_h: int | None
    ) -> DataFrame:
        """(o, c) pairs with BFS-set distance per origin in [min_h, max_h] —
        the multi-variable generalization of `expand`
        (operators/traversal.py; reference `src/query.rs:171-218`)."""
        edges = edges.localCheckpoint(eager=True)
        start = origins.select(F.col("o")).dropDuplicates().withColumn("c", F.col("o"))
        visited = start.localCheckpoint(eager=True)
        current = visited
        result = visited if min_h == 0 else None
        depth = 0
        while max_h is None or depth < max_h:
            depth += 1
            nxt = (
                current.join(edges, current["c"] == edges["src"])
                .select("o", F.col("dst").alias("c"))
                .dropDuplicates()
                .join(visited, ["o", "c"], "left_anti")
                .localCheckpoint(eager=True)
            )
            if nxt.isEmpty():
                break
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            if depth >= min_h:
                result = nxt if result is None else result.unionByName(nxt)
            current = nxt
        if result is None:
            return start.limit(0)
        return result

    def _compile_path(self, path: ast.PatternPath) -> tuple[DataFrame, set[str]]:
        df, label = self._node_df(path.start, None)
        bound = {path.start.var}
        prev = path.start
        for rel, node in path.hops:
            edges, dst_label = self._edge(rel)
            ndf, label = self._node_df(node, dst_label)
            if node.label and node.label != dst_label:
                raise CypherCompileError(
                    f"pattern label {node.label!r} does not match edge "
                    f"endpoint {dst_label!r}"
                )
            src_col = F.col(_pref(prev.var, "id"))
            if (rel.min_hops, rel.max_hops) == (1, 1):
                hop = edges.select(
                    F.col("src").alias("__hop_src"), F.col("dst").alias("__hop_dst")
                )
                df = (
                    df.join(hop, src_col == F.col("__hop_src"))
                    .join(ndf, F.col("__hop_dst") == F.col(_pref(node.var, "id")))
                    .drop("__hop_src", "__hop_dst")
                )
            else:
                origins = df.select(src_col.alias("o"))
                pairs = self._var_length_pairs(
                    edges, origins, rel.min_hops, rel.max_hops
                )
                df = (
                    df.join(pairs, src_col == pairs["o"])
                    .join(ndf, F.col("c") == F.col(_pref(node.var, "id")))
                    .drop("o", "c")
                )
            bound.add(node.var)
            prev = node
        return df, bound

    def _compile_matches(self, matches) -> DataFrame:
        df: DataFrame | None = None
        bound: set[str] = set()
        for m in matches:
            if isinstance(m, ast.WithClause):
                if df is None:
                    raise CypherCompileError("WITH/WHERE before any MATCH")
                if m.where is not None:
                    df = df.filter(self._predicate(m.where, df))
                if m.vars or m.props:  # project to the listed items
                    missing = set(m.vars) - bound
                    if missing:
                        raise CypherCompileError(f"WITH references unbound {missing}")
                    keep = [F.col(c) for c in df.columns
                            if c.split("__")[0] in set(m.vars)]
                    for p, alias in m.props:
                        col = self._col(p, df)
                        # unaliased `WITH a.name` keeps the namespaced
                        # column so `RETURN a.name` still resolves;
                        # aliased becomes a plain bare-name column
                        keep.append(col.alias(alias) if alias
                                    else col.alias(_pref(p.var, p.key)))
                    df = df.select(*keep)
                    bound = set(m.vars) | {p.var for p, a in m.props if a is None}
                continue
            for path in m.paths:
                pdf, pvars = self._compile_path(path)
                if df is None:
                    df, bound = pdf, pvars
                    continue
                shared = bound & pvars
                join_cols = [
                    c for c in pdf.columns
                    if c.split("__")[0] in shared and c in df.columns
                ]
                how = "left_outer" if m.optional else "inner"
                if join_cols:
                    df = df.join(pdf, join_cols, how)
                else:
                    df = df.crossJoin(pdf) if not m.optional else df.join(
                        pdf, F.lit(True), "left_outer"
                    )
                bound |= pvars
        if df is None:
            raise CypherCompileError("query has no MATCH clause")
        return df

    # -- expression compilation -----------------------------------------
    def _col(self, expr, df: DataFrame) -> Column:
        if isinstance(expr, ast.Prop):
            name = _pref(expr.var, expr.key)
            if name not in df.columns:
                raise CypherCompileError(f"unknown property {expr.var}.{expr.key}")
            return F.col(name)
        if isinstance(expr, ast.Lit):
            return F.lit(expr.value)
        raise CypherCompileError(f"cannot compile operand {expr!r}")

    def _predicate(self, cond, df: DataFrame) -> Column:
        if isinstance(cond, ast.BoolOp):
            cols = [self._predicate(c, df) for c in cond.items]
            out = cols[0]
            for c in cols[1:]:
                out = (out & c) if cond.op == "and" else (out | c)
            return out
        if isinstance(cond, ast.Not):
            return ~self._predicate(cond.item, df)
        if isinstance(cond, ast.IsNull):
            c = self._col(cond.expr, df)
            return c.isNotNull() if cond.negate else c.isNull()
        if isinstance(cond, ast.Exists):
            return self._col(cond.expr, df).isNotNull()
        if isinstance(cond, ast.Cmp):
            left = self._col(cond.left, df)
            if cond.op == "=~":
                return left.rlike(cond.right.value if isinstance(cond.right, ast.Lit) else "")
            if cond.op == "in":
                return left.isin(cond.right.value)
            right = self._col(cond.right, df)
            return {
                "=": left == right, "<>": left != right,
                ">": left > right, "<": left < right,
                ">=": left >= right, "<=": left <= right,
            }[cond.op]
        raise CypherCompileError(f"cannot compile predicate {cond!r}")

    # -- projection ------------------------------------------------------
    def _item_name(self, item: ast.ReturnItem) -> str:
        if item.alias:
            return item.alias
        if item.agg:
            base = item.agg if item.expr is None else f"{item.agg}_{item.expr.key}"
            return base
        if isinstance(item.expr, ast.Prop):
            return item.expr.key
        return str(item.expr)

    def _agg_col(self, item: ast.ReturnItem, df: DataFrame) -> Column:
        name = self._item_name(item)
        if item.agg == "count":
            if item.expr is None:
                return F.count("*").alias(name)
            c = self._col(item.expr, df)
            return (F.count_distinct(c) if item.distinct else F.count(c)).alias(name)
        c = self._col(item.expr, df)
        if item.distinct:
            raise CypherCompileError("DISTINCT inside non-count aggregates unsupported")
        fn = {
            "sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
            "collect": F.collect_list,
            # Cypher-path STDEV is population σ (`src/cypher/executor.rs:
            # 482-501`); STDEVP maps to the same there — we expose both
            # correctly instead.
            "stdev": F.stddev_samp, "stdevp": F.stddev_pop,
        }.get(item.agg)
        if fn is not None:
            return fn(c).alias(name)
        if item.agg == "percentilecont":
            return F.percentile(c, F.lit(item.agg_param)).alias(name)
        if item.agg == "percentiledisc":
            return F.expr(
                f"percentile_disc({item.agg_param}) WITHIN GROUP (ORDER BY "
                f"{_pref(item.expr.var, item.expr.key)})"
            ).alias(name)
        raise CypherCompileError(f"unknown aggregate {item.agg!r}")

    def _project(self, q: ast.ReadQuery, df: DataFrame) -> DataFrame:
        has_agg = any(i.agg for i in q.items)
        if has_agg:
            if q.group_by:
                keys = [self._col(p, df).alias(p.key) for p in q.group_by]
            else:
                # standard Cypher implicit grouping: non-aggregate items
                keys = [
                    self._col(i.expr, df).alias(self._item_name(i))
                    for i in q.items if not i.agg
                ]
            aggs = [self._agg_col(i, df) for i in q.items if i.agg]
            out = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
        else:
            cols = []
            for i in q.items:
                if isinstance(i.expr, str):
                    # bare name: a node variable → its id column, or a
                    # plain column created by `WITH ... AS alias`
                    if _pref(i.expr, "id") in df.columns:
                        cols.append(F.col(_pref(i.expr, "id")).alias(i.alias or i.expr))
                    elif i.expr in df.columns:
                        cols.append(F.col(i.expr).alias(i.alias or i.expr))
                    else:
                        raise CypherCompileError(f"unknown variable {i.expr!r}")
                else:
                    cols.append(self._col(i.expr, df).alias(self._item_name(i)))
            out = df.select(*cols)
        if q.ret_distinct:
            out = out.dropDuplicates()
        if q.order_by:
            keys = []
            for o in q.order_by:
                name = o.key.split(".")[-1] if "." in o.key else o.key
                col = F.col(name)
                # missing values sort last in both directions, matching the
                # reference (`src/query.rs:441-468`)
                keys.append(col.asc_nulls_last() if o.asc else col.desc_nulls_last())
            out = out.orderBy(*keys)
        if q.skip:
            out = out.offset(q.skip)
        if q.limit is not None:
            out = out.limit(q.limit)
        return out

    # -- statements ------------------------------------------------------
    def run_read(self, q: ast.ReadQuery) -> DataFrame:
        df = self._compile_matches(q.matches)
        if q.where is not None:
            df = df.filter(self._predicate(q.where, df))
        return self._project(q, df)

    def run(self, stmt):
        if isinstance(stmt, ast.ReadQuery):
            return self.run_read(stmt)
        if isinstance(stmt, ast.UnionQuery):
            parts = [self.run_read(p) for p in stmt.parts]
            out = parts[0]
            for p in parts[1:]:
                if set(p.columns) == set(out.columns):
                    out = out.unionByName(p)
                elif len(p.columns) == len(out.columns):
                    # reference unions NODE results regardless of the
                    # variable names each branch used
                    # (`tests/union_test.rs:214-238` — RETURN f ∪ RETURN
                    # u); positional union under the first branch's names
                    out = out.union(p)
                else:
                    raise CypherCompileError(
                        "UNION branches return different column counts: "
                        f"{out.columns} vs {p.columns}"
                    )
            # UNION dedups whole rows (standard SQL; reference dedups by
            # node id, `src/cypher/executor.rs:1669-1682`)
            return out if stmt.all else out.dropDuplicates()
        if isinstance(stmt, ast.CreateStmt):
            return self._run_create(stmt)
        if isinstance(stmt, ast.CreateRelStmt):
            return self._run_create_rel(stmt)
        if isinstance(stmt, ast.DeleteStmt):
            return self._run_delete(stmt)
        if isinstance(stmt, ast.SetStmt):
            return self._run_set(stmt)
        if isinstance(stmt, ast.MergeStmt):
            return self._run_merge(stmt)
        if isinstance(stmt, ast.MergeRelStmt):
            return self._run_merge_rel(stmt)
        if isinstance(stmt, ast.ForeachStmt):
            return self._run_foreach(stmt)
        if isinstance(stmt, ast.CallStmt):
            return self._run_call(stmt)
        if isinstance(stmt, ast.TransactionStmt):
            # no-op: batch-job atomicity replaces op-log transactions
            # (SURVEY.md §2.11); returns the unchanged graph so scripted
            # BEGIN/COMMIT/ROLLBACK sequences run through unchanged
            return self.g
        raise CypherCompileError(f"unsupported statement {stmt!r}")

    def _run_merge_rel(self, stmt: ast.MergeRelStmt) -> PropertyGraph:
        """Relationship MERGE: endpoint patterns that match no node are
        first created from their pattern props (reference creates the
        missing parts of the pattern, `src/cypher/executor.rs:861-1023`;
        scenario `tests/merge_comprehensive_test.rs:222-237`), then for
        every (a, b) endpoint pair the edge is created iff absent
        (left-anti against the edge table — `:962-1018`). A previously
        unseen rel type opens a new EdgeSet between the pattern labels.
        ON CREATE SET applies to newly created edges, ON MATCH SET to the
        edges that already existed. Idempotent."""
        from pyspark.sql import Window

        from rs_graphdb_spark.graph import EdgeSet

        if len(stmt.path.hops) > 1:
            return self._run_merge_path(stmt)
        (rel, dst_node) = stmt.path.hops[0]
        src_pat, dst_pat = stmt.path.start, dst_node
        if rel.direction == "in":
            src_pat, dst_pat = dst_pat, src_pat
        g = PropertyGraph(nodes=dict(self.g.nodes), edges=dict(self.g.edges))
        if rel.rel_type in g.edges:
            es = g.edges[rel.rel_type]
        else:
            if not (src_pat.label and dst_pat.label):
                raise CypherCompileError(
                    f"new relationship type {rel.rel_type!r} needs labeled "
                    "endpoint patterns to declare its endpoints"
                )
            from rs_graphdb_spark.session import local_df

            spark = next(iter(g.nodes.values())).sparkSession
            empty = local_df(spark, [], "edge_id long, src long, dst long")
            es = EdgeSet(df=empty, src_label=src_pat.label,
                         dst_label=dst_pat.label)

        def _ensure_nodes(np: ast.NodePattern, label: str) -> None:
            """Create the endpoint from its pattern when nothing matches
            (MERGE creates the missing parts of the pattern)."""
            if np.label and np.label != label:
                raise CypherCompileError(
                    f"pattern label {np.label!r} does not match edge endpoint {label!r}"
                )
            if label not in g.nodes:
                raise CypherCompileError(f"unknown label {label!r}")
            if not np.props:
                return
            pat = ast.NodePattern(var=np.var, label=label, props=np.props)
            merged = Compiler(g)._run_merge(ast.MergeStmt(node=pat))
            g.nodes[label] = merged.nodes[label]

        def _ids(np: ast.NodePattern, label: str) -> DataFrame:
            df = g.nodes[label]
            for k, v in np.props:
                df = (df.filter(F.col(k) == F.lit(v))
                      if k in df.columns else df.limit(0))
            # MERGE endpoint patterns are point lookups (a handful of ids);
            # without the coalesce the CartesianProduct below schedules
            # left-partitions × right-partitions near-empty tasks — 4000+
            # tasks for a 1×1 pair on a 32-way table
            return df.select("id").coalesce(1)

        _ensure_nodes(src_pat, es.src_label)
        _ensure_nodes(dst_pat, es.dst_label)
        a = _ids(src_pat, es.src_label).withColumnRenamed("id", "src")
        b = _ids(dst_pat, es.dst_label).withColumnRenamed("id", "dst")
        pairs = a.crossJoin(b)
        missing = pairs.join(
            es.df.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        edge_df = es.df
        if stmt.on_match:
            matched = pairs.join(es.df.select("src", "dst"), ["src", "dst"],
                                 "left_semi").withColumn("__m", F.lit(True))
            flagged = edge_df.join(matched, ["src", "dst"], "left")
            for k, v in stmt.on_match:
                old = F.col(k) if k in edge_df.columns else F.lit(None)
                flagged = flagged.withColumn(
                    k, F.when(F.col("__m"), F.lit(v)).otherwise(old)
                )
            edge_df = flagged.drop("__m")
        if missing.isEmpty():
            if edge_df is not es.df:
                g.edges[rel.rel_type] = EdgeSet(
                    df=edge_df, src_label=es.src_label, dst_label=es.dst_label
                )
            return g
        max_eid = edge_df.agg(F.max("edge_id")).first()[0] or 0
        w = Window.orderBy("src", "dst")
        new = missing.withColumn("edge_id", F.lit(max_eid) + F.row_number().over(w))
        for k, v in stmt.on_create:
            new = new.withColumn(k, F.lit(v))
        for c in new.columns:  # new edge-property keys extend the table
            if c not in edge_df.columns:
                edge_df = edge_df.withColumn(
                    c, F.lit(None).cast(new.schema[c].dataType)
                )
        for c in edge_df.columns:
            if c not in new.columns:
                new = new.withColumn(c, F.lit(None).cast(edge_df.schema[c].dataType))
        g.edges[rel.rel_type] = EdgeSet(
            df=edge_df.unionByName(new.select(edge_df.columns)),
            src_label=es.src_label,
            dst_label=es.dst_label,
        )
        return g

    def _run_merge_path(self, stmt: ast.MergeRelStmt) -> PropertyGraph:
        """Chained relationship MERGE
        `MERGE (a:L {..})-[:T1]->(b:L {..})-[:T2]->(c:L {..})`
        (reference `tests/multi_rel_merge_exec_test.rs:16-103`): every
        node pattern is matched-or-created, every hop edge is created iff
        absent — the reference creates the MISSING PARTS of the pattern
        rather than all-or-nothing. ON CREATE SET fires when the full
        path did not already exist (the create-path / partial-match
        scenarios), ON MATCH SET when it did; a SET naming a node
        variable updates that node's table, any other variable falls
        through to the hop edges (matching the single-hop form)."""
        pats = [stmt.path.start] + [dst for _, dst in stmt.path.hops]
        for np in pats:
            if np.label is None:
                raise CypherCompileError(
                    "chained MERGE needs labeled node patterns"
                )
        existed = self._path_exists(stmt.path)
        g = self.g
        for np in pats:
            g = Compiler(g)._run_merge(ast.MergeStmt(node=np))
        node_vars = {np.var for np in pats}
        edge_oc = stmt.on_create if stmt.on_create_var not in node_vars else ()
        edge_om = stmt.on_match if stmt.on_match_var not in node_vars else ()
        src = stmt.path.start
        for rel, dst in stmt.path.hops:
            g = Compiler(g)._run_merge_rel(ast.MergeRelStmt(
                path=ast.PatternPath(start=src, hops=((rel, dst),)),
                on_create=edge_oc, on_match=edge_om,
            ))
            src = dst
        var, updates = (
            (stmt.on_match_var, stmt.on_match) if existed
            else (stmt.on_create_var, stmt.on_create)
        )
        if updates and var in node_vars:
            np = next(p for p in pats if p.var == var)
            nodes = g.nodes[np.label]
            cond = F.lit(True)
            for k, v in np.props:
                cond = cond & (
                    (F.col(k) == F.lit(v)) if k in nodes.columns else F.lit(False)
                )
            for k, v in updates:
                old = F.col(k) if k in nodes.columns else F.lit(None)
                nodes = nodes.withColumn(
                    k, F.when(cond, F.lit(v)).otherwise(old)
                )
            g = PropertyGraph(
                nodes={**g.nodes, np.label: nodes}, edges=dict(g.edges)
            )
        return g

    def _path_exists(self, path: ast.PatternPath) -> bool:
        """Pre-mutation probe: does at least one binding of the FULL
        pattern path exist? Chain of point-lookup joins — every frame is
        a handful of ids, so this is a cheap driver action on the DML
        path."""
        g = self.g

        def _ids(np: ast.NodePattern) -> DataFrame | None:
            if np.label not in g.nodes:
                return None
            df = g.nodes[np.label]
            for k, v in np.props:
                df = (df.filter(F.col(k) == F.lit(v))
                      if k in df.columns else df.limit(0))
            return df.select("id")

        cur = _ids(path.start)
        if cur is None:
            return False
        cur = cur.withColumnRenamed("id", "n0")
        for i, (rel, dst) in enumerate(path.hops):
            if rel.rel_type not in g.edges:
                return False
            e = g.edges[rel.rel_type].df.select("src", "dst")
            if rel.direction == "in":
                e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            nxt = _ids(dst)
            if nxt is None:
                return False
            cur = (
                cur.join(
                    e.withColumnRenamed("src", f"n{i}")
                    .withColumnRenamed("dst", f"n{i + 1}"),
                    f"n{i}",
                )
                .join(nxt.withColumnRenamed("id", f"n{i + 1}"),
                      f"n{i + 1}", "left_semi")
            )
        return not cur.isEmpty()

    def _run_foreach(self, stmt: ast.ForeachStmt) -> PropertyGraph:
        """FOREACH over a literal node-id list + SET
        (`src/cypher/executor.rs:1561-1623`): isin filter + merge update.
        The target label is recovered from the id namespace
        (id // ID_STRIDE — graph.LABEL_INDEX)."""
        from rs_graphdb_spark.graph import ID_STRIDE, LABEL_INDEX

        if not stmt.ids:  # FOREACH over [] is a no-op (foreach_test.rs:58)
            return PropertyGraph(nodes=dict(self.g.nodes),
                                 edges=dict(self.g.edges))
        idxs = {i // ID_STRIDE for i in stmt.ids}
        if len(idxs) != 1:
            raise CypherCompileError("FOREACH ids must share one label namespace")
        rev = {v: k for k, v in LABEL_INDEX.items()}
        label = rev.get(idxs.pop())
        if label is None or label not in self.g.nodes:
            # raw dense ids (the reference's single-store model,
            # `tests/foreach_test.rs`): unambiguous when the graph has
            # exactly one node label
            if len(self.g.nodes) == 1:
                label = next(iter(self.g.nodes))
            else:
                raise CypherCompileError("FOREACH ids resolve to no known label")
        g = PropertyGraph(nodes=dict(self.g.nodes), edges=dict(self.g.edges))
        nodes = g.nodes[label]
        hit = F.col("id").isin(list(stmt.ids))
        for k, v in stmt.updates:
            old = F.col(k) if k in nodes.columns else F.lit(None)
            nodes = nodes.withColumn(k, F.when(hit, F.lit(v)).otherwise(old))
        g.nodes[label] = nodes
        return g

    def _run_call(self, stmt: ast.CallStmt) -> DataFrame:
        """CALL { subquery } RETURN ... (`src/cypher/executor.rs:1625-1650`):
        outer projection over the inner result's columns (count(*) is the
        supported outer aggregate)."""
        df = self.run_read(stmt.inner)
        has_agg = any(i.agg for i in stmt.items)
        if has_agg:
            keys = [
                F.col(i.expr).alias(i.alias or i.expr)
                for i in stmt.items if not i.agg
            ]
            aggs = []
            for i in stmt.items:
                if not i.agg:
                    continue
                if i.agg != "count" or i.expr is not None:
                    raise CypherCompileError(
                        "CALL outer aggregates support count(*) only"
                    )
                aggs.append(F.count("*").alias(i.alias or "count"))
            out = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
        else:
            out = df.select(
                *[F.col(i.expr).alias(i.alias or i.expr) for i in stmt.items]
            )
        if stmt.order_by:
            keys = [
                F.col(o.key).asc_nulls_last() if o.asc
                else F.col(o.key).desc_nulls_last()
                for o in stmt.order_by
            ]
            out = out.orderBy(*keys)
        if stmt.skip:
            out = out.offset(stmt.skip)
        if stmt.limit is not None:
            out = out.limit(stmt.limit)
        return out

    # -- DML (graph-rewrite semantics; returns the NEW node DataFrame) ---
    def _create_node(self, g: PropertyGraph, np: ast.NodePattern) -> int:
        """Append one node row from a pattern; opens a new label table
        for a previously-unseen label. Returns the new id (mutates g's
        node dict)."""
        if np.label is None:
            raise CypherCompileError("CREATE needs a label")
        row = {k: v for k, v in np.props}
        spark = (
            next(iter(g.nodes.values())).sparkSession if g.nodes
            else None
        )
        if np.label not in g.nodes:
            if spark is None:
                raise CypherCompileError(
                    "CREATE on an empty graph needs a SparkSession-bearing "
                    "table — load at least one label first"
                )
            import pandas as pd

            new = (
                spark.createDataFrame(pd.DataFrame([row])) if row
                else spark.range(1).select()
            ).withColumn("id", F.lit(1).cast("long"))
            g.nodes[np.label] = new.select("id", *[c for c in new.columns
                                                   if c != "id"])
            return 1
        nodes = g.nodes[np.label]
        spark = nodes.sparkSession
        max_id = int(nodes.agg(F.max("id")).first()[0] or 0)
        if row:
            # Arrow-path literal (see session.local_df): a pickled-list
            # relation taxes every later action with a Python task
            import pandas as pd

            new = spark.createDataFrame(pd.DataFrame([row]))
        else:
            new = spark.range(1).select()
        new = new.withColumn("id", F.lit(max_id + 1).cast("long"))
        for c in new.columns:  # new property keys extend the table
            if c not in nodes.columns:
                nodes = nodes.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
        for c in nodes.columns:
            if c not in new.columns:
                new = new.withColumn(c, F.lit(None).cast(nodes.schema[c].dataType))
        g.nodes[np.label] = nodes.unionByName(new.select(nodes.columns))
        return max_id + 1

    def _run_create(self, stmt: ast.CreateStmt) -> PropertyGraph:
        """CREATE appends rows (`src/cypher/executor.rs:610-648`); id =
        max(id)+1 per created node — dense-enough without a single writer
        (SURVEY.md §7 hard-point #4)."""
        g = PropertyGraph(nodes=dict(self.g.nodes), edges=dict(self.g.edges))
        for np in stmt.nodes:
            self._create_node(g, np)
        return g

    def _run_create_rel(self, stmt: ast.CreateRelStmt) -> PropertyGraph:
        """CREATE (a:L {..})-[:T]->(b:L {..}): unconditionally create BOTH
        endpoint nodes and the relationship (reference create-path form,
        `tests/cypher_delete_test.rs:41-45`). A previously-unseen rel type
        opens a new EdgeSet between the pattern labels."""
        from rs_graphdb_spark.graph import EdgeSet
        from rs_graphdb_spark.session import local_df

        (rel, dst_node) = stmt.path.hops[0]
        src_pat, dst_pat = stmt.path.start, dst_node
        if rel.direction == "in":
            src_pat, dst_pat = dst_pat, src_pat
        g = PropertyGraph(nodes=dict(self.g.nodes), edges=dict(self.g.edges))
        sid = self._create_node(g, src_pat)
        did = self._create_node(g, dst_pat)
        spark = next(iter(g.nodes.values())).sparkSession
        if rel.rel_type in g.edges:
            es = g.edges[rel.rel_type]
            max_eid = int(es.df.agg(F.max("edge_id")).first()[0] or 0)
            new = local_df(spark, [(max_eid + 1, sid, did)],
                           "edge_id long, src long, dst long")
            g.edges[rel.rel_type] = EdgeSet(
                df=es.df.unionByName(new, allowMissingColumns=True),
                src_label=es.src_label, dst_label=es.dst_label,
            )
        else:
            if not (src_pat.label and dst_pat.label):
                raise CypherCompileError(
                    f"new relationship type {rel.rel_type!r} needs labeled "
                    "endpoint patterns"
                )
            g.edges[rel.rel_type] = EdgeSet(
                df=local_df(spark, [(1, sid, did)],
                            "edge_id long, src long, dst long"),
                src_label=src_pat.label, dst_label=dst_pat.label,
            )
        return g

    def _match_victims(self, match: ast.MatchClause, where, var: str) -> tuple[DataFrame, str]:
        df = self._compile_matches([match])
        if where is not None:
            df = df.filter(self._predicate(where, df))
        label = None
        for path in match.paths:
            if path.start.var == var:
                label = path.start.label
            for _, node in path.hops:
                if node.var == var:
                    label = node.label
        if label is None:
            raise CypherCompileError(f"variable {var!r} not bound by MATCH")
        return df.select(F.col(_pref(var, "id")).alias("id")).dropDuplicates(), label

    def _run_delete(self, stmt: ast.DeleteStmt) -> PropertyGraph:
        """DELETE cascades to incident edges (`src/cypher/executor.rs:
        650-687`; cascade `src/storage/mem_store.rs:123-147`)."""
        victims, label = self._match_victims(stmt.match, stmt.where, stmt.var)
        g = PropertyGraph(nodes=dict(self.g.nodes), edges=dict(self.g.edges))
        g.nodes[label] = g.nodes[label].join(victims, "id", "left_anti")
        from rs_graphdb_spark.graph import EdgeSet

        for rt, es in list(g.edges.items()):
            df = es.df
            if es.src_label == label:
                df = df.join(victims.withColumnRenamed("id", "src"), "src", "left_anti")
            if es.dst_label == label:
                df = df.join(victims.withColumnRenamed("id", "dst"), "dst", "left_anti")
            g.edges[rt] = EdgeSet(df=df, src_label=es.src_label, dst_label=es.dst_label)
        return g

    def _run_set(self, stmt: ast.SetStmt) -> PropertyGraph:
        """SET merges properties under the match predicate
        (`src/cypher/executor.rs:689-738`)."""
        victims, label = self._match_victims(stmt.match, stmt.where, stmt.var)
        g = PropertyGraph(nodes=dict(self.g.nodes), edges=dict(self.g.edges))
        nodes = g.nodes[label]
        hit = victims.withColumn("__hit", F.lit(True))
        df = nodes.join(hit, "id", "left_outer")
        for k, v in stmt.updates:
            # SET may introduce a new property key — the reference's bags
            # are open maps (`src/values/value.rs:14`); here that extends
            # the table schema with NULLs for unmatched rows
            old = F.col(k) if k in nodes.columns else F.lit(None)
            df = df.withColumn(k, F.when(F.col("__hit"), F.lit(v)).otherwise(old))
        g.nodes[label] = df.drop("__hit")
        return g

    def _run_merge(self, stmt: ast.MergeStmt) -> PropertyGraph:
        """MERGE = match full pattern else create, with ON CREATE SET /
        ON MATCH SET (`src/cypher/executor.rs:740-1211`)."""
        np = stmt.node
        g = PropertyGraph(nodes=dict(self.g.nodes), edges=dict(self.g.edges))
        if np.label is None:
            # MERGE (n) — matches ANY node (reference
            # `tests/merge_comprehensive_test.rs:392-406`): a no-op on a
            # non-empty graph. Creating an anonymous label-less node has no
            # home in the label-table model → documented divergence.
            if any(not df.isEmpty() for df in g.nodes.values()):
                return g
            raise CypherCompileError(
                "MERGE without a label on an empty graph is unsupported "
                "(label-table model has no label-less store)"
            )
        nodes = g.nodes[np.label]
        spark = nodes.sparkSession
        cond = F.lit(True)
        for k, v in np.props:
            # a property key the table has never seen can match nothing —
            # the full pattern is unmatched and MERGE creates (reference
            # partial-match scenario `merge_comprehensive_test.rs:410-430`)
            cond = cond & (
                (F.col(k) == F.lit(v)) if k in nodes.columns else F.lit(False)
            )
        matched = nodes.filter(cond)
        if matched.isEmpty():
            props = dict(np.props)
            for k, v in stmt.on_create:
                props[k] = v
            max_id = nodes.agg(F.max("id")).first()[0] or 0
            # Arrow-path literal row: a pickled-list relation would re-run
            # a Python worker task on EVERY later action over the unioned
            # table (session.local_df docstring has the numbers)
            import pandas as pd

            new = spark.createDataFrame(pd.DataFrame([props])).withColumn(
                "id", F.lit(max_id + 1)
            )
            for c in new.columns:  # new property keys extend the table
                if c not in nodes.columns:
                    nodes = nodes.withColumn(c, F.lit(None).cast(new.schema[c].dataType))
            for c in nodes.columns:
                if c not in new.columns:
                    new = new.withColumn(c, F.lit(None).cast(nodes.schema[c].dataType))
            g.nodes[np.label] = nodes.unionByName(new.select(nodes.columns))
        elif stmt.on_match:
            upd = nodes
            for k, v in stmt.on_match:
                old = F.col(k) if k in nodes.columns else F.lit(None)
                upd = upd.withColumn(k, F.when(cond, F.lit(v)).otherwise(old))
            g.nodes[np.label] = upd
        return g


def execute_cypher(graph: PropertyGraph, text: str):
    """Parse + compile + run one Cypher statement.

    Read queries and UNIONs return a DataFrame; DML statements return a
    NEW PropertyGraph (immutable-graph rewrite — the Spark replacement for
    the reference's in-place mutation under `&mut`)."""
    return Compiler(graph).run(parse_cypher(text))

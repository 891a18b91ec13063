"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY.md §5 notes it has no randomized testing).

Driver-side properties run pure-Python pieces (parser, fingerprints,
layouts) under many random inputs; Spark-side properties use small
deterministic samples to keep runtime bounded.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rs_graphdb_spark.algorithms.graph_algos import astar, dfs_preorder
from rs_graphdb_spark.cypher.parser import CypherSyntaxError, parse_cypher
from rs_graphdb_spark.functions.layout import circle_layout, hierarchical_layout

ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)


@given(var=ident, label=ident, key=ident, val=st.integers(-1000, 1000))
@settings(max_examples=50, deadline=None)
def test_parser_roundtrips_simple_match(var, label, key, val):
    q = parse_cypher(
        f"MATCH ({var}:{label}) WHERE {var}.{key} > {val} "
        f"RETURN {var}.{key} AS x"
    )
    m = q.matches[0]
    assert m.paths[0].start.var == var
    assert m.paths[0].start.label == label
    assert q.items[0].alias == "x"


@given(st.text(max_size=40))
@settings(max_examples=50, deadline=None)
def test_parser_never_hangs_on_garbage(text):
    # must either parse or raise CypherSyntaxError — no other exception
    try:
        parse_cypher(text)
    except CypherSyntaxError:
        pass


@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=60, unique=True))
@settings(max_examples=30, deadline=None)
def test_circle_layout_on_circle(ids):
    pos = circle_layout(ids, radius=7.5)
    assert set(pos) == set(ids)
    for x, y in pos.values():
        assert abs(math.hypot(x, y) - 7.5) < 1e-6


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=60,
    )
)
@settings(max_examples=30, deadline=None)
def test_dfs_preorder_visits_reachable_exactly_once(edges):
    start = edges[0][0]
    order = dfs_preorder(edges, start)
    assert order[0] == start
    assert len(order) == len(set(order))  # no revisits
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    reachable = {start}
    frontier = [start]
    while frontier:
        v = frontier.pop()
        for w in adj.get(v, ()):
            if w not in reachable:
                reachable.add(w)
                frontier.append(w)
    assert set(order) == reachable


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1, max_size=40,
    ),
    st.data(),
)
@settings(max_examples=30, deadline=None)
def test_astar_cost_is_optimal_vs_dijkstra(edges, data):
    # A* with the euclidean heuristic (admissible) must equal plain
    # Dijkstra (heuristic 0) in cost
    nodes = sorted({n for e in edges for n in e})
    coords = {n: (float(n % 4), float(n // 4)) for n in nodes}
    start = data.draw(st.sampled_from(nodes))
    goal = data.draw(st.sampled_from(nodes))
    a = astar(edges, coords, start, goal)
    d = astar(edges, coords, start, goal, heuristic=lambda v: 0.0)
    if a is None:
        assert d is None
    else:
        assert d is not None and abs(a[0] - d[0]) < 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        max_size=40,
    ),
    st.lists(st.integers(0, 20), min_size=1, max_size=21, unique=True),
)
@settings(max_examples=30, deadline=None)
def test_hierarchical_layout_total_and_edge_monotone(edges, ids):
    pos = hierarchical_layout(ids, [(s, d) for s, d in edges if s in ids and d in ids])
    assert set(pos) == set(ids)


# --- temporal operators vs brute-force references (Spark-side; few
# examples, tiny frames — each example is a real window job) ---

_asof_case = st.tuples(
    st.lists(  # left rows: (key, ts)
        st.tuples(st.integers(1, 3), st.integers(0, 12)),
        min_size=1, max_size=8,
    ),
    st.lists(  # right rows: (key, ts)
        st.tuples(st.integers(1, 3), st.integers(0, 12)),
        min_size=0, max_size=8,
    ),
    st.sampled_from(["backward", "forward"]),
    st.booleans(),                       # strict
    st.sampled_from([None, 0, 3]),       # tolerance
)


@given(_asof_case)
@settings(max_examples=12, deadline=None)
def test_asof_join_matches_bruteforce(spark, case):
    from rs_graphdb_spark.operators.temporal import asof_join

    lrows, rrows, direction, strict, tol = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(rrows)],
        "k long, ts long, rid long",
    ) if rrows else spark.createDataFrame([], "k long, ts long, rid long")
    out = asof_join(
        left, right, key_cols=["k"], left_ts="ts", right_ts="ts",
        value_cols=["rid"], direction=direction, strict=strict, tolerance=tol,
    )
    got = {r.lid: (r.ts_right, r.rid_right) for r in out.collect()}

    def brute(k, t):
        if direction == "backward":
            ok = lambda rt: (rt < t) if strict else (rt <= t)
            intol = lambda rt: tol is None or t - rt <= tol
            pick = max
        else:
            ok = lambda rt: (rt > t) if strict else (rt >= t)
            intol = lambda rt: tol is None or rt - t <= tol
            pick = min
        cands = [(rt, 100 + i) for i, (rk, rt) in enumerate(rrows)
                 if rk == k and ok(rt) and intol(rt)]
        return pick(cands) if cands else (None, None)

    want = {i: brute(k, t) for i, (k, t) in enumerate(lrows)}
    assert got == want


@given(
    st.lists(  # (user, ts); duplicates allowed — eid breaks ties
        st.tuples(st.integers(1, 2), st.integers(0, 40)),
        min_size=1, max_size=14,
    ),
    st.integers(1, 10),
)
@settings(max_examples=12, deadline=None)
def test_sessionize_matches_bruteforce(spark, rows, gap):
    from rs_graphdb_spark.operators.temporal import sessionize

    df = spark.createDataFrame(
        [(u, t, i) for i, (u, t) in enumerate(rows)], "u long, ts long, eid long"
    )
    out = sessionize(df, "u", "ts", gap, order_cols=["eid"])
    got = {r.eid: r.session_id for r in out.collect()}

    want = {}
    for u in {u for u, _ in rows}:
        evs = sorted((t, i) for i, (uu, t) in enumerate(rows) if uu == u)
        sid, prev = 0, None
        for t, i in evs:
            if prev is None or t - prev > gap:
                sid += 1
            want[i] = sid
            prev = t
    assert got == want


@given(
    st.lists(st.tuples(st.integers(1, 3), st.integers(0, 30)),
             min_size=1, max_size=8),
    st.lists(st.tuples(st.integers(1, 3), st.integers(0, 30)),
             min_size=0, max_size=8),
    st.integers(0, 6),
    st.integers(0, 6),
)
@settings(max_examples=10, deadline=None)
def test_interval_join_matches_bruteforce(spark, lrows, rrows, lower, upper):
    from rs_graphdb_spark.operators.temporal import interval_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(k, t, 100 + i) for i, (k, t) in enumerate(rrows)],
        "k long, ts long, rid long",
    ) if rrows else spark.createDataFrame([], "k long, ts long, rid long")
    out = interval_join(
        left, right, key_cols=["k"], left_ts="ts", right_ts="ts",
        lower=lower, upper=upper, value_cols=["rid"],
    )
    got = {(r.lid, r.rid_right) for r in out.collect()}
    want = {
        (i, 100 + j)
        for i, (lk, lt) in enumerate(lrows)
        for j, (rk, rt) in enumerate(rrows)
        if lk == rk and lt - lower <= rt <= lt + upper
    }
    assert got == want


@given(
    st.lists(st.integers(1, 80), min_size=1, max_size=20),
    st.integers(50, 300),
    st.integers(1, 4),
)
@settings(max_examples=10, deadline=None)
def test_pack_greedy_matches_bruteforce(spark, sizes, budget, shards):
    from rs_graphdb_spark.functions.sampling import hash_bucket, pack_greedy

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, sz long"
    )
    out = {r.doc_id: (r.shard, r.bin) for r in
           pack_greedy(df, "doc_id", "sz", budget, shards=shards).collect()}
    shard_of = {r.doc_id: r.s for r in df.select(
        "doc_id", hash_bucket("doc_id", shards).alias("s")).collect()}

    want = {}
    for sh in set(shard_of.values()):
        acc = 0
        for i in sorted(d for d, s in shard_of.items() if s == sh):
            want[i] = (sh, acc // budget)
            acc += sizes[i]
    assert out == want


@given(st.lists(st.integers(0, 100000), min_size=1, max_size=50, unique=True))
@settings(max_examples=10, deadline=None)
def test_hash_bucket_deterministic_and_in_range(spark, ids):
    from rs_graphdb_spark.functions.sampling import hash_bucket

    df = spark.createDataFrame([(i,) for i in ids], "k long")
    a = {r.k: r.b for r in df.select("k", hash_bucket("k", 7).alias("b")).collect()}
    b = {r.k: r.b for r in df.select("k", hash_bucket("k", 7).alias("b")).collect()}
    assert a == b
    assert all(0 <= v < 7 for v in a.values())


def test_dfs_preorder_equals_lexmin_path_rank():
    """The q24 oracle's premise: with ascending-neighbor expansion, DFS
    discovery order equals the rank of each node's lexicographically
    smallest simple path from the root. Brute-forced over 150 random
    digraphs (driver-side, no Spark)."""
    import random

    from rs_graphdb_spark.algorithms.graph_algos import dfs_preorder

    def lexmin_paths(edges, start):
        adj = {}
        for s, d in edges:
            adj.setdefault(s, []).append(d)
        best = {}

        def rec(node, path):
            if node not in best or path < best[node]:
                best[node] = list(path)
            for n in sorted(adj.get(node, [])):
                if n not in path:
                    rec(n, path + [n])

        rec(start, [start])
        return best

    for trial in range(150):
        rng = random.Random(trial)
        n = rng.randrange(3, 9)
        m = rng.randrange(2, 14)
        edges = [(a, b) for a, b in
                 {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
                 if a != b]
        if not edges:
            continue
        start = min(a for a, _ in edges)
        order = dfs_preorder(edges, start)
        best = lexmin_paths(edges, start)
        lex_order = [v for v, _ in sorted(best.items(), key=lambda kv: kv[1])]
        assert order == lex_order, f"trial {trial}"


@given(
    st.lists(  # docs as lists of line-token ints (small alphabet -> real
        st.lists(st.integers(0, 5), min_size=0, max_size=6),  # cross-doc dups)
        min_size=1, max_size=8,
    ),
    st.integers(1, 3),
)
@settings(max_examples=12, deadline=None)
def test_dedup_lines_matches_bruteforce(spark, docs, max_df):
    from rs_graphdb_spark.functions.cleaning import dedup_lines

    texts = [(i, "\n".join(f"L{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_kept"], r["n_dropped"])
        for r in dedup_lines(df, "doc_id", "text", max_line_df=max_df).collect()
    }

    # brute force: df over non-empty lines, drop lines with df > max_df
    from collections import Counter

    dfreq = Counter()
    for _, toks in enumerate(docs):
        for ln in {f"L{t}" for t in toks}:
            dfreq[ln] += 1
    for i, toks in enumerate(docs):
        lines = [f"L{t}" for t in toks]
        kept = [ln for ln in lines if dfreq[ln] <= max_df]
        want = ("\n".join(kept), len(kept), len(lines) - len(kept))
        assert got[i] == want, (i, got[i], want)


@given(
    st.lists(st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", "c"])),
             min_size=1, max_size=15, unique_by=lambda x: x[0]),
    st.floats(0.0, 2.0),
)
@settings(max_examples=10, deadline=None)
def test_mixture_respects_plan_thresholds(spark, rows, budget_scale):
    import hashlib

    from rs_graphdb_spark.functions.sampling import (
        apply_token_mixture,
        mixture_plan,
    )

    df = spark.createDataFrame(
        [(i, s, 10) for i, s in rows], "doc_id long, source string, n_tok long"
    )
    budget = budget_scale * 10 * len(rows)
    plan = mixture_plan(df, "source", "n_tok", budget,
                        {"a": 0.6, "b": 0.3}, default_weight=0.1)
    fracs = {r["source"]: r["keep_frac"] for r in plan.collect()}
    kept = {r["doc_id"] for r in
            apply_token_mixture(df, "doc_id", "source", plan, seed=5).collect()}
    for i, s in rows:
        h = int(hashlib.md5(f"5:{i}".encode()).hexdigest()[:8], 16) % 1_000_000
        want = h < int(math.floor(fracs[s] * 1_000_000))
        assert (i in kept) == want, (i, s, fracs[s], h)


@given(
    st.lists(
        st.lists(st.integers(-3, 3), min_size=3, max_size=3),
        min_size=1, max_size=12,
    ),
    st.integers(1, 3),                   # k
    st.sampled_from([0.5, 0.8, 0.95]),   # threshold
)
@settings(max_examples=10, deadline=None)
def test_semantic_dedup_matches_bruteforce(spark, vecs, k, thr):
    """SemDeDup drop rule vs a pure-python reference: within the SAME
    cluster, a vector falls to its smallest-id neighbor with cosine ≥ τ."""
    from rs_graphdb_spark.functions.similarity import semantic_dedup

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)
            if any(v)]  # zero vectors have no cosine — excluded
    if not rows:
        return
    k = min(k, len(rows))  # Lloyd init draws the k smallest ids
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: (r["cluster"], r["keep"], r["dup_of"])
           for r in semantic_dedup(emb, "vec_id", "embedding", k=k,
                                   iterations=2, threshold=thr).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(x * x for x in b))
        return num / den

    clusters = {i: out[i][0] for i, _ in rows}
    for i, v in rows:
        cands = [j for j, w in rows
                 if j < i and clusters[j] == clusters[i]
                 and cos(w, v) >= thr]
        want = min(cands) if cands else None
        assert out[i][2] == want and out[i][1] == (want is None), (
            i, out[i], want)


@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=24),
             min_size=1, max_size=10),
)
@settings(max_examples=15, deadline=None)
def test_bigram_lm_matches_bruteforce(spark, texts):
    """Add-1 bigram LM (train = even ids, score = all) vs a pure-python
    reference: counts, matches, and NLL to 1e-9."""
    from rs_graphdb_spark.functions.lm import (
        BOS, bigram_counts, lm_vocab_size, score_bigram_lm)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    train = [(i, t) for i, t in rows if i % 2 == 0]
    lm = bigram_counts(df.filter("doc_id % 2 = 0"))

    def toks(t):
        out, cur = [], []
        for ch in t.lower():
            if ch.isalnum():
                cur.append(ch)
            elif cur:
                out.append("".join(cur)); cur = []
        if cur:
            out.append("".join(cur))
        return out

    def bigrams(t):
        w = [BOS] + toks(t)
        return list(zip(w, w[1:]))

    cb: dict = {}
    for _, t in train:
        for g in bigrams(t):
            cb[g] = cb.get(g, 0) + 1
    if not cb:
        return  # vocab_size must be positive; nothing to score against
    cw: dict = {}
    for (w1, _), c in cb.items():
        cw[w1] = cw.get(w1, 0) + c
    V = len({w2 for _, w2 in cb})
    assert lm_vocab_size(lm) == V

    got = {r["doc_id"]: r for r in
           score_bigram_lm(df, "doc_id", "text", lm, V).collect()}
    for i, t in rows:
        bg = bigrams(t)
        r = got[i]
        assert r["n_bigrams"] == len(bg)
        assert r["n_matched"] == sum(1 for g in bg if g in cb)
        assert r["sum_cb"] == sum(cb.get(g, 0) for g in bg)
        if bg:
            nll = -sum(
                math.log((cb.get(g, 0) + 1.0) / (cw.get(g[0], 0) + V))
                for g in bg
            ) / len(bg)
            assert abs(r["nll"] - nll) < 1e-9
        else:
            assert r["nll"] is None

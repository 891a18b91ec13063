"""Distributed BPE tokenizer — known-answer tests (Sennrich fixture)."""

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.functions.bpe import (
    bpe_encode,
    bpe_sql,
    bpe_token_counts,
    bpe_train,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic BPE walkthrough corpus: low x5, lower x2, newest x6,
    # widest x3 (word-level counts drive the merges)
    text1 = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                     + ["widest"] * 3)
    return spark.createDataFrame(
        [(1, text1), (2, "low lower newest widest")],
        "doc_id long, text string")


def test_merge_order_matches_sennrich(corpus):
    m, v = bpe_train(corpus, "text", num_merges=6)
    merges = [(r["l"], r["r"], r["pc"]) for r in m.orderBy("rank").collect()]
    # es(11) -> est(11) -> lo(9) -> low(9) -> ew(7) -> ewest(7); ties at
    # equal count break lexicographically (e,s < e,w at count 11? no —
    # counts differ; the deterministic order below is pinned)
    assert merges == [("e", "s", 11), ("es", "t", 11), ("l", "o", 9),
                      ("lo", "w", 9), ("e", "w", 7), ("ew", "est", 7)]
    seqs = {r["word"]: r["seq"] for r in v.collect()}
    assert seqs["low"] == " low "
    assert seqs["newest"] == " n  ewest "


def test_boundary_never_merges_across_tokens(spark):
    # 'aa b' contains the substring 'a b' but the pair ('a','b') must
    # only merge where BOTH tokens match exactly
    df = spark.createDataFrame(
        [(1, "xab xab ab")], "doc_id long, text string")
    m, v = bpe_train(df, "text", num_merges=1)
    (row,) = m.collect()
    assert (row["l"], row["r"]) == ("a", "b")  # pair count 3 beats x,a
    seqs = {r["word"]: r["seq"] for r in v.collect()}
    assert seqs["xab"] == " x  ab "
    assert seqs["ab"] == " ab "


def test_consecutive_pair_occurrences_all_merge(spark):
    df = spark.createDataFrame(
        [(1, "abab abab")], "doc_id long, text string")
    m, v = bpe_train(df, "text", num_merges=1)
    (row,) = m.collect()
    assert (row["l"], row["r"]) == ("a", "b")
    # ' a  b  a  b ' must become ' ab  ab ' (both occurrences)
    assert {r["seq"] for r in v.collect()} == {" ab  ab "}


def test_exhausted_merges_leave_vocab_intact(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    m, v = bpe_train(df, "text", num_merges=4)
    # round 0 merges (a,b); rounds 1-3 have no pairs left -> no rows,
    # vocab unchanged rather than wiped
    assert m.count() == 1
    assert [r["seq"] for r in v.collect()] == [" ab "]


def test_encode_and_counts(corpus):
    m, _ = bpe_train(corpus, "text", num_merges=6)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]
    enc = {(r["doc_id"], r["word_idx"]): r["tokens"]
           for r in bpe_encode(corpus, "doc_id", "text", ml).collect()}
    assert enc[(2, 0)] == ["low"]
    assert enc[(2, 2)] == ["n", "ewest"]
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_token_counts(
                  corpus, "doc_id", "text", ml).collect()}
    # doc 2: low(1) + lower(3: low,e,r) + newest(2) + widest(4)
    assert counts[2] == 10


def test_unicode_mode_merges_latin_and_passes_cjk(spark):
    """mode='unicode': CJK codepoints are single-symbol words (BERT-style
    pre-tokenization — nothing to merge within them), Latin words still
    learn merges; both survive encoding."""
    df = spark.createDataFrame(
        [(1, "newest newest newest 数据 数据")],
        "doc_id long, text string")
    m, v = bpe_train(df, "text", num_merges=2, mode="unicode")
    merges = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]
    # all Latin pairs tie at count 3 after (e,s); the deterministic
    # (count desc, l, r) tie-break then picks (e,w) — 'e' < 'es'
    assert merges == [("e", "s"), ("e", "w")]  # from 'newest' only
    seqs = {r["word"]: r["seq"] for r in v.collect()}
    # each CJK codepoint is its own one-symbol word — already atomic
    assert seqs["数"] == " 数 " and seqs["据"] == " 据 "
    assert seqs["newest"] == " n  ew  es  t "
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_token_counts(
                  df, "doc_id", "text", merges, mode="unicode").collect()}
    # newest -> n,ew,es,t (4) x3 + 4 CJK codepoint tokens
    assert counts[1] == 12 + 4


def test_artifact_roundtrip_and_ids(spark, corpus, tmp_path):
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_encode_ids, load_bpe_artifact,
        save_bpe_artifact, token_ids)
    m, v = bpe_train(corpus, "text", num_merges=6)
    art = bpe_artifact(m, v)
    p = str(tmp_path / "tok.json")
    save_bpe_artifact(art, p)
    art2 = load_bpe_artifact(p)
    assert art2["merges"] == [tuple(x) for x in art["merges"]]
    assert art2["alphabet"] == art["alphabet"]
    ids = token_ids(art2)
    # alphabet d,e,i,l,n,o,r,s,t,w gets 0..9; merges mint es,est,lo,low,
    # ew,ewest in learned order
    assert ids["d"] == 0 and len(art2["alphabet"]) == 10
    assert ids["es"] == 10 and ids["low"] == 13 and ids["ewest"] == 15
    enc = {(r["doc_id"], r["word_idx"]): r["ids"]
           for r in bpe_encode_ids(
               corpus, "doc_id", "text", art2).collect()}
    assert enc[(2, 0)] == [ids["low"]]
    assert enc[(2, 2)] == [ids["n"], ids["ewest"]]


def test_encode_ids_unknown_char_maps_to_unk(spark, tmp_path):
    from rs_graphdb_spark.functions.bpe import bpe_artifact, bpe_encode_ids
    train = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    m, v = bpe_train(train, "text", num_merges=1)
    art = bpe_artifact(m, v)
    new = spark.createDataFrame([(9, "ab zq")], "doc_id long, text string")
    enc = {(r["doc_id"], r["word_idx"]): r["ids"]
           for r in bpe_encode_ids(new, "doc_id", "text", art).collect()}
    assert enc[(9, 0)] == [2]          # merged 'ab' = id 2 after a,b
    assert enc[(9, 1)] == [-1, -1]     # z, q unseen -> unk


def test_duckdb_twin_matches(spark, corpus):
    import duckdb
    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    m_sql, c_sql = bpe_sql(num_merges=6)
    m, _ = bpe_train(corpus, "text", num_merges=6)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]
    got = [(r[1], r[2]) for r in con.execute(m_sql + " ORDER BY rank").fetchall()]
    assert got == ml
    cnt_spark = {r["doc_id"]: r["n_bpe_tokens"]
                 for r in bpe_token_counts(
                     corpus, "doc_id", "text", ml).collect()}
    cnt_duck = dict(con.execute(c_sql).fetchall())
    assert cnt_spark == cnt_duck


# ---------------------------------------------------------------- r8:
# byte-level (GPT-2 byte table) BPE + the broadcast_words gate


def test_byte_table_is_a_bijection():
    from rs_graphdb_spark.functions.bpe import (
        bytes_to_unicode, unicode_to_bytes)
    b2u = bytes_to_unicode()
    assert sorted(b2u) == list(range(256))
    assert len(set(b2u.values())) == 256
    # every byte symbol is ONE codepoint with no whitespace — the padded
    # doubled-space algebra's invariant
    assert all(len(c) == 1 and not c.isspace() for c in b2u.values())
    assert unicode_to_bytes() == {c: b for b, c in b2u.items()}


def test_byte_level_train_matches_char_level_on_ascii(corpus):
    # on pure-ASCII text every char is one byte, so byte-level training
    # must learn the identical merge list (symbols differ only by table)
    mc, _ = bpe_train(corpus, "text", num_merges=6)
    mb, _ = bpe_train(corpus, "text", num_merges=6, byte_level=True)
    char_merges = [(r["l"], r["r"], r["pc"])
                   for r in mc.orderBy("rank").collect()]
    byte_merges = [(r["l"], r["r"], r["pc"])
                   for r in mb.orderBy("rank").collect()]
    assert byte_merges == char_merges  # ascii printable maps to itself


def test_byte_level_word_roundtrip_no_unks(spark, corpus):
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_decode_ids, bpe_encode_ids)
    from rs_graphdb_spark.functions.text import tokenize
    m, v = bpe_train(corpus, "text", num_merges=6, byte_level=True)
    art = bpe_artifact(m, v, byte_level=True)
    assert len(art["alphabet"]) == 256 and art["byte_level"]
    docs = spark.createDataFrame(
        [(1, "low lower café 東京 naïve"), (2, "newest русский 한국어")],
        "doc_id long, text string")
    words = {(r["doc_id"], r["word_idx"]): r["word"]
             for r in docs.select(
                 "doc_id",
                 F.posexplode(tokenize("text", "unicode"))
                 .alias("word_idx", "word")).collect()}
    enc = bpe_encode_ids(docs, "doc_id", "text", art,
                         mode="unicode").collect()
    assert len(enc) == len(words)
    for r in enc:
        assert all(i >= 0 for i in r["ids"]), r  # byte fallback: no unks
        assert bpe_decode_ids(r["ids"], art) == \
            words[(r["doc_id"], r["word_idx"])]


def test_encode_strings_lossless_arbitrary_unicode(spark, corpus):
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_decode_ids, bpe_encode_strings)
    m, v = bpe_train(corpus, "text", num_merges=6, byte_level=True)
    art = bpe_artifact(m, v, byte_level=True)
    cases = ["hello world", "東京タワー 2024", "naïve café ☕",
             "emoji: 😀🎉👍", "mixed  sp\taces\nand newlines", "",
             "русский текст", "한국어", "\U0001F469‍\U0001F4BB",
             "punct!@#$%^&*()[]{};:'\",.<>/?\\|`~"]
    sdf = spark.createDataFrame(list(enumerate(cases)), "id long, s string")
    out = {r["id"]: r["ids"]
           for r in bpe_encode_strings(sdf, "id", "s", art).collect()}
    for i, c in enumerate(cases):
        assert all(x is not None and x >= 0 for x in out[i])
        assert bpe_decode_ids(out[i], art) == c
    # learned ascii merges still apply inside byte space
    lows = spark.createDataFrame([(0, "low")], "id long, s string")
    (row,) = bpe_encode_strings(lows, "id", "s", art).collect()
    assert len(row["ids"]) == 1  # 'low' merged to a single token


def test_encode_strings_rejects_char_level_artifact(spark, corpus):
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_encode_strings)
    m, v = bpe_train(corpus, "text", num_merges=2)
    art = bpe_artifact(m, v)
    sdf = spark.createDataFrame([(0, "x")], "id long, s string")
    with pytest.raises(ValueError, match="byte_level"):
        bpe_encode_strings(sdf, "id", "s", art)


def test_byte_level_token_budget_parity(spark, corpus):
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_encode_ids)
    m, v = bpe_train(corpus, "text", num_merges=6, byte_level=True)
    art = bpe_artifact(m, v, byte_level=True)
    ml = [tuple(x) for x in art["merges"]]
    budget = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_token_counts(
                  corpus, "doc_id", "text", ml, byte_level=True).collect()}
    per_word = (bpe_encode_ids(corpus, "doc_id", "text", art)
                .groupBy("doc_id")
                .agg(F.sum(F.size("ids")).alias("n")).collect())
    assert budget == {r["doc_id"]: r["n"] for r in per_word}


def test_broadcast_words_gate_plan_shape(corpus):
    m, _ = bpe_train(corpus, "text", num_merges=2)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]

    def plan(bw):
        df = bpe_encode(corpus, "doc_id", "text", ml,
                        broadcast_words=bw)
        return df._jdf.queryExecution().executedPlan().toString()

    # the open-vocabulary plan: a real shuffle join, NO BroadcastExchange
    off = plan(False)
    assert "BroadcastExchange" not in off
    assert "ShuffledHashJoin" in off or "SortMergeJoin" in off
    # the bounded-vocabulary plan keeps the broadcast
    assert "BroadcastExchange" in plan(True)
    with pytest.raises(ValueError, match="broadcast_words"):
        bpe_encode(corpus, "doc_id", "text", ml, broadcast_words="yes")


def test_broadcast_words_false_same_answers(corpus):
    m, _ = bpe_train(corpus, "text", num_merges=6)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]
    base = {(r["doc_id"], r["word_idx"]): r["tokens"]
            for r in bpe_encode(corpus, "doc_id", "text", ml).collect()}
    off = {(r["doc_id"], r["word_idx"]): r["tokens"]
           for r in bpe_encode(corpus, "doc_id", "text", ml,
                               broadcast_words=False).collect()}
    assert base == off


def test_decode_rejects_unknown_id(corpus):
    from rs_graphdb_spark.functions.bpe import bpe_artifact, bpe_decode_ids
    m, v = bpe_train(corpus, "text", num_merges=1)
    art = bpe_artifact(m, v)
    with pytest.raises(ValueError, match="unknown token id"):
        bpe_decode_ids([99999], art)


# ---------------------------------------------------------------------------
# Arrow encode kernel (r8 VERDICT item #1): production merge counts
# ---------------------------------------------------------------------------


def _replace_chain_oracle(word, merges, byte_level=False):
    """The literal padded-doubled-space replace chain in pure Python —
    the exact semantics of the expression path and the DuckDB twin."""
    from rs_graphdb_spark.functions.bpe import bytes_to_unicode
    if byte_level:
        b2u = bytes_to_unicode()
        syms = [b2u[b] for b in word.encode("utf-8")]
    else:
        syms = list(word)
    if not syms:
        return []
    s = " " + "  ".join(syms) + " "
    for left, right in merges:
        s = s.replace(f" {left}  {right} ", f" {left}{right} ")
    return s.strip().split("  ")


def test_apply_merges_py_matches_replace_chain_randomized():
    """The heap kernel must be CHAIN-equivalent (not min-rank-first
    GPT-2 order) — including the case a later merge re-creates an
    earlier merge's pair, which the chain leaves unmerged."""
    import random

    from rs_graphdb_spark.functions.bpe import _apply_merges_py

    rng = random.Random(0xBEEF)
    alpha = "abcd"
    for trial in range(300):
        # random merges over growing symbols, duplicates filtered
        merges, seen, syms_pool = [], set(), list(alpha)
        for _ in range(rng.randint(1, 12)):
            p = (rng.choice(syms_pool), rng.choice(syms_pool))
            if p in seen:
                continue
            seen.add(p)
            merges.append(p)
            syms_pool.append(p[0] + p[1])
        ranks = {p: i for i, p in enumerate(merges)}
        word = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        got = _apply_merges_py(list(word), merges, ranks)
        want = _replace_chain_oracle(word, merges)
        assert got == want, (word, merges, got, want)


def test_apply_merges_py_chain_order_not_min_rank():
    """Directed chain-order case: merge 2 re-creates merge 0's pair;
    the chain (and the kernel) must NOT go back and apply merge 0."""
    from rs_graphdb_spark.functions.bpe import _apply_merges_py

    # word 'abcb': merge0 (c,b)->cb applies => a b cb ;
    # merge1 (b,cb)->bcb applies => a bcb ; merge2 (a,bcb) => abcb.
    # Now suppose merge0 were (a,b): on 'abcb' it applies FIRST (ab c b),
    # then (c,b) at rank1 => ab cb, and a rank2 (ab,cb) => abcb.
    merges = [("a", "b"), ("c", "b"), ("ab", "cb")]
    ranks = {p: i for i, p in enumerate(merges)}
    got = _apply_merges_py(list("abcb"), merges, ranks)
    assert got == ["abcb"]
    assert got == _replace_chain_oracle("abcb", merges)
    # re-creation case: applying (b,c) then (bc,a) leaves a trailing
    # 'b','c' pair created too late for rank 0 to consume
    merges2 = [("b", "c"), ("a", "b"), ("ab", "bc")]
    ranks2 = {p: i for i, p in enumerate(merges2)}
    for w in ("abbc", "babcbc", "bcabbcbc"):
        assert _apply_merges_py(list(w), merges2, ranks2) == \
            _replace_chain_oracle(w, merges2), w


def test_arrow_engine_parity_encode(corpus):
    m, _ = bpe_train(corpus, "text", num_merges=6)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]
    expr = {(r["doc_id"], r["word_idx"]): r["tokens"]
            for r in bpe_encode(corpus, "doc_id", "text", ml,
                                encode_engine="expr").collect()}
    arrow = {(r["doc_id"], r["word_idx"]): r["tokens"]
             for r in bpe_encode(corpus, "doc_id", "text", ml,
                                 encode_engine="arrow").collect()}
    assert expr == arrow


def test_arrow_engine_parity_encode_ids_byte_level(spark, corpus):
    from rs_graphdb_spark.functions.bpe import bpe_artifact, bpe_encode_ids
    m, v = bpe_train(corpus, "text", num_merges=6, byte_level=True)
    art = bpe_artifact(m, v, byte_level=True)
    expr = {(r["doc_id"], r["word_idx"]): r["ids"]
            for r in bpe_encode_ids(corpus, "doc_id", "text", art,
                                    encode_engine="expr").collect()}
    arrow = {(r["doc_id"], r["word_idx"]): r["ids"]
             for r in bpe_encode_ids(corpus, "doc_id", "text", art,
                                     encode_engine="arrow").collect()}
    assert expr == arrow and expr


def test_arrow_engine_parity_encode_strings(spark, corpus):
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_encode_strings)
    m, v = bpe_train(corpus, "text", num_merges=6, byte_level=True)
    art = bpe_artifact(m, v, byte_level=True)
    cases = ["hello world", "東京タワー 2024", "naïve café ☕", "",
             "low lower newest"]
    sdf = spark.createDataFrame(list(enumerate(cases)), "id long, s string")
    expr = {r["id"]: r["ids"]
            for r in bpe_encode_strings(sdf, "id", "s", art,
                                        encode_engine="expr").collect()}
    arrow = {r["id"]: r["ids"]
             for r in bpe_encode_strings(sdf, "id", "s", art,
                                         encode_engine="arrow").collect()}
    assert expr == arrow and len(expr) == len(cases)


def test_encode_strings_preserves_null_rows(spark, corpus):
    """r8 advisor note: a NULL value row must survive the join (null-
    safe) and emit NULL ids — not vanish."""
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_encode_strings)
    m, v = bpe_train(corpus, "text", num_merges=2, byte_level=True)
    art = bpe_artifact(m, v, byte_level=True)
    sdf = spark.createDataFrame(
        [(0, "low"), (1, None), (2, "")], "id long, s string")
    for eng in ("expr", "arrow"):
        out = {r["id"]: r["ids"]
               for r in bpe_encode_strings(sdf, "id", "s", art,
                                           encode_engine=eng).collect()}
        assert set(out) == {0, 1, 2}, eng
        assert out[1] is None and out[2] == [], eng
        assert out[0] and all(i >= 0 for i in out[0]), eng


def test_encode_engine_routing_and_plan_shape(corpus):
    """auto = expr below the threshold (no Python node), arrow at or
    above it (MapInArrow in the plan); bad engine name raises."""
    from rs_graphdb_spark.functions.bpe import _BPE_ARROW_MIN_MERGES
    m, _ = bpe_train(corpus, "text", num_merges=2)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]

    def plan(engine, merges):
        df = bpe_encode(corpus, "doc_id", "text", merges,
                        encode_engine=engine)
        return df._jdf.queryExecution().executedPlan().toString()

    assert "MapInArrow" not in plan("auto", ml)
    assert "MapInArrow" in plan("arrow", ml)
    # pad with never-applying merges to cross the auto threshold
    big = ml + [(f"Z{i}", f"Q{i}") for i in range(_BPE_ARROW_MIN_MERGES)]
    assert "MapInArrow" in plan("auto", big)
    with pytest.raises(ValueError, match="encode_engine"):
        bpe_encode(corpus, "doc_id", "text", ml, encode_engine="numpy")


def test_arrow_engine_large_merge_list_encodes(corpus):
    """The production regime the expression chain cannot express: a
    32k-entry merge list. The kernel's cost is rank-dict lookups, so
    this runs in seconds; answers must equal the 6-merge expr result
    because the 32k padding merges never apply."""
    m, _ = bpe_train(corpus, "text", num_merges=6)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]
    big = ml + [(f"z{i}x", f"q{i}y") for i in range(32_000)]
    want = {(r["doc_id"], r["word_idx"]): r["tokens"]
            for r in bpe_encode(corpus, "doc_id", "text", ml,
                                encode_engine="expr").collect()}
    got = {(r["doc_id"], r["word_idx"]): r["tokens"]
           for r in bpe_encode(corpus, "doc_id", "text", big,
                               encode_engine="auto").collect()}
    assert got == want


def test_rounds_batch_training(corpus):
    """Batched rounds (r8 VERDICT item #7): B symbol-disjoint merges
    per round. The FIRST merge always equals strict order's first (the
    global argmax is selected first in every greedy round); each
    round's picks are symbol-disjoint; the learned merges still encode
    (lossless under byte level is covered elsewhere)."""
    strict, _ = bpe_train(corpus, "text", num_merges=6)
    batched, _ = bpe_train(corpus, "text", num_merges=6, rounds_batch=3)
    s = [(r["l"], r["r"], r["pc"]) for r in strict.orderBy("rank").collect()]
    b = [(r["l"], r["r"], r["pc"]) for r in batched.orderBy("rank").collect()]
    assert len(b) == 6
    assert b[0] == s[0]  # global argmax heads every greedy selection
    # disjointness within each 3-round: no shared symbols or products
    for lo in (0, 3):
        used = set()
        for l_, r_, _pc in b[lo:lo + 3]:
            assert not ({l_, r_, l_ + r_} & used)
            used.update((l_, r_, l_ + r_))
    # learned merges drive a working encode
    ml = [(x[0], x[1]) for x in b]
    out = bpe_encode(corpus, "doc_id", "text", ml).collect()
    assert out and all(r["tokens"] for r in out)
    with pytest.raises(ValueError, match="rounds_batch"):
        bpe_train(corpus, "text", num_merges=2, rounds_batch=0)


def test_tokpack_kernel_path_equals_expr(corpus):
    """Tokenize-and-pack at production vocab (r9 VERDICT item #6): a
    32k-padded artifact routed through the Arrow encode kernel packs
    the IDENTICAL (shard, bin → ids) layout as the 6-merge expr path —
    padding merges never fire, and their ids are assigned AFTER the
    real symbols, so every emitted id (and hence the packed contents)
    is invariant."""
    from rs_graphdb_spark.functions.bpe import bpe_artifact, bpe_encode_ids
    from rs_graphdb_spark.functions.sampling import pack_greedy

    m, v = bpe_train(corpus, "text", num_merges=6)
    art = bpe_artifact(m, v)
    big = dict(art)
    big["merges"] = list(art["merges"]) + [
        (f"z{i}x", f"q{i}y") for i in range(32_000)]

    def packed(a, engine):
        enc = bpe_encode_ids(corpus, "doc_id", "text", a,
                             encode_engine=engine)
        di = (
            enc.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(
                F.struct("word_idx", "ids"))).alias("ws"))
            .select("doc_id",
                    F.flatten(F.transform("ws", lambda s: s["ids"]))
                    .alias("ids"))
            .select("doc_id", F.size("ids").alias("n_ids"),
                    F.concat_ws(",", F.col("ids").cast("array<string>"))
                    .alias("ids_str"))
        )
        pk = pack_greedy(di, "doc_id", "n_ids", budget=16, shards=4)
        return {(r["shard"], r["bin"], r["doc_id"]): r["ids_str"]
                for r in pk.collect()}

    want = packed(art, "expr")
    got = packed(big, "auto")  # auto routes to the Arrow kernel at 32k
    assert got == want
    assert len(want) == 2  # both docs land, each in one (shard, bin)

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

"""Okapi BM25 ranked retrieval — hand-computed known answers.

The reference's full-text surface (`/root/reference/src/index_advanced.rs`)
stops at boolean OR/AND search; BM25 is the beyond-reference ranked form
built on the same inverted index.
"""

import math

import pyspark.sql.functions as F
import pytest

from rs_graphdb_spark.functions.text import bm25, bm25_search


def _expected(corpus, k1=1.2, b=0.75):
    """Straightforward Python BM25 twin (dict-of-floats, same formula)."""
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    dl = {i: len(w) for i, w in toks.items()}
    avgdl = sum(dl.values()) / n
    df = {}
    for w in toks.values():
        for t in set(w):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, w in toks.items():
        for t in set(w):
            tf = w.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            out[(i, t)] = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl[i] / avgdl))
    return out


@pytest.fixture(scope="module")
def corpus():
    return {
        1: "hash join merge hash hash",
        2: "sort merge join",
        3: "scan filter scan",
        4: "hash table probe build",
    }


def test_bm25_matches_hand_formula(spark, corpus):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    got = {(r["doc_id"], r["term"]): r["score"]
           for r in bm25(df, "doc_id", "text").collect()}
    exp = _expected(corpus)
    assert set(got) == set(exp)
    for key, val in exp.items():
        assert got[key] == pytest.approx(val, abs=1e-12), key


def test_bm25_rarer_term_scores_higher(spark, corpus):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    got = {(r["doc_id"], r["term"]): r["score"]
           for r in bm25(df, "doc_id", "text").collect()}
    # 'probe' (df=1) must out-score 'join' (df=2) at the same tf within
    # one document's normalization — compare within doc 4 vs doc 2 terms
    assert got[(4, "probe")] > got[(2, "join")]


def test_bm25_search_sums_query_terms(spark, corpus):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    exp = _expected(corpus)
    got = {r["doc_id"]: r["score"]
           for r in bm25_search(df, "doc_id", "text",
                                ["join", "hash"]).collect()}
    # fixed-order sum: hash then join (sorted), missing term = 0.0
    for doc in (1, 2, 4):
        want = exp.get((doc, "hash"), 0.0) + exp.get((doc, "join"), 0.0)
        assert got[doc] == pytest.approx(want, abs=1e-12)
    assert 3 not in got  # no query term at all -> no row
    # the heavy-tf 'hash' doc must rank first for this query
    assert max(got, key=got.get) == 1


def test_indexed_search_equals_direct(spark, corpus, tmp_path):
    from rs_graphdb_spark.functions.text import (
        bm25_search_indexed, write_bm25_index)
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    idx = str(tmp_path / "bm25idx")
    write_bm25_index(df, "doc_id", "text", idx)
    direct = {r["doc_id"]: r["score"]
              for r in bm25_search(df, "doc_id", "text",
                                   ["hash", "join", "merge"]).collect()}
    indexed = {r["doc_id"]: r["score"]
               for r in bm25_search_indexed(
                   spark, idx, ["hash", "join", "merge"], k=10).collect()}
    assert indexed == direct  # identical doubles: same association, same ints


def test_indexed_search_plan_is_pruned(spark, corpus, tmp_path):
    """The probe scan must show PartitionFilters on tp AND a term
    pushdown — the O(query-postings) contract, independent of corpus."""
    import io
    from contextlib import redirect_stdout

    from rs_graphdb_spark.functions.text import (
        bm25_search_indexed, write_bm25_index)
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    idx = str(tmp_path / "bm25idx2")
    write_bm25_index(df, "doc_id", "text", idx)
    out = bm25_search_indexed(spark, idx, ["hash"], k=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(extended=False)
    plan = buf.getvalue()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "tp" in pf[0].split("PartitionFilters", 1)[1][:200]
    assert any("PushedFilters" in ln
               and "term" in ln.split("PushedFilters", 1)[1][:300]
               for ln in plan.splitlines())


def test_appendable_index_ingest_equals_full_rebuild(spark, corpus, tmp_path):
    """Append-only ingest: index A, append B -> search equals the direct
    BM25 over A∪B exactly, and A's posting files are byte-untouched."""
    import hashlib
    import os

    from rs_graphdb_spark.functions.text import (
        append_bm25_index, bm25_search_indexed, write_bm25_index)

    a = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge probe merge hash scan"), (11, "join join filter")],
        "doc_id long, text string")
    idx = str(tmp_path / "inc")
    write_bm25_index(a, "doc_id", "text", idx, appendable=True)

    def file_md5s(root):
        out = {}
        for r, _d, fs in os.walk(os.path.join(root, "postings")):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
        return out

    before = file_md5s(idx)
    append_bm25_index(spark, idx, b, "doc_id", "text")
    after = file_md5s(idx)
    for p, h in before.items():
        assert after[p] == h  # immutable standing postings
    assert len(after) > len(before)

    direct = {r["doc_id"]: r["score"]
              for r in bm25_search(a.unionByName(b), "doc_id", "text",
                                   ["hash", "join", "merge"]).collect()}
    indexed = {r["doc_id"]: r["score"]
               for r in bm25_search_indexed(
                   spark, idx, ["hash", "join", "merge"], k=20).collect()}
    assert indexed == direct


def test_append_requires_appendable_layout(spark, corpus, tmp_path):
    import pytest as _pytest

    from rs_graphdb_spark.functions.text import (
        append_bm25_index, write_bm25_index)
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    idx = str(tmp_path / "denorm")
    write_bm25_index(df, "doc_id", "text", idx)
    with _pytest.raises(ValueError):
        append_bm25_index(spark, idx, df, "doc_id", "text")


def test_append_batch_id_idempotent_retry(spark, corpus, tmp_path):
    """r8 (advisor note): a committed batch retried under the same
    batch_id is SKIPPED — df/nd/total never double-count."""
    import json

    from rs_graphdb_spark.functions.text import (
        append_bm25_index, bm25_search_indexed, write_bm25_index)
    a = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge probe merge hash scan")], "doc_id long, text string")
    idx = str(tmp_path / "idem")
    write_bm25_index(a, "doc_id", "text", idx, appendable=True)
    assert append_bm25_index(
        spark, idx, b, "doc_id", "text", batch_id="b1") == "committed"
    first = {r["doc_id"]: r["score"]
             for r in bm25_search_indexed(
                 spark, idx, ["hash", "merge"], k=20).collect()}
    meta1 = json.load(open(f"{idx}/_meta.json"))
    assert meta1["batches"] == ["b1"]
    # the retry is a no-op: same status, same meta, same scores
    assert append_bm25_index(
        spark, idx, b, "doc_id", "text", batch_id="b1") \
        == "skipped-duplicate"
    meta2 = json.load(open(f"{idx}/_meta.json"))
    assert meta2 == meta1
    again = {r["doc_id"]: r["score"]
             for r in bm25_search_indexed(
                 spark, idx, ["hash", "merge"], k=20).collect()}
    assert again == first


def test_append_crashed_batch_detected(spark, corpus, tmp_path):
    """A pending marker without a committed meta entry = a crash
    mid-append; the retry must refuse with the rebuild guidance rather
    than double-append."""
    import os

    import pytest as _pytest

    from rs_graphdb_spark.functions.text import (
        append_bm25_index, write_bm25_index)
    a = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge probe")], "doc_id long, text string")
    idx = str(tmp_path / "crash")
    write_bm25_index(a, "doc_id", "text", idx, appendable=True)
    os.makedirs(f"{idx}/_batches", exist_ok=True)
    open(f"{idx}/_batches/b9.pending", "w").write("b9")  # simulated crash
    with _pytest.raises(RuntimeError, match="write_bm25_index"):
        append_bm25_index(spark, idx, b, "doc_id", "text", batch_id="b9")
    # a DIFFERENT batch id (and the default fresh uuid) must ALSO
    # refuse: a stale marker means the WHOLE index may be inconsistent,
    # not just that one batch (r8 advisor note)
    with _pytest.raises(RuntimeError, match="stale pending"):
        append_bm25_index(spark, idx, b, "doc_id", "text", batch_id="b10")
    with _pytest.raises(RuntimeError, match="stale pending"):
        append_bm25_index(spark, idx, b, "doc_id", "text")
    # explicit override for a caller that verified the crash predates
    # the postings append
    assert append_bm25_index(
        spark, idx, b, "doc_id", "text", batch_id="b10",
        allow_stale_pending=True) == "committed"


def test_phrase_search_counts_consecutive_occurrences(spark):
    from rs_graphdb_spark.functions.text import phrase_search
    df = spark.createDataFrame(
        [(1, "hash join hash join merge"),   # two occurrences
         (2, "join hash merge"),             # reversed -> none
         (3, "hash scan join"),              # gap -> none
         (4, "a a a")],                      # overlapping self-phrase
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_search(df, "doc_id", "text",
                                  ["hash", "join"]).collect()}
    assert got == {1: 2}
    tri = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_search(df, "doc_id", "text",
                                  ["a", "a"]).collect()}
    assert tri == {4: 2}  # positions (0,1) and (1,2) both match


def test_proximity_search_window_and_tightest_span(spark):
    from rs_graphdb_spark.functions.text import proximity_search
    df = spark.createDataFrame(
        [(1, "hash x y join"),                 # span 3
         (2, "join a b c d e f g hash"),       # span 8 -> outside w=8
         (3, "merge hash join"),               # hash..join span 1
         (4, "hash only here")],               # missing 'join'
        "doc_id long, text string")
    got = {r["doc_id"]: r["span"]
           for r in proximity_search(df, "doc_id", "text",
                                     ["hash", "join"], window=8).collect()}
    assert got == {1: 3, 3: 1}
    # three-term proximity: all must co-occur
    tri = {r["doc_id"]: r["span"]
           for r in proximity_search(df, "doc_id", "text",
                                     ["merge", "hash", "join"],
                                     window=8).collect()}
    assert tri == {3: 2}


def test_bm25_search_duplicate_terms_count_once(spark, corpus):
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    once = {r["doc_id"]: r["score"]
            for r in bm25_search(df, "doc_id", "text", ["join"]).collect()}
    twice = {r["doc_id"]: r["score"]
             for r in bm25_search(df, "doc_id", "text",
                                  ["join", "join"]).collect()}
    assert once == twice


def test_committed_pending_marker_autoclears(spark, corpus, tmp_path):
    """r9 advisor: a pending marker whose batch_id is already in
    meta['batches'] is provably committed (the crash fell between the
    meta flip and the marker cleanup) — the stale scan clears it
    instead of refusing every future ingest for a durable batch."""
    import os

    from rs_graphdb_spark.functions.text import (
        append_bm25_index, write_bm25_index)
    a = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge probe")], "doc_id long, text string")
    c = spark.createDataFrame(
        [(11, "hash scan")], "doc_id long, text string")
    idx = str(tmp_path / "autoclear")
    write_bm25_index(a, "doc_id", "text", idx, appendable=True)
    assert append_bm25_index(
        spark, idx, b, "doc_id", "text", batch_id="b1") == "committed"
    # simulate the crash window: the commit landed but the marker remove
    # was lost
    open(f"{idx}/_batches/b1.pending", "w").write("b1")
    assert append_bm25_index(
        spark, idx, c, "doc_id", "text", batch_id="b2") == "committed"
    assert not os.path.exists(f"{idx}/_batches/b1.pending")


def test_rebuild_bm25_index_recovers_from_crash(spark, corpus, tmp_path):
    """r9 VERDICT item #5: crash marker → refuse → rebuild → ingest
    proceeds; the rebuilt index matches a clean build row-for-row
    (postings + termstats + meta scalars) and serves the same scores."""
    import json
    import os

    from rs_graphdb_spark.functions.text import (
        append_bm25_index, bm25_search_indexed, rebuild_bm25_index,
        write_bm25_index)
    a = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge probe merge")], "doc_id long, text string")
    full = a.unionByName(b)
    idx = str(tmp_path / "rebuild")
    write_bm25_index(a, "doc_id", "text", idx, appendable=True)
    os.makedirs(f"{idx}/_batches", exist_ok=True)
    open(f"{idx}/_batches/dead.pending", "w").write("dead")
    with pytest.raises(RuntimeError, match="stale pending"):
        append_bm25_index(spark, idx, b, "doc_id", "text", batch_id="x")
    meta = rebuild_bm25_index(spark, idx, full, "doc_id", "text")
    assert meta["batches"] == [] and meta["nd"] == full.count()
    assert not os.path.exists(f"{idx}/_batches/dead.pending")
    # ≡ a clean build over the same corpus
    clean = str(tmp_path / "clean")
    write_bm25_index(full, "doc_id", "text", clean, appendable=True)
    for sub in ("postings", "termstats"):
        got = sorted(map(tuple, spark.read.parquet(
            f"{idx}/{sub}").collect()))
        want = sorted(map(tuple, spark.read.parquet(
            f"{clean}/{sub}").collect()))
        assert got == want, sub
    cm = json.load(open(f"{clean}/_meta.json"))
    assert {k: meta[k] for k in ("nd", "total_tokens", "n_prefix",
                                 "mode", "layout")} \
        == {k: cm[k] for k in ("nd", "total_tokens", "n_prefix",
                               "mode", "layout")}
    # and ingest proceeds after recovery
    nxt = spark.createDataFrame(
        [(11, "hash scan hash")], "doc_id long, text string")
    assert append_bm25_index(
        spark, idx, nxt, "doc_id", "text", batch_id="y") == "committed"
    got = {r["doc_id"]: round(r["score"], 9)
           for r in bm25_search_indexed(
               spark, idx, ["hash", "merge"], k=20).collect()}
    ref2 = str(tmp_path / "ref2")
    write_bm25_index(full.unionByName(nxt), "doc_id", "text", ref2,
                     appendable=True)
    want = {r["doc_id"]: round(r["score"], 9)
            for r in bm25_search_indexed(
                spark, ref2, ["hash", "merge"], k=20).collect()}
    assert got == want

"""Corpus-cleaning operators: PII scrub/audit, cross-doc line dedup,
within-doc repeated-line removal, shuffle-sharding."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from rs_graphdb_spark.functions.cleaning import (
    PII_PATTERNS,
    dedup_lines,
    dedup_lines_within,
    pii_counts,
    scrub_pii,
    shuffle_shard,
)


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "mail me at alice.smith+spam@example.co.uk thanks"),
        (2, "server 192.168.0.1 and backup 10.0.0.255 are up"),
        (3, "call +1-415-555-0199 or 030 1234 5678 now"),
        (4, "card 4111111111111111 acct 12345678901234567"),
        (5, "clean text with no secrets at all"),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_scrub_pii_replaces_each_type(pii_df):
    out = {
        r["doc_id"]: r["c"]
        for r in pii_df.select(
            "doc_id", scrub_pii("text").alias("c")
        ).collect()
    }
    assert out[1] == "mail me at <EMAIL> thanks"
    assert out[2] == "server <IP> and backup <IP> are up"
    assert out[3] == "call <PHONE> or <PHONE> now"
    assert out[4] == "card <NUM> acct <NUM>"
    assert out[5] == "clean text with no secrets at all"
    assert out[6] is None


def test_pii_counts_struct(pii_df):
    rows = {
        r["doc_id"]: r["p"].asDict()
        for r in pii_df.filter(F.col("text").isNotNull())
        .select("doc_id", pii_counts("text").alias("p"))
        .collect()
    }
    assert rows[1]["email"] == 1 and rows[1]["phone"] == 0
    assert rows[2]["ip"] == 2
    assert rows[3]["phone"] == 2
    assert rows[4]["id_number"] == 2
    assert all(v == 0 for v in rows[5].values())


def test_scrub_order_email_before_numbers(spark):
    # digits inside an email must be consumed by the email rule, never
    # left for the bare-number rule to mangle half of
    df = spark.createDataFrame(
        [(1, "x 12345678901234567@example.com y")], "i long, text string"
    )
    assert (
        df.select(scrub_pii("text").alias("c")).first()["c"]
        == "x <EMAIL> y"
    )


@pytest.fixture(scope="module")
def lines_df(spark):
    rows = [
        # "header" is shared boilerplate across 3 docs; "footer" across 2
        (1, "header\nunique one\nfooter"),
        (2, "header\nunique two\nunique two b\nfooter"),
        (3, "header\nunique three"),
        (4, "all mine\nnothing shared"),
        (5, "header"),  # only boilerplate -> empty after dedup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_lines_drops_boilerplate(lines_df):
    out = {
        r["doc_id"]: r
        for r in dedup_lines(lines_df, "doc_id", "text", max_line_df=1).collect()
    }
    assert out[1]["text_clean"] == "unique one"
    assert out[1]["n_kept"] == 1 and out[1]["n_dropped"] == 2
    assert out[2]["text_clean"] == "unique two\nunique two b"
    assert out[3]["text_clean"] == "unique three"
    assert out[4]["text_clean"] == "all mine\nnothing shared"
    assert out[4]["n_dropped"] == 0
    # doc 5 was pure boilerplate but must still be returned
    assert out[5]["text_clean"] == "" and out[5]["n_kept"] == 0
    assert out[5]["n_dropped"] == 1


def test_dedup_lines_max_df_threshold(lines_df):
    # max_line_df=2 keeps the footer (df=2) but still drops header (df=4)
    out = {
        r["doc_id"]: r["text_clean"]
        for r in dedup_lines(lines_df, "doc_id", "text", max_line_df=2).collect()
    }
    assert out[1] == "unique one\nfooter"
    assert out[2] == "unique two\nunique two b\nfooter"
    assert out[5] == ""


def test_dedup_lines_within(spark):
    df = spark.createDataFrame(
        [
            (1, "a\nb\na\nc\nb\na"),
            (2, "x\nx\nx"),
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines_within(df, "doc_id", "text").collect()}
    assert out[1]["text_clean"] == "a\nb\nc"
    assert out[1]["n_kept"] == 3 and out[1]["n_dropped"] == 3
    assert out[2]["text_clean"] == "x"
    assert out[2]["n_dropped"] == 2
    assert out[3]["text_clean"] == "solo" and out[3]["n_dropped"] == 0


def test_dedup_lines_blank_lines_dropped(spark):
    # min_line_chars=1 (default) removes empty lines produced by \n\n
    df = spark.createDataFrame([(1, "a\n\nb\n\na")], "doc_id long, text string")
    out = dedup_lines_within(df, "doc_id", "text").first()
    assert out["text_clean"] == "a\nb"


def test_shuffle_shard_deterministic_and_balanced(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = shuffle_shard(df, "doc_id", 8, seed=7)
    b = shuffle_shard(df, "doc_id", 8, seed=7)
    assert a.select("doc_id", "shard", "sort_key").exceptAll(
        b.select("doc_id", "shard", "sort_key")
    ).count() == 0
    sizes = [r["c"] for r in a.groupBy("shard").agg(F.count("*").alias("c")).collect()]
    assert len(sizes) == 8
    # md5 is uniform: every shard within 2x of the mean on 2000 rows
    assert min(sizes) > 2000 / 8 / 2 and max(sizes) < 2000 / 8 * 2
    # a different seed produces a different permutation
    c = shuffle_shard(df, "doc_id", 8, seed=8)
    assert a.join(c, "doc_id").filter(
        F.col("a.sort_key") if False else a["sort_key"] == c["sort_key"]
    ).count() < 2000


def test_shuffle_shard_matches_reference_hash(spark):
    # pin the exact md5 derivation so the oracle twin can't drift
    df = spark.createDataFrame([(42,)], "doc_id long")
    row = shuffle_shard(df, "doc_id", 8, seed=0).first()
    h = hashlib.md5(b"0:42").hexdigest()
    assert row["sort_key"] == h
    assert row["shard"] == int(h[:8], 16) % 8


def test_shuffle_shard_rejects_bad_n(spark):
    with pytest.raises(ValueError):
        shuffle_shard(spark.range(1), "id", 0)


# ---------------------------------------------------------------------------
# URL hygiene
# ---------------------------------------------------------------------------


def test_url_normalize(spark):
    from rs_graphdb_spark.functions.cleaning import url_normalize

    rows = [
        (1, "HTTP://Example.COM:80/Path/x?b=2&utm_source=tw&a=1#frag"),
        (2, "https://example.com:443"),
        (3, "https://example.com/a?utm_campaign=x"),
        (4, "http://example.com:8080/x"),
        (5, "not a url"),
        (6, "https://example.com/a?z=1&y=2"),
    ]
    df = spark.createDataFrame(rows, "i long, u string")
    out = {r["i"]: r["n"] for r in df.select("i", url_normalize("u").alias("n")).collect()}
    assert out[1] == "http://example.com/Path/x?a=1&b=2"
    assert out[2] == "https://example.com/"
    assert out[3] == "https://example.com/a"
    assert out[4] == "http://example.com:8080/x"
    assert out[5] == "not a url"  # malformed: passed through untouched
    assert out[6] == "https://example.com/a?y=2&z=1"


def test_url_parts_and_domain(spark):
    from rs_graphdb_spark.functions.cleaning import extract_domain, url_parts

    df = spark.createDataFrame(
        [(1, "https://docs.sub.example.com:8443/a/b?q=1#x")], "i long, u string"
    )
    p = df.select(url_parts("u").alias("p"), extract_domain("u").alias("d")).first()
    assert p["p"]["scheme"] == "https"
    assert p["p"]["host"] == "docs.sub.example.com"
    assert p["p"]["port"] == "8443"
    assert p["p"]["path"] == "/a/b"
    assert p["p"]["query"] == "?q=1"
    assert p["d"] == "example.com"


# ---------------------------------------------------------------------------
# hashed-feature linear classifier
# ---------------------------------------------------------------------------


def test_linear_classifier_matches_manual_score(spark):
    import hashlib

    from rs_graphdb_spark.functions.cleaning import (
        linear_text_classifier,
        make_hashed_weights,
    )

    dim = 256
    w = make_hashed_weights(spark, dim=dim, seed=3)
    wmap = {r["feature"]: r["weight"] for r in w.collect()}
    # weights are the pinned md5 derivation
    h0 = int(hashlib.md5(b"3:7").hexdigest()[:8], 16)
    assert abs(wmap[7] - (h0 % 2000001 / 1e6 - 1.0)) < 1e-12

    df = spark.createDataFrame(
        [(1, "good clean prose here"), (2, ""), (3, "good clean")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["score"]
        for r in linear_text_classifier(df, "doc_id", "text", w, dim=dim).collect()
    }

    def manual(text):
        toks = text.split()
        grams = set(toks) | {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        import math

        z = sum(
            wmap[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim]
            for g in grams
        )
        return 1.0 / (1.0 + math.exp(-z))

    assert abs(out[1] - manual("good clean prose here")) < 1e-9
    assert out[2] == 0.5  # empty doc -> sigmoid(0)
    assert abs(out[3] - manual("good clean")) < 1e-9


# ---------------------------------------------------------------------------
# snapshot diff + line-dedup properties
# ---------------------------------------------------------------------------


def test_snapshot_diff_statuses(spark):
    from rs_graphdb_spark.functions.cleaning import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma"), (3, "delta")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "ALPHA  beta!"),   # normalized-identical -> unchanged
            (2, "gamma edited"),   # changed
            (4, "brand new"),      # added
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new, "doc_id", "text").collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_dedup_lines_identity_when_threshold_huge(spark):
    from rs_graphdb_spark.functions.cleaning import dedup_lines

    df = spark.createDataFrame(
        [(1, "shared\nmine"), (2, "shared\nyours")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           dedup_lines(df, "doc_id", "text", max_line_df=10_000).collect()}
    assert out[1]["text_clean"] == "shared\nmine"
    assert out[2]["text_clean"] == "shared\nyours"
    assert all(r["n_dropped"] == 0 for r in out.values())


def test_dedup_lines_within_idempotent(spark):
    from rs_graphdb_spark.functions.cleaning import dedup_lines_within

    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x\ny\nx")], "doc_id long, text string"
    )
    once = dedup_lines_within(df, "doc_id", "text").select(
        "doc_id", F.col("text_clean").alias("text")
    )
    twice = dedup_lines_within(once, "doc_id", "text")
    joined = once.join(
        twice.select("doc_id", "text_clean", "n_dropped"), "doc_id"
    ).collect()
    for r in joined:
        assert r["text_clean"] == r["text"]
        assert r["n_dropped"] == 0


# ---------------------------------------------------------------------------
# unicode hygiene
# ---------------------------------------------------------------------------


def test_normalize_text_nfc_and_nfkc(spark):
    from rs_graphdb_spark.functions.cleaning import normalize_text

    df = spark.createDataFrame(
        [
            (1, "caf" + "é"),       # decomposed -> café
            (2, "ﬁle"),               # ﬁ ligature (NFKC -> fi)
            (3, "plain"),
            (4, None),
        ],
        "i long, t string",
    )
    nfc = {r["i"]: r["c"] for r in df.select("i", normalize_text("t").alias("c")).collect()}
    assert nfc[1] == "café" and nfc[2] == "ﬁle" and nfc[3] == "plain"
    assert nfc[4] is None
    nfkc = {r["i"]: r["c"] for r in
            df.select("i", normalize_text("t", "NFKC").alias("c")).collect()}
    assert nfkc[2] == "file"


def test_normalize_text_rejects_bad_form(spark):
    from rs_graphdb_spark.functions.cleaning import normalize_text

    with pytest.raises(ValueError):
        normalize_text("t", "NFX")


def test_strip_control_chars(spark):
    from rs_graphdb_spark.functions.cleaning import strip_control_chars

    df = spark.createDataFrame(
        [(1, "a\x00b​c\td\ne\x7ff")], "i long, t string"
    )
    out = df.select(strip_control_chars("t").alias("c")).first()["c"]
    assert out == "abc\td\nef"  # tab/newline preserved, rest stripped


def test_dedup_lines_null_text_survives(spark):
    # a NULL text document must come back with empty text_clean, not
    # vanish or kill the job (crawl columns are always partly garbage)
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup_lines(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2}
    assert out[2]["text_clean"] == "" and out[2]["n_kept"] == 0
    within = {r["doc_id"]: r for r in
              dedup_lines_within(df, "doc_id", "text").collect()}
    assert within[2]["text_clean"] == ""


def test_extract_domain_psl_rules(spark):
    """Registrable domain honors the public-suffix snapshot: normal
    multi-label rules, wildcard, exception, and the default fall-back
    (VERDICT r3 item #7)."""
    from rs_graphdb_spark.functions.cleaning import extract_domain
    from rs_graphdb_spark.session import local_df

    cases = [
        (1, "https://docs.example.co.uk/x", "example.co.uk"),
        (2, "https://a.b.github.io/", "b.github.io"),
        (3, "https://foo.www.ck/", "www.ck"),        # exception !www.ck
        (4, "https://y.z.ck/", "y.z.ck"),            # wildcard *.ck
        (5, "https://plain.example.com/", "example.com"),
        (6, "https://n.vm.compute.amazonaws.com/q",
         "n.vm.compute.amazonaws.com"),              # 4-label wildcard
        (7, "https://deep.sub.shop.co.uk/", "shop.co.uk"),
        (8, "https://me.blogspot.com/", "me.blogspot.com"),
        (9, "https://www.gov.uk/", "www.gov.uk"),
    ]
    df = local_df(spark, [(i, u) for i, u, _ in cases], "id long, u string")
    got = {r["id"]: r["d"] for r in
           df.select("id", extract_domain("u").alias("d")).collect()}
    assert got == {i: want for i, _, want in cases}


def test_extract_domain_sql_twin_matches(spark):
    """The generated DuckDB CASE (psl_domain_sql) must agree with the
    Spark expression host-for-host — both derive from PSL_SNAPSHOT."""
    import duckdb

    from rs_graphdb_spark.functions.cleaning import (
        extract_domain, psl_domain_sql)
    from rs_graphdb_spark.session import local_df

    hosts = [
        "docs.example.co.uk", "a.b.github.io", "foo.www.ck", "www.ck",
        "y.z.ck", "plain.example.com", "n.vm.compute.amazonaws.com",
        "x.gov.au", "a.b.c.d.net.nz", "e.s3.amazonaws.com",
        "weird", "two.labels",
    ]
    df = local_df(spark, [(h,) for h in hosts], "h string")
    got = {r["h"]: r["d"] for r in df.select(
        "h", extract_domain(F.concat(F.lit("http://"), F.col("h"), F.lit("/")))
        .alias("d")).collect()}
    con = duckdb.connect()
    expr = psl_domain_sql("h")
    want = {h: con.execute(f"SELECT {expr} AS d FROM (SELECT ? AS h)",
                           [h]).fetchone()[0] for h in hosts}
    assert got == want


def test_extract_domain_psl_join_equals_column(spark):
    """The broadcast-joined PSL table form (the full-list production
    path) must return exactly what the inlined expression returns."""
    from rs_graphdb_spark.functions.cleaning import (
        extract_domain, extract_domain_psl_join)
    from rs_graphdb_spark.session import local_df

    hosts = [
        "docs.example.co.uk", "a.b.github.io", "foo.www.ck", "www.ck",
        "y.z.ck", "plain.example.com", "n.vm.compute.amazonaws.com",
        "x.gov.au", "a.b.c.d.net.nz", "e.s3.amazonaws.com",
        "me.blogspot.com", "unknown.example.org", "two.labels",
    ]
    df = local_df(
        spark,
        [(i, f"https://{h}/p") for i, h in enumerate(hosts)],
        "id long, u string",
    )
    want = {r["id"]: r["d"] for r in
            df.select("id", extract_domain("u").alias("d")).collect()}
    got = {r["id"]: r["domain"] for r in
           extract_domain_psl_join(df, "u", "id").collect()}
    assert got == want


def test_html_to_text_cross_engine(spark):
    """WET-style extraction: script/style/comment bodies dropped, block
    boundaries become newlines, entities single-pass decoded — and the
    generated DuckDB chain (html_to_text_sql) is bit-identical."""
    import duckdb

    from rs_graphdb_spark.functions.cleaning import (
        html_to_text, html_to_text_sql)
    from rs_graphdb_spark.session import local_df

    docs = [
        (1, '<html><head><style>p {c: 1}</style>'
            '<script>var x = 1 < 2 && "s";</script></head><body>'
            '<!-- gone --><h1>Title</h1><p>Hello   world</p>'
            '<p>a &amp; b &lt;t&gt; &quot;q&quot; &#39;s&#39;&nbsp;.</p>'
            '<ul><li>one</li><li>two</li></ul>'
            '<div>amp-escape &amp;lt; stays</div></body></html>'),
        (2, 'no markup'),
        (3, ''),
        (4, '<p>unclosed <b>bold'),
        (5, '<DIV>upper <BR>case</DIV>'),
    ]
    df = local_df(spark, docs, "doc_id long, html string")
    got = {r["doc_id"]: r["t"] for r in
           df.select("doc_id", html_to_text("html").alias("t")).collect()}
    assert got[1] == ('Title\nHello world\na & b <t> "q" \'s\' .\n'
                      'one\ntwo\namp-escape &lt; stays')
    assert got[2] == "no markup"
    assert got[3] == ""
    assert got[4] == "unclosed bold"
    assert got[5] == "upper\ncase"

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i, _ in docs) + ") v(doc_id, html)",
        [h for _, h in docs],
    )
    want = dict(con.execute(
        f"SELECT doc_id, {html_to_text_sql('html')} FROM d").fetchall())
    assert got == want


def test_compression_ratio_exact_zlib_and_ordering(spark):
    """Exact zlib lengths per row; repetitive text must compress far
    below high-entropy text; NULL text passes through as NULLs."""
    import zlib

    from rs_graphdb_spark.functions.cleaning import compression_ratio
    from rs_graphdb_spark.session import local_df

    rep = "spam and eggs " * 200
    import random
    _rng = random.Random(5)
    rnd = "".join(_rng.choice("abcdefghijklmnop qrstuvwxyz.,!")
                  for _ in range(2800))
    df = local_df(spark, [(1, rep), (2, rnd), (3, None), (4, "")],
                  "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           compression_ratio(df, "doc_id", "text").collect()}
    for i, t in ((1, rep), (2, rnd)):
        raw = t.encode("utf-8")
        assert out[i]["n_bytes"] == len(raw)
        assert out[i]["n_compressed"] == len(zlib.compress(raw, 6))
    assert out[1]["ratio"] < 0.05 < 0.5 < out[2]["ratio"]
    assert out[3]["n_bytes"] is None and out[3]["ratio"] is None
    assert out[4]["n_bytes"] == 0 and out[4]["n_compressed"] > 0

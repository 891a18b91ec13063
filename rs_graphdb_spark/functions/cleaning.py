"""Corpus-cleaning operators for LLM training-data pipelines.

PII scrubbing, cross-document line (boilerplate) dedup, within-document
repeated-line removal, and deterministic shuffle-sharding — the cleaning
stages that sit between raw crawl and the dedup/quality passes in
:mod:`.dedup` / :mod:`.text` (RefinedWeb line-dedup, CCNet paragraph
hashing, and the common scrub-before-train shape).

Everything here is JVM-side built-in expressions (whole-stage codegen)
except :func:`normalize_text` (Arrow-batched — Spark has no built-in
Unicode normalizer); no row-at-a-time Python anywhere. Determinism contract matches the rest of the
package: only md5-derived hashes appear in result-visible values so the
DuckDB oracle reproduces them bit-for-bit.

Scale notes (100 TB):
- PII scrubbing is a pure scan-stage projection — zero shuffles.
- ``dedup_lines`` shuffles twice: once keyed by line (document-frequency
  count, map-side partial-aggregated, so a viral boilerplate line costs
  one long per partition, not a hot reduce key) and once keyed by doc id
  (ordered reconstruction). The line-df frame carries ONLY (line-hash,
  df), never line text, into the join.
- ``shuffle_shard`` is a projection; the intended write is
  ``repartition(n, "shard").sortWithinPartitions("sort_key")`` — one
  exchange, no global sort.
"""

from __future__ import annotations

import re
from typing import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "scrub_pii",
    "pii_counts",
    "dedup_lines",
    "dedup_lines_within",
    "shuffle_shard",
    "url_parts",
    "url_normalize",
    "extract_domain",
    "extract_domain_psl_join",
    "psl_domain_sql",
    "PSL_SNAPSHOT",
    "hashed_features",
    "hashed_feature_rows",
    "linear_text_classifier",
    "make_hashed_weights",
    "snapshot_diff",
    "strip_control_chars",
    "normalize_text",
    "HTML_STRIP_PATTERNS",
    "HTML_ENTITIES",
    "html_to_text",
    "html_to_text_sql",
]

#: (name, regex, replacement) applied IN ORDER — order is semantic: the
#: email pattern must run before the bare-number pattern or the digits of
#: a phone number inside an address-like token would be mangled first.
#: Patterns are the RE2-compatible subset (no lookaround, no backrefs) so
#: Java regex (Spark) and RE2 (DuckDB) agree character-for-character.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[- .]\(?\d{2,4}\)?[- .]\d{3,4}([- .]?\d{3,4})?", "<PHONE>"),
    ("id_number", r"\b\d{13,19}\b", "<NUM>"),
]


def scrub_pii(
    col: Column | str,
    patterns: Sequence[tuple[str, str, str]] | None = None,
) -> Column:
    """Replace PII spans with typed placeholder tokens.

    A chained ``regexp_replace`` — one codegen'd projection, applied in
    :data:`PII_PATTERNS` order (emails before bare digit runs). The same
    chain in the same order is the oracle's DuckDB form, so scrubbed text
    is bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, repl in patterns or PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(
    col: Column | str,
    patterns: Sequence[tuple[str, str, str]] | None = None,
) -> Column:
    """Struct of per-type PII match counts over the RAW text (each pattern
    counts independently; overlaps between types are intentional — the
    audit question is "how many spans would each rule hit", not "what
    does the scrub chain leave")."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        *[
            F.regexp_count(c, F.lit(pat)).cast("long").alias(name)
            for name, pat, _ in (patterns or PII_PATTERNS)
        ]
    )


def _lines(df: DataFrame, id_col: str, text_col: str, delim: str,
           min_line_chars: int) -> DataFrame:
    """(id, pos, line) — positional explode of the delimited text.

    ``delim`` is a LITERAL delimiter (escaped before it reaches the regex
    split), matching DuckDB's ``string_split``; 0-based ``pos`` drives
    the ordered reconstruction."""
    return (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), re.escape(delim))).alias(
                "pos", "line"
            ),
        )
        .filter(F.length("line") >= min_line_chars)
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    max_line_df: int = 1,
    min_line_chars: int = 1,
) -> DataFrame:
    """Cross-document line dedup (RefinedWeb-style boilerplate removal):
    drop every line that occurs in MORE than ``max_line_df`` distinct
    documents, then reconstruct each document from its surviving lines in
    original order.

    Returns every input document: ``(id_col, text_clean, n_kept,
    n_dropped)`` — ``text_clean`` is ``''`` (empty, not NULL, for stable
    hashing) when all lines were boilerplate.

    Plan: the document-frequency pass aggregates a LINE HASH (md5), not
    the line text — the join back to the positional frame is
    hash-to-hash, so the shuffled df frame is ~40 bytes/distinct-line
    regardless of line length. Lines below ``min_line_chars`` are
    dropped before any shuffle."""
    lines = _lines(df, id_col, text_col, delim, min_line_chars).withColumn(
        "_lh", F.md5("line")
    )
    dfreq = (
        lines.select("_lh", id_col)
        .groupBy("_lh")
        .agg(F.countDistinct(id_col).alias("_df"))
        .filter(F.col("_df") <= max_line_df)
        .select("_lh", F.lit(True).alias("_keep"))
    )
    # LEFT join (not semi): dropped lines must still reach the doc-keyed
    # aggregation so n_dropped comes out of the SAME single pass — the
    # kept flag is folded into one collect_list + filter, one exchange
    flagged = lines.join(dfreq, "_lh", "left")
    rebuilt = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line", "_keep"))
                    ),
                    lambda x: x["_keep"].isNotNull(),
                ),
                lambda x: x["line"],
            ),
            delim,
        ).alias("text_clean"),
        F.count(F.col("_keep")).alias("n_kept"),
        (F.count("*") - F.count(F.col("_keep"))).alias("n_dropped"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
        )
    )


def dedup_lines_within(
    df: DataFrame,
    id_col: str,
    text_col: str,
    delim: str = "\n",
    min_line_chars: int = 1,
) -> DataFrame:
    """Within-document repeated-line removal: keep the FIRST occurrence of
    each distinct line in a document, preserving order (the MassiveText
    within-doc repetition scrub at line granularity).

    Returns ``(id_col, text_clean, n_kept, n_dropped)``. One shuffle
    (groupBy doc+line-hash folds first-occurrence and reconstruction into
    the same doc-keyed exchange via a two-level agg)."""
    lines = _lines(df, id_col, text_col, delim, min_line_chars).withColumn(
        "_lh", F.md5("line")
    )
    firsts = (
        lines.groupBy(id_col, "_lh")
        .agg(
            F.min("pos").alias("pos"),
            F.first("line").alias("line"),
            F.count("*").alias("_n"),
        )
    )
    rebuilt = (
        firsts.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
                delim,
            ).alias("text_clean"),
            F.count("*").alias("n_kept"),
            F.sum("_n").alias("_n_total"),
        )
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("_n_total", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def shuffle_shard(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training-data
    writes: ``shard`` in [0, n_shards) and a ``sort_key`` whose per-shard
    ordering is the seeded pseudo-random training order.

    Both derive from ``md5(seed || ':' || id)`` — engine-reproducible
    (DuckDB: ``('0x'||substr(md5(...),1,8))::BIGINT``), stable across
    runs and cluster sizes, and re-seedable per epoch. Write with
    ``df.repartition(n_shards, "shard").sortWithinPartitions("sort_key")``
    — one exchange; no global sort is ever needed because consumers read
    shards independently."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    return df.withColumn(
        "shard",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards).alias(
            "shard"
        ),
    ).withColumn("sort_key", h)


# ---------------------------------------------------------------------------
# URL hygiene (crawl-pipeline canonicalization)
# ---------------------------------------------------------------------------

#: capture groups: 1 scheme, 2 host[:port], 3 path, 4 ?query (incl. '?')
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?"


def url_parts(col: Column | str) -> Column:
    """Struct (scheme, host, port, path, query) parsed from a URL —
    regex-group extraction only (no UDF), fragment excluded. Malformed
    URLs (no scheme://) parse to empty strings, never NULL/error — a
    crawl column is always partly garbage."""
    c = F.col(col) if isinstance(col, str) else col
    hostport = F.regexp_extract(c, _URL_RE, 2)
    return F.struct(
        F.lower(F.regexp_extract(c, _URL_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)).alias("host"),
        F.regexp_extract(hostport, r":(\d+)$", 1).alias("port"),
        F.regexp_extract(c, _URL_RE, 3).alias("path"),
        F.regexp_extract(c, _URL_RE, 4).alias("query"),
    )


def url_normalize(col: Column | str, strip_params_prefix: str = "utm_") -> Column:
    """Canonical URL: lowercase scheme+host, default ports stripped
    (80/http, 443/https), empty path → '/', fragment dropped, tracking
    params (``strip_params_prefix``) removed and the remainder SORTED so
    parameter order never splits a dedup group. Pure codegen expressions;
    the DuckDB twin applies the identical steps."""
    p = url_parts(col)
    port = F.when(
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
        | (p["port"] == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.regexp_replace(p["query"], r"^\?", ""), "&"),
                lambda kv: (kv != "") & ~kv.startswith(strip_params_prefix),
            )
        ),
        "&",
    )
    query = F.when(params == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), params)
    )
    return F.when(
        p["scheme"] == "", F.col(col) if isinstance(col, str) else col
    ).otherwise(
        F.concat(p["scheme"], F.lit("://"), p["host"], port, path, query)
    )


#: Public-suffix-list snapshot (rules from the public PSL format:
#: plain = public suffix, ``*.`` = wildcard (every label under the tail
#: is a public suffix), ``!`` = exception (that exact name IS
#: registrable). This is a curated subset covering the high-traffic
#: multi-label suffixes; a production pipeline swaps in the full
#: published list — every code path below reads only this constant, so
#: the swap is a one-line change.
PSL_SNAPSHOT = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp", "gr.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr", "pe.kr",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "pages.dev", "netlify.app", "vercel.app", "s3.amazonaws.com",
    "*.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.compute.amazonaws.com",
    "!www.ck",
]


def _psl_tables() -> tuple[dict[int, list[str]], dict[int, list[str]],
                           dict[int, list[str]]]:
    """Partition PSL_SNAPSHOT into (normal-by-label-count,
    wildcard-TAILS-by-tail-label-count, exceptions-by-label-count)."""
    normal: dict[int, list[str]] = {}
    wild: dict[int, list[str]] = {}
    exc: dict[int, list[str]] = {}
    for rule in PSL_SNAPSHOT:
        if rule.startswith("!"):
            name = rule[1:]
            exc.setdefault(name.count(".") + 1, []).append(name)
        elif rule.startswith("*."):
            tail = rule[2:]
            wild.setdefault(tail.count(".") + 1, []).append(tail)
        else:
            normal.setdefault(rule.count(".") + 1, []).append(rule)
    return normal, wild, exc


def extract_domain(col: Column | str) -> Column:
    """Registrable domain under the public-suffix list
    (``docs.example.co.uk`` → ``example.co.uk``; ``a.b.github.io`` →
    ``b.github.io``; wildcard ``*.ck`` and exception ``!www.ck`` rules
    honored). Pure codegen'd expression over :data:`PSL_SNAPSHOT` —
    the longest matching rule wins, exceptions take precedence, and
    hosts under no listed rule fall back to the last two labels (the
    implicit ``*`` default rule). The DuckDB twin
    (:func:`psl_domain_sql`) is generated from the SAME constant.

    For the full published PSL (~9k rules, too many to inline in an
    expression tree) use :func:`extract_domain_psl_join` — the
    broadcast-joined table form with identical semantics."""
    host = url_parts(col)["host"]
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def suf(k: int) -> Column:
        # self-guarding: slice with start 0 (host of exactly k-1 labels)
        # is a runtime error; today every use sits behind an `n >= …`
        # conjunct that short-circuits, but the guard must not depend on
        # callers keeping that operand order
        return F.when(
            n >= k,
            F.concat_ws(".", F.slice(labels, n - F.lit(k) + 1, F.lit(k))),
        ).otherwise(F.lit(""))

    normal, wild, exc = _psl_tables()
    # longest public suffix first; within a length: exception > wildcard
    # > normal (an exception names a registrable domain directly).
    # exception lengths count too: an exception longer than every
    # normal/wildcard suffix must still get a branch (advisor r4)
    max_ps = max([*normal, *(k + 1 for k in wild), *exc, 1])
    expr = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)  # default rule
    for k in range(1, max_ps + 1):  # build inside-out: longest ends on top
        branches = []
        if k in normal:
            branches.append(
                ((n >= k + 1) & suf(k).isin(*normal[k]), suf(k + 1))
            )
        if k - 1 in wild:  # wildcard tail of k-1 labels → suffix of k
            branches.append(
                ((n >= k + 1) & suf(k - 1).isin(*wild[k - 1]), suf(k + 1))
            )
        if k in exc:
            branches.append(((n >= k) & suf(k).isin(*exc[k]), suf(k)))
        for cond, val in branches:
            expr = F.when(cond, val).otherwise(expr)
    return expr


def psl_domain_sql(host_expr: str) -> str:
    """DuckDB CASE expression mirroring :func:`extract_domain`
    bit-for-bit, generated from the same :data:`PSL_SNAPSHOT` — drop it
    into an oracle query wherever the Spark side calls
    ``extract_domain``."""
    normal, wild, exc = _psl_tables()
    ls = f"string_split({host_expr}, '.')"
    n = f"len({ls})"

    def suf(k: int) -> str:
        return f"array_to_string({ls}[{n} - {k} + 1:{n}], '.')"

    def lit(vals: list[str]) -> str:
        inner = ", ".join("'" + v.replace("'", "''") + "'" for v in vals)
        return f"[{inner}]"

    max_ps = max([*normal, *(k + 1 for k in wild), *exc, 1])
    branches: list[tuple[str, str]] = []
    for k in range(max_ps, 0, -1):  # CASE evaluates top-down: longest first
        if k in exc:
            branches.append(
                (f"{n} >= {k} AND list_contains({lit(exc[k])}, {suf(k)})",
                 suf(k))
            )
        if k - 1 in wild:
            branches.append(
                (f"{n} >= {k + 1} AND "
                 f"list_contains({lit(wild[k - 1])}, {suf(k - 1)})",
                 suf(k + 1))
            )
        if k in normal:
            branches.append(
                (f"{n} >= {k + 1} AND "
                 f"list_contains({lit(normal[k])}, {suf(k)})",
                 suf(k + 1))
            )
    whens = "\n".join(f"WHEN {c} THEN {v}" for c, v in branches)
    default = f"regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
    return f"(CASE {whens} ELSE {default} END)"


def extract_domain_psl_join(
    df: DataFrame,
    url_col: str,
    id_col: str,
    out_col: str = "domain",
    rules: list[str] | None = None,
) -> DataFrame:
    """Registrable domain via a BROADCAST-JOINED rule table — the
    production shape for the full published PSL (~9k rules), identical
    semantics to :func:`extract_domain` (property-pinned).

    Plan: each host explodes into its ≤6 trailing-label suffix
    candidates (plus the wildcard-form key for each), one broadcast hash
    join against the rule table, a per-row max on (is_exception,
    suffix-length) picks the winning rule, and the registrable domain is
    sliced arithmetically — no corpus-sized shuffle anywhere; the only
    exchange is the groupBy on ``id_col``, which a pre-partitioned
    corpus reuses."""
    spark = df.sparkSession
    rows = []
    for rule in (rules if rules is not None else PSL_SNAPSHOT):
        if rule.startswith("!"):
            name, kind = rule[1:], 2
        elif rule.startswith("*."):
            name, kind = rule, 1  # keyed by its literal '*.tail' form
        else:
            name, kind = rule, 0
        rows.append((name, kind, name.count(".") + 1))
    from rs_graphdb_spark.session import local_df

    rules_df = local_df(
        spark, rows, "rule string, kind int, nlabels int"
    )
    host = url_parts(F.col(url_col))["host"]
    base = df.select(
        F.col(id_col), host.alias("_host"),
        F.split(host, r"\.").alias("_ls"),
    ).withColumn("_n", F.size("_ls"))
    # candidate keys: each trailing suffix of ≤6 labels, in both its
    # literal and wildcard ('*.'+tail-after-first-label) forms
    cand = base.select(
        id_col, "_host", "_ls", "_n",
        F.explode(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.col("_n"), F.lit(6))),
                    lambda k: F.concat_ws(
                        ".", F.slice(F.col("_ls"), F.col("_n") - k + 1, k)
                    ),
                ),
                lambda s: s != "",
            )
        ).alias("_suf"),
    ).withColumn(
        "_wsuf",
        F.when(
            F.size(F.split(F.col("_suf"), r"\.")) >= 2,
            F.concat(F.lit("*."), F.regexp_replace("_suf", r"^[^.]+\.", "")),
        ),
    )
    hits = cand.join(
        F.broadcast(rules_df),
        (F.col("_suf") == F.col("rule")) | (F.col("_wsuf") == F.col("rule")),
    ).select(
        id_col, "_n", "_ls",
        # winning rule: exceptions dominate, then longest public suffix.
        # For an exception the registrable domain IS the matched name; a
        # wildcard rule's public suffix is one label longer than its tail
        # key ('*.'+tail matches 'label.tail').
        F.struct(
            (F.col("kind") == 2).alias("_is_exc"),
            # a '*.'-form key's label count IS the matched public-suffix
            # length ('*.tail' has tail-labels + 1 == suffix labels), so
            # every kind uses nlabels directly
            F.col("nlabels").alias("_ps_len"),
            F.col("kind").alias("_kind"),
        ).alias("_m"),
    )
    best = hits.groupBy(id_col).agg(F.max("_m").alias("_m"),
                                    F.first("_n").alias("_n"),
                                    F.first("_ls").alias("_ls"))
    dom = F.when(
        F.col("_m._is_exc"),
        F.concat_ws(
            ".", F.slice(F.col("_ls"), F.col("_n") - F.col("_m._ps_len") + 1,
                         F.col("_m._ps_len")),
        ),
    ).otherwise(
        F.when(
            F.col("_n") >= F.col("_m._ps_len") + 1,
            F.concat_ws(
                ".",
                F.slice(F.col("_ls"),
                        F.col("_n") - F.col("_m._ps_len"),
                        F.col("_m._ps_len") + 1),
            ),
        )
    )
    matched = best.select(F.col(id_col), dom.alias(out_col))
    default_dom = F.regexp_extract(F.col("_host"), r"([^.]+\.[^.]+)$", 1)
    return (
        base.join(matched, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(out_col), default_dom).alias(out_col),
        )
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear text classifier (the fasttext-style quality-filter
# serving shape: explode → hash → broadcast-join weights → doc-sum → sigmoid)
# ---------------------------------------------------------------------------


def _grams(tk: Column) -> Column:
    """Unigram + bigram array from a TOKEN-ARRAY column."""
    n = F.size(tk)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", tk[i], tk[i + 1]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(tk, bigrams)


def hashed_features(col: Column | str, dim: int = 1 << 16) -> Column:
    """Word-unigram + bigram hashed feature ids (md5 → [0, dim)) — the
    hashing-trick featurizer as a single Column expression. Distinct per
    doc (binary features, the fasttext default for classification).

    NB: as one expression the tokenizer regex gets inlined into every
    element access (CollapseProject), so this form is for small frames /
    composition convenience; the hot path is :func:`hashed_feature_rows`,
    which stages the token array in its own projection first (measured
    4× faster at sf0.1)."""
    from rs_graphdb_spark.functions.dedup import md5_long
    from rs_graphdb_spark.functions.text import tokenize

    return F.array_distinct(
        F.transform(_grams(tokenize(col)), lambda g: md5_long(g) % dim)
    )


def hashed_feature_rows(
    df: DataFrame, id_col: str, text_col: str, dim: int = 1 << 16
) -> DataFrame:
    """DISTINCT ``(id_col, feature)`` rows — the staged scale path of
    :func:`hashed_features` (identical feature values).

    The token array is materialized in ITS OWN projection before the
    gram expressions touch it: expressed as one tree, CollapseProject
    inlines the tokenizer regex into every element access and the
    gram explode runs the regex hundreds of times per document
    (measured 6.8 s → 1.7 s at sf0.1 for the classifier). The md5 →
    feature hash runs codegen'd on the EXPLODED column, and per-doc
    distinctness is a dropDuplicates on the slim (id, feature) pair."""
    from rs_graphdb_spark.functions.dedup import md5_long
    from rs_graphdb_spark.functions.text import tokenize

    # Fan out under-split inputs (r11, guide §6): a small-but-dense
    # parquet file scans as 1-2 splits, so the expensive projection
    # (regex tokenize + gram explode + md5 per gram) ran on 2 cores —
    # measured 6.1 s for 5.5M gram rows at the 10× corpus, with 30
    # cores idle. One cheap exchange of the raw text (hash by id —
    # deterministic under task retry, guide §2.5) buys full-width
    # compute; already-parallel inputs (a real 100 TB table) skip it.
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par, id_col)
    staged = df.select(F.col(id_col), tokenize(text_col).alias("_tk"))
    return (
        staged.select(F.col(id_col), F.explode(_grams(F.col("_tk"))).alias("_g"))
        .select(F.col(id_col), (md5_long(F.col("_g")) % dim).alias("feature"))
        .dropDuplicates([id_col, "feature"])
    )


def make_hashed_weights(
    spark, dim: int = 1 << 16, seed: int = 0
) -> DataFrame:
    """Deterministic demo weight table ``(feature LONG, weight DOUBLE)`` in
    [-1, 1) — the stand-in for a trained quality classifier's exported
    weights (fasttext / logistic regression over hashed n-grams). A real
    pipeline loads its table from parquet; everything downstream
    (broadcast join, doc-sum, sigmoid) is identical. Weights derive from
    md5(seed:feature) so the oracle regenerates them in SQL."""
    ids = spark.range(0, dim).select(F.col("id").alias("feature"))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("feature"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return ids.select(
        "feature",
        ((h % 2000001) / F.lit(1000000.0) - 1.0).alias("weight"),
        # integer micro-units: summing DOUBLES is addition-order-dependent
        # (Spark vs any oracle engine drifts in the last ulps); summing
        # micro-LONGS is exact and order-free — use this column whenever
        # the aggregate must be reproducible bit-for-bit across engines
        ((h % 2000001) - 1000000).cast("long").alias("weight_micro"),
    )


def linear_text_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    dim: int = 1 << 16,
    bias: float = 0.0,
) -> DataFrame:
    """Score documents with a linear model over hashed n-gram features:
    ``sigmoid(bias + Σ weight[h(g)])`` for the doc's DISTINCT grams.

    Returns ``(id_col, score DOUBLE)``. Plan: one scan-stage explode of
    hashed feature ids, a broadcast hash join against the (≤ ``dim``-row)
    weight table, and one doc-keyed partial-aggregated sum — the shape
    that serves a fasttext-class quality filter over 100 TB without any
    Python. Docs with zero features score ``sigmoid(bias)``."""
    feats = hashed_feature_rows(df, id_col, text_col, dim)
    scored = (
        feats.join(F.broadcast(weights), "feature")
        .groupBy(id_col)
        .agg(F.sum("weight").alias("_z"))
    )
    z = F.coalesce(F.col("_z"), F.lit(0.0)) + F.lit(bias)
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("score"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Corpus snapshot diff for incremental pipeline runs: classify every
    id across two snapshots as ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` by content fingerprint (normalized-token md5, the same
    fingerprint exact-dedup keys on).

    Returns ``(id_col, status)``. Plan: each side reduces to (id, fp) at
    scan stage — the full-outer join shuffles two slim hash frames, never
    text. Downstream incremental stages re-process ONLY
    ``added``/``changed`` ids (e.g. feed them to ``minhash_probe``
    against the standing index) — the 100 TB nightly-refresh shape where
    re-running the whole corpus is the thing you cannot afford."""
    from rs_graphdb_spark.functions.text import fingerprint

    o = old.select(F.col(id_col), fingerprint(text_col).alias("_fp_old"))
    n = new.select(F.col(id_col), fingerprint(text_col).alias("_fp_new"))
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


# ---------------------------------------------------------------------------
# Unicode hygiene
# ---------------------------------------------------------------------------

#: C0 controls (minus \t\n\r), DEL, and zero-width characters (ZWSP,
#: ZWNJ, ZWJ, BOM) — the bytes that break tokenizers and dedup keys
_CONTROL_RE = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
    "\\u200b\\u200c\\u200d\\ufeff]"
)


def strip_control_chars(col: Column | str) -> Column:
    """Remove C0 control characters (keeping tab/newline/CR), DEL, and
    zero-width characters — pure codegen'd ``regexp_replace``, zero
    shuffles, identical RE2 form in the oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _CONTROL_RE, "")


def normalize_text(col: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the canonicalization
    step before any hashing/dedup pass (combining-mark sequences and
    compatibility variants otherwise make visually-identical documents
    hash apart).

    Spark has no built-in normalizer, so this is the module's one
    Arrow-batched Python stage (`pandas.Series.str.normalize`, vectorized
    per batch — same tier as the multimodal codecs, never per-row
    dispatch). The DuckDB oracle twin is ``nfc_normalize`` (verified
    md5-identical output on composed/decomposed fixtures)."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    c = F.col(col) if isinstance(col, str) else col
    return _norm(c)


# ---------------------------------------------------------------------------
# HTML → text extraction (WET-style)
# ---------------------------------------------------------------------------

#: (regex, replacement) applied IN ORDER — order is semantic: script/
#: style/noscript blocks must go (content included) before the generic
#: tag rule or their bodies would leak as text; block-level closers turn
#: into newlines BEFORE remaining tags collapse to spaces so paragraph
#: structure survives. RE2-compatible subset (lazy quantifiers, inline
#: (?is) flags; no lookaround/backrefs) so Java regex (Spark) and RE2
#: (DuckDB) agree character-for-character.
HTML_STRIP_PATTERNS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<noscript[^>]*>.*?</noscript>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<(br|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table)[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
]

#: entity → character, applied IN ORDER after tag stripping; ``&amp;``
#: decodes LAST (the standard single-pass rule: '&amp;lt;' must yield the
#: literal text '&lt;', not '<')
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

#: final whitespace canonicalization, in order: horizontal runs → one
#: space, spaces hugging a newline dropped, newline runs → one newline,
#: leading/trailing whitespace stripped (explicit class, not \s — Java
#: and RE2 disagree on whether \s matches \x0b)
_HTML_WS_PATTERNS: list[tuple[str, str]] = [
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^[ \n]+", ""),
    (r"[ \n]+$", ""),
]


def html_to_text(col: Column | str) -> Column:
    """Extract visible text from an HTML document column (the WARC→WET
    step at the head of every web-crawl training pipeline): drop
    script/style/noscript bodies and comments, convert block-level
    boundaries to newlines, strip remaining tags, decode the five XML
    entities + ``&nbsp;``, and canonicalize whitespace.

    One chained ``regexp_replace``/``replace`` projection — pure
    whole-stage codegen, zero shuffles, so extracting a 100 TB crawl is a
    scan stage. The identical chain in the identical order is emitted for
    DuckDB by :func:`html_to_text_sql`, so extracted text is
    bit-identical across engines. This is deliberately a regex extractor
    (CommonCrawl-WET fidelity class), not a DOM parser: no entity
    numeric-range decoding beyond ``&#39;``, no table layout, and a tag
    whose NAME merely starts with a block-boundary name (``<broken>``
    matching the ``br`` rule) is treated as a boundary — RE2 has no
    lookahead to forbid it, and both engines share the behavior. Swap a
    native extractor behind the same column contract for DOM-accurate
    corpora.
    """
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in HTML_STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    for ent, ch in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    for pat, repl in _HTML_WS_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def html_to_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text`, generated from the SAME
    pattern tables (single source of truth — the PSL/PII convention)."""

    def q(s: str) -> str:
        if "\n" in s:
            # newline replacements ride as chr(10) expressions — DuckDB
            # string literals have no escape form inside plain quotes
            parts = s.split("\n")
            lits = []
            for i, p in enumerate(parts):
                if i:
                    lits.append("chr(10)")
                if p:
                    lits.append("'" + p.replace("'", "''") + "'")
            return " || ".join(lits) if lits else "''"
        return "'" + s.replace("'", "''") + "'"

    e = expr
    for pat, repl in HTML_STRIP_PATTERNS:
        e = f"regexp_replace({e}, {q(pat)}, {q(repl)}, 'g')"
    for ent, ch in HTML_ENTITIES:
        e = f"replace({e}, {q(ent)}, {q(ch)})"
    for pat, repl in _HTML_WS_PATTERNS:
        e = f"regexp_replace({e}, {q(pat)}, {q(repl)}, 'g')"
    return e


def compression_ratio(
    df: "DataFrame", id_col: str, text_col: str, level: int = 6
) -> "DataFrame":
    """zlib-DEFLATE compressibility per document — the classic
    machine-generated/boilerplate quality signal (highly repetitive text
    compresses far below prose; the RefinedWeb/Gopher-era filters cut on
    exactly this): returns ``(id_col, n_bytes, n_compressed, ratio)``
    with ``ratio = n_compressed / max(n_bytes, 1)`` at 6 dp.

    Spark has no DEFLATE expression, so this is an Arrow-batched stage
    (zlib's C deflate per row inside one ``mapInArrow`` batch — same
    justified-Python tier as Unicode normalization and the codecs).
    Zero shuffles: the signal is a scan-stage projection, so scoring
    100 TB parallelizes embarrassingly. DuckDB has no DEFLATE either, so
    this operator is pytest-pinned (exact zlib lengths) rather than
    driver-oracled — the one mechanically-unavoidable exception to the
    cross-engine contract."""
    import pyarrow as pa
    import zlib

    def _fn(batches):
        for batch in batches:
            texts = batch.column(1).to_pylist()
            nb, nc, ratio = [], [], []
            for t in texts:
                if t is None:
                    nb.append(None)
                    nc.append(None)
                    ratio.append(None)
                    continue
                raw = t.encode("utf-8")
                comp = len(zlib.compress(raw, level))
                nb.append(len(raw))
                nc.append(comp)
                ratio.append(round(comp / max(len(raw), 1), 6))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0),
                 pa.array(nb, type=pa.int64()),
                 pa.array(nc, type=pa.int64()),
                 pa.array(ratio, type=pa.float64())],
                [batch.schema.names[0], "n_bytes", "n_compressed", "ratio"],
            )

    # id passes through untouched — declare its REAL type (a hardcoded
    # `long` would mismatch string/int32 ids at runtime)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInArrow(
        _fn,
        f"{id_col} {id_type}, n_bytes long, n_compressed long, ratio double",
    )

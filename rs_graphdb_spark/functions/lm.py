"""N-gram language-model perplexity scoring (the CCNet quality gate).

CCNet (Wenzek et al. 2020) ranks crawl documents by the perplexity of a
small LM trained on a trusted reference corpus, then keeps the head of
the distribution. The same shape here, Spark-first:

- :func:`bigram_counts` trains the LM: ONE corpus scan → explode
  BOS-prefixed token bigrams → ``groupBy`` counts (map-side combined, so
  a viral bigram costs one long per partition, not a hot reduce key).
- :func:`score_bigram_lm` scores documents with add-k smoothing:
  ``logP(w_i | w_{i-1}) = ln((c(w_{i-1} w_i) + k) / (c(w_{i-1}) + k·V))``
  via a LEFT join of the document's bigrams against the count table,
  then one doc-keyed aggregation. Per-doc NLL = −mean logP; perplexity
  = exp(NLL).
- :func:`ccnet_buckets` cuts head / middle / tail on NLL thresholds.

Scale shape (100 TB): the LM table is vocabulary-bounded (≤ observed
bigram types, DF-cappable), independent of corpus row count — broadcast
it when it fits (``broadcast_lm=True``), fall back to a shuffle join
keyed by the bigram when a giant open-domain vocabulary doesn't. Scoring
is one explode + one join + one aggregation; nothing is ever collected
to the driver. No Python UDFs anywhere.

Determinism contract: counts and match counts are integers (bit-exact
across engines); NLL is a sum of ``ln`` over per-doc bigrams in document
order on both engines and is compared at 6 dp (the classifier-sigmoid
precedent: transcendental tails pinned by unit test, integer mechanism
by the driver oracle).

Reference anchor: extends the §2.8 text-analysis family
(`/root/reference/src/index_advanced.rs:72-88` tokenizer) — the
reference has no LM scorer; this is part of the beyond-reference
training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokenize

__all__ = [
    "BOS",
    "bigram_counts",
    "ngram_counts",
    "lm_vocab_size",
    "score_bigram_lm",
    "score_interpolated_lm",
    "score_kn_lm",
    "ccnet_buckets",
]

#: beginning-of-document marker — cannot collide with real tokens (the
#: tokenizer emits lowercase alphanumerics only)
BOS = "<s>"


def _bigrams(text_col: Column | str, mode: str = "ascii") -> Column:
    """BOS-prefixed bigram strings ``"w1 w2"`` of a text column, in
    document order.

    The token array is bound ONCE as a lambda variable (the
    single-element-``transform`` idiom from
    ``text.quality_features_struct``): a plain expression reference would
    be re-inlined by projection collapse at every ``element_at`` — i.e.
    the regexp tokenizer re-run TWICE PER BIGRAM (measured 10.2 s for a
    5 000-doc count at sf0.1; 0.6 s bound)."""
    return F.transform(
        F.array(F.concat(F.array(F.lit(BOS)), tokenize(text_col, mode))),
        # guard: sequence(1, 0) would generate a DESCENDING [1, 0] — an
        # empty doc (w = [BOS] alone) must yield zero bigrams, not garbage
        lambda w: F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    mode: str = "ascii",
) -> DataFrame:
    """Train the LM: ``(w1, w2, cnt)`` bigram counts over ``df``.

    ``min_count`` prunes singleton bigram types (the standard LM-size
    cap — at web scale the count table is Zipf-dominated by hapaxes;
    pruned mass falls through to the smoothed floor). One scan, one
    map-side-combined aggregation."""
    out = (
        df.select(F.explode(_bigrams(text_col, mode)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
            F.col("cnt"),
        )
    )
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def lm_vocab_size(lm: DataFrame) -> int:
    """V for add-k smoothing: distinct successor types in the LM (every
    corpus token occurs as some bigram's ``w2`` — BOS guarantees the
    first token does too). k-row collect (a scalar), never corpus data."""
    return lm.select(F.countDistinct("w2").alias("v")).first()["v"]


def score_bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    broadcast_lm: bool = True,
    mode: str = "ascii",
) -> DataFrame:
    """Per-document add-k bigram NLL / perplexity against a trained LM.

    Returns ``(id_col, n_bigrams, n_matched, sum_cb, nll, ppl)`` —
    ``n_matched``/``sum_cb`` are the integer mechanism checks (bigrams
    found in the LM, summed LM counts); ``nll`` is mean negative log
    prob, ``ppl = exp(nll)``. Empty docs (0 bigrams) score NULL nll/ppl
    rather than a fake 0. The LM join is LEFT: unseen bigrams smooth to
    ``k / (c(w1) + k·V)`` and unseen contexts to ``1 / V``."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    ctx = lm.groupBy("w1").agg(F.sum("cnt").alias("cw"))
    lmj = lm.select(
        F.concat_ws(" ", "w1", "w2").alias("g"), F.col("cnt").alias("cb")
    )
    if broadcast_lm:
        lmj, ctx = F.broadcast(lmj), F.broadcast(ctx)
    bg = df.select(
        F.col(id_col), F.explode(_bigrams(text_col, mode)).alias("g")
    ).withColumn("w1", F.split_part(F.col("g"), F.lit(" "), F.lit(1)))
    kv = float(k) * float(vocab_size)
    scored = (
        bg.join(lmj, "g", "left")
        .join(ctx, "w1", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count("cb").alias("n_matched"),
            F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("sum_cb"),
            F.sum(
                -F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(float(k)))
                    / (F.coalesce(F.col("cw"), F.lit(0)) + F.lit(kv))
                )
            ).alias("_nll_sum"),
        )
    )
    out = scored.select(
        id_col,
        "n_bigrams",
        "n_matched",
        "sum_cb",
        (F.col("_nll_sum") / F.col("n_bigrams")).alias("nll"),
        F.exp(F.col("_nll_sum") / F.col("n_bigrams")).alias("ppl"),
    )
    # docs with no tokens produce no bigram rows — restore them with NULLs
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.coalesce("sum_cb", F.lit(0)).cast("long").alias("sum_cb"),
            "nll",
            "ppl",
        )
    )


def score_kn_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: DataFrame,
    vocab_size: int,
    discount: float = 0.75,
    broadcast_lm: bool = True,
    mode: str = "ascii",
) -> DataFrame:
    """Interpolated bigram Kneser-Ney scoring with absolute discounting —
    the credible production form of the CCNet gate (KenLM-style backoff
    rather than add-k). Per predicted token:

    - seen context (``c(w1) > 0``)::

        P(w2|w1) = max(c(w1 w2) − D, 0) / c(w1)
                 + (D · N1+(w1 ·) / c(w1)) · Pcont(w2)

    - unseen context: full backoff, ``P = Pcont(w2)``

    where ``N1+(w1 ·)`` is the context's continuation fan-out (distinct
    successor types of ``w1``), and the continuation distribution is
    add-one smoothed over the observed vocabulary so unseen words keep a
    positive floor::

        Pcont(w2) = (N1+(· w2) + 1) / (T + V)

    with ``T`` = total distinct bigram types in the LM and ``V`` =
    ``vocab_size``. Absolute discounting keeps every mechanism quantity
    an integer (type counts, fan-outs, continuation counts), so the
    cross-engine contract survives: returns ``(id_col, n_bigrams,
    n_matched, sum_cont, nll, ppl)`` where ``sum_cont`` is the summed
    continuation counts of the doc's predicted tokens (bit-exact) and
    nll/ppl are the 6-dp transcendental tail. The discounted mass
    ``D·N1+(w1·)/c(w1)`` is exactly what the max-subtraction removes, so
    each seen-context distribution sums to 1 (Chen & Goodman 1999 eq. 4).

    Plan: the same shape as :func:`score_bigram_lm` — one explode, three
    broadcast joins against vocabulary-bounded tables (bigram, context
    stats, continuation counts), one doc-keyed aggregation; ``T`` is a
    one-scalar action on the LM table, never corpus data.
    """
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    n_types = lm.count()  # T: distinct bigram types (scalar)
    ctx = lm.groupBy("w1").agg(
        F.sum("cnt").alias("cw"), F.count("*").alias("fo")
    )
    cont = lm.groupBy(F.col("w2").alias("w2c")).agg(
        F.count("*").alias("ct")
    )
    lmj = lm.select(
        F.concat_ws(" ", "w1", "w2").alias("g"), F.col("cnt").alias("cb")
    )
    if broadcast_lm:
        lmj, ctx, cont = F.broadcast(lmj), F.broadcast(ctx), F.broadcast(cont)
    bg = df.select(
        F.col(id_col), F.explode(_bigrams(text_col, mode)).alias("g")
    ).select(
        id_col,
        "g",
        F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2c"),
    )
    d = float(discount)
    tv = float(n_types + vocab_size)
    pc = (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0)) / F.lit(tv)
    pkn = F.when(
        F.col("cw").isNotNull(),
        F.greatest(
            F.coalesce(F.col("cb"), F.lit(0)) - F.lit(d), F.lit(0.0)
        ) / F.col("cw")
        + F.lit(d) * F.col("fo") / F.col("cw") * pc,
    ).otherwise(pc)
    scored = (
        bg.join(lmj, "g", "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2c", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count("cb").alias("n_matched"),
            F.coalesce(F.sum("ct"), F.lit(0)).cast("long").alias("sum_cont"),
            F.sum(-F.log(pkn)).alias("_nll_sum"),
        )
    )
    out = scored.select(
        id_col,
        "n_bigrams",
        "n_matched",
        "sum_cont",
        (F.col("_nll_sum") / F.col("n_bigrams")).alias("nll"),
        F.exp(F.col("_nll_sum") / F.col("n_bigrams")).alias("ppl"),
    )
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("n_matched", F.lit(0)).cast("long").alias("n_matched"),
            F.coalesce("sum_cont", F.lit(0)).cast("long").alias("sum_cont"),
            "nll",
            "ppl",
        )
    )


def ccnet_buckets(
    nll: Column | str,
    head_max: float,
    tail_min: float,
) -> Column:
    """CCNet head/middle/tail label from NLL thresholds (head = most
    reference-like). Thresholds are explicit arguments — derive them once
    per corpus from ``approxQuantile``/``percentile_cont`` and pass the
    LITERALS, so the cut is reproducible and cross-engine stable (a
    percentile recomputed inside the expression would tie-break
    differently under float drift)."""
    if head_max > tail_min:
        raise ValueError(f"head_max {head_max} > tail_min {tail_min}")
    c = F.col(nll) if isinstance(nll, str) else nll
    return (
        F.when(c.isNull(), F.lit("empty"))
        .when(c <= head_max, F.lit("head"))
        .when(c >= tail_min, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )


def _ngrams(text_col: Column | str, n: int, mode: str = "ascii") -> Column:
    """(n−1)×BOS-padded word n-gram strings, in document order — one
    n-gram per real token, so every token is predicted exactly once.
    Same bind-once discipline as :func:`_bigrams`."""
    pad = F.array(*[F.lit(BOS)] * (n - 1))
    return F.transform(
        F.array(F.concat(pad, tokenize(text_col, mode))),
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(w, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]


def ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 1,
    mode: str = "ascii",
) -> DataFrame:
    """Train an order-``n`` count LM: ``(g, cnt)`` where ``g`` is the
    space-joined n-gram. Same one-scan map-side-combined shape as
    :func:`bigram_counts` (which keeps its split-column layout for
    compatibility)."""
    out = (
        df.select(F.explode(_ngrams(text_col, n, mode)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
    )
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def score_interpolated_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm2: DataFrame,
    lm3: DataFrame,
    vocab_size: int,
    k: float = 1.0,
    lam: float = 0.7,
    broadcast_lm: bool = True,
    mode: str = "ascii",
) -> DataFrame:
    """Interpolated trigram scoring — the CCNet gate at a credible LM
    order: per predicted token,

    ``P = lam · (c(w1w2w3)+k)/(c(w1w2)+k·V) + (1−lam) · (c(w2w3)+k)/(c(w2)+k·V)``

    with ``lm3`` from :func:`ngram_counts(n=3)` and ``lm2`` from
    :func:`bigram_counts` over the SAME reference split. Returns
    ``(id_col, n_trigrams, n_matched3, sum_cb3, nll, ppl)`` — the
    integer columns are the bit-exact mechanism checks, nll/ppl the
    transcendental tail (6-dp oracle precedent).

    Plan: one explode + four joins (trigram, trigram-context, bigram,
    unigram-context — all against vocabulary-bounded count tables,
    broadcast under ``broadcast_lm``) + one doc-keyed aggregation. Same
    100 TB posture as the bigram form: prune with ``min_count`` until
    the tables broadcast; the corpus is never reshuffled."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    c12 = lm3.groupBy(
        F.concat_ws(
            " ",
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)),
        ).alias("g12c")
    ).agg(F.sum("cnt").alias("c12"))
    b23 = lm2.select(
        F.concat_ws(" ", "w1", "w2").alias("g23c"),
        F.col("cnt").alias("c23"),
    )
    c2 = lm2.groupBy(F.col("w1").alias("w2c")).agg(
        F.sum("cnt").alias("c2")
    )
    lm3j = lm3.select(F.col("g").alias("g123"), F.col("cnt").alias("c123"))
    if broadcast_lm:
        lm3j, c12 = F.broadcast(lm3j), F.broadcast(c12)
        b23, c2 = F.broadcast(b23), F.broadcast(c2)
    tg = df.select(
        F.col(id_col), F.explode(_ngrams(text_col, 3, mode)).alias("g123")
    ).select(
        id_col,
        "g123",
        F.concat_ws(
            " ",
            F.split_part(F.col("g123"), F.lit(" "), F.lit(1)),
            F.split_part(F.col("g123"), F.lit(" "), F.lit(2)),
        ).alias("g12c"),
        F.concat_ws(
            " ",
            F.split_part(F.col("g123"), F.lit(" "), F.lit(2)),
            F.split_part(F.col("g123"), F.lit(" "), F.lit(3)),
        ).alias("g23c"),
        F.split_part(F.col("g123"), F.lit(" "), F.lit(2)).alias("w2c"),
    )
    kv = float(k) * float(vocab_size)
    p3 = (F.coalesce(F.col("c123"), F.lit(0)) + F.lit(float(k))) / (
        F.coalesce(F.col("c12"), F.lit(0)) + F.lit(kv)
    )
    p2 = (F.coalesce(F.col("c23"), F.lit(0)) + F.lit(float(k))) / (
        F.coalesce(F.col("c2"), F.lit(0)) + F.lit(kv)
    )
    scored = (
        tg.join(lm3j, "g123", "left")
        .join(c12, "g12c", "left")
        .join(b23, "g23c", "left")
        .join(c2, "w2c", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.count("c123").alias("n_matched3"),
            F.coalesce(F.sum("c123"), F.lit(0)).cast("long").alias("sum_cb3"),
            F.sum(
                -F.log(F.lit(float(lam)) * p3 + F.lit(1.0 - float(lam)) * p2)
            ).alias("_nll_sum"),
        )
    )
    out = scored.select(
        id_col,
        "n_trigrams",
        "n_matched3",
        "sum_cb3",
        (F.col("_nll_sum") / F.col("n_trigrams")).alias("nll"),
        F.exp(F.col("_nll_sum") / F.col("n_trigrams")).alias("ppl"),
    )
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trigrams", F.lit(0)).cast("long")
            .alias("n_trigrams"),
            F.coalesce("n_matched3", F.lit(0)).cast("long")
            .alias("n_matched3"),
            F.coalesce("sum_cb3", F.lit(0)).cast("long").alias("sum_cb3"),
            "nll",
            "ppl",
        )
    )

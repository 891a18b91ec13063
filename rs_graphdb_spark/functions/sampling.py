"""Deterministic splits and sequence packing for training-data pipelines.

Beyond-reference surface (the reference has no sampling/packing at all):
the operations a 100 TB corpus needs between dedup and tokenizer-feed.

Everything here is hash-deterministic — no RNG, no ordering dependence —
so splits are reproducible across runs, clusters, and engines (the
DuckDB oracles reproduce them bit-for-bit), and adding data never moves
an existing document to a different split (the property rand()-based
splits lack).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "deterministic_split",
    "group_aware_split",
    "hash_sample",
    "score_weighted_sample",
    "stratified_hash_sample",
    "pack_greedy",
    "mixture_plan",
    "apply_token_mixture",
]


def hash_bucket(col: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): md5 of the stringified key, first
    8 hex chars as an integer, mod buckets. md5 (not xxhash/crc) so any
    engine can reproduce it (DuckDB:
    ``('0x'||substr(md5(CAST(k AS VARCHAR)),1,8))::BIGINT % buckets``)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return h % buckets


def _split_expr(bucket: Column, weights: Mapping[str, int]) -> Column:
    """Piecewise split label from integer percentage weights (sum 100)."""
    total = sum(weights.values())
    if total != 100:
        raise ValueError(f"weights must sum to 100, got {total}")
    expr = None
    edge = 0
    for name, w in weights.items():
        edge += w
        expr = F.when(bucket < edge, name) if expr is None else expr.when(
            bucket < edge, name
        )
    return expr


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, int] | None = None,
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test' by default, 90/5/5)
    keyed on the row id. Pure projection — no shuffle, fully pushed into
    the scan stage at any scale."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    return df.withColumn("split", _split_expr(hash_bucket(id_col), weights))


def group_aware_split(
    df: DataFrame,
    group_col: Column | str,
    weights: Mapping[str, int] | None = None,
) -> DataFrame:
    """Split keyed on a GROUP fingerprint instead of the row id, so every
    member of a duplicate cluster lands in the same split — the guard
    against train/test contamination via near-duplicates. Pass e.g.
    ``fingerprint(text_col)`` (exact-dup clusters) or a precomputed
    connected-component id from the MinHash pair graph (near-dup
    clusters). Still a pure projection."""
    weights = weights or {"train": 90, "val": 5, "test": 5}
    return df.withColumn("split", _split_expr(hash_bucket(group_col), weights))


def hash_sample(
    df: DataFrame,
    id_col: Column | str,
    fraction: float,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic uniform sample: keep a row iff its hash bucket falls
    below ``fraction`` of the bucket space. Unlike ``df.sample()`` this is
    reproducible across runs/engines (md5, no RNG), stable under data
    growth (a kept row stays kept forever), and a pure projection —
    filter + scan, no shuffle, at any scale. Fraction granularity is
    1/buckets."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_bucket(id_col, buckets) < int(round(fraction * buckets)))


def score_weighted_sample(
    df: DataFrame,
    id_col: Column | str,
    score_col: Column | str,
    max_score: int,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic IMPORTANCE sampling by a per-document quality score:
    keep a row with probability ``score / max_score`` (score an INTEGER
    column, e.g. the micro-unit output of the hashed-feature classifier
    — integer so the accept threshold is engine-exact, never a float
    comparison that could flip on the last ulp). The acceptance test is
    ``hash_bucket(id) * max_score < score * buckets`` — pure integer
    arithmetic over the same md5 bucket hash_sample uses, so a kept row
    stays kept as the corpus grows, across runs AND engines.

    This is the standard quality-weighted corpus selection stage
    (upsample high-quality documents, downsample boilerplate) expressed
    as a pure scan-stage projection — no RNG, no shuffle, 100 TB-safe.
    Scores below 0 drop always; above max_score keep always."""
    if max_score <= 0:
        raise ValueError(f"max_score must be positive, got {max_score}")
    sc = F.col(score_col) if isinstance(score_col, str) else score_col
    return df.filter(
        hash_bucket(id_col, buckets) * F.lit(int(max_score))
        < sc.cast("long") * F.lit(buckets)
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: Column | str,
    strata_col: Column | str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep-fractions (e.g.
    up-sample rare languages, down-sample boilerplate-heavy domains — the
    standard data-mixing step before training). Same determinism contract
    as :func:`hash_sample`; strata not listed get ``default_fraction``.
    Still a pure projection — the per-stratum threshold is a CASE
    expression, not a join."""
    sc = F.col(strata_col) if isinstance(strata_col, str) else strata_col
    thresh = None
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], got {frac}")
        lit = F.lit(int(round(frac * buckets)))
        thresh = F.when(sc == name, lit) if thresh is None else thresh.when(
            sc == name, lit
        )
    thresh = thresh.otherwise(F.lit(int(round(default_fraction * buckets))))
    return df.filter(hash_bucket(id_col, buckets) < thresh)


def pack_greedy(
    df: DataFrame,
    id_col: str,
    size_col: Column | str,
    budget: int,
    shards: int = 32,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic order (hash shard, then id) and cut into contiguous
    bins of ~``budget`` tokens (a bin may overrun by at most one
    document — the standard streaming-concat packing used for LLM
    pretraining; exact first-fit bin packing is inherently sequential).

    Scale shape: one shuffle on the shard key, then a per-shard window
    cumsum — each shard packs independently, so parallelism = ``shards``
    and adding shards never changes bins within a shard."""
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    shard = hash_bucket(id_col, shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_shard = df.withColumn("shard", shard).withColumn("_sz", size)
    prefix = F.coalesce(F.sum("_sz").over(w), F.lit(0))
    return (
        with_shard.withColumn("bin", F.floor(prefix / budget))
        .drop("_sz")
    )


def mixture_plan(
    df: DataFrame,
    source_col: str,
    token_count_col: Column | str,
    token_budget: float,
    weights: Mapping[str, float],
    default_weight: float = 0.0,
) -> DataFrame:
    """Per-source sampling plan to hit a target token MIXTURE: for each
    source, ``target = weight × token_budget`` and ``keep_frac =
    min(1, target / total_tokens)`` (1.0 caps an over-asked source at
    "take everything" — the standard under-supply behavior when a small
    source can't fill its slice).

    Returns ``(source, total_tokens, target_tokens, keep_frac)`` — one
    row per source. Fully distributed: one partial-aggregated groupBy;
    the weight table is a broadcast literal frame (sources are O(100) in
    practice). Feed the plan to :func:`apply_token_mixture`."""
    from rs_graphdb_spark.session import local_df

    tc = F.col(token_count_col) if isinstance(token_count_col, str) else token_count_col
    totals = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(tc.cast("long")).alias("total_tokens")
    )
    wdf = local_df(
        df.sparkSession,
        [(k, float(v)) for k, v in weights.items()],
        "source string, w double",
    )
    return (
        totals.join(F.broadcast(wdf), "source", "left")
        .select(
            "source",
            "total_tokens",
            (F.coalesce("w", F.lit(float(default_weight)))
             * F.lit(float(token_budget))).alias("target_tokens"),
        )
        .withColumn(
            "keep_frac",
            F.when(F.col("total_tokens") <= 0, F.lit(0.0)).otherwise(
                F.least(
                    F.lit(1.0), F.col("target_tokens") / F.col("total_tokens")
                )
            ),
        )
    )


def apply_token_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    plan: DataFrame,
    seed: int = 0,
) -> DataFrame:
    """Apply a :func:`mixture_plan`: keep each document iff its seeded
    hash bucket falls under its source's ``keep_frac`` — deterministic,
    engine-reproducible (md5), re-seedable per epoch, and stable under
    corpus growth within a source (existing docs never flip for a fixed
    plan). One broadcast join against the O(#sources) plan; the filter is
    an integer threshold compare (``floor(frac × 1e6)``), never a float
    equality."""
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(seed)), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1_000_000
    )
    p = plan.select(
        F.col("source").alias("_mix_src"),
        F.floor(F.col("keep_frac") * 1_000_000).cast("long").alias("_thr"),
    )
    return (
        df.join(
            F.broadcast(p),
            F.col(source_col) == F.col("_mix_src"),
            "left",
        )
        .filter(h < F.coalesce(F.col("_thr"), F.lit(0)))
        .drop("_mix_src", "_thr")
    )

"""Distributed training of the hashed-feature logistic-regression text
classifier — the TRAINING side of ``cleaning.linear_text_classifier``
(which serves exported weights; reference surface analog: the quality
filters the pipeline ops gate on).

Full-batch gradient descent as plain DataFrame algebra, one pass per
iteration: margin = one feature-keyed broadcast join + doc aggregation,
gradient = one doc-keyed join + feature aggregation — all map-side
combinable, weight table bounded by ``dim``, corpus never collected.

Integer-exact cross-engine contract (the clf_z / KMV / soft-dedup
discipline): weights live in integer MICRO units, per-doc margins are
exact int64 sums (features are binary), and the per-example gradient is
QUANTIZED to micros (floor(err·C + 0.5), C = lr·1e6/n folded in Python)
BEFORE the feature-level sum — so every aggregate both engines compute
is an order-free integer sum, and the only doubles (z = zm/1e6, σ(z),
err·C) are computed from identical bits with identical association.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rs_graphdb_spark.functions.cleaning import hashed_feature_rows

_MICRO = 1_000_000.0


def _sigmoid_err(zm, y):
    """err = σ(zm/1e6) − y, parenthesized exactly as the DuckDB twin."""
    return (
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(zm.cast("double") / F.lit(_MICRO))))
    ) - y


def train_logreg_hashed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    dim: int = 1 << 16,
    iterations: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """Learn integer micro-weights (feature LONG, w_micro LONG) by
    ``iterations`` of full-batch GD on binary hashed features. The
    returned table serves directly through
    ``cleaning.linear_text_classifier`` (its ``weight_micro`` contract).
    Weight table contains only features observed in the corpus (absent
    feature ≡ weight 0)."""
    feats = hashed_feature_rows(df, id_col, text_col, dim).localCheckpoint()
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("int").alias("_y"))
    n = df.count()
    c = float(lr) * _MICRO / float(n)  # per-example micro step, Python-folded
    w = None
    for _ in range(iterations):
        if w is None:
            z = labels.select(F.col(id_col), F.lit(0).cast("long").alias("zm"))
        else:
            z = (
                feats.join(F.broadcast(w), "feature", "left")
                .groupBy(id_col)
                .agg(F.sum(F.coalesce(F.col("w_micro"), F.lit(0)))
                     .alias("zm"))
            )
        err = labels.join(z, id_col, "left").select(
            F.col(id_col),
            _sigmoid_err(F.coalesce(F.col("zm"), F.lit(0)), F.col("_y"))
            .alias("_e"),
        )
        grad = (
            feats.join(err, id_col)
            .select("feature",
                    F.floor((F.col("_e") * F.lit(c)) + 0.5)
                    .cast("long").alias("_qc"))
            .groupBy("feature")
            .agg(F.sum("_qc").alias("_g"))
        )
        if w is None:
            w = grad.select(
                "feature", (-F.col("_g")).alias("w_micro"))
        else:
            w = (
                w.join(grad, "feature", "full_outer")
                .select(
                    "feature",
                    (F.coalesce(F.col("w_micro"), F.lit(0))
                     - F.coalesce(F.col("_g"), F.lit(0))).alias("w_micro"),
                )
            )
        w = w.localCheckpoint()
    return w


def score_logreg_hashed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    dim: int = 1 << 16,
) -> DataFrame:
    """Exact integer margins under a trained weight table: (id, zm LONG),
    zm = Σ w_micro over the doc's features — order-free, cross-engine
    exact; σ(zm/1e6) is the serving probability."""
    feats = hashed_feature_rows(df, id_col, text_col, dim)
    z = (
        feats.join(F.broadcast(weights), "feature", "left")
        .groupBy(id_col)
        .agg(F.sum(F.coalesce(F.col("w_micro"), F.lit(0))).alias("zm"))
    )
    return (
        df.select(F.col(id_col))
        .join(z, id_col, "left")
        .select(id_col, F.coalesce("zm", F.lit(0)).cast("long").alias("zm"))
    )

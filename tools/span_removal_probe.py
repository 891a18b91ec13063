"""Scale probe for the exact-substring REMOVAL pass (r9 VERDICT item
#8): `remove_duplicate_spans` is oracle-green at suite scale; its plan
claims — wall near-LINEAR in corpus rows, interval-table size bounded
by the DUPLICATE MASS (∝ planted dup fraction), never by corpus size —
are measured here.

Corpus: synthetic docs of ~120 unique tokens each; a planted 10%
subset appends one of n/400 SHARED 60-token boilerplate blocks — 40
docs per family at every decade, so the duplicate SUBGRAPH (extents =
one row per sharing pair per run — quadratic in FAMILY size by the
pair semantics, the documented contract) grows linearly with the
corpus, which is what the near-linear-wall claim is about. Three
corpus decades; per rung we log wall, the extent-table row count (the
interval frame the removal join carries), and the removed-token
total.

Usage: python tools/span_removal_probe.py
Prints markdown rows for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def corpus(spark, n: int):
    """~120 unique tokens per doc (deterministic per doc), 10% of docs
    append one of n/400 shared 60-token blocks (40 docs/family)."""
    uniq = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(119)),
        lambda i: F.concat(F.lit("w"), F.col("id"), F.lit("x"), i)))
    fam = ((F.col("id") / 10).cast("long")
           % max(1, n // 400)).cast("string")
    block = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.concat(F.lit("shared"), fam, F.lit("tok"), i)))
    return (
        spark.range(0, n, 1, 32)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 == 0,
                   F.concat(uniq, F.lit(" "), block))
            .otherwise(uniq).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def main() -> None:
    from rs_graphdb_spark.functions.dedup import (
        duplicate_span_extents, remove_duplicate_spans)
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("span-removal-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("| docs | dup docs | extent rows | removed tokens | wall (s) |")
    print("|---|---|---|---|---|")
    for n in (2_000, 20_000, 200_000):
        df = corpus(spark, n)
        t0 = time.time()
        ext = duplicate_span_extents(df, "doc_id", "text", k=50)
        n_ext = ext.count()
        out = remove_duplicate_spans(df, "doc_id", "text", k=50)
        rem = out.agg(
            F.sum("n_removed").alias("r"),
            F.count(F.when(F.col("n_removed") > 0, 1)).alias("d"),
        ).first()
        wall = time.time() - t0
        print(f"| {n} | {rem['d']} | {n_ext} | {rem['r']} "
              f"| {round(wall, 1)} |")
    spark.stop()


if __name__ == "__main__":
    main()

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
corpus decades; per rung we log the extent-table row count (the
interval frame the removal join carries), the removed-token total,
and the end-to-end removal wall.

Each rung runs in a FRESH subprocess (the pq_batch_probe discipline):
the extents pipeline checkpoints eagerly, and a prior rung's (or a
prior phase's) checkpoint blocks evicting against the current one
inflated in-session rungs ~2-4× (measured 114 s vs 30 s for the same
200k removal) — cross-rung storage pressure, not operator cost.

Usage: python tools/span_removal_probe.py
Prints markdown rows for PLANS.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def corpus(spark, n: int):
    """~120 unique tokens per doc (deterministic per doc), 10% of docs
    append one of n/400 shared 60-token blocks (40 docs/family)."""
    from pyspark.sql import functions as F

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


def child(n: int) -> None:
    from pyspark.sql import functions as F
    from rs_graphdb_spark.functions.dedup import (
        duplicate_span_extents, remove_duplicate_spans)
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("span-removal-probe")
    spark.sparkContext.setLogLevel("ERROR")
    df = corpus(spark, n)
    t0 = time.time()
    out = remove_duplicate_spans(df, "doc_id", "text", k=50)
    rem = out.agg(
        F.sum("n_removed").alias("r"),
        F.count(F.when(F.col("n_removed") > 0, 1)).alias("d"),
    ).first()
    wall = time.time() - t0
    n_ext = duplicate_span_extents(df, "doc_id", "text", k=50).count()
    print(json.dumps({"n": n, "dup_docs": rem["d"], "ext": n_ext,
                      "removed": int(rem["r"]),
                      "wall_s": round(wall, 1)}))


def main() -> None:
    print("| docs | dup docs | extent rows | removed tokens "
          "| removal wall (s) |")
    print("|---|---|---|---|---|")
    for n in (2_000, 20_000, 200_000):
        r = subprocess.run(
            [sys.executable, __file__, "--child", str(n)],
            capture_output=True, text=True, check=True)
        d = json.loads(r.stdout.strip().splitlines()[-1])
        print(f"| {d['n']} | {d['dup_docs']} | {d['ext']} "
              f"| {d['removed']} | {d['wall_s']} |")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]))
    else:
        main()

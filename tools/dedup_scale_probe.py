"""Three-decade scale probe for the flagship dedup family (r4 verdict #1).

The 100 TB story for minhash pairs / duplicate spans / line dedup rested
on plan-shape reasoning plus ONE measured decade (sf0.1 -> sf1). This
probe measures THREE decades — 5k / 50k / 500k docs — on fixtures whose
duplicate structure is CONSTANT per doc as the corpus grows, so wall
time should scale ~linearly; a superlinear bend here is an operator
problem, not a fixture artifact:

- near-dup corpus: groups of 10 near-identical docs (62 tokens, last 2
  member-distinct -> within-group jaccard ~0.9, cross-group 0.0). True
  pair count = 45 * n_groups, exactly linear by construction. The
  make_bigsf mirror scheme is NOT used here: its per-doc dup-group size
  grows with the factor, so its pair mass is quadratic in the factor
  and would fake a superlinear bend.
- line corpus: 6 lines/doc, 2 drawn from a fixed 100-line boilerplate
  pool (so boilerplate line document-frequencies grow linearly — the
  RefinedWeb hot-key shape), 4 unique.

Usage: python tools/dedup_scale_probe.py [base_groups] [rungs]
Prints one markdown table row per (operator, rung) for PLANS.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def neardup_corpus(spark, n_groups: int):
    """n_groups groups x 10 members; 62 tokens/doc, members differ in the
    last 2 tokens only -> jaccard ~0.9 within a group, 0.0 across."""
    g = spark.range(n_groups)
    base = F.concat_ws(
        " ",
        *[
            F.concat(F.lit(f"w{j}x"), (F.col("id") * 7 + j).cast("string"))
            for j in range(60)
        ],
    )
    return (
        g.select(F.col("id").alias("g"), base.alias("base"))
        .select(
            "g", "base",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("m"),
        )
        .select(
            (F.col("g") * 16 + F.col("m")).alias("doc_id"),
            F.concat_ws(
                " ", "base",
                F.concat(F.lit("shard"), F.col("m").cast("string")),
                F.concat(F.lit("marker"), F.col("m").cast("string")),
            ).alias("text"),
        )
    )


def line_corpus(spark, n_docs: int):
    """6 lines/doc joined by ' a ': lines 0,3 from a fixed 100-line
    boilerplate pool (df grows linearly with the corpus), rest unique."""
    pool = F.concat(F.lit("boilerplate common tail notice ref"),
                    (F.col("id") % 100).cast("string"))
    uniq = lambda j: F.concat_ws(  # noqa: E731
        " ",
        *[
            F.concat(F.lit(f"u{j}t{t}q"),
                     (F.col("id") * 13 + j * 3 + t).cast("string"))
            for t in range(4)
        ],
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " a ", pool, uniq(1), uniq(2), pool, uniq(3), uniq(4)
        ).alias("text"),
    )


def timed(label, fn, runs=2):
    best, out = float("inf"), None
    for _ in range(runs):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    base_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    rungs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from rs_graphdb_spark.functions.cleaning import dedup_lines
    from rs_graphdb_spark.functions.dedup import (
        duplicate_spans,
        minhash_dedup_pairs,
    )
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("dedup-scale-probe")
    work = tempfile.mkdtemp(prefix="dedup-scale-")
    rows = []
    for r in range(rungs):
        n_groups = base_groups * 10**r
        n_docs = n_groups * 10
        nd_path = f"{work}/neardup-{r}"
        ln_path = f"{work}/lines-{r}"
        neardup_corpus(spark, n_groups).write.mode("overwrite").parquet(nd_path)
        line_corpus(spark, n_docs).write.mode("overwrite").parquet(ln_path)
        nd = spark.read.parquet(nd_path)
        ln = spark.read.parquet(ln_path)
        runs = 2 if r < rungs - 1 else 1  # top rung: single timed run

        w, n = timed("minhash", lambda: minhash_dedup_pairs(
            nd, "doc_id", "text", threshold=0.8).count(), runs)
        rows.append((f"minhash_dedup_pairs {n_docs//1000}k docs", w,
                     f"{n} pairs (true {45*n_groups})"))
        print(rows[-1], flush=True)

        w, n = timed("spans", lambda: duplicate_spans(
            nd, "doc_id", "text", k=50).count(), runs)
        rows.append((f"duplicate_spans {n_docs//1000}k docs", w,
                     f"{n} pairs"))
        print(rows[-1], flush=True)

        w, n = timed("lines", lambda: dedup_lines(
            ln, "doc_id", "text", delim=" a ").agg(
                F.sum("n_dropped").alias("d"),
                F.count("*").alias("c")).collect()[0], runs)
        rows.append((f"dedup_lines {n_docs//1000}k docs", w,
                     f"{n['c']} docs, {n['d']} dropped lines"))
        print(rows[-1], flush=True)

    print("\n| operator / rung | wall (s) | result |")
    print("|---|---|---|")
    for label, w, res in rows:
        print(f"| {label} | {w:.2f} | {res} |")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

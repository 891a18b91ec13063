"""Three-decade scale probe for the round-5 text operators.

repetition_signals / html_to_text are pure scan-stage projections and
the bigram-LM gate is scan + vocabulary-bounded join + one doc-keyed
agg — all should be exactly linear in document count. This probe
measures them at 20k / 200k / 2M synthetic docs (held constant: ~55
tokens/doc from a 40-word vocabulary, the sf fixtures' shape) so a bend
is an operator problem, not a fixture artifact.

Usage: python tools/textops_scale_probe.py [base_docs] [rungs]
Prints one markdown row per (operator, rung) for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

VOCAB = [f"w{i}" for i in range(40)]


def synth_docs(spark, n_docs: int):
    """~55-token docs drawn deterministically from a 40-word vocabulary,
    one line break + one echoed prefix per doc (so the line/dup-gram
    paths all fire)."""
    par = spark.sparkContext.defaultParallelism
    d = spark.range(n_docs).repartition(par)
    tok = lambda j: F.array(*[F.lit(w) for w in VOCAB])[  # noqa: E731
        F.pmod(
            F.hash(F.concat(F.col("id").cast("string"), F.lit(f":{j}"))),
            F.lit(40),
        )
    ]
    body = F.concat_ws(" ", *[tok(j) for j in range(50)])
    text = F.concat(
        body, F.lit("\nfooter line\n"), F.substring(body, 1, 30)
    )
    return d.select(F.col("id").alias("doc_id"), text.alias("text")) \
        .localCheckpoint(eager=True)


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rungs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from rs_graphdb_spark.functions.cleaning import html_to_text
    from rs_graphdb_spark.functions.lm import (
        bigram_counts, lm_vocab_size, score_bigram_lm)
    from rs_graphdb_spark.functions.text import repetition_signals
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("textops-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def probe(tag, n, fn):
        fn()  # warm (JIT + checkpointed fixture already materialized)
        t0 = time.time()
        fn()
        print(f"| {tag} | {n:,} docs | {time.time() - t0:.2f} s |",
              flush=True)

    for r in range(rungs):
        n = base * 10 ** r
        docs = synth_docs(spark, n)
        docs.count()

        probe("repetition_signals", n, lambda: docs.select(
            "doc_id", repetition_signals("text").alias("r")
        ).select("doc_id", "r.*").write.mode("overwrite")
         .format("noop").save())

        page = F.concat(F.lit("<html><body><p>"), F.col("text"),
                        F.lit("</p><script>x()</script></body></html>"))
        probe("html_to_text", n, lambda: docs.select(
            "doc_id", html_to_text(page).alias("t")
        ).write.mode("overwrite").format("noop").save())

        def lm_gate():
            lm = bigram_counts(
                docs.filter(F.col("doc_id") % 10 < 8)).localCheckpoint()
            score_bigram_lm(docs, "doc_id", "text", lm, lm_vocab_size(lm)) \
                .write.mode("overwrite").format("noop").save()

        probe("bigram-LM gate (train+score)", n, lm_gate)

        def tri_gate():
            from rs_graphdb_spark.functions.lm import (
                ngram_counts, score_interpolated_lm)

            ref = docs.filter(F.col("doc_id") % 10 < 8)
            lm2 = bigram_counts(ref).localCheckpoint()
            lm3 = ngram_counts(ref, n=3).localCheckpoint()
            score_interpolated_lm(
                docs, "doc_id", "text", lm2, lm3, lm_vocab_size(lm2)
            ).write.mode("overwrite").format("noop").save()

        probe("trigram-LM gate (train+score)", n, tri_gate)
        docs.unpersist()


if __name__ == "__main__":
    main()

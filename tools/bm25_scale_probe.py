"""Index-growth probe for the standing BM25 index.

Claim under test: `bm25_search_indexed` is one partition-pruned,
row-group-pushed scan of the QUERY TERMS' postings — O(query postings),
independent of corpus size. Build the index at three corpus decades
(fixed 40-word vocabulary, so per-term posting lists grow linearly —
the honest worst case: df rows DO grow with the corpus) and at three
decades with a GROWING vocabulary (fixed per-term posting mass — the
production Zipf-tail shape where most terms stay rare).

Usage: python tools/bm25_scale_probe.py
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def synth_docs(spark, n_docs: int, vocab_size: int):
    par = spark.sparkContext.defaultParallelism
    d = spark.range(n_docs).repartition(par)
    vocab = ["hash", "join", "merge"] + [
        f"word{i}x" for i in range(vocab_size - 3)]
    tok = lambda j: F.array(*[F.lit(w) for w in vocab])[  # noqa: E731
        F.pmod(
            F.hash(F.concat(F.col("id").cast("string"), F.lit(f":{j}"))),
            F.lit(vocab_size),
        )
    ]
    text = F.concat_ws(" ", *[tok(j) for j in range(50)])
    return d.select(F.col("id").alias("doc_id"), text.alias("text")) \
        .localCheckpoint(eager=True)


def main() -> None:
    from rs_graphdb_spark.functions.text import (
        bm25_search_indexed, write_bm25_index)
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("bm25-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def measure(docs, tag):
        idx = "/root/repo/.tmp/bm25probe"
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        write_bm25_index(docs, "doc_id", "text", idx)
        build = time.time() - t0
        q = lambda: bm25_search_indexed(  # noqa: E731
            spark, idx, ["hash", "join", "merge"], k=10
        ).write.mode("overwrite").format("noop").save()
        q()  # warm
        t0 = time.time()
        q()
        probe = time.time() - t0
        print(f"| {tag} | build {build:.2f} s | probe {probe:.2f} s |",
              flush=True)
        shutil.rmtree(idx, ignore_errors=True)

    print("axis A: fixed 40-word vocab (query-term postings GROW with "
          "corpus — the worst case)")
    for n in (20_000, 200_000, 2_000_000):
        docs = synth_docs(spark, n, 40)
        docs.count()
        measure(docs, f"{n:,} docs, vocab 40")
        docs.unpersist()

    print("axis B: vocabulary grows with corpus (fixed per-term mass — "
          "the Zipf-tail shape)")
    for n, v in ((20_000, 40), (200_000, 400), (2_000_000, 4000)):
        docs = synth_docs(spark, n, v)
        docs.count()
        measure(docs, f"{n:,} docs, vocab {v:,}")
        docs.unpersist()


if __name__ == "__main__":
    main()

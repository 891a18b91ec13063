"""Two-axis scale probe for the round-7 BPE tokenizer.

The claim under test: `bpe_train` cost = ONE corpus scan (word counts)
plus num_merges VOCABULARY-sized jobs. Therefore:

- **Corpus axis** (fixed 40-word vocabulary, 20k/200k/2M docs): the
  word-count scan grows linearly, the merge loop is FLAT — total wall
  should approach scan-dominated linear growth with a constant merge
  floor.
- **Vocabulary axis** (fixed 200k docs, 40/400/4000 distinct words):
  the merge loop grows with distinct words (rows in the pair table),
  the scan is flat — superlinear growth in either axis is an operator
  defect.
- **Merge axis (r8 VERDICT item #1)** (fixed 200k docs / 400 words,
  8 → 1k → 10k → 32k merges): ENCODE cost must stay near-flat — the
  mapInArrow kernel's per-word work is rank-dict lookups, independent
  of merge-list size. The merge list is the 6 trained merges padded
  with structured synthetic merges over the trained symbol space (some
  apply, most don't — the realistic shape: a 32k vocabulary applies
  only ~word-length merges per word). The expression path is measured
  at the 8-merge rung only (it cannot compile at 32k — that ceiling is
  the finding).
- **Train merge axis (r8 VERDICT item #7)** (fixed corpus, 64 / 256
  merges, rounds_batch 1 vs 32): one localCheckpointed Spark round per
  merge makes strict-order training linear in SEQUENTIAL jobs; batched
  rounds (top-B symbol-disjoint pairs per round) cut job count B×.

Usage: python tools/bpe_scale_probe.py
Prints one markdown row per (axis, rung) for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def synth_docs(spark, n_docs: int, vocab_size: int):
    """~50-token docs drawn deterministically from a sized vocabulary
    (multi-char words so merges have work to do)."""
    par = spark.sparkContext.defaultParallelism
    d = spark.range(n_docs).repartition(par)
    vocab = [f"word{i}x{i % 7}" for i in range(vocab_size)]
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
    from rs_graphdb_spark.functions.bpe import (
        bpe_token_counts, bpe_train, word_counts)
    from rs_graphdb_spark.session import get_spark

    axes = set(sys.argv[1] if len(sys.argv) > 1 else "ABCT")
    spark = get_spark("bpe-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def run(tag, fn):
        fn()  # warm
        t0 = time.time()
        fn()
        print(f"| {tag} | {time.time() - t0:.2f} s |", flush=True)

    def train_and_count(docs):
        m, _v = bpe_train(docs, "text", num_merges=6)
        ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]
        bpe_token_counts(docs, "doc_id", "text", ml) \
            .write.mode("overwrite").format("noop").save()

    if "A" in axes:
        print("axis A: corpus decades, vocab fixed at 40")
        for n in (20_000, 200_000, 2_000_000):
            docs = synth_docs(spark, n, 40)
            docs.count()
            run(f"word-count scan, {n:,} docs",
                lambda: word_counts(docs, "text")
                .write.mode("overwrite").format("noop").save())
            run(f"train(6)+encode, {n:,} docs",
                lambda: train_and_count(docs))
            docs.unpersist()

    if "B" in axes:
        print("axis B: vocabulary decades, corpus fixed at 200k docs")
        for v in (40, 400, 4000):
            docs = synth_docs(spark, 200_000, v)
            docs.count()
            run(f"train(6)+encode, {v:,} distinct words",
                lambda: train_and_count(docs))
            docs.unpersist()

    if "C" not in axes and "T" not in axes:
        return
    print("axis C: merge-list size, encode only (200k docs, 400 words)")
    docs = synth_docs(spark, 200_000, 400)
    docs.count()
    m, _v = bpe_train(docs, "text", num_merges=6)
    ml = [(r["l"], r["r"]) for r in m.orderBy("rank").collect()]

    def pad_merges(n: int) -> list:
        """Trained merges + structured synthetic pads: chains over the
        trained symbols (some apply) and never-applying fillers — the
        realistic large-vocabulary shape: most merges miss any word."""
        out = list(ml)
        seen = set(out)
        syms = [a + b for a, b in ml] + list("wordx0123456789")
        i = 0
        while len(out) < n:
            a = syms[i % len(syms)]
            b = syms[(i * 7 + 3) % len(syms)]
            if (a, b) not in seen:
                seen.add((a, b))
                out.append((a, b))
                if len(a) + len(b) <= 32:  # cap symbol growth — real
                    syms.append(a + b)     # vocab symbols are short
            i += 1
        return out[:n]

    def enc(merges, engine):
        return lambda: bpe_token_counts(
            docs, "doc_id", "text", merges, encode_engine=engine
        ).write.mode("overwrite").format("noop").save()

    if "C" in axes:
        run("encode expr, 8 merges", enc(pad_merges(8), "expr"))
        for n in (8, 1_000, 10_000, 32_000):
            run(f"encode arrow, {n:,} merges", enc(pad_merges(n), "arrow"))
    docs.unpersist()

    if "T" in axes:
        print("train merge axis: rounds_batch (200k docs, 400 words)")
        docs = synth_docs(spark, 200_000, 400)
        docs.count()
        for nm, rb in ((64, 1), (64, 32), (256, 32)):
            run(f"train({nm}) rounds_batch={rb}",
                lambda: bpe_train(docs, "text", num_merges=nm,
                                  rounds_batch=rb)[0].count())
        docs.unpersist()


if __name__ == "__main__":
    main()

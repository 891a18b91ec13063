"""Scale probe for the round-8 WARC ingestion path.

The claim under test: WARC→WET is ONE scan stage whose unit of
parallelism is the file — cost is linear in total corpus bytes and
independent of how those bytes split across files (as long as file
count ≥ cores). Therefore:

- **Corpus axis** (fixed docs/file, 2k/20k/200k docs): encode+parse+
  extract wall should grow ~linearly with docs.
- **File-shape axis** (fixed 20k docs, 4/16/64 docs per file): wall
  should be FLAT — more, smaller files only changes task granularity,
  not work. Superlinear growth on either axis is an operator defect.

Usage: python tools/warc_scale_probe.py
Prints one markdown row per (axis, rung) for PLANS.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def synth_docs(spark, n_docs: int):
    par = spark.sparkContext.defaultParallelism
    d = spark.range(n_docs).repartition(par)
    text = F.concat_ws(" ", *[
        F.concat(F.lit(f"w{j}v"),
                 F.pmod(F.hash(F.col("id") + j), F.lit(97)).cast("string"))
        for j in range(40)
    ])
    return d.select(F.col("id").alias("doc_id"), text.alias("text")) \
        .localCheckpoint(eager=True)


def run(spark, docs, docs_per_file: int) -> tuple[float, int]:
    from rs_graphdb_spark.sources.warc import documents_as_warc, warc_to_wet

    t0 = time.time()
    wet = warc_to_wet(documents_as_warc(
        docs, docs_per_file=docs_per_file, corrupt_every=97))
    n = wet.select(F.md5("wet_text")).count()
    return round(time.time() - t0, 2), n


def main() -> None:
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("warc-probe")
    print("| axis | rung | wall s | wet rows |")
    print("|---|---|---|---|")
    for n in (2_000, 20_000, 200_000):
        docs = synth_docs(spark, n)
        wall, rows = run(spark, docs, 16)
        print(f"| corpus | {n} docs | {wall} | {rows} |", flush=True)
        docs.unpersist()
    docs = synth_docs(spark, 20_000)
    for dpf in (4, 16, 64):
        wall, rows = run(spark, docs, dpf)
        print(f"| file-shape | {dpf} docs/file | {wall} | {rows} |",
              flush=True)

    # streaming-reader axis (r9): same WET composition from ON-DISK
    # files through read_warc_stream — binaryFile parity at normal
    # sizes; the differentiator (bounded memory, no 2 GB cap) is
    # pytest-pinned, this row shows throughput parity
    import os
    import tempfile

    from rs_graphdb_spark.sources.warc import (
        documents_as_warc, read_warc_stream, warc_to_wet)

    for n in (20_000, 200_000):
        docs = synth_docs(spark, n)
        root = tempfile.mkdtemp(prefix="warc_probe_stream_")
        for r in documents_as_warc(docs, corrupt_every=97).collect():
            with open(os.path.join(
                    root, f"part-{int(r['warc_id']):06d}.warc.gz"),
                    "wb") as f:
                f.write(bytes(r["payload"]))
        t0 = time.time()
        wet = warc_to_wet(records=read_warc_stream(spark, root))
        rows = wet.select(F.md5("wet_text")).count()
        print(f"| streaming | {n} docs (on-disk) | "
              f"{round(time.time() - t0, 2)} | {rows} |", flush=True)
        docs.unpersist()


if __name__ == "__main__":
    main()

"""Measure probe wall on a 50-epoch fragmented standing index vs after
compaction (r4 verdict #6 done-criterion): grow an index the way the
continuous sink does (one `_append_epoch` file set per epoch), time the
pruned probe, compact, time again — the probe wall should return to the
freshly-written level and file counts to one per `bp=` dir.

Usage: python tools/compaction_probe.py [n_epochs] [docs_per_epoch]
"""

from __future__ import annotations

import glob
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def corpus(spark, n, offset=0):
    return spark.range(n).select(
        (F.col("id") + offset).alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit(f"w{j}t"), ((F.col("id") + offset) * 13 + j)
                     .cast("string"))
            for j in range(40)
        ]).alias("text"),
    )


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from rs_graphdb_spark.functions.dedup import (
        compact_minhash_index,
        load_banded_pruned,
        minhash_index,
        minhash_probe,
        release_lazy_pins,
        write_minhash_index,
    )
    from rs_graphdb_spark.session import get_spark
    from rs_graphdb_spark.streaming.ops import _append_epoch

    spark = get_spark("compaction-probe")
    work = tempfile.mkdtemp(prefix="compact-probe-")
    idx = f"{work}/index"

    banded, sets = minhash_index(corpus(spark, 20_000), "doc_id", "text")
    write_minhash_index(banded, sets, idx)
    banded.unpersist()

    batch = corpus(spark, 200, offset=900_000).localCheckpoint(eager=True)
    nb, ns = minhash_index(batch, "doc_id", "text")
    nb = nb.localCheckpoint(eager=True)
    ns = ns.localCheckpoint(eager=True)

    def probe_wall() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            pruned = load_banded_pruned(spark, f"{idx}/banded", nb)
            pairs = minhash_probe(
                pruned, spark.read.parquet(f"{idx}/sets"), batch,
                "doc_id", "text", threshold=0.8,
                new_banded=nb, new_sets=ns, broadcast_new=True, eager=False,
            )
            pairs.count()
            best = min(best, time.time() - t0)
            release_lazy_pins()
        return best

    def n_files() -> int:
        return len(glob.glob(f"{idx}/banded/*/*.parquet"))

    print(f"| fresh index (20k docs) | {probe_wall():.2f} s "
          f"| {n_files()} banded files |", flush=True)

    for e in range(n_epochs):
        eb, es = minhash_index(
            corpus(spark, per_epoch, offset=1_000_000 + e * per_epoch),
            "doc_id", "text",
        )
        _append_epoch(eb.withColumn("bp", F.substring("bh", 1, 1)),
                      f"{idx}/banded", e, partition_col="bp", sort_col="bh",
                      run_id="probe-")
        _append_epoch(es.select("doc_id", "sets"), f"{idx}/sets", e,
                      sort_col="doc_id", run_id="probe-")
        eb.unpersist()
    print(f"| +{n_epochs} epochs x {per_epoch} docs | {probe_wall():.2f} s "
          f"| {n_files()} banded files |", flush=True)

    t0 = time.time()
    compact_minhash_index(spark, idx)
    t_c = time.time() - t0
    print(f"| compacted (job {t_c:.1f} s) | {probe_wall():.2f} s "
          f"| {n_files()} banded files |", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Standing-index probe scaling (PLANS.md): per-batch probe wall as the
corpus index grows 10×.

Builds the continuous-ingest standing layout (`write_minhash_index`:
banded partitioned by bh prefix + sorted by bh, sets sorted by doc_id)
for an N-doc and a 10N-doc corpus, then times the SAME small batch
probed against each — the sink's exact read path (`load_banded_pruned`
partition pruning + bh IN pushdown, broadcast batch side, colliding-id
sets pushdown). O(batch) means the wall should be ~flat in corpus size.

Usage: python tools/ingest_scale_probe.py [n_small] [batch]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from rs_graphdb_spark.functions.dedup import (
        load_banded_pruned,
        minhash_index,
        minhash_probe,
        write_minhash_index,
    )
    from rs_graphdb_spark.session import get_spark

    spark = get_spark("ingest-scale-probe")
    work = tempfile.mkdtemp(prefix="ingest-probe-")

    def doc_text(seed_col):
        return F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{j}x"), (seed_col * 7 + j).cast("string"))
                for j in range(40)
            ],
        )

    def corpus(n):
        # every doc unique (seed = id); the batch duplicates only seeds
        # 0..batch_n, so the TRUE pair count is corpus-size-independent
        return spark.range(n).select(
            F.col("id").alias("doc_id"), doc_text(F.col("id")).alias("text")
        )

    batch = spark.range(batch_n).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(doc_text(F.col("id")), F.lit(" tail")).alias("text"),
    ).localCheckpoint(eager=True)
    new_banded, new_sets = minhash_index(batch, "doc_id", "text")
    new_banded = new_banded.localCheckpoint(eager=True)
    new_sets = new_sets.localCheckpoint(eager=True)

    from rs_graphdb_spark.functions.dedup import release_lazy_pins

    scales = [("1x", n_small), ("10x", n_small * 10),
              ("100x", n_small * 100)]
    for scale, n in scales:
        idx_dir = f"{work}/index-{scale}"
        banded, sets = minhash_index(corpus(n), "doc_id", "text")
        write_minhash_index(banded, sets, idx_dir)
        banded.unpersist()
        best = float("inf")
        n_pairs = 0
        for _ in range(3):
            t0 = time.time()
            # eager=False: the continuous sink's actual micro-batch path
            # (lazy persist pins, no per-stage checkpoint jobs)
            pruned = load_banded_pruned(spark, f"{idx_dir}/banded", new_banded)
            pairs = minhash_probe(
                pruned, spark.read.parquet(f"{idx_dir}/sets"), batch,
                "doc_id", "text", threshold=0.8,
                new_banded=new_banded, new_sets=new_sets, broadcast_new=True,
                eager=False,
            )
            n_pairs = pairs.count()
            best = min(best, time.time() - t0)
            release_lazy_pins()
        print(f"| standing index {scale} ({n} docs) | probe batch={batch_n} "
              f"| {best:.2f} s | {n_pairs} pairs |", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

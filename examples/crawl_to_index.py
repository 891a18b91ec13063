"""Crawl → training data → serving index, end to end (round-9 surface):

1. render the documents table into real multi-member ``.warc.gz`` files
   on disk (the CommonCrawl container shape);
2. ingest them with the STREAMING reader (bounded memory per task — no
   2 GB binaryFile cap);
3. run WARC→WET → gopher quality filter → minhash near-dup keepers as
   THREE manifest-committed stages of the versioned pipeline store
   (kill it anywhere between stages and rerun: it resumes from the
   committed bytes);
4. BPE-encode the surviving corpus with a byte-level tokenizer through
   the Arrow kernel (production merge-count path);
5. build a STANDING IVF-PQ index over the embeddings table, append a
   late batch, and serve a partition-pruned ANN probe.

Run: python examples/crawl_to_index.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from rs_graphdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("crawl-to-index")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    work = tempfile.mkdtemp(prefix="crawl2idx-")

    # 1. write the crawl: one .warc.gz per 16 docs, one corrupt member
    from rs_graphdb_spark.sources.warc import documents_as_warc
    crawl = os.path.join(work, "crawl")
    os.makedirs(crawl)
    for r in documents_as_warc(docs, corrupt_every=97).collect():
        with open(f"{crawl}/part-{int(r['warc_id']):06d}.warc.gz",
                  "wb") as f:
            f.write(bytes(r["payload"]))
    print(f"crawl files: {len(os.listdir(crawl))}")

    # 2-3. streaming ingest feeding the versioned pipeline
    from rs_graphdb_spark.functions.dedup import near_dup_clusters
    from rs_graphdb_spark.functions.text import quality_filter
    from rs_graphdb_spark.operators.pipeline_store import (
        pipeline_state, run_pipeline_versioned)
    from rs_graphdb_spark.sources.warc import read_warc_stream, warc_to_wet

    recs = read_warc_stream(spark, crawl).localCheckpoint()
    wid = F.regexp_extract("url", "doc(\\d+)\\?", 1).cast("long")
    stages = [
        ("wet", lambda prev: warc_to_wet(records=prev)
            .select(wid.alias("doc_id"), "wet_text")
            .repartition(4, "doc_id").sortWithinPartitions("doc_id")),
        ("quality", lambda prev: prev.filter(quality_filter("wet_text"))
            .repartition(4, "doc_id").sortWithinPartitions("doc_id")),
        ("dedup", lambda prev: near_dup_clusters(prev, "doc_id",
                                                 "wet_text")
            .filter(F.col("keep")).select("doc_id")
            .repartition(1).sortWithinPartitions("doc_id")),
    ]
    store = os.path.join(work, "store")
    keepers = run_pipeline_versioned(spark, store, recs, stages)
    n_keep = keepers.count()
    print("pipeline:", pipeline_state(store), "keepers:", n_keep)

    # 4. byte-level BPE through the Arrow kernel (forced here to show
    # the production path; auto routes by merge count)
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_encode_ids, bpe_train)
    m, v = bpe_train(docs, "text", num_merges=24, byte_level=True,
                     rounds_batch=8)
    art = bpe_artifact(m, v, byte_level=True)
    ids = bpe_encode_ids(docs.join(keepers, "doc_id"), "doc_id", "text",
                         art, encode_engine="arrow")
    print("encoded token rows:", ids.count())

    # 5. standing IVF-PQ index (RESIDUAL encoding — codes quantize
    # v − c_cell(v), the FAISS IndexIVFPQ recipe) + append + probe
    from rs_graphdb_spark.functions.similarity import (
        append_pq_index, ivf_centroids, knn_pq_indexed, write_pq_index)
    old = emb.filter(F.col("vec_id") % 10 != 0)
    late = emb.filter(F.col("vec_id") % 10 == 0)
    cents = ivf_centroids(old, "vec_id", "v", 8, 2)
    idx = os.path.join(work, "pqidx")
    write_pq_index(old, "vec_id", "v", idx, m=8, ks=16,
                   centroids=cents, residual=True)
    print("append:", append_pq_index(spark, idx, late, "vec_id", "v",
                                     batch_id="late-1"))
    hits = knn_pq_indexed(spark, idx, emb.filter(F.col("vec_id") < 3),
                          "vec_id", "v", k=5, n_probe=2)
    print("probe results:")
    for r in hits.orderBy("query_id", "rank").collect():
        print("  ", r["query_id"], "->", r["neighbor_id"],
              round(r["adc_cos"], 4))

    # 6. batch-mode probing: the whole embedding table against the
    # index with NO driver-side query collect — the index-join /
    # self-join shape for corpus-scale dedup
    near = knn_pq_indexed(spark, idx, emb, "vec_id", "v", k=1,
                          n_probe=2, batch_mode=True)
    print("batch-mode self-join rows:", near.count())


if __name__ == "__main__":
    main()

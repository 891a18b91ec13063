"""End-to-end training-data pipeline over the documents/embeddings
fixtures: profile → quality/language analysis → near-dup clustering →
contamination-safe split → sequence packing. Every stage is the same
operator the 100 TB deployment would run (see PLANS.md for the plan
shapes).

Run: python examples/training_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from rs_graphdb_spark.functions.dedup import near_dup_clusters
from rs_graphdb_spark.functions.profile import profile
from rs_graphdb_spark.functions.sampling import group_aware_split, pack_greedy
from rs_graphdb_spark.functions.text import fingerprint, quality_features, token_count
from rs_graphdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("-- 1. ingest validation (single-pass profile)")
    profile(docs, ["doc_id", "text"]).show(truncate=False)

    print("-- 2. quality features")
    q = quality_features("text")
    scored = docs.select("doc_id", *[c.alias(k) for k, c in q.items()])
    scored.agg(*[F.round(F.avg(c), 3).alias(f"avg_{c}")
                 for c in scored.columns if c != "doc_id"]).show()

    print("-- 2a. WET extraction + repetition signals + LM perplexity gate")
    from rs_graphdb_spark.functions.cleaning import html_to_text
    from rs_graphdb_spark.functions.lm import (
        bigram_counts,
        ccnet_buckets,
        lm_vocab_size,
        score_bigram_lm,
    )
    from rs_graphdb_spark.functions.text import repetition_signals

    # crawl shape: wrap each doc in markup, extract the visible text back
    page = F.concat(F.lit("<html><body><p>"), F.col("text"),
                    F.lit("</p><script>x()</script></body></html>"))
    extracted = docs.select("doc_id", html_to_text(page).alias("text"))
    extracted.select(repetition_signals("text").alias("r")).agg(
        F.round(F.avg("r.top_ngram_char_frac"), 3).alias("avg_top2gram"),
        F.round(F.avg("r.dup_ngram_char_frac"), 3).alias("avg_dup5gram"),
    ).show()
    lm = bigram_counts(
        extracted.filter(F.col("doc_id") % 10 < 8)).localCheckpoint()
    score_bigram_lm(extracted, "doc_id", "text", lm, lm_vocab_size(lm)) \
        .select(ccnet_buckets("nll", 3.38, 3.41).alias("bucket")) \
        .groupBy("bucket").count().orderBy("bucket").show()

    print("-- 2b. corpus cleaning: PII scrub + cross-doc line dedup")
    from rs_graphdb_spark.functions.cleaning import (
        dedup_lines,
        pii_counts,
        scrub_pii,
    )

    audited = docs.select("doc_id", pii_counts("text").alias("pii"))
    audited.agg(*[F.sum(f"pii.{f}").alias(f)
                  for f in ("email", "ip", "phone", "id_number")]).show()
    docs = docs.withColumn("text", scrub_pii("text"))
    lined = dedup_lines(docs, "doc_id", "text", delim=" a ", max_line_df=3)
    lined.agg(F.sum("n_kept").alias("lines_kept"),
              F.sum("n_dropped").alias("boilerplate_dropped")).show()

    print("-- 2c. model-based quality scoring (hashed-feature classifier)")
    from rs_graphdb_spark.functions.cleaning import (
        linear_text_classifier,
        make_hashed_weights,
    )

    wts = make_hashed_weights(spark, 1 << 16, seed=0)
    linear_text_classifier(docs, "doc_id", "text", wts).agg(
        F.round(F.avg("score"), 4).alias("avg_quality_score")
    ).show()

    print("-- 3. near-dup clustering (MinHash/LSH -> CC -> keeper)")
    clusters = near_dup_clusters(docs, "doc_id", "text", threshold=0.8)
    clusters.groupBy("keep").count().show()

    print("-- 3a. soft dedup: down-weight duplicates instead of dropping")
    from rs_graphdb_spark.functions.dedup import soft_dedup_weights

    soft_dedup_weights(clusters).agg(
        F.count("*").alias("docs"),
        F.sum("weight_micro").alias("total_micro_mass"),
    ).show()

    print("-- 3b. SemDeDup over the embeddings table (semantic pruning)")
    from rs_graphdb_spark.functions.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    semantic_dedup(emb, "vec_id", "embedding", k=4, threshold=0.45) \
        .groupBy("keep").count().show()

    print("-- 4. incremental dedup: probe a new batch against the corpus index")
    from rs_graphdb_spark.functions.dedup import minhash_index, minhash_probe

    split_id = docs.agg(F.max("doc_id")).first()[0] // 2
    banded, sets = minhash_index(docs.filter(F.col("doc_id") <= split_id),
                                 "doc_id", "text")
    probe = minhash_probe(banded, sets,
                          docs.filter(F.col("doc_id") > split_id),
                          "doc_id", "text", threshold=0.8)
    print(f"   new-batch near-dup pairs: {probe.count()}")

    print("-- 4b. nightly refresh: snapshot diff -> probe ONLY the delta")
    # the incremental-decontamination stage: classify the refreshed
    # snapshot against yesterday's, then probe only added/changed docs
    # against the standing index + the benchmark shingles — never
    # re-shingling the unchanged 99% of the corpus (driver part
    # q39:diff_probe pins the pair set against a DuckDB twin)
    from rs_graphdb_spark.functions.cleaning import snapshot_diff
    from rs_graphdb_spark.functions.dedup import ngram_contamination

    mx = docs.agg(F.max("doc_id")).first()[0]
    refreshed = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select("doc_id",
                F.when(F.col("doc_id") % 7 == 0,
                       F.concat(F.col("text"), F.lit(" rev2")))
                .otherwise(F.col("text")).alias("text"))
        .unionByName(
            docs.filter(F.col("doc_id") % 11 == 0).select(
                (F.col("doc_id") + mx + 1).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text")))
    )
    diff = snapshot_diff(docs, refreshed, "doc_id", "text")
    diff.groupBy("status").count().orderBy("status").show()
    delta = refreshed.join(
        diff.filter(F.col("status").isin("added", "changed"))
        .select("doc_id"), "doc_id", "left_semi")
    banded_all, sets_all = minhash_index(docs, "doc_id", "text")
    delta_dups = minhash_probe(
        banded_all, sets_all,
        delta.select((F.col("doc_id") + 10 * (mx + 1)).alias("doc_id"), "text"),
        "doc_id", "text", threshold=0.8)
    evalset = docs.filter(F.col("doc_id") % 17 == 0).select("doc_id", "text")
    contam = ngram_contamination(delta, evalset, "doc_id", "text")
    print(f"   delta docs: {delta.count()}, near-dups of corpus: "
          f"{delta_dups.count()}, benchmark-contaminated: {contam.count()}")

    print("-- 5. contamination-safe split (keyed on dup fingerprint)")
    kept = docs.join(clusters.filter("keep"), docs.doc_id == clusters.doc_id
                     ).select(docs["*"])
    split = group_aware_split(kept.withColumn("fp", fingerprint("text")), "fp")
    split.groupBy("split").count().orderBy("split").show()

    print("-- 6. language-stratified mixing sample (en 50%, others 10%)")
    from rs_graphdb_spark.functions.sampling import stratified_hash_sample
    from rs_graphdb_spark.functions.text import lang_id

    mixed = stratified_hash_sample(
        split.withColumn("lg", lang_id("text")),
        "doc_id", "lg", {"en": 0.5}, default_fraction=0.1,
    )
    mixed.groupBy("lg").count().orderBy("lg").show()

    print("-- 6b. token-budget mixture (src0 30%, src1 20%, rest shared)")
    from rs_graphdb_spark.functions.sampling import (
        apply_token_mixture,
        mixture_plan,
    )

    ntok = split.withColumn("n_tok", token_count("text").cast("long"))
    plan = mixture_plan(ntok, "source", "n_tok", token_budget=10_000.0,
                        weights={"src0": 0.3, "src1": 0.2},
                        default_weight=0.02)
    plan.orderBy("source").show(5)
    apply_token_mixture(ntok, "doc_id", "source", plan).groupBy("source") \
        .agg(F.sum("n_tok").alias("tokens")).orderBy("source").show(5)

    print("-- 7. sequence packing (2048-token bins, 8 shards)")
    packed = pack_greedy(
        split.withColumn("sz", token_count("text").cast("long")),
        "doc_id", "sz", budget=2048, shards=8,
    )
    packed.groupBy("shard", "bin").agg(
        F.count("*").alias("docs"), F.sum("sz").alias("tokens")
    ).orderBy("shard", "bin").show(10)

    print("-- 7b. shuffle-shard write layout (8 shards, seeded order)")
    from rs_graphdb_spark.functions.cleaning import shuffle_shard

    sharded = shuffle_shard(split, "doc_id", 8, seed=0)
    sharded.groupBy("shard").count().orderBy("shard").show()
    # production write: sharded.repartition(8, "shard")
    #                          .sortWithinPartitions("sort_key")
    #                          .write.partitionBy("shard").parquet(...)

    print("-- 8. multimodal: render docs into real BMP/PGM/PNG and decode")
    from rs_graphdb_spark.functions.multimodal import (
        documents_as_images,
        extract_features,
    )

    media = documents_as_images(docs.limit(200), corrupt_every=97)
    feats = extract_features(media)
    feats.groupBy("media_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("width"), 1).alias("avg_w"),
        F.round(F.avg("height"), 1).alias("avg_h"),
    ).orderBy("media_type").show()

    print("-- 8b. real nearest-neighbor resize to 32x32 (same formats)")
    from rs_graphdb_spark.functions.multimodal import resize_image

    extract_features(resize_image(media, 32, 32)).groupBy(
        "media_type", "width", "height"
    ).count().orderBy("media_type").show()

    print("-- 8c. audio (real WAV) + video (real AVI) feature passes")
    from rs_graphdb_spark.functions.multimodal import (
        audio_features,
        documents_as_audio,
        documents_as_video,
        resample_audio,
        sample_video_frames,
    )

    wav = documents_as_audio(docs, corrupt_every=89)
    audio_features(resample_audio(wav, 4000)).groupBy(
        "media_type", "sample_rate"
    ).count().orderBy("media_type").show()
    sample_video_frames(
        documents_as_video(docs, corrupt_every=83), every_n=2
    ).groupBy("width").count().orderBy("width").show()

    print("-- 9. BPE tokenizer: train 6 merges, encode to token ids")
    from rs_graphdb_spark.functions.bpe import (
        bpe_artifact, bpe_encode_ids, bpe_train)

    m, v = bpe_train(docs, "text", num_merges=6)
    m.orderBy("rank").show()
    art = bpe_artifact(m, v)
    bpe_encode_ids(docs, "doc_id", "text", art).select(
        "doc_id", F.size("ids").alias("n_ids")
    ).groupBy().agg(F.sum("n_ids").alias("corpus_token_ids")).show()

    print("-- 10. BM25 retrieval: direct + standing-index search")
    import tempfile

    from rs_graphdb_spark.functions.text import (
        bm25_search, bm25_search_indexed, write_bm25_index)

    bm25_search(docs, "doc_id", "text", ["hash", "join", "merge"]) \
        .orderBy(F.col("score").desc()).limit(5).show()
    with tempfile.TemporaryDirectory() as d:
        write_bm25_index(docs, "doc_id", "text", d)
        bm25_search_indexed(spark, d, ["hash", "join", "merge"], k=5).show()
    spark.stop()


if __name__ == "__main__":
    main()

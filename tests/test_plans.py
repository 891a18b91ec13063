"""Physical-plan regression tests: the plan SHAPES the 100 TB design
relies on, asserted at the explain level so a refactor that silently
adds a shuffle / loses pushdown / drops a broadcast fails CI.

(The bucketed no-Exchange assertion lives in test_sources; the
composite-prefix PartitionFilters assertion runs inside q97 itself.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    # count shuffle exchanges only (broadcast exchanges are the cheap kind)
    return sum(
        1 for ln in _plan(df).splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln
    )


def test_label_scan_pushes_filter_and_prunes_columns(spark, graph):
    df = (
        graph.nodes["Customer"]
        .filter(F.col("c_acctbal") > 1000.0)
        .select("id", "c_name")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "c_acctbal" in plan.split("PushedFilters", 1)[1][:200]
    # projection pruning: the scan must not read the untouched wide columns
    read = plan.split("ReadSchema", 1)[1][:300]
    assert "c_mktsegment" not in read and "c_nationkey" not in read


def test_one_hop_join_broadcasts_small_dim(spark, graph):
    nation = graph.nodes["Nation"]
    cust = graph.nodes["Customer"]
    edges = graph.edges["CUST_NATION"].df
    df = (
        cust.join(edges, cust["id"] == edges["src"])
        .join(nation, edges["dst"] == nation["id"])
        .groupBy("n_name").count()
    )
    assert "BroadcastHashJoin" in _plan(df)


def test_asof_join_is_single_shuffle(spark):
    from rs_graphdb_spark.operators.temporal import asof_join
    from rs_graphdb_spark.session import local_df

    left = local_df(spark, [(1, 10), (1, 20)], "user_id long, ts long")
    right = local_df(spark, [(1, 5, 7)], "user_id long, ts long, event_id long")
    out = asof_join(left, right, ["user_id"], "ts", "ts", value_cols=["event_id"])
    # the union-merge design: ONE exchange partitions the unioned frame by
    # key; everything after is window work on that partitioning
    assert _n_exchanges(out) == 1, _plan(out)


def test_sessionize_is_single_shuffle(spark):
    from rs_graphdb_spark.operators.temporal import sessionize
    from rs_graphdb_spark.session import local_df

    ev = local_df(spark, [(1, 10), (1, 20)], "user_id long, ts long")
    out = sessionize(ev, "user_id", "ts", gap=5)
    assert _n_exchanges(out) == 1, _plan(out)


def test_quality_features_single_jvm_projection(spark):
    """The single-evaluation struct form must stay ONE JVM projection
    directly over a 2-column pruned scan — no Python stage, no shuffle,
    and exactly one tokenizer call in the plan (the lambda binding).
    (Higher-order functions run as interpreted expressions, outside
    whole-stage codegen — still JVM-side and single-pass.)"""
    from rs_graphdb_spark.functions.text import quality_features_struct

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select("doc_id", quality_features_struct("text").alias("qf"))
    plan = _plan(df)
    assert _n_exchanges(df) == 0
    assert "Python" not in plan  # no UDF fallback crept in
    assert plan.count("regexp_extract_all") == 1  # tokenizer bound once
    read = plan.split("ReadSchema", 1)[1][:200]
    assert "doc_id" in read and "lang" not in read  # column pruning held


def test_interval_join_shuffles_on_bucket_key(spark):
    from rs_graphdb_spark.operators.temporal import interval_join
    from rs_graphdb_spark.session import local_df

    left = local_df(spark, [(1, 100)], "user_id long, ts long")
    right = local_df(spark, [(1, 150, 9)], "user_id long, ts long, event_id long")
    out = interval_join(left, right, ["user_id"], "ts", "ts", 50, 50,
                        value_cols=["event_id"])
    plan = _plan(out)
    # join key must include the derived time bucket, not just user_id —
    # that is what bounds the per-key fan-out under a hot key
    assert "_bucket" in plan


def test_scrub_pii_stays_in_scan_stage(spark):
    from rs_graphdb_spark.functions.cleaning import pii_counts, scrub_pii

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select("doc_id", scrub_pii("text").alias("c"),
                     pii_counts("text").alias("p"))
    assert _n_exchanges(df) == 0, _plan(df)


def test_dedup_lines_two_shuffles_no_text_in_df_pass(spark):
    from rs_graphdb_spark.functions.cleaning import dedup_lines

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup_lines(docs, "doc_id", "text", delim=" a ")
    # line-hash df exchange + doc-keyed reconstruct exchange; the final
    # left join back to doc ids broadcasts or reuses, never adds a third
    # full shuffle of line text
    assert _n_exchanges(out) <= 3, _plan(out)


def test_classifier_broadcasts_weights(spark):
    from rs_graphdb_spark.functions.cleaning import (
        linear_text_classifier,
        make_hashed_weights,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = make_hashed_weights(spark, 1 << 12)
    out = linear_text_classifier(docs, "doc_id", "text", w, dim=1 << 12)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    # (id, feature) dedup exchange + doc-keyed agg exchange (+ the final
    # doc left-join); the weight side must NOT shuffle-join
    assert _n_exchanges(out) <= 4, plan


def test_shuffle_shard_is_pure_projection(spark):
    from rs_graphdb_spark.functions.cleaning import shuffle_shard

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = shuffle_shard(docs, "doc_id", 8)
    assert _n_exchanges(out) == 0, _plan(out)


def test_mixture_apply_broadcasts_plan(spark):
    from rs_graphdb_spark.functions.sampling import (
        apply_token_mixture,
        mixture_plan,
    )
    from rs_graphdb_spark.functions.text import token_count

    docs = spark.read.parquet(f"{SF}/documents.parquet").withColumn(
        "n_tok", token_count("text").cast("long")
    )
    plan_df = mixture_plan(docs, "source", "n_tok", 1000.0, {"src0": 0.5})
    out = apply_token_mixture(docs, "doc_id", "source", plan_df)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan


def test_snapshot_diff_shuffles_hashes_not_text(spark):
    from rs_graphdb_spark.functions.cleaning import snapshot_diff

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = snapshot_diff(docs, docs, "doc_id", "text")
    plan = _plan(out)
    # full-outer join cannot broadcast: expect exactly the two side
    # exchanges (and no more), and the shuffled schema is (id, fp) only
    assert _n_exchanges(out) <= 2, plan
    assert "text" not in plan.split("SortMergeJoin")[0].split("Exchange")[-1]


def test_repetition_signals_stays_in_scan_stage(spark):
    """The Gopher repetition struct (incl. the round-6 sorted run-length
    gram stats) must stay a zero-Exchange scan-stage projection."""
    from rs_graphdb_spark.functions.text import repetition_signals

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = docs.select("doc_id", repetition_signals("text").alias("r"))
    assert _n_exchanges(df) == 0


def test_chunk_documents_is_pure_scan_stage(spark):
    from rs_graphdb_spark.functions.text import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = chunk_documents(docs, "doc_id", "text", max_tokens=40, overlap=8)
    assert _n_exchanges(df) == 0


def test_kn_lm_broadcasts_all_three_count_tables(spark):
    """score_kn_lm: bigram, context-stats and continuation tables all
    broadcast (vocabulary-bounded); the only shuffles are the doc-keyed
    aggregation + the empty-doc restore join."""
    from rs_graphdb_spark.functions.lm import (
        bigram_counts, lm_vocab_size, score_kn_lm)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    lm = bigram_counts(docs).localCheckpoint()
    df = score_kn_lm(docs, "doc_id", "text", lm, lm_vocab_size(lm))
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3


def test_stream_join_batch_twin_pushes_type_filters(spark):
    """The interval self-join's event_type filters must reach the
    parquet scan on BOTH sides (each side reads only its own type), and
    the small side should broadcast — the plan a 100 TB run needs."""
    from rs_graphdb_spark.streaming.ops import stream_stream_interval_join

    events = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    plan = stream_stream_interval_join(
        events, horizon_s=3600, streaming=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,click)" in plan


def test_unicode_text_stage_is_single_scan(spark):
    """The unicode text family is a scan-stage projection: no Exchange
    (beyond an explicit repartition), no Python eval nodes."""
    from pyspark.sql import functions as F

    from rs_graphdb_spark.functions import text as TX

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = docs.select(
        "doc_id",
        TX.lang_id("text", mode="unicode").alias("lang"),
        TX.token_count("text", mode="unicode").alias("n"),
        TX.quality_filter("text", mode="unicode").alias("keep"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # pure JVM expressions, no UDF fallback

"""Fluent Query builder semantics (reference `src/query.rs` behaviors,
upgraded per SURVEY.md §3.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rs_graphdb_spark.graph import label_base


def test_label_scan_counts(q, spark):
    n = q.from_label("Customer").df.count()
    raw = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert n == raw == 150


def test_point_lookup_and_id_scheme(q):
    row = (
        q.from_label_and_prop_eq("Customer", "c_name", "Customer#000000007")
        .df.select("id", "c_custkey")
        .first()
    )
    assert row["id"] == label_base("Customer") + row["c_custkey"]


def test_out_keeps_multiplicity_and_dedup_flag(q):
    base = q.from_label("Customer").where_prop_eq("c_nationkey", 7)
    n_cust = base.df.count()
    hops = base.out("PLACED").df.count()
    assert hops > n_cust  # ~10 orders per customer
    # distinct() dedups by node id
    assert base.out("PLACED").distinct().df.count() == hops  # orders unique
    two = base.out("PLACED").out("CONTAINS")
    assert two.distinct().df.count() < two.df.count()


def test_in_hop_reverses(q):
    custs = (
        q.from_label("Order").where_prop_eq("o_orderkey", 0)
        .in_("PLACED").df.select("c_custkey").collect()
    )
    assert len(custs) == 1


def test_order_by_nulls_last_and_pagination(q):
    rows = (
        q.from_label("Order").order_by("o_orderkey").paginate(10, 5)
        .df.select("o_orderkey").collect()
    )
    assert [r["o_orderkey"] for r in rows] == [10, 11, 12, 13, 14]


def test_union_vs_union_all(q):
    a = q.from_label("Customer").where_prop_eq("c_nationkey", 1)
    b = q.from_label("Customer").where_prop_eq("c_nationkey", 1)
    assert a.union(b).df.count() == a.df.count()
    assert a.union_all(b).df.count() == 2 * a.df.count()


def test_semi_anti_partition(q):
    total = q.from_label("Customer").df.count()
    semi = q.from_label("Customer").semi_out("KNOWS").df.count()
    anti = q.from_label("Customer").anti_out("KNOWS").df.count()
    assert semi + anti == total


def test_optional_out_keeps_unmatched(q):
    n = (
        q.from_label("Customer").optional_out("KNOWS")
        .df.select("id").distinct().count()
    )
    assert n == q.from_label("Customer").df.count()


def test_aggregates(q):
    row = q.from_label("Customer").group_by_agg(
        [], {"cnt": F.count("*"), "avg_bal": F.avg("c_acctbal")}
    ).first()
    assert row["cnt"] == 150 and row["avg_bal"] is not None


def test_percentile_and_stdev(q):
    samp = q.from_label("Customer").stdev("c_acctbal").first()[0]
    pop = q.from_label("Customer").stdev("c_acctbal", population=True).first()[0]
    assert samp > pop > 0
    p50 = q.from_label("Customer").percentile_cont("c_acctbal", 0.5).first()[0]
    assert p50 > 0

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


# ============== SKIP/LIMIT battery (reference tests/skip_limit_test.rs) =====
# Customer at sf0.001 has 150 rows — the reference's 1000-user fixture
# scaled to the test data; every boundary from the Rust suite is kept.

def test_skip_basic(q):
    base = q.from_label("Customer").order_by("c_custkey")
    assert base.skip(100).df.count() == 50
    assert base.skip(149).df.count() == 1
    assert base.skip(150).df.count() == 0          # skip all
    assert base.skip(2000).df.count() == 0         # skip beyond total


def test_limit_basic(q):
    base = q.from_label("Customer")
    assert base.limit(100).df.count() == 100
    assert base.limit(0).df.count() == 0           # limit zero
    assert base.limit(2000).df.count() == 150      # limit beyond total


def test_skip_and_limit_combined(q):
    base = q.from_label("Customer").order_by("c_custkey")
    assert base.skip(50).limit(50).df.count() == 50
    assert base.skip(100).limit(100).df.count() == 50   # clipped tail page
    assert base.skip(150).limit(100).df.count() == 0    # fully past the end


def test_paginate_vs_skip_limit_consistency(q):
    base = q.from_label("Customer").order_by("c_custkey")
    via_paginate = [r["c_custkey"] for r in
                    base.paginate(25, 10).df.select("c_custkey").collect()]
    via_skip_limit = [r["c_custkey"] for r in
                      base.skip(25).limit(10).df.select("c_custkey").collect()]
    assert via_paginate == via_skip_limit != []


def test_paginate_edge_cases(q):
    base = q.from_label("Customer").order_by("c_custkey")
    assert base.paginate(150, 100).df.count() == 0   # offset past the end
    assert base.paginate(0, 0).df.count() == 0       # zero page size
    assert base.paginate(0, 10000).df.count() == 150  # oversized page


def test_chained_pagination_covers_all_rows_once(q):
    """Walking pages until empty yields every row exactly once
    (skip_limit_test.rs:163-198)."""
    base = q.from_label("Customer").order_by("c_custkey")
    seen: list[int] = []
    page = 0
    while True:
        rows = base.paginate(page * 40, 40).df.select("c_custkey").collect()
        if not rows:
            break
        seen.extend(r["c_custkey"] for r in rows)
        page += 1
        assert page <= 5, "too many pages"
    assert len(seen) == 150 and len(set(seen)) == 150


def test_order_by_with_pagination_window_values(q):
    """Sorted pagination returns exactly the expected key window
    (skip_limit_test.rs:216-237, tightened to exact values)."""
    rows = (q.from_label("Customer").order_by("c_custkey")
            .paginate(100, 25).df.select("c_custkey").collect())
    assert [r["c_custkey"] for r in rows] == list(range(100, 125))

"""Edge-case parity with the reference test suite (SURVEY.md §5):
aggregation numerics on empty/single-value inputs, percentile parameter
validation, skip/limit boundaries, pagination identity.

Reference: `tests/aggregation_enhanced_test.rs:20-501`,
`tests/skip_limit_test.rs:28-156`.
"""

import pytest
from pyspark.sql import functions as F

from rs_graphdb_spark.loaders import load_tpch_graph
from rs_graphdb_spark.query import Query

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def g(spark):
    return load_tpch_graph(spark, SF)


def _empty(g):
    return Query(graph=g).from_label("Customer").where(F.lit(False))


# -- aggregation numerics ----------------------------------------------------

def test_count_on_empty_frontier(g):
    assert _empty(g).count().first()["cnt"] == 0


def test_sum_avg_on_empty_frontier_is_null(g):
    # reference errors on non-Int sums and skips empty; SQL semantics: NULL
    row = _empty(g).sum_("c_acctbal").first()
    assert row["sum_val"] is None
    assert _empty(g).avg_("c_acctbal").first()["avg_val"] is None


def test_stdev_single_value_is_null_sample(g, spark):
    # sample stddev of n=1 is undefined (NULL); population is 0.0 — the
    # reference's Cypher path returns NULL for n<2
    # (`src/cypher/executor.rs:482-501`)
    one = Query(graph=g).from_label("Customer").where(F.col("c_custkey") == 1)
    assert one.stdev("c_acctbal").first()["stdev_val"] is None
    assert one.stdev("c_acctbal", population=True).first()["stdev_val"] == 0.0


def test_stdev_sample_vs_population(g):
    q = Query(graph=g).from_label("Nation")
    samp = q.stdev("n_regionkey").first()["stdev_val"]
    pop = q.stdev("n_regionkey", population=True).first()["stdev_val"]
    assert samp > pop > 0


def test_percentile_bounds(g):
    q = Query(graph=g).from_label("Customer")
    lo = q.percentile_cont("c_acctbal", 0.0).first()[0]
    hi = q.percentile_cont("c_acctbal", 1.0).first()[0]
    mid = q.percentile_cont("c_acctbal", 0.5).first()[0]
    mn = q.min_("c_acctbal").first()[0]
    mx = q.max_("c_acctbal").first()[0]
    assert lo == mn and hi == mx and mn < mid < mx


def test_percentile_invalid_param_raises(g):
    # reference validates q ∈ [0,1] (`src/query.rs:534-574`)
    q = Query(graph=g).from_label("Customer")
    with pytest.raises(Exception):
        q.percentile_cont("c_acctbal", 1.5).first()


def test_percentile_disc_is_an_actual_value(g):
    q = Query(graph=g).from_label("Customer")
    v = q.percentile_disc("c_acctbal", 0.37).first()[0]
    assert (
        Query(graph=g).from_label("Customer")
        .where(F.col("c_acctbal") == v).df.count() > 0
    )


# -- skip / limit boundaries (`tests/skip_limit_test.rs`) --------------------

def test_skip_past_end_is_empty(g):
    n = g.nodes["Customer"].count()
    q = Query(graph=g).from_label("Customer").order_by("c_custkey")
    assert q.skip(n + 10).df.count() == 0


def test_skip_zero_is_identity(g):
    q = Query(graph=g).from_label("Customer").order_by("c_custkey")
    assert q.skip(0).df.count() == g.nodes["Customer"].count()


def test_limit_zero_and_over_length(g):
    n = g.nodes["Customer"].count()
    q = Query(graph=g).from_label("Customer").order_by("c_custkey")
    assert q.limit(0).df.count() == 0
    assert q.limit(n + 100).df.count() == n


def test_paginate_equals_skip_limit(g):
    # identity pinned by the reference (`tests/skip_limit_test.rs:28-156`)
    q = Query(graph=g).from_label("Customer").order_by("c_custkey")
    a = [r["c_custkey"] for r in q.skip(40).limit(25).df.collect()]
    b = [r["c_custkey"] for r in q.paginate(40, 25).df.collect()]
    assert a == b and len(a) == 25


def test_pagination_covers_all_rows_once(g):
    q = Query(graph=g).from_label("Customer").order_by("c_custkey")
    n = g.nodes["Customer"].count()
    seen = []
    page = 0
    while True:
        rows = q.paginate(page * 37, 37).df.collect()
        if not rows:
            break
        seen.extend(r["c_custkey"] for r in rows)
        page += 1
    assert len(seen) == n and len(set(seen)) == n
    assert seen == sorted(seen)

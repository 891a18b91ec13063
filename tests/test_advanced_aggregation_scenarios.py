"""The reference's advanced-aggregation scenarios, ported 1:1.

Source: `/root/reference/tests/advanced_aggregation_test.rs` —
percentileCont (median, quartiles, p95, float interpolation, empty,
single value, invalid q), sample stdev (constant/empty/single), sample
variance (+ stdev² consistency), and combined/filtered aggregation.

The reference returns ``None`` for empty inputs, n<2 stdev, and
out-of-range q; SQL aggregation returns NULL for the first two, and the
invalid-q guard lives in the Cypher layer (the reference's own guard is
in `percentile_cont`, `src/cypher/executor.rs:532-541`).
"""

from __future__ import annotations

import math

import pytest

from rs_graphdb_spark.graph import PropertyGraph
from rs_graphdb_spark.query import Query
from rs_graphdb_spark.session import local_df


def _students(spark, scores):
    rows = [(i + 1, f"S{i + 1}", s, 20 + i) for i, s in enumerate(scores)]
    g = PropertyGraph(nodes={"Student": local_df(
        spark, rows, "id long, name string, score long, age long")}, edges={})
    return Query(g).from_label("Student")


def _one(df):
    return df.first()[0]


def test_percentile_cont_median(spark):
    """advanced_aggregation_test.rs:19-34: median of 60..100 is 80."""
    q = _students(spark, [60, 70, 80, 90, 100])
    assert _one(q.percentile_cont("score", 0.5)) == 80.0


def test_percentile_cont_quartiles(spark):
    """advanced_aggregation_test.rs:36-58."""
    q = _students(spark, list(range(1, 11)))
    q1 = _one(q.percentile_cont("score", 0.25))
    assert 2.0 < q1 < 4.0
    assert _one(q.percentile_cont("score", 0.5)) == 5.5
    q3 = _one(q.percentile_cont("score", 0.75))
    assert 7.0 < q3 < 9.0


def test_percentile_cont_empty(spark):
    """advanced_aggregation_test.rs:60-68: empty → NULL (reference
    None)."""
    q = _students(spark, [])
    assert q.percentile_cont("score", 0.5).first()[0] is None


def test_percentile_cont_single_value(spark):
    """advanced_aggregation_test.rs:70-80."""
    q = _students(spark, [80])
    assert _one(q.percentile_cont("score", 0.5)) == 80.0


def test_percentile_cont_invalid_percentile(spark):
    """advanced_aggregation_test.rs:82-93: q outside [0,1] is rejected
    (the reference returns None; Spark raises — both refuse to compute)."""
    q = _students(spark, [80])
    for bad in (-0.1, 1.1):
        with pytest.raises(Exception):
            q.percentile_cont("score", bad).collect()


def test_percentile_cont_p95(spark):
    """advanced_aggregation_test.rs:95-110: p95 over 1..100 ≈ 95."""
    q = _students(spark, list(range(1, 101)))
    assert abs(_one(q.percentile_cont("score", 0.95)) - 95.0) < 1.0


def test_stdev(spark):
    """advanced_aggregation_test.rs:112-132: sample σ of 20,25,30,35,40
    is √62.5 ≈ 7.906."""
    q = _students(spark, [20, 25, 30, 35, 40])
    assert abs(_one(q.stdev("score")) - 7.906) < 0.01


def test_stdev_constant_values(spark):
    """advanced_aggregation_test.rs:134-148."""
    q = _students(spark, [30, 30, 30, 30])
    assert _one(q.stdev("score")) == 0.0


def test_stdev_empty_and_single_value(spark):
    """advanced_aggregation_test.rs:150-170: both yield NULL (sample σ
    undefined below n=2; reference returns None)."""
    assert _students(spark, []).stdev("score").first()[0] is None
    assert _students(spark, [80]).stdev("score").first()[0] is None


def test_variance(spark):
    """advanced_aggregation_test.rs:172-189: sample variance 62.5."""
    q = _students(spark, [20, 25, 30, 35, 40])
    assert abs(_one(q.variance("score")) - 62.5) < 0.01


def test_variance_consistency_with_stdev(spark):
    """advanced_aggregation_test.rs:191-207: σ = √variance."""
    q = _students(spark, [11, 24, 37, 52, 68])
    s = _one(q.stdev("score"))
    v = _one(q.variance("score"))
    assert abs(s - math.sqrt(v)) < 0.001


def test_variance_empty(spark):
    """advanced_aggregation_test.rs:209-217."""
    assert _students(spark, []).variance("score").first()[0] is None


def test_aggregation_combined(spark):
    """advanced_aggregation_test.rs:219-242: count/median/avg/σ/var over
    scores 5,10,...,100."""
    scores = [5 * i for i in range(1, 21)]
    q = _students(spark, scores)
    assert _one(q.count()) == 20
    assert _one(q.percentile_cont("score", 0.5)) == 52.5
    assert _one(q.avg_("score")) == 52.5
    assert _one(q.stdev("score")) is not None
    assert _one(q.variance("score")) is not None


def test_aggregation_with_filter(spark):
    """advanced_aggregation_test.rs:244-261: median over the filtered
    frontier (score >= 50 keeps 50..100, median 75)."""
    q = _students(spark, [10, 20, 30, 40, 50, 60, 70, 80, 90, 100])
    filtered = q.where_prop_gt("score", 49)
    assert _one(filtered.count()) == 6
    assert _one(filtered.percentile_cont("score", 0.5)) == 75.0


def test_percentile_cont_float_interpolation(spark):
    """advanced_aggregation_test.rs:263-280: even-count median
    interpolates between the middle pair (1..8 → 4.5)."""
    q = _students(spark, list(range(1, 9)))
    assert _one(q.percentile_cont("score", 0.5)) == 4.5


def test_aggregation_edge_cases(spark):
    """advanced_aggregation_test.rs:282-300: two values — median is the
    midpoint, sample variance (20-30)²/2·... = 50."""
    q = _students(spark, [20, 30])
    assert _one(q.percentile_cont("score", 0.5)) == 25.0
    assert _one(q.variance("score")) == 50.0

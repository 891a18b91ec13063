"""Dump FULL pipeline plans for the dedup queries with every
localCheckpoint/persist neutralized (the committed query plans are
checkpoint-opaque: the returned frame is a Scan ExistingRDD over the
materialized pair set, in r10 and r11 alike). Patching the pins to
identity exposes the whole lineage down to the parquet scans so plan
claims (exchange count, join strategy, key width) are checkable.

Usage: SPARK_GRAFT_SF_DIR=... python tools/dump_internal_plans.py <tag> <query>...
Writes plans/$SPARK_GRAFT_PLANS_DIR/<query>_internal_<tag>.txt.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import DataFrame
    from pyspark.sql.classic.dataframe import DataFrame as CDataFrame

    for klass in (DataFrame, CDataFrame):
        klass.localCheckpoint = lambda self, eager=True: self  # type: ignore
        klass.persist = lambda self, *a, **k: self  # type: ignore

    from rs_graphdb_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("internal_plans")
    qs = entry._legacy_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"))
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        p = os.path.join(out_dir, f"{n}_internal_{tag}.txt")
        with open(p, "w") as f:
            f.write(plan)
        print(n, "->", p)


if __name__ == "__main__":
    main()

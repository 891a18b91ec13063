"""Dump .explain('formatted') for bench queries to plans/$SPARK_GRAFT_PLANS_DIR
(default r11)/<q>_<tag>.txt."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rs_graphdb_spark.session import get_spark
import __spark_entry__ as entry

def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plans")
    qs = entry._legacy_queries()
    if not names:
        import bench
        names = [n for n in bench.HEADLINE + bench.EXTRA if n in qs]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans",
                           os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"))
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        try:
            df = qs[n](spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as e:
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(out_dir, f"{n}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(n, "->", f"{n}_{tag}.txt")

if __name__ == "__main__":
    main()

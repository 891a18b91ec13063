"""Derive the memory-bandwidth calibration threshold (r9 VERDICT item
#1): the single-thread busy loop (`bench._calib1`) is steal-sensitive
but bandwidth-blind — sf1 q46 committed 20.7 s in r9 from two
clean-calib passes that isolated adjudication put at 13.3 s (sustained
outside-VM memory pressure). The new probe streams a fixed buffer
across N worker threads (numpy releases the GIL, so the threads
genuinely load several memory channels at once); its sample time is a
machine constant on an idle box and inflates under bandwidth
contention.

This tool measures the probe's distribution under the same conditions
bench.py samples in:
  A. bare python, no Spark              (floor)
  B. idle Spark session up              (bench's between-pass state)
  C. immediately after a heavy 32-thread Spark job (GC/JIT tail)
  D. DURING a concurrent 32-thread memory-heavy Spark job
     (stand-in for outside-VM bandwidth pressure — must separate
      cleanly from A-C for the gate to be usable)

Prints per-condition min/median/max over N samples; the bench gate
threshold `_BW_BAD` is chosen above max(A..C) with margin and below
the D cluster, the way `_CALIB_BAD` (idle 0.061-0.065, storms >=0.075)
was derived.

Usage: python tools/bw_calib_probe.py
"""

from __future__ import annotations

import statistics
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def sample_n(fn, n=12, gap=0.2):
    out = []
    for _ in range(n):
        out.append(fn())
        time.sleep(gap)
    return out


def stats(name, xs):
    print(f"{name}: min={min(xs):.4f} med={statistics.median(xs):.4f} "
          f"max={max(xs):.4f}  n={len(xs)}")


def main() -> None:
    from bench import _bw_calib1

    print("A. bare python (no Spark)")
    a = sample_n(_bw_calib1)
    stats("A", a)

    from rs_graphdb_spark.session import get_spark

    spark = get_spark("bw-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("B. idle Spark session")
    b = sample_n(_bw_calib1)
    stats("B", b)

    def heavy():
        # 32-thread shuffle+agg over ~1.5 GB of generated rows — the
        # kind of job a bench pass runs
        (spark.range(0, 40_000_000, 1, 32)
         .selectExpr("id % 97 as k", "id * 2654435761 % 1000003 as v")
         .groupBy("k").agg({"v": "sum"})
         .write.mode("overwrite").format("noop").save())

    heavy()
    print("C. right after a heavy Spark job")
    c = sample_n(_bw_calib1)
    stats("C", c)

    print("D. during a concurrent heavy Spark job")
    stop = threading.Event()

    def loop():
        while not stop.is_set():
            heavy()

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    time.sleep(2.0)
    d = sample_n(_bw_calib1)
    stop.set()
    th.join(timeout=120)
    stats("D", d)

    quiet_max = max(max(a), max(b), max(c))
    print(f"\nquiet max (A..C) = {quiet_max:.4f}; contended min (D) = "
          f"{min(d):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()

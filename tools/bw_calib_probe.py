"""Derive the memory-bandwidth calibration threshold (r9 VERDICT item
#1): the single-thread busy loop (`bench._calib1`) is steal-sensitive
but bandwidth-blind — sf1 q46 committed 20.7 s in r9 from two
clean-calib passes that isolated adjudication put at 13.3 s (sustained
outside-VM memory pressure). `bench._bw_calib1` streams fixed buffers
across N worker threads (numpy releases the GIL, so the threads
genuinely load several memory channels at once); its min-of-2 sample
time is a machine constant on an idle box and inflates under bandwidth
contention.

This tool measures the probe's distribution under the conditions
bench.py samples in:
  A. bare python, no Spark                   (floor)
  B. idle Spark session up                   (bench's between-pass state)
  C. immediately after a heavy 32-thread Spark job (GC/JIT tail)
  D. DURING a 16-thread numpy memory-STREAM antagonist process — the
     stand-in for outside-VM bandwidth pressure. (A Spark shuffle job
     was tried first and is too CPU-bound to contend DRAM channels:
     its D overlapped A-C.)

Derivation recorded 2026-08-16 (this box, min-of-2 sampling, two
runs): A-B max 0.067, C (post-job GC tail) max 0.074, antagonist
median 0.099 (its spin-up can leak one low sample) → _BW_BAD = 0.08,
above the quiet tail and below the contended median. Single-run
sampling overlapped (idle spikes to 0.125 from thread scheduling
jitter) — which is why the gate sample is min-of-2: sustained
pressure inflates both back-to-back runs, jitter only one.

Usage: python tools/bw_calib_probe.py
"""

from __future__ import annotations

import statistics
import subprocess
import sys
import textwrap
import time

sys.path.insert(0, "/root/repo")

ANTAGONIST = textwrap.dedent("""
    import threading, numpy as np, sys, time
    stop = time.time() + float(sys.argv[1])
    def work():
        a = np.ones(8 << 20); b = np.ones(8 << 20); c = np.empty(8 << 20)
        while time.time() < stop:
            np.add(a, b, out=c)
    ths = [threading.Thread(target=work) for _ in range(16)]
    [t.start() for t in ths]; [t.join() for t in ths]
""")


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

    _bw_calib1()  # fault buffers in
    print("A. bare python (no Spark)")
    a = sample_n(_bw_calib1)
    stats("A", a)

    from rs_graphdb_spark.session import get_spark

    spark = get_spark("bw-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("B. idle Spark session")
    b = sample_n(_bw_calib1)
    stats("B", b)

    (spark.range(0, 40_000_000, 1, 32)
     .selectExpr("id % 97 as k", "id * 2654435761 % 1000003 as v")
     .groupBy("k").agg({"v": "sum"})
     .write.mode("overwrite").format("noop").save())
    print("C. right after a heavy Spark job")
    c = sample_n(_bw_calib1)
    stats("C", c)

    print("D. during a 16-thread memory-stream antagonist")
    p = subprocess.Popen([sys.executable, "-c", ANTAGONIST, "40"])
    time.sleep(4.0)
    d = sample_n(_bw_calib1)
    p.wait()
    stats("D", d)

    quiet_max = max(max(a), max(b), max(c))
    print(f"\nquiet max (A..C) = {quiet_max:.4f}; contended min (D) = "
          f"{min(d):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()

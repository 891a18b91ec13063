"""Synthesize a larger scale factor from sf0.1 (r2 verdict #4: the 2x
perf bar should be re-proven beyond sf0.1).

Writes factor-N copies of every sf0.1 table into OUT_DIR with per-copy
key shifts (stride 2^20 keeps all natural keys far below the 2^40
label-namespace stride), preserving schemas bit-for-bit via DuckDB:

- region / nation: fixed dimensions, copied as-is (TPC-H convention)
- customer / supplier / part / orders / lineitem: keys + FKs shifted
  per copy, so each copy is a self-consistent shard (the KNOWS graph
  derivation yields N disjoint components — label info still travels
  within components, and CC/PageRank see 10x nodes and edges)
- events: event_id/user_id shifted -> 10x users at the same per-user
  event volume (the realistic scale-up for sessionize/asof)
- documents: doc_id shifted; copies i>0 get a ' shardN markerN' text
  suffix -> near-identical cross-copy twins (jaccard ~0.95), which is a
  DELIBERATE dedup stress: every doc gains 9 near-dups, like a crawl
  that picked up 10 mirrors of the same site
- embeddings: vec_id shifted, vectors unchanged (exact-duplicate
  vectors across copies stress the ANN/near-dup banding)

Usage: python tools/make_bigsf.py [factor] [src_dir] [out_dir]
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

STRIDE = 1 << 20


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = pathlib.Path(
        sys.argv[3] if len(sys.argv) > 3 else "/root/repo/.tmp/sf1"
    )
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    shifted = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t in ["region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, keys in shifted.items():
        parts = []
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        for i in range(factor):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * STRIDE} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    sel.append(f"text || ' shard{i} marker{i}' AS text")
                elif t == "documents" and c == "n_chars" and i > 0:
                    extra = len(f" shard{i} marker{i}")
                    sel.append(f"n_chars + {extra} AS n_chars")
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{src}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet'"
            " (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Build the 10x scale-soak dataset (driver-side tooling, like
selfcheck.py): /tmp/sf1_soak holds every harness table at 10x sf0.1 —
lineitem ~6M rows, events 1M, orders 1.5M — produced by key-shifted
copies so join fan-outs and per-key group sizes keep their sf0.1 shape
(pure duplication would multiply intra-key density instead of scale).
Copy 0 is byte-identical to sf0.1; copies 1..9 shift every key column
by i*stride and get a tiny per-copy text suffix so the dedup workload
keeps near-duplicate structure instead of gaining 10-way exact-dup
cliques (a quadratic pair blowup sf1 real data would not have).

The soak measures SCALING of the slowest queries (BENCH_SOAK.json via
tools/run_soak.sh), not correctness — the oracle gate stays on the
driver-generated sf0.01.

Usage: python3 tools/make_soak_data.py [out_dir] (default /tmp/sf1_soak)
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_soak"
COPIES = 10

# key columns to shift per table, with strides comfortably above the
# source key ranges (power-of-ten so shifted ids stay readable)
SHIFTS = {
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
    "events": {"event_id": 10**9, "user_id": 10**7},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "customer": {"c_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**9},
}
AS_IS = ["region", "nation", "part", "supplier"]


def soak(table: str) -> None:
    t = pq.read_table(f"{SRC}/{table}.parquet")
    parts = []
    for i in range(COPIES):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if i > 0 and name in SHIFTS[table]:
                col = pc.add(col, i * SHIFTS[table][name])
            elif i > 0 and table == "documents" and name == "text":
                # per-copy suffix: near-dups stay near-dups, exact
                # cross-copy dups disappear (see module doc)
                col = pc.binary_join_element_wise(
                    pc.cast(col, pa.string()), f" s{i}", "")
            elif i > 0 and table == "documents" and name == "n_chars":
                col = pc.add(col, len(f" s{i}"))
            parts_col = col
            cols[name] = parts_col
        parts.append(pa.table(cols, schema=None).cast(t.schema))
    out = pa.concat_tables(parts)
    # version 2.6 keeps timestamp[ns] (events) instead of coercing
    pq.write_table(out, f"{OUT}/{table}.parquet", version="2.6")
    print(f"{table}: {t.num_rows} -> {out.num_rows} rows")


def main() -> None:
    import os
    os.makedirs(OUT, exist_ok=True)
    for tbl in SHIFTS:
        soak(tbl)
    for tbl in AS_IS:
        shutil.copyfile(f"{SRC}/{tbl}.parquet", f"{OUT}/{tbl}.parquet")
        print(f"{tbl}: copied as-is")


if __name__ == "__main__":
    main()

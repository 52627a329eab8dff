#!/usr/bin/env python3
"""Build an Nx scale-soak dataset (driver-side tooling, like
selfcheck.py): key-shifted copies of sf0.1 so join fan-outs and
per-key group sizes keep their sf0.1 shape (pure duplication would
multiply intra-key density instead of scale). Copy 0 is byte-identical
to sf0.1; copies 1..N-1 shift every key column by i*stride and get a
tiny per-copy text suffix so the dedup workload keeps near-duplicate
structure instead of gaining N-way exact-dup cliques (a quadratic pair
blowup real sf-N data would not have).

Copies stream through a ParquetWriter one at a time — the 100x set
(60M-row lineitem) never materializes in memory.

The soak measures SCALING of the slowest queries (BENCH_SOAK.json),
not correctness — the oracle gate stays on the driver-generated sf0.01.

Usage: python3 tools/make_soak_data.py [out_dir] [copies]
       (defaults: /tmp/sf1_soak 10)
"""
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_soak"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10

# key columns to shift per table, with strides comfortably above the
# source key ranges times the copy count (power-of-ten for readability)
SHIFTS = {
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
    "events": {"event_id": 10**9, "user_id": 10**7},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "customer": {"c_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**9},
}
AS_IS = ["region", "nation", "part", "supplier"]


def _doc_suffixes(t: pa.Table, i: int) -> list:
    """Per-row suffix ' d<doc_id>c<i>' repeated ~tokens/4 times."""
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        reps = max(3, text.count(" ") // 4)
        out.append(f" d{doc_id}c{i}" * reps)
    return out


def _perturb(t: pa.Table, i: int) -> pa.Array:
    sufs = _doc_suffixes(t, i)
    texts = t.column("text").to_pylist()
    return pa.array([txt + s for txt, s in zip(texts, sufs)], pa.string())


def _suffix_len(t: pa.Table, i: int) -> pa.Array:
    return pa.array([len(s) for s in _doc_suffixes(t, i)], pa.int64())


def soak(table: str) -> None:
    t = pq.read_table(f"{SRC}/{table}.parquet")
    # version 2.6 keeps timestamp[ns] (events) instead of coercing
    writer = pq.ParquetWriter(f"{OUT}/{table}.parquet", t.schema,
                              version="2.6")
    for i in range(COPIES):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if i > 0 and name in SHIFTS[table]:
                col = pc.add(col, i * SHIFTS[table][name])
            elif i > 0 and table == "documents" and name == "text":
                # PER-DOCUMENT, length-proportional perturbation: append
                # the (copy, doc_id)-unique token repeated ~tokens/4
                # times. Cross-copy pairs of the same doc fall below the
                # near-dup thresholds (J ~ 0.7 < 0.8; fingerprints get a
                # ~20% token-weight pull in a doc-unique direction), and
                # docs WITHIN a copy share no suffix content, so the
                # generator manufactures neither cross-copy dup cliques
                # (a 3-char suffix did: C(N,2) pairs per doc) nor
                # intra-copy fingerprint families (a copy-wide shared
                # suffix did: it dominated short docs). Dup density per
                # doc stays at its sf0.1 level — growth means MORE
                # documents, not denser duplication.
                col = _perturb(t, i)
            elif i > 0 and table == "documents" and name == "n_chars":
                col = pc.add(pc.cast(col, pa.int64()),
                             _suffix_len(t, i))
            cols[name] = col
        writer.write_table(pa.table(cols, schema=None).cast(t.schema))
    writer.close()
    print(f"{table}: {t.num_rows} -> {t.num_rows * COPIES} rows")


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

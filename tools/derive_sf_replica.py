"""Derive a larger spot-check scale factor from an existing testdata dir
by deterministic key-shifted replication (VERDICT r17 item 6: the driver
generates /root/testdata and it is read-only, so a true sf1 cannot be
produced here — this derives an sf1-SIZED workload from sf0.1 whose
Spark-vs-DuckDB parity the ordinary selfcheck harness still checks
exactly, because both engines read the SAME derived parquet).

Replication scheme (pure pandas/pyarrow — no Spark, so it cannot
contaminate a timing window): each fact table is concatenated K times
with its PRIMARY id space shifted by k*(max_id+1); foreign keys that
must keep joining (o_orderkey <-> l_orderkey) shift together by the
parent's span; reference/dimension keys (custkey, partkey, suppkey,
nation, region, user_id) are left unshifted — a 10x corpus with the
same dimension tables, i.e. realistic growth. Text/value payloads are
byte-identical across replicas; dedup-family lanes therefore see 10-way
duplicate content, which is a workload-character change a reader must
keep in mind — fine for a parity + scaling spot check, NOT a substitute
for driver-generated data.

Usage: python tools/derive_sf_replica.py SRC_DIR DST_DIR [K]
"""

from __future__ import annotations

import os
import sys

import pandas as pd


# per-table: columns shifted by k * span(primary of that id space).
# id spaces: doc (documents.doc_id), vec (embeddings.vec_id),
# event (events.event_id), order (orders.o_orderkey).
_SHIFTS = {
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "event"},
    "orders": {"o_orderkey": "order"},
    "lineitem": {"l_orderkey": "order"},
}
_COPY_ONLY = ("customer", "supplier", "part", "nation", "region")


def derive(src: str, dst: str, k: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    spans = {
        "doc": int(pd.read_parquet(f"{src}/documents.parquet", columns=["doc_id"])["doc_id"].max()) + 1,
        "vec": int(pd.read_parquet(f"{src}/embeddings.parquet", columns=["vec_id"])["vec_id"].max()) + 1,
        "event": int(pd.read_parquet(f"{src}/events.parquet", columns=["event_id"])["event_id"].max()) + 1,
        "order": int(pd.read_parquet(f"{src}/orders.parquet", columns=["o_orderkey"])["o_orderkey"].max()) + 1,
    }
    for name in _COPY_ONLY:
        pd.read_parquet(f"{src}/{name}.parquet").to_parquet(
            f"{dst}/{name}.parquet", index=False
        )
    for name, shifts in _SHIFTS.items():
        base = pd.read_parquet(f"{src}/{name}.parquet")
        reps = []
        for i in range(k):
            r = base.copy()
            for col, space in shifts.items():
                r[col] = r[col] + i * spans[space]
            reps.append(r)
        pd.concat(reps, ignore_index=True).to_parquet(
            f"{dst}/{name}.parquet", index=False
        )
        print(f"{name}: {len(base)} -> {len(base) * k} rows", flush=True)


if __name__ == "__main__":
    derive(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)

"""Generate a larger scale factor by replicating the driver's sf0.1
parquet with consistent key offsets — the sf1/sf3 probe data the scale
benchmarks run against (BENCH_sf1.json, mv_refresh_sf1).

Replica r offsets every FACT key by r x a table-specific stride so PKs
stay unique and FK joins stay consistent within a replica:

- customer:  c_custkey   += r * C_STRIDE   (nationkey untouched — the
  25-row nation dim is shared across replicas, like TPC-H itself)
- orders:    o_orderkey  += r * O_STRIDE, o_custkey += r * C_STRIDE
- lineitem:  l_orderkey  += r * O_STRIDE, partkey/suppkey untouched
- part/supplier/nation/region: copied once (dims scale slower than
  facts in TPC-H; a 10x fact probe against fixed dims is the realistic
  shape — and the harder one for the dim-join routes, which see 10x
  the fan-in per dim key)
- events:    event_id += r * E_STRIDE, user_id += r * U_STRIDE
- documents: doc_id += r * D_STRIDE (text untouched — EXACT replicas,
  deliberately the heavy-duplication worst case for dedup/LSH probes)
- embeddings: id += r * D_STRIDE

Usage: python tools/make_sf.py <out_dir> [replicas=10] [src=/root/testdata/sf0.1]
Pure pyarrow — no Spark session, runs in ~20s for 10x.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

STRIDES = {
    "c_custkey": 1_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 1_000_000,
    "l_orderkey": 100_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 10_000_000,
    "id": 10_000_000,  # embeddings PK
}

REPLICATED = {
    "customer": ("c_custkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey",),
    "events": ("event_id", "user_id"),
    "documents": ("doc_id",),
    "embeddings": ("id",),
}

COPIED = ("region", "nation", "supplier", "part")


def replicate(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in COPIED:
        p = os.path.join(src, f"{t}.parquet")
        if os.path.exists(p):
            pq.write_table(pq.read_table(p), os.path.join(out, f"{t}.parquet"))
            print(f"{t}: copied")
    for t, keys in REPLICATED.items():
        p = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        base = pq.read_table(p)
        writer = pq.ParquetWriter(
            os.path.join(out, f"{t}.parquet"), base.schema
        )
        for r in range(replicas):
            if r == 0:
                writer.write_table(base)
                continue
            cols = []
            for name in base.schema.names:
                col = base.column(name)
                if name in keys:
                    col = pc.add(col, pa.scalar(r * STRIDES[name], type=col.type))
                cols.append(col)
            writer.write_table(pa.table(cols, schema=base.schema))
        writer.close()
        print(f"{t}: {base.num_rows} x {replicas} rows")


if __name__ == "__main__":
    out = sys.argv[1]
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    replicate(src, out, replicas)

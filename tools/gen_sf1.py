"""Generate a local sf1 stress fixture (VERDICT r5 #4).

The driver fixtures stop at sf0.1 (600k-row lineitem); every scale claim
above that was a design argument.  This builds a deterministic sf1
(~6M-row lineitem) by 10x key-shifted replication of the READ-ONLY
driver sf0.1 tables: replica r adds r*K to every primary/foreign key
(K = a power of 10 above the observed max, per key family), so

* all FK joins stay exactly satisfiable (each replica is a closed
  sub-universe: orders->customer, lineitem->orders/part/supplier,
  events.user_id, documents.doc_id, embeddings.vec_id);
* per-key group sizes (skew profile) are IDENTICAL to sf0.1 — the data
  gets 10x wider, not 10x hotter, which is what a bigger corpus looks
  like;
* value/date distributions are untouched, so selectivities match sf0.1
  and wall-clock ratios isolate SCALING, not plan changes.

region/nation are genuine dims and stay single-copy (replicated keys
would break the 25-nation domain).  Exact-duplicate text across
replicas is deliberate: dedup ops see a 90%-duplicate corpus at sf1,
a stress shape, not a correctness fixture.

Output: $SSKOS_SF1_DIR (default /root/repo/.scratch/sf1), pyarrow
parquet with the SOURCE SCHEMA PRESERVED byte-for-byte (load_table's
ns-timestamp repair etc. behaves identically).  Idempotent: skips
tables whose output already exists.

Usage: python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
#: 10x by default (sf1); $SSKOS_REPLICAS=100 builds the sf10 probe
#: fixture (VERDICT r6 #4) with identical key-family mechanics.
REPLICAS = int(os.environ.get("SSKOS_REPLICAS", "10"))

#: key column -> key family; every column in a family shifts by the SAME
#: offset so FK edges stay intact across tables.
KEY_FAMILIES: dict[str, str] = {
    "o_orderkey": "order",
    "l_orderkey": "order",
    "o_custkey": "cust",
    "c_custkey": "cust",
    "l_partkey": "part",
    "p_partkey": "part",
    "l_suppkey": "supp",
    "s_suppkey": "supp",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}

SINGLE_COPY = {"region", "nation"}
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def family_offsets() -> dict[str, int]:
    """One power-of-10 offset per key family, above the family's max."""
    maxes: dict[str, int] = {}
    for t in TABLES:
        if t in SINGLE_COPY:
            continue
        schema = pq.read_schema(f"{SRC}/{t}.parquet")
        keys = [c for c in schema.names if c in KEY_FAMILIES]
        if not keys:
            continue
        tbl = pq.read_table(f"{SRC}/{t}.parquet", columns=keys)
        for c in keys:
            fam = KEY_FAMILIES[c]
            m = pc.max(tbl[c]).as_py() or 0
            maxes[fam] = max(maxes.get(fam, 0), int(m))
    return {
        fam: 10 ** len(str(mx)) for fam, mx in maxes.items()
    }  # e.g. max 599999 -> offset 1_000_000


def main() -> int:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("SSKOS_SF1_DIR", "/root/repo/.scratch/sf1")
    )
    os.makedirs(out, exist_ok=True)
    offs = family_offsets()
    print(f"# family offsets: {offs}")
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst):
            print(f"# {t}: exists, skipped")
            continue
        src = pq.read_table(f"{SRC}/{t}.parquet")
        if t in SINGLE_COPY:
            pq.write_table(src, dst)
            print(f"# {t}: single copy ({src.num_rows} rows)")
            continue
        # Stream replicas as row groups (REPLICAS=100 would need ~5 GB
        # resident for lineitem if concatenated first).
        writer = pq.ParquetWriter(dst, src.schema)
        total = 0
        for r in range(REPLICAS):
            cols = []
            for name in src.schema.names:
                col = src[name]
                if name in KEY_FAMILIES and r > 0:
                    delta = r * offs[KEY_FAMILIES[name]]
                    col = pc.add(col, pa.scalar(delta, type=col.type))
                cols.append(col)
            part = pa.table(cols, schema=src.schema)
            writer.write_table(part)
            total += part.num_rows
        writer.close()
        print(f"# {t}: {src.num_rows} -> {total} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Generate the Zipf-keyed skew stress fixture (VERDICT r12 #5).

The TPC-H-ish driver fixtures are near-uniform per key, so the repo's
100 TB skew story (AQE skew-join splitting, salting, map-side combine
absorbing hot groups) rested on design argument plus `join_skew_salted`'s
own synthetic hot key.  This builds a deterministic sf1-sized variant
where the JOIN/AGG keys the headline shapes shuffle on follow a Zipf
law, so task-skew claims become executions (tools/stress_skew.py):

* ``orders.o_custkey``   ← Zipf(s=1.2) over the UNCHANGED customer key
  domain (FKs stay exactly satisfiable; the hottest customer holds
  ~7% of all orders at sf1).
* ``lineitem.l_orderkey``← Zipf(s=1.2) over the UNCHANGED orders key
  domain (the q3 orders⋈lineitem probe sees hot order groups).
* ``customer.c_mktsegment`` ← Zipf(s=1.5) over the 5 segments (the
  topk_per_group window sees one segment holding ~58% of customers).
* ``documents.text``     ← pooled: doc i takes the text of pool doc
  rank(i) with Zipf(s=1.2) ranks over the first 10k base texts, so
  `dedup_exact`'s content_hash groups are hot (top text ~37k dups) —
  the map-side-combine absorption claim under test.

All other columns ride along unchanged (selectivities and date ranges
match sf1), so wall/skew deltas vs BENCH_sf1 isolate KEY SKEW, not
plan changes.  Requires tools/gen_sf1.py output; idempotent.

Usage: python tools/gen_skew.py [sf1_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF1 = os.environ.get("SSKOS_SF1_DIR", "/root/repo/.scratch/sf1")
OUT = os.environ.get("SSKOS_SKEW_DIR", "/root/repo/.scratch/skew1")
ZIPF_S = 1.2
SEG_S = 1.5
DOC_POOL = 10_000


def zipf_ranks(rng: np.random.Generator, n_draws: int, n_ranks: int,
               s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n_ranks + 1, dtype=np.float64), s)
    return rng.choice(n_ranks, size=n_draws, p=w / w.sum())


def _replace(tbl: pa.Table, col: str, values: pa.Array) -> pa.Table:
    i = tbl.schema.get_field_index(col)
    return tbl.set_column(i, tbl.schema.field(i), values)


def main() -> int:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else SF1
    out = sys.argv[2] if len(sys.argv) > 2 else OUT
    if not os.path.exists(f"{sf1}/lineitem.parquet"):
        raise SystemExit(f"run tools/gen_sf1.py first ({sf1} missing)")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(1313)

    # customer: Zipf the mktsegment over its 5-value domain.
    if not os.path.exists(f"{out}/customer.parquet"):
        c = pq.read_table(f"{sf1}/customer.parquet")
        segs = sorted(pc.unique(c.column("c_mktsegment")).to_pylist())
        ranks = zipf_ranks(rng, c.num_rows, len(segs), SEG_S)
        seg_arr = pa.array(
            [segs[r] for r in ranks],
            type=c.schema.field("c_mktsegment").type,
        )
        pq.write_table(_replace(c, "c_mktsegment", seg_arr),
                       f"{out}/customer.parquet")

    # orders: Zipf o_custkey over the customer key domain.
    if not os.path.exists(f"{out}/orders.parquet"):
        c = pq.read_table(f"{sf1}/customer.parquet", columns=["c_custkey"])
        custkeys = np.sort(
            np.unique(np.asarray(c.column("c_custkey")))
        )
        o = pq.read_table(f"{sf1}/orders.parquet")
        ranks = zipf_ranks(rng, o.num_rows, len(custkeys), ZIPF_S)
        keys = pa.array(custkeys[ranks],
                        type=o.schema.field("o_custkey").type)
        pq.write_table(_replace(o, "o_custkey", keys),
                       f"{out}/orders.parquet")

    # lineitem: Zipf l_orderkey over the (UNCHANGED) orders key domain.
    if not os.path.exists(f"{out}/lineitem.parquet"):
        o = pq.read_table(f"{sf1}/orders.parquet", columns=["o_orderkey"])
        okeys = np.sort(np.unique(np.asarray(o.column("o_orderkey"))))
        li = pq.read_table(f"{sf1}/lineitem.parquet")
        ranks = zipf_ranks(rng, li.num_rows, len(okeys), ZIPF_S)
        keys = pa.array(okeys[ranks],
                        type=li.schema.field("l_orderkey").type)
        pq.write_table(_replace(li, "l_orderkey", keys),
                       f"{out}/lineitem.parquet")

    # documents: pool texts so content groups are Zipf-hot.
    if not os.path.exists(f"{out}/documents.parquet"):
        d = pq.read_table(f"{sf1}/documents.parquet")
        pool = d.column("text").to_pylist()[:DOC_POOL]
        ranks = zipf_ranks(rng, d.num_rows, len(pool), ZIPF_S)
        texts = pa.array((pool[r] for r in ranks),
                         type=d.schema.field("text").type)
        t = _replace(d, "text", texts)
        n_chars = pa.array(
            (len(pool[r]) for r in ranks),
            type=d.schema.field("n_chars").type,
        )
        pq.write_table(_replace(t, "n_chars", n_chars),
                       f"{out}/documents.parquet")
    print(f"skew fixture ready at {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""ANN recall at the second decade (VERDICT r9 #5): the IVF / PQ /
banded-SimHash recall gates and the bucket-occupancy balance are
measured on 2,000 fixture vectors; this probe re-asserts them at 10×.

Straight gen_sf1 replication copies vectors byte-for-byte, which makes
recall trivial (a query's replicas are exact cos-1.0 twins that any
quantizer co-locates).  This probe instead builds a PERTURBED 20k
fixture: replica r of vector v is normalize(v + 0.35·g) with g a
seeded N(0, 1/√dim) draw keyed on (r, vec_id) — deterministic,
cos(v, v′) ≈ 0.94, so each query's true top-3 are its nine perturbed
twins and the index must (a) route near-but-not-identical neighbors to
the right cells and (b) let the exact re-rank order nine cos≈0.94
candidates correctly.  That is the discrimination production ANN
actually performs on near-dup corpora.

Output: one JSON line + BENCH_ann20k.json sidecar; the table in
BASELINE.md is derived from it.

Usage: python tools/probe_ann_20k.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SSKOS_ANN20K_DIR", "/root/repo/.scratch/ann20k")
REPLICAS = 10
NOISE = 0.35
QUERY_MOD = 250  # 80 queries over 20k vectors


def build_fixture() -> None:
    if os.path.exists(f"{OUT}/embeddings.parquet"):
        return
    os.makedirs(OUT, exist_ok=True)
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    lab = t["label"].to_numpy()
    n, dim = X.shape
    key_shift = 10 ** int(np.ceil(np.log10(ids.max() + 1)))
    out_ids, out_X, out_lab = [], [], []
    for r in range(REPLICAS):
        if r == 0:
            Y = X
        else:
            g = np.random.RandomState(1_000_003 * r).normal(
                0.0, 1.0 / np.sqrt(dim), size=(n, dim)
            )
            Y = X + NOISE * g
            Y = Y / np.linalg.norm(Y, axis=1, keepdims=True)
        out_ids.append(ids + r * key_shift)
        out_X.append(Y)
        out_lab.append(lab)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in np.vstack(out_X)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(out_lab), pa.int32()),
        }
    )
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def main() -> int:
    build_fixture()
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_streaming_kafka_offset_spark import session as S
    import __spark_entry__ as entrymod

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sskos-ann-20k")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "8g")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
    S.ensure_configs(spark)
    queries = entrymod.queries()

    t = pq.read_table(f"{OUT}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    qmask = ids % QUERY_MOD == 0
    sims = X[qmask] @ X.T
    qids = ids[qmask]
    exact: dict[int, set[int]] = {}
    for i, qid in enumerate(qids):
        s = sims[i].copy()
        s[np.where(ids == qid)[0][0]] = -np.inf
        # brute-force truth uses the SAME floor+tie rule as the engines:
        # e5-floored cosine desc, neighbor_id asc
        key = np.lexsort((ids, -np.floor(s * 100000)))
        exact[int(qid)] = set(ids[key[:3]].tolist())

    out: dict[str, dict] = {}
    for name in ("sim_topk_ivf", "sim_topk_pq", "sim_topk_ann"):
        t0 = time.monotonic()
        got: dict[int, set[int]] = {}
        # QUERY_MOD-aligned queries: all three ops select vec_id % 25
        # == 0 internally; restrict the recall denominator to our 80
        # probe queries (a superset run costs the same scan).
        for r in queries[name](spark, OUT).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        wall = round(time.monotonic() - t0, 2)
        hits = tot = 0
        for qid, truth in exact.items():
            hits += len(truth & got.get(qid, set()))
            tot += 3
        out[name] = {
            "recall_at3": round(hits / tot, 4),
            "n_queries": len(exact),
            "wall_sec": wall,
        }
        print(f"# {name}: recall@3 {out[name]['recall_at3']} "
              f"({len(exact)} queries, {wall}s)", file=sys.stderr)

    # bucket occupancy balance at 20k (the SimHash load-balance check)
    rows = queries["embed_bucket_stats"](spark, OUT).collect()
    occ = [r["n_vecs"] for r in rows]
    out["embed_bucket_stats"] = {
        "n_buckets": len(occ),
        "max_over_mean": round(max(occ) / (sum(occ) / len(occ)), 2),
    }
    print(f"# embed_bucket_stats: {len(occ)} buckets, "
          f"max/mean {out['embed_bucket_stats']['max_over_mean']}",
          file=sys.stderr)

    payload = {
        "metric": "ann_recall_20k",
        "fixture": OUT,
        "n_vectors": int(len(ids)),
        "noise": NOISE,
        "queries": out,
    }
    print(json.dumps(payload))
    with open("BENCH_ann20k.json", "w") as f:
        json.dump(payload, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

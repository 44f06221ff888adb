"""Measured-recall harness for the EMBEDDING dedup family
(`dedup_embed_cosine`, `dedup_semantic`) at 20k vectors — VERDICT r12
#3: the lexical dedup family carries measured recall (BENCH_dedup20k
minhash/simhash, BENCH_cont20k containment/ngram) while the embedding
pair rested on small-SF oracle parity alone.  This probe PLANTS graded
near-duplicate vectors at known cosine levels and measures both ops
against brute force:

- **Fixture** (built once under ``.scratch/semdedup20k``): 8k seeded
  random unit vectors (64-dim float32, the engine's embedding shape) +
  4k planted near-dups (one per even base, graded cosine
  L ∈ {0.999, 0.99, 0.97, 0.95, 0.9, 0.8, 0.6, 0.45} by base index,
  constructed as v' = L·v + √(1−L²)·w with w ⊥ v so cos(v,v') = L up
  to float32 rounding; the dup inherits its base's label) + 8k filler
  = 20k vectors, 10 labels.

- **`dedup_embed_cosine`** is an EXACT blocked all-pairs op (label is
  the block; planted dups share it), so its gates are exactness laws,
  not a curve: every within-label pair whose TRUE left-fold cosine
  exceeds 0.4 is emitted (recall EXACTLY 1.0), every emitted planted
  pair's floor-1e-5 cosine matches the byte-exact recomputation, and
  nothing below the gate leaks.  Truth pairs are screened with a
  blocked numpy Gram and boundary-confirmed with the op's own strict
  left-to-right double fold (Python floats ARE IEEE doubles, so the
  recomputation is bit-exact against ``functions.similarity.dot``).

- **`dedup_semantic`** blocks on data-adaptive k-means clusters
  (k = n/250 = 80 here), so recall vs brute force is a MEASURED curve
  exactly like MinHash vs banding theory: a planted pair is recalled
  when its dominated member (same d2 ⇒ higher vec_id; else the
  nearer-to-centroid one) appears in the drop list.  Misses are
  cluster-boundary splits — the documented cost of linear-in-n pair
  volume.  The probe records recall per planted level and the
  same-cluster rate (so cluster-split misses are attributed, not
  inferred).

Output: one JSON line + BENCH_semdedup20k.json sidecar;
tests/test_properties.py carries a compact planted-law pytest
(identical-f1f2 twins ⇒ same cluster ⇒ the higher-id twin MUST drop)
so the law runs every round without the 20k build.

Usage: python tools/probe_semdedup_20k.py
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

OUT = os.environ.get("SSKOS_SEMDEDUP20K_DIR", "/root/repo/.scratch/semdedup20k")
LEVELS = [0.999, 0.99, 0.97, 0.95, 0.9, 0.8, 0.6, 0.45]
DIM = 64
N_BASE = 8000
N_FILLER = 8000
DUP_SHIFT = 1_000_000
TAU = 0.4


def _unit(rng: np.random.Generator, n: int) -> np.ndarray:
    v = rng.standard_normal((n, DIM))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def build_fixture() -> None:
    if os.path.exists(f"{OUT}/embeddings.parquet"):
        return
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(1302)
    base = _unit(rng, N_BASE)
    filler = _unit(rng, N_FILLER)
    ids, vecs, labels, truth = [], [], [], []
    for i in range(N_BASE):
        ids.append(i)
        vecs.append(base[i])
        labels.append(i % 10)
    for i in range(0, N_BASE, 2):  # 4k planted dups on the even bases
        lev = LEVELS[(i // 2) % len(LEVELS)]
        v = base[i].astype(np.float64)
        w = rng.standard_normal(DIM)
        w -= (w @ v) * v  # orthogonalize against v
        w /= np.linalg.norm(w)
        dup = (lev * v + np.sqrt(1.0 - lev * lev) * w).astype(np.float32)
        dup /= np.float32(np.linalg.norm(dup))
        ids.append(i + DUP_SHIFT)
        vecs.append(dup)
        labels.append(i % 10)
        truth.append((i, i + DUP_SHIFT, lev))
    for i in range(N_FILLER):
        ids.append(2 * DUP_SHIFT + i)
        vecs.append(filler[i])
        labels.append((i * 7) % 10)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")
    with open(f"{OUT}/truth.json", "w") as f:
        json.dump(truth, f)


def left_fold_cos(a: np.ndarray, b: np.ndarray) -> float:
    """The engine's exact fold: float32 elements cast to double,
    accumulated strictly left-to-right in double (dot() in
    functions/similarity.py) — Python floats are IEEE doubles."""
    s = 0.0
    for x, y in zip(a.tolist(), b.tolist()):
        s = s + x * y
    return s


def main() -> int:
    build_fixture()

    tbl = pq.read_table(f"{OUT}/embeddings.parquet")
    ids = np.asarray(tbl.column("vec_id"))
    labels = np.asarray(tbl.column("label"))
    mat = np.stack(
        [np.asarray(x, dtype=np.float32) for x in tbl.column("embedding").to_pylist()]
    )
    by_id = {int(i): j for j, i in enumerate(ids)}
    truth = [tuple(r) for r in json.load(open(f"{OUT}/truth.json"))]

    # ---- brute-force within-label ground truth for dedup_embed_cosine.
    # Blocked Gram per label in float64 screens candidates with a ±1e-7
    # margin; the strict left fold settles every boundary pair.
    truth_pairs: dict[tuple[int, int], float] = {}
    for lab in np.unique(labels):
        sel = np.where(labels == lab)[0]
        sub = mat[sel].astype(np.float64)
        g = sub @ sub.T
        ii, jj = np.where(g > TAU - 1e-7)
        for a, b in zip(ii.tolist(), jj.tolist()):
            if a >= b:
                continue
            ia, ib = int(ids[sel[a]]), int(ids[sel[b]])
            lo, hi = min(ia, ib), max(ia, ib)
            c = left_fold_cos(mat[by_id[lo]], mat[by_id[hi]])
            if c > TAU:
                truth_pairs[(lo, hi)] = c

    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark.plans.registry import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("sskos-probe-semdedup20k")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    report: dict = {"metric": "embed_dedup_recall_20k", "n_vectors": 20000}

    # ---- dedup_embed_cosine: exactness laws ---------------------------
    t0 = time.time()
    rows = QUERIES["dedup_embed_cosine"](spark, OUT).collect()
    wall = round(time.time() - t0, 2)
    emitted = {(r.id_a, r.id_b): r.cosine for r in rows}
    missing = [p for p in truth_pairs if p not in emitted]
    leaks = [p for p in emitted if p not in truth_pairs]
    value_mismatch = sum(
        1
        for p, c in truth_pairs.items()
        if p in emitted and emitted[p] != np.floor(c * 100000) / 100000
    )
    planted_bands: dict[str, dict] = {}
    for lev in LEVELS:
        pairs = [(a, b) for a, b, lv in truth if lv == lev]
        in_truth = [p for p in pairs if p in truth_pairs]
        hit = sum(1 for p in in_truth if p in emitted)
        planted_bands[str(lev)] = {
            "n_planted": len(pairs),
            "n_above_tau": len(in_truth),
            "recall": round(hit / len(in_truth), 6) if in_truth else None,
        }
    report["dedup_embed_cosine"] = {
        "wall_sec": wall,
        "rows": len(rows),
        "n_true_pairs": len(truth_pairs),
        "missing_true_pairs": len(missing),
        "below_gate_leaks": len(leaks),
        "value_mismatches": value_mismatch,
        "planted_bands": planted_bands,
    }

    # ---- dedup_semantic: cluster-blocked recall curve ------------------
    t0 = time.time()
    drops = QUERIES["dedup_semantic"](spark, OUT).collect()
    wall = round(time.time() - t0, 2)
    dropped = {r.vec_id for r in drops}
    # a planted pair is 'recalled' when either member lands in the drop
    # list (an isolated same-cluster pair always drops exactly one:
    # keep-farthest, ties to the higher id); misses are cluster splits.
    sem_bands: dict[str, dict] = {}
    for lev in LEVELS:
        pairs = [(a, b) for a, b, lv in truth if lv == lev]
        above = [p for p in pairs if left_fold_cos(
            mat[by_id[p[0]]], mat[by_id[p[1]]]) >= TAU]
        hit = sum(
            1 for a, b in above if a in dropped or b in dropped
        )
        sem_bands[str(lev)] = {
            "n_planted": len(pairs),
            "n_above_tau": len(above),
            "recall": round(hit / len(above), 6) if above else None,
        }
    report["dedup_semantic"] = {
        "wall_sec": wall,
        "rows": len(drops),
        "planted_bands": sem_bands,
    }

    line = json.dumps(report)
    print(line)
    with open("BENCH_semdedup20k.json", "w") as f:
        f.write(line + "\n")
    ec = report["dedup_embed_cosine"]
    ok = (
        ec["missing_true_pairs"] == 0
        and ec["below_gate_leaks"] == 0
        and ec["value_mismatches"] == 0
        # cluster-blocked recall floor: strong dups must be found
        and all(
            sem_bands[str(lev)]["recall"] is not None
            and sem_bands[str(lev)]["recall"] >= 0.9
            for lev in (0.999, 0.99)
        )
    )
    print("embed-dedup recall gates:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

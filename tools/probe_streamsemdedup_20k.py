"""Measured-recall probe for the STREAMING semantic admission
(`stream_dedup_embed`) on a 20k planted-band vector fixture — the
embedding twin of tools/probe_streamdedup.py, completing the "every
dedup family carries MEASURED recall" contract for the streaming side.

The committed planted-law pytest builds twins with IDENTICAL leading
coordinates, so it proves the predicate but is structurally blind to
the one approximation the op actually makes: CELL-BOUNDARY CROSSING.
A real near-duplicate's perturbation is isotropic — at cosine c the
blocking coordinates move by ~sqrt(1-c^2)/sqrt(dim), and whenever that
nudge crosses a floor(coord*50) boundary a single-cell equi-join never
meets the reference.  This probe therefore plants twins with RANDOM
orthogonal perturbations at controlled cosine bands and measures the
op end-to-end (emit="records", one staged chunk per trigger) against
the brute-force float64 truth:

- **Drop recall per band** — fraction of true tau-duplicates (brute
  force max-cosine >= 0.40 vs the reference ledger) the stream
  actually rejected, attributed to the planted cosine band.
- **Admit recall** — every truly-fresh vector admitted exactly once.
- **Replay recall** — every replayed reference record self-matched.

Fixture (seeded, dim 64, ~20k rows): 4,000 reference vectors
(vec_id % 3 == 0) random-unit in the first-32-coordinate block;
1,500 twins per cosine band {0.999, 0.99, 0.97, 0.95, 0.9, 0.8, 0.6,
0.45} built as c*r + sqrt(1-c^2)*u with u a RANDOM unit orthogonal to
r (no coordinate alignment — the honest geometry); 4,000 fresh
vectors in the disjoint last-32-coordinate block (cosine 0 to every
reference, all landing in the (0,0) cell to exercise blocking-vs-
predicate separation).  Truth is numpy float64 with the op's own
floor-1e-5 rule; bands sit >=0.05 from tau so fold-order ulp wobble
cannot flip a classification.

Output: one JSON line + BENCH_streamsemdedup20k.json sidecar.

Usage: python tools/probe_streamsemdedup_20k.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

BANDS = [0.999, 0.99, 0.97, 0.95, 0.9, 0.8, 0.6, 0.45]
N_REF = 4000
N_PER_BAND = 1500
N_FRESH = 4000
DIM = 64
TAU_E5 = 40000


def build_fixture(rng, out_dir: str):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    ref = np.zeros((N_REF, DIM), dtype=np.float64)
    block = rng.standard_normal((N_REF, 32))
    ref[:, :32] = block / np.linalg.norm(block, axis=1, keepdims=True)

    rows_vec = [ref]
    band_of: list[float] = [0.0] * N_REF  # 0.0 = reference row
    for c in BANDS:
        base_idx = rng.integers(0, N_REF, N_PER_BAND)
        base = ref[base_idx]
        u = rng.standard_normal((N_PER_BAND, DIM))
        u -= (np.sum(u * base, axis=1, keepdims=True)) * base
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        rows_vec.append(c * base + math.sqrt(1.0 - c * c) * u)
        band_of.extend([c] * N_PER_BAND)
    fresh = np.zeros((N_FRESH, DIM), dtype=np.float64)
    fblock = rng.standard_normal((N_FRESH, 32))
    fresh[:, 32:] = fblock / np.linalg.norm(fblock, axis=1, keepdims=True)
    rows_vec.append(fresh)
    band_of.extend([-1.0] * N_FRESH)  # -1 = planted fresh

    vecs = np.concatenate(rows_vec).astype(np.float32)
    n = len(vecs)
    # vec_id: references get id = 3*i (i < N_REF); everything else gets
    # ids that are != 0 mod 3 (the op's ingested-ledger rule).
    ids = np.empty(n, dtype=np.int64)
    ids[:N_REF] = 3 * np.arange(N_REF)
    k = np.arange(n - N_REF)
    ids[N_REF:] = 3 * (k // 2) + 1 + (k % 2)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(
                [int(b * 1000) if b > 0 else (0 if b == 0.0 else -1) for b in band_of],
                pa.int32(),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    return ids, vecs, band_of


POSTURES = [(50, 0), (50, 1), (25, 1), (25, 2)]


def main() -> int:
    import numpy as np

    from spark_streaming_kafka_offset_spark import session as S
    from spark_streaming_kafka_offset_spark.streaming.core import (
        _SDE_CELL_SCALE,
        _SDE_REGISTER_RADIUS,
        stream_dedup_embed,
    )

    rng = np.random.default_rng(14)
    out_dir = tempfile.mkdtemp(prefix="sskos_streamsem20k_")
    ids, vecs, band_of = build_fixture(rng, out_dir)

    # float64 brute-force truth with the op's floor-1e-5 >= tau rule
    ref_mask = ids % 3 == 0
    ref64 = vecs[ref_mask].astype(np.float64)
    cos = vecs.astype(np.float64) @ ref64.T
    max_e5 = np.floor(cos.max(axis=1) * 100000).astype(np.int64)
    is_dup = max_e5 >= TAU_E5
    dup_ids = set(ids[is_dup].tolist())
    fresh_ids = set(ids[~is_dup].tolist())

    # per-posture candidate volume (how many (probe, registered-ref)
    # equi-cell meetings the anti-join evaluates) — numpy re-derivation
    # of the op's floor grid, the cost axis of the recall trade-off
    def candidate_pairs(scale: int, radius: int) -> int:
        pc = np.floor(vecs[:, :2].astype(np.float64) * scale).astype(np.int64)
        rc = np.floor(ref64[:, :2] * scale).astype(np.int64)
        from collections import Counter

        occ: Counter = Counter()
        for x, y in rc:
            for dx in range(-radius, radius + 1):
                for dy in range(-radius, radius + 1):
                    occ[(x + dx, y + dy)] += 1
        return int(sum(occ.get((x, y), 0) for x, y in pc))

    spark = S.get_spark("sskos-probe-streamsem20k")
    report: dict = {
        "n_rows": len(ids),
        "n_true_dups": len(dup_ids),
        "n_true_fresh": len(fresh_ids),
        "shipped_default": f"scale={_SDE_CELL_SCALE},radius={_SDE_REGISTER_RADIUS}",
        "postures": {},
    }
    for scale, radius in POSTURES:
        t0 = time.monotonic()
        admitted = [
            r.vec_id
            for r in stream_dedup_embed(
                spark,
                out_dir,
                emit="records",
                max_files_per_trigger=1,
                cell_scale=scale,
                register_radius=radius,
            ).collect()
        ]
        wall = round(time.monotonic() - t0, 2)
        admitted_set = set(admitted)
        leaked = admitted_set & dup_ids
        entry = {
            "wall_sec": wall,
            "admitted": len(admitted),
            "double_admitted": len(admitted) - len(admitted_set),
            "dups_leaked": len(leaked),
            "fresh_missing": len(fresh_ids - admitted_set),
            "drop_recall": round(1.0 - len(leaked) / max(1, len(dup_ids)), 6),
            "admit_recall": round(
                (len(fresh_ids) - len(fresh_ids - admitted_set))
                / max(1, len(fresh_ids)),
                6,
            ),
            "candidate_pairs": candidate_pairs(scale, radius),
        }
        per_band = {}
        for band in [0.0] + BANDS:
            b_ids = {
                i
                for i, b, d in zip(ids.tolist(), band_of, is_dup.tolist())
                if b == band and d
            }
            if not b_ids:
                continue
            b_leak = len(b_ids & admitted_set)
            per_band["replay" if band == 0.0 else f"{band}"] = {
                "planted_true_dups": len(b_ids),
                "leaked": b_leak,
                "recall": round(1.0 - b_leak / len(b_ids), 6),
            }
        entry["per_band"] = per_band
        report["postures"][f"scale={scale},radius={radius}"] = entry
    payload = {
        "metric": "streamsemdedup20k_recall",
        "unit": "sec",
        "report": report,
    }
    print(json.dumps(payload))
    with open("BENCH_streamsemdedup20k.json", "w") as f:
        json.dump(payload, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

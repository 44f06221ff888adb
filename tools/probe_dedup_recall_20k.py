"""Dedup-family recall at 20k docs (VERDICT r10 #7): planted near-dups
at graded Jaccard levels give `dedup_minhash` (16-perm / 4-band LSH +
exact verify) a MEASURED recall curve against the banding theory
p(J) = 1 − (1 − J⁴)⁴, and `dedup_simhash` an exact-equality check of
its pigeonhole guarantee (every pair at signature hamming ≤ 3 shares a
16-bit band) — the gates the two ops must keep holding while their
pair posture (the r11 exact-collapse + multiplicity form) changes.

Fixture (deterministic, built once under .scratch/dedup20k): 20k docs =
5k sf0.1 base docs + 5k graded variants + 10k unique-token filler.
Variant of base doc d targets Jaccard level L(d) ∈ {1.0, .9, .8, .7,
.6, .5, .4} by doc_id % 7: replacing m evenly-spaced tokens (stride ≥ 3)
with unique sentinels kills ≤3m shingles and adds ≤3m new ones, so
m ≈ s(1−L)/(3(1+L)) lands near the target; the probe uses each pair's
TRUE shingle-set Jaccard (recomputed in Python) for banding and for the
expected-recall integral, so construction error cannot bias the gate.

Recall is measured over planted pairs with true J ≥ 0.5 (the op's
verify gate), expanded through the r11 multiplicity algebra (a J=1.0
variant is an exact-dup group self row).  Precision side: no emitted
planted pair may carry true J < 0.5, and every emitted jaccard must
equal the Python truth to the e4 floor.

Output: one JSON line + BENCH_dedup20k.json sidecar; the BASELINE.md
table is derived from it.  tests/test_ranking.py carries a compact
sf0.001-sized pytest of the same laws so the gate runs every round.

Usage: python tools/probe_dedup_recall_20k.py
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
OUT = os.environ.get("SSKOS_DEDUP20K_DIR", "/root/repo/.scratch/dedup20k")
LEVELS = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4]
VAR_SHIFT = 1_000_000
FILL_SHIFT = 2_000_000


def _shingles(tokens: list[str]) -> set[str]:
    return {
        " ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)
    }


def make_variant(tokens: list[str], level: float, seed: int) -> list[str]:
    """Replace m evenly spaced tokens (stride >= 3) with unique
    sentinels so the shingle-set Jaccard lands near `level`."""
    n = len(tokens)
    s = max(n - 2, 1)
    if level >= 1.0:
        return list(tokens)
    m = max(1, round(s * (1.0 - level) / (3.0 * (1.0 + level))))
    m = min(m, n // 3)
    out = list(tokens)
    stride = max(3, n // max(m, 1))
    pos = [(i * stride) % n for i in range(m)]
    # dedupe positions while preserving spacing
    seen, final = set(), []
    for p in pos:
        while p in seen:
            p = (p + 3) % n
        seen.add(p)
        final.append(p)
    for j, p in enumerate(final):
        out[p] = f"zq{seed}x{j}"
    return out


def build_fixture() -> None:
    if os.path.exists(f"{OUT}/documents.parquet"):
        return
    os.makedirs(OUT, exist_ok=True)
    t = pq.read_table(f"{SRC}/documents.parquet")
    rows = t.to_pylist()
    out = []
    truth = []  # (base_id, var_id, level, true_jaccard)
    for r in rows:
        out.append(r)
        toks = r["text"].split(" ")
        if len(toks) < 6:
            continue
        level = LEVELS[r["doc_id"] % len(LEVELS)]
        vtoks = make_variant(toks, level, r["doc_id"])
        vtext = " ".join(vtoks)
        vid = r["doc_id"] + VAR_SHIFT
        out.append(
            {
                **r,
                "doc_id": vid,
                "text": vtext,
                "n_chars": len(vtext),
            }
        )
        a, b = _shingles(toks), _shingles(vtoks)
        tj = len(a & b) / len(a | b) if (a | b) else 0.0
        truth.append((r["doc_id"], vid, level, tj))
        # two unique-token filler docs per base doc -> 20k total
        for k in (0, 1):
            fid = r["doc_id"] + FILL_SHIFT * (k + 1)
            ftext = " ".join(
                f"f{r['doc_id']}k{k}w{i}" for i in range(len(toks))
            )
            out.append(
                {
                    **r,
                    "doc_id": fid,
                    "text": ftext,
                    "n_chars": len(ftext),
                }
            )
    pq.write_table(pa.Table.from_pylist(out, schema=t.schema),
                   f"{OUT}/documents.parquet")
    with open(f"{OUT}/truth.json", "w") as f:
        json.dump(truth, f)


def popcount64(x: np.ndarray) -> np.ndarray:
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(x)
    v = x.copy()
    out = np.zeros(v.shape, dtype=np.int64)
    for _ in range(4):
        out += np.array(
            [bin(int(b)).count("1") for b in range(1 << 16)], dtype=np.int64
        )[(v & np.uint64(0xFFFF)).astype(np.int64)]
        v >>= np.uint64(16)
    return out


def main() -> int:
    build_fixture()
    truth = [tuple(r) for r in json.load(open(f"{OUT}/truth.json"))]

    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark.plans.registry import QUERIES
    from spark_streaming_kafka_offset_spark.session import load_table

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("sskos-probe-dedup20k")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    report: dict = {"metric": "dedup_recall_20k", "n_docs": 20000}

    # ---- MinHash LSH recall vs banding theory --------------------------
    t0 = time.time()
    rows = QUERIES["dedup_minhash"](spark, OUT).collect()
    mh_wall = round(time.time() - t0, 2)
    # expand r11 multiplicity rows through exact-text groups: with this
    # fixture's construction the only exact groups are (base, J=1.0
    # variant) twins, whose self rows carry the pair directly.
    d = load_table(spark, OUT, "documents")
    from pyspark.sql import functions as F

    groups = {
        r.rep: sorted(r.ids)
        for r in d.groupBy(F.md5("text").alias("th"))
        .agg(
            F.min("doc_id").alias("rep"),
            F.collect_list("doc_id").alias("ids"),
        )
        .where(F.size("ids") >= 2)
        .collect()
    }
    emitted: dict[tuple[int, int], float] = {}
    for r in rows:
        if r.id_a == r.id_b:
            ids = groups[r.id_a]
            for i, x in enumerate(ids):
                for y in ids[i + 1 :]:
                    emitted[(x, y)] = r.jaccard
        else:
            emitted[(r.id_a, r.id_b)] = r.jaccard

    bands: dict[float, dict[str, float]] = {}
    for lev in LEVELS:
        pairs = [p for p in truth if p[2] == lev]
        eligible = [p for p in pairs if p[3] >= 0.5]
        hit = sum(1 for p in eligible if (p[0], p[1]) in emitted)
        exp = (
            sum(1 - (1 - p[3] ** 4) ** 4 for p in eligible) / len(eligible)
            if eligible
            else None
        )
        below = [p for p in pairs if p[3] < 0.5]
        leaked = sum(1 for p in below if (p[0], p[1]) in emitted)
        bands[lev] = {
            "n_planted": len(pairs),
            "n_eligible": len(eligible),
            "recall": round(hit / len(eligible), 4) if eligible else None,
            "expected_banding": round(exp, 4) if exp is not None else None,
            "below_gate_leaks": leaked,
            "mean_true_j": round(
                sum(p[3] for p in pairs) / len(pairs), 4
            ),
        }
    # value-precision: every emitted planted jaccard equals the truth
    j_mismatch = 0
    for base, vid, _lev, tj in truth:
        got = emitted.get((base, vid))
        if got is not None and abs(got - np.floor(tj * 10000) / 10000) > 1e-9:
            j_mismatch += 1
    report["dedup_minhash"] = {
        "wall_sec": mh_wall,
        "rows": len(rows),
        "bands": {str(k): v for k, v in bands.items()},
        "jaccard_value_mismatches": j_mismatch,
    }

    # ---- SimHash pigeonhole guarantee: output == brute force ----------
    t0 = time.time()
    sh = QUERIES["dedup_simhash"](spark, OUT).collect()
    sh_wall = round(time.time() - t0, 2)
    from spark_streaming_kafka_offset_spark.functions.text import (
        simhash_signatures,
    )

    sig_rows = simhash_signatures(d).collect()
    ids = np.array([r.doc_id for r in sig_rows], dtype=np.int64)
    sigs = np.array([r.sig for r in sig_rows], dtype=np.int64).astype(
        np.uint64
    )
    order = np.argsort(ids)
    ids, sigs = ids[order], sigs[order]
    want = set()
    blk = 2000
    for i0 in range(0, len(ids), blk):
        x = np.bitwise_xor.outer(sigs[i0 : i0 + blk], sigs)
        pc = popcount64(x)
        ii, jj = np.where(pc <= 3)
        for a, b in zip(ii, jj):
            ga, gb = ids[i0 + a], ids[b]
            if ga < gb:
                want.add((int(ga), int(gb)))
    got = {(r.id_a, r.id_b) for r in sh}
    report["dedup_simhash"] = {
        "wall_sec": sh_wall,
        "n_pairs": len(got),
        "n_bruteforce": len(want),
        "missing": len(want - got),
        "extra": len(got - want),
        "recall": round(1 - len(want - got) / len(want), 6)
        if want
        else None,
    }

    with open("BENCH_dedup20k.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

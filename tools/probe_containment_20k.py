"""Exact-recall measurement for the set-similarity dedup pair
(`dedup_containment`, `dedup_ngram_jaccard`) at 20k docs — VERDICT r11
#4: both ops CLAIM exact recall by the prefix-filter pigeonhole
(containment: the ``⌊|A|/5⌋+1`` rarest shingles; Jaccard: the
``⌊|A|/2⌋+1`` rarest in the same length bucket).  BENCH_dedup20k
already measures MinHash recall against banding theory and SimHash
against brute force; this probe closes the family by PLANTING graded
ground truth at 20k docs and asserting the pigeonhole claims hold as
measurements, not arguments:

- `dedup_ngram_jaccard` runs on the SAME dedup20k fixture (the graded
  J ∈ {1.0 … 0.4} variants replace tokens in place, so every planted
  pair shares its length bucket by construction).  Gate: every planted
  pair whose TRUE integer test passes (2·|A∩B| ≥ |A∪B|) is emitted —
  recall EXACTLY 1.0, no banding curve — with byte-exact n_inter /
  n_union; no sub-threshold planted pair leaks.

- `dedup_containment` runs on a NEW cont20k fixture: 5k sf0.1 base
  docs + 5k BOILERPLATE-WRAPPED copies (15 shared template tokens on
  each side of an embedded copy with m graded in-place replacements →
  containment C(base→wrapper) ∈ {1.0, .95, .9, .85, .8, .75, .7} by
  doc_id % 7) + 10k unique-token filler.  The wrapper construction is
  the operator's own motivating case (low Jaccard, high containment),
  and the shared boilerplate makes its shingles CORPUS-HOT — the probe
  therefore also measures that hot template shingles stay out of the
  df-ranked prefix.  Gate: every planted ordered pair with TRUE
  5·n_inter ≥ 4·n_a is emitted with exact (n_inter, n_a); none below.

Output: one JSON line + BENCH_cont20k.json sidecar; tests/test_text.py
carries a compact planted-construction pytest of the same laws so the
gate runs every round.

Usage: python tools/probe_containment_20k.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
OUT_J = os.environ.get("SSKOS_DEDUP20K_DIR", "/root/repo/.scratch/dedup20k")
OUT_C = os.environ.get("SSKOS_CONT20K_DIR", "/root/repo/.scratch/cont20k")
C_LEVELS = [1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7]
VAR_SHIFT = 1_000_000
FILL_SHIFT = 2_000_000
BOILER_PRE = [f"tplhdr{i}" for i in range(15)]
BOILER_SUF = [f"tplftr{i}" for i in range(15)]


def shingles(tokens: list[str]) -> set[str]:
    return {" ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)}


def graded_embed(tokens: list[str], level: float, seed: int) -> list[str]:
    """In-place replacements grading C(base -> wrapper): each replaced
    token kills <= 3 of base's shingles, so m ~ s(1-level)/3."""
    n = len(tokens)
    s = max(n - 2, 1)
    out = list(tokens)
    if level >= 1.0:
        return out
    m = max(1, round(s * (1.0 - level) / 3.0))
    m = min(m, n // 3)
    stride = max(3, n // max(m, 1))
    seen: set[int] = set()
    for j in range(m):
        p = (j * stride) % n
        while p in seen:
            p = (p + 3) % n
        seen.add(p)
        out[p] = f"cq{seed}x{j}"
    return out


def build_cont_fixture() -> None:
    if os.path.exists(f"{OUT_C}/documents.parquet"):
        return
    os.makedirs(OUT_C, exist_ok=True)
    t = pq.read_table(f"{SRC}/documents.parquet")
    rows = t.to_pylist()
    out, truth = [], []  # truth: (id_a, id_b, level, n_inter, n_a)
    for r in rows:
        out.append(r)
        toks = r["text"].split(" ")
        if len(toks) < 6:
            continue
        level = C_LEVELS[r["doc_id"] % len(C_LEVELS)]
        wrapped = (
            BOILER_PRE
            + graded_embed(toks, level, r["doc_id"])
            + BOILER_SUF
        )
        wtext = " ".join(wrapped)
        wid = r["doc_id"] + VAR_SHIFT
        out.append(
            {**r, "doc_id": wid, "text": wtext, "n_chars": len(wtext)}
        )
        sh_a, sh_b = shingles(toks), shingles(wrapped)
        truth.append(
            (r["doc_id"], wid, level, len(sh_a & sh_b), len(sh_a))
        )
        # reverse direction: wrapper contained in base (boilerplate
        # shingles miss) — recorded so sub-threshold leaks are checked
        # both ways
        truth.append(
            (wid, r["doc_id"], -level, len(sh_a & sh_b), len(sh_b))
        )
        for k in (0, 1):
            fid = r["doc_id"] + FILL_SHIFT * (k + 1)
            ftext = " ".join(
                f"c{r['doc_id']}k{k}w{i}" for i in range(len(toks))
            )
            out.append(
                {**r, "doc_id": fid, "text": ftext, "n_chars": len(ftext)}
            )
    pq.write_table(
        pa.Table.from_pylist(out, schema=t.schema),
        f"{OUT_C}/documents.parquet",
    )
    with open(f"{OUT_C}/truth.json", "w") as f:
        json.dump(truth, f)


def main() -> int:
    # the Jaccard leg reuses the dedup20k fixture + its builder
    from tools.probe_dedup_recall_20k import LEVELS as J_LEVELS
    from tools.probe_dedup_recall_20k import build_fixture as build_j

    build_j()
    build_cont_fixture()

    from pyspark.sql import SparkSession

    from spark_streaming_kafka_offset_spark.plans.registry import QUERIES

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count()}]")
        .appName("sskos-probe-cont20k")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    report: dict = {"metric": "setsim_exact_recall_20k", "n_docs": 20000}

    # ---- dedup_ngram_jaccard: recall must be EXACTLY 1.0 --------------
    jt = pq.read_table(f"{OUT_J}/documents.parquet").to_pylist()
    text_by_id = {r["doc_id"]: r["text"] for r in jt}
    j_truth = [tuple(r) for r in json.load(open(f"{OUT_J}/truth.json"))]
    t0 = time.time()
    rows = QUERIES["dedup_ngram_jaccard"](spark, OUT_J).collect()
    j_wall = round(time.time() - t0, 2)
    emitted = {(r.id_a, r.id_b): (r.n_inter, r.n_union) for r in rows}
    bands: dict[str, dict] = {}
    miss_pairs, value_mismatch, leaks = [], 0, 0
    for lev in J_LEVELS:
        pairs = [p for p in j_truth if p[2] == lev]
        eligible, below = [], []
        for base, vid, _lev, _tj in pairs:
            a = shingles(text_by_id[base].split(" "))
            b = shingles(text_by_id[vid].split(" "))
            ni, nu = len(a & b), len(a | b)
            (eligible if 2 * ni >= nu else below).append(
                (base, vid, ni, nu)
            )
        hit = 0
        for base, vid, ni, nu in eligible:
            got = emitted.get((min(base, vid), max(base, vid)))
            if got is None:
                miss_pairs.append((base, vid))
                continue
            hit += 1
            if got != (ni, nu):
                value_mismatch += 1
        leaks += sum(
            1
            for base, vid, _ni, _nu in below
            if (min(base, vid), max(base, vid)) in emitted
        )
        bands[str(lev)] = {
            "n_planted": len(pairs),
            "n_eligible": len(eligible),
            "recall": round(hit / len(eligible), 6) if eligible else None,
        }
    report["dedup_ngram_jaccard"] = {
        "wall_sec": j_wall,
        "rows": len(rows),
        "bands": bands,
        "missing_eligible": len(miss_pairs),
        "value_mismatches": value_mismatch,
        "below_gate_leaks": leaks,
    }

    # ---- dedup_containment: recall must be EXACTLY 1.0 -----------------
    c_truth = [tuple(r) for r in json.load(open(f"{OUT_C}/truth.json"))]
    t0 = time.time()
    crows = QUERIES["dedup_containment"](spark, OUT_C).collect()
    c_wall = round(time.time() - t0, 2)
    cemit = {(r.id_a, r.id_b): (r.n_inter, r.n_a) for r in crows}
    cbands: dict[str, dict] = {}
    cmiss, cval, cleaks = [], 0, 0
    for lev in C_LEVELS:
        fwd = [p for p in c_truth if p[2] == lev]
        eligible = [p for p in fwd if 5 * p[3] >= 4 * p[4]]
        below = [p for p in fwd if 5 * p[3] < 4 * p[4]]
        hit = 0
        for ida, idb, _lev, ni, na in eligible:
            got = cemit.get((ida, idb))
            if got is None:
                cmiss.append((ida, idb))
                continue
            hit += 1
            if got != (ni, na):
                cval += 1
        cleaks += sum(
            1 for ida, idb, _l, _ni, _na in below if (ida, idb) in cemit
        )
        cbands[str(lev)] = {
            "n_planted": len(fwd),
            "n_eligible": len(eligible),
            "recall": round(hit / len(eligible), 6) if eligible else None,
            "mean_true_c": round(
                sum(p[3] / p[4] for p in fwd) / len(fwd), 4
            )
            if fwd
            else None,
        }
    # reverse-direction rows (level < 0): wrapper -> base containment is
    # boilerplate-diluted; emit/leak accounting only
    rev = [p for p in c_truth if p[2] < 0]
    rev_eligible = [p for p in rev if 5 * p[3] >= 4 * p[4]]
    rev_hit = sum(1 for p in rev_eligible if (p[0], p[1]) in cemit)
    cmiss_rev = len(rev_eligible) - rev_hit
    cleaks += sum(
        1
        for p in rev
        if 5 * p[3] < 4 * p[4] and (p[0], p[1]) in cemit
    )
    report["dedup_containment"] = {
        "wall_sec": c_wall,
        "rows": len(crows),
        "bands": cbands,
        "missing_eligible": len(cmiss) + cmiss_rev,
        "n_reverse_eligible": len(rev_eligible),
        "value_mismatches": cval,
        "below_gate_leaks": cleaks,
    }

    line = json.dumps(report)
    print(line)
    with open("BENCH_cont20k.json", "w") as f:
        f.write(line + "\n")
    ok = (
        report["dedup_ngram_jaccard"]["missing_eligible"] == 0
        and report["dedup_ngram_jaccard"]["value_mismatches"] == 0
        and report["dedup_ngram_jaccard"]["below_gate_leaks"] == 0
        and report["dedup_containment"]["missing_eligible"] == 0
        and report["dedup_containment"]["value_mismatches"] == 0
        and report["dedup_containment"]["below_gate_leaks"] == 0
    )
    print("exact-recall gates:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Semantic laws for the r5 text-pipeline ops (beyond oracle parity).

Oracle hashes prove cross-engine equality; these tests prove the
transforms MEAN what they claim: normalization undoes damage, redaction
leaves no PII behind, entropy respects its mathematical bounds.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_streaming_kafka_offset_spark.plans.registry import QUERIES
from spark_streaming_kafka_offset_spark.session import load_table
from tests.conftest import SF_DIR


def test_normalize_recovers_original_text(spark):
    """normalize(mangle(text)) == text for every fixture doc in the op's
    slice — the mangling (case flips, doubled spaces, punctuation, and
    the r10 Unicode damage: zero-width joiners, C0 controls, a BOM,
    é-for-e substitution, a stray combining mark) is fully undone,
    proven hash-for-hash against the untouched source."""
    out = QUERIES["text_normalize"](spark, SF_DIR)
    originals = (
        load_table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") % 4 == 2)
        .select("doc_id", F.sha2("text", 256).alias("orig_hash"))
    )
    joined = out.join(originals, "doc_id")
    assert joined.count() > 0
    assert joined.where(F.col("norm_hash") != F.col("orig_hash")).count() == 0


def test_unicode_fold_representation_insensitive(spark):
    """The law NFC-folding buys: composed and decomposed spellings of
    the same text fold to the SAME bytes, and homoglyph noise
    (zero-width chars, BOM, controls) never changes the fold of the
    letters around it."""
    from spark_streaming_kafka_offset_spark.functions.text import (
        _ZW_CTRL,
        unicode_fold,
    )

    composed = "caf" + chr(233) + " latt" + chr(233)         # café latté NFC
    decomposed = "cafe" + chr(769) + " latte" + chr(769)     # NFD twins
    noisy = ("caf" + chr(233) + chr(8203) + " " + chr(65279)
             + "latt" + chr(233) + chr(7))
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, noisy)], "id long, s string"
    )
    out = {
        r.id: r.f
        for r in df.select(
            "id",
            F.regexp_replace(unicode_fold(F.col("s")), _ZW_CTRL, "").alias("f"),
        ).collect()
    }
    assert out[1] == out[2] == "cafe latte", out
    assert out[3] == "cafe latte", out


def test_pii_redaction_leaves_no_matches(spark):
    """After redaction no email/IP/phone pattern may remain, every doc
    with injected PII counted exactly one of each, and clean docs zero."""
    out = QUERIES["text_pii_redact"](spark, SF_DIR).collect()
    injected = [r for r in out if r["doc_id"] % 2 == 0]
    clean = [r for r in out if r["doc_id"] % 2 == 1]
    assert injected and clean
    assert all(
        (r["n_emails"], r["n_ips"], r["n_phones"]) == (1, 1, 1)
        for r in injected
    )
    assert all(
        (r["n_emails"], r["n_ips"], r["n_phones"]) == (0, 0, 0) for r in clean
    )
    assert all(r["redacted_tail"].endswith("<PHONE>") for r in injected)
    assert all("@" not in r["redacted_tail"] for r in injected)


def test_entropy_bounds(spark):
    """0 <= H <= ln(n_distinct), with equality at uniform distribution;
    and H must be < ln(n_tokens) whenever any token repeats."""
    for r in QUERIES["text_entropy"](spark, SF_DIR).collect():
        assert -1e-9 <= r["entropy_nats"] <= math.log(r["n_distinct"]) + 1e-4
        if r["n_distinct"] < r["n_tokens"]:
            assert r["entropy_nats"] < math.log(r["n_tokens"])


def test_lm_perplexity_surprisal_bounds(spark):
    """Surprisal laws: every reported doc has avg_mbits in (0, 1000·log2
    (tot+V)] — a bigram can never be more surprising than a zero-count
    event under add-one smoothing — and the integer ledger is internally
    consistent (total == sum of per-bigram costs implies total ≥ n·min
    cost ≥ n·0, and avg = total div n exactly)."""
    rows = QUERIES["text_lm_perplexity"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_bigrams"] > 0
        assert 0 < r["avg_mbits"] <= 25_000  # 25 bits/bigram ⇔ V+tot < 2^25
        assert r["avg_mbits"] == r["total_mbits"] // r["n_bigrams"]
    # The list is the argmax-20: sorted by surprisal, deterministic ties.
    pairs = [(r["avg_mbits"], r["doc_id"]) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_admission_funnel_conserves_and_exercises_every_stage(spark):
    """The funnel partitions the corpus exactly (Σ n_docs == |documents|)
    and every reason — including the two damage-injected ones — is
    non-vacuous."""
    rows = {
        r["reason"]: r["n_docs"]
        for r in QUERIES["corpus_admission_pipeline"](spark, SF_DIR).collect()
    }
    total = load_table(spark, SF_DIR, "documents").count()
    assert sum(rows.values()) == total
    assert set(rows) == {
        "admitted", "duplicate", "lang_filtered", "repetitive", "too_short"
    }
    assert all(v > 0 for v in rows.values())


def test_minhash_collapse_multiplicity_equals_raw_pairs(spark, tmp_path):
    """The r11 exact-collapse form of dedup_minhash must carry the FULL
    raw-pair algebra: expanding every emitted row through its exact-dup
    group membership (cross rows -> group_a x group_b member pairs, self
    rows -> C(g,2) within-group pairs) reproduces the raw all-docs
    LSH+Jaccard pair list EXACTLY — ids, n_common_bands (text-determined,
    identical texts share identical signatures) and jaccard alike.  This
    pins the collapse on a replica-heavy input the sf fixtures lack."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet")
    base = t.to_pylist()
    planted = list(base)
    for r in base[:40]:  # 40 docs get 2 exact replicas each
        for k in (1, 2):
            planted.append({**r, "doc_id": r["doc_id"] + 10_000 * k})
    pq.write_table(
        pa.Table.from_pylist(planted, schema=t.schema),
        str(tmp_path / "documents.parquet"),
    )

    collapsed = QUERIES["dedup_minhash"](spark, str(tmp_path)).collect()

    # Raw reference: the pre-r11 formulation over ALL docs (no collapse).
    from spark_streaming_kafka_offset_spark.functions.text import (
        _candidates_from_sets,
        shingle_sets,
    )
    from spark_streaming_kafka_offset_spark.session import load_table

    d = load_table(spark, str(tmp_path), "documents")
    sets_ = shingle_sets(d)
    a = sets_.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sets_.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    raw = {
        (r.id_a, r.id_b): (r.n_common_bands, r.jaccard)
        for r in _candidates_from_sets(sets_)
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common_bands",
            (F.floor(inter / union * 10000) / 10000).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.5)
        .collect()
    }
    assert raw, "planted replicas must produce raw pairs"

    members: dict[str, list[int]] = {}
    for r in planted:
        members.setdefault(r["text"], []).append(r["doc_id"])
    group_of = {min(ids): sorted(ids) for ids in members.values()}

    expanded = {}
    for row in collapsed:
        assert row.n_member_pairs >= 1
        if row.id_a == row.id_b:  # self row: within-group pairs
            ids = group_of[row.id_a]
            pairs = [
                (x, y) for i, x in enumerate(ids) for y in ids[i + 1 :]
            ]
        else:
            pairs = [
                (min(x, y), max(x, y))
                for x in group_of[row.id_a]
                for y in group_of[row.id_b]
            ]
        assert len(pairs) == row.n_member_pairs, row
        for p in pairs:
            assert p not in expanded, f"pair emitted twice: {p}"
            expanded[p] = (row.n_common_bands, row.jaccard)

    assert expanded == raw
    assert any(r.id_a == r.id_b for r in collapsed)  # replicas exercised
    assert sum(r.n_member_pairs for r in collapsed) == len(raw)

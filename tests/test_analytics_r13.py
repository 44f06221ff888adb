"""Planted-law tests for the r13 operator batch (SURVEY §2.71)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from spark_streaming_kafka_offset_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR

_DOCS_SCHEMA = pq.read_schema(f"{SF_DIR}/documents.parquet")


def _write_docs(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pylist(rows, schema=_DOCS_SCHEMA),
        str(tmp_path / "documents.parquet"),
    )


def test_script_profile_planted_mixes(spark, tmp_path):
    """Planted Cyrillic / digit-heavy / whitespace docs recover
    hand-computed integer ppm exactly, the five classes partition
    n_chars, and the per-doc max finds the single mojibake doc a
    clean corpus mean would hide."""
    base = QUERIES["text_script_profile"](spark, SF_DIR).collect()
    assert base, "fixture profile empty"
    for r in base:
        parts = (
            r.latin_ppm + r.digit_ppm + r.space_ppm
            + r.nonascii_ppm + r.other_ppm
        )
        assert 1000000 - 5 <= parts <= 1000000, r  # floor dust only

    def doc(did, lang, text):
        return {
            "doc_id": did,
            "text": text,
            "lang": lang,
            "source": "s",
            "n_chars": len(text),
        }

    rows = [
        doc(0, "aa", "abcdef"),
        doc(1, "aa", "ghijkl"),
        doc(2, "bb", "Привет"),       # 6 chars, all non-ASCII
        doc(3, "bb", "abc 123"),       # 3 latin, 1 space, 3 digits
        doc(4, "cc", "12345"),         # digit-heavy pole
        doc(5, "dd", "a\tb\nc"),       # explicit-whitespace class
    ]
    _write_docs(tmp_path, rows)
    out = {
        r.lang: r
        for r in QUERIES["text_script_profile"](spark, str(tmp_path)).collect()
    }
    aa = out["aa"]
    assert (aa.n_docs, aa.latin_ppm, aa.nonascii_ppm) == (2, 1000000, 0)
    assert aa.n_docs_nonascii == 0 and aa.max_doc_nonascii_ppm == 0

    bb = out["bb"]  # totals: n_c=13 lat=3 dig=3 sp=1 na=6 other=0
    assert bb.n_docs == 2
    assert bb.latin_ppm == 3 * 1000000 // 13
    assert bb.digit_ppm == 3 * 1000000 // 13
    assert bb.space_ppm == 1 * 1000000 // 13
    assert bb.nonascii_ppm == 6 * 1000000 // 13
    assert bb.other_ppm == 0
    assert bb.n_docs_nonascii == 1
    assert bb.n_docs_digit_heavy == 1  # "abc 123": 5*3 > 7
    assert bb.max_doc_nonascii_ppm == 1000000  # the mojibake doc

    cc = out["cc"]
    assert (cc.digit_ppm, cc.n_docs_digit_heavy) == (1000000, 1)

    dd = out["dd"]  # "a\tb\nc": 3 latin, 2 whitespace of 5
    assert dd.latin_ppm == 3 * 1000000 // 5
    assert dd.space_ppm == 2 * 1000000 // 5


def test_code_detect_planted_poles(spark, tmp_path):
    """Symbol-heavy code, indent-heavy code, and plain prose pin the
    integer rule exactly; expected rollup values are recomputed in
    python with the same regexes rather than hand constants."""
    import re

    code_a = "int f(){return a[0]<b;}"
    code_b = "x = [i*i for i in range(9)];"
    prose = "plain words only here nothing structural at all"
    indent = "def g():\n  a = one\n  b = two\n\tc = three\nplain tail"
    rows = [
        {"doc_id": 0, "text": code_a, "lang": "en", "source": "code",
         "n_chars": len(code_a)},
        {"doc_id": 1, "text": code_b, "lang": "en", "source": "code",
         "n_chars": len(code_b)},
        {"doc_id": 2, "text": prose, "lang": "en", "source": "prose",
         "n_chars": len(prose)},
        {"doc_id": 3, "text": indent, "lang": "en", "source": "indent",
         "n_chars": len(indent)},
    ]
    _write_docs(tmp_path, rows)

    def feats(t):
        n_c = len(t)
        n_sym = len(re.findall(r"[{};()=<>\[\]]", t))
        n_lines = t.count("\n") + 1
        n_ind = len(re.findall(r"(?m)^(\t|  )", t))
        return n_c, n_sym, n_lines, n_ind

    def expect(texts):
        per = [feats(t) for t in texts]
        n_code = sum(
            1 for c, s, ln, i in per if 50 * s > c or 4 * i > ln
        )
        sc, ss, sl, si = (sum(x) for x in zip(*per))
        return {
            "n_docs": len(texts),
            "n_code": n_code,
            "code_ppm": n_code * 1000000 // len(texts),
            "sym_ppm": ss * 1000000 // sc,
            "indent_ppm": si * 1000000 // sl,
        }

    out = {
        r.source: r
        for r in QUERIES["text_code_detect"](spark, str(tmp_path)).collect()
    }
    for src, texts in (
        ("code", [code_a, code_b]),
        ("prose", [prose]),
        ("indent", [indent]),
    ):
        want = expect(texts)
        got = out[src]
        for k, v in want.items():
            assert getattr(got, k) == v, (src, k, getattr(got, k), v)
    assert out["code"].n_code == 2  # symbol rule fires on both
    assert out["prose"].n_code == 0
    assert out["indent"].n_code == 1  # indent rule alone fires


def test_adi_cv2_planted_quadrants(spark, tmp_path):
    """One planted brand per Syntetos-Boylan quadrant through the
    exact integer poles (ADI/CV² values hand-derivable)."""
    from datetime import datetime, timedelta

    parts = [
        {"p_partkey": 1, "p_brand": "SMOOTH"},
        {"p_partkey": 2, "p_brand": "INTERMIT"},
        {"p_partkey": 3, "p_brand": "ERRATIC"},
        {"p_partkey": 4, "p_brand": "LUMPY"},
    ]
    epoch = datetime(1970, 1, 1)

    def li(pk, wk, q):
        return {
            "l_partkey": pk,
            "l_shipdate": epoch + timedelta(days=7 * wk),
            "l_quantity": float(q),
        }

    rows = []
    rows += [li(1, w, 10) for w in range(10)]            # ADI 1, CV² 0
    rows += [li(2, w, 10) for w in (0, 2, 4, 6, 8)]       # ADI 1.8, CV² 0
    rows += [li(3, w, 1 if w % 2 == 0 else 19)            # ADI 1, CV² .81
             for w in range(10)]
    rows += [li(4, w, q) for w, q in ((0, 1), (4, 1), (8, 28))]  # 3, 1.62

    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.Table.from_pylist(parts), str(tmp_path / "part.parquet"))

    out = {
        r.brand: r
        for r in QUERIES["orders_adi_cv2"](spark, str(tmp_path)).collect()
    }
    assert out["SMOOTH"].demand_class == "smooth"
    assert (out["SMOOTH"].adi_e6, out["SMOOTH"].cv2_e6) == (1000000, 0)
    assert out["INTERMIT"].demand_class == "intermittent"
    assert out["INTERMIT"].adi_e6 == 1800000
    assert out["ERRATIC"].demand_class == "erratic"
    assert out["ERRATIC"].cv2_e6 == 810000
    assert out["LUMPY"].demand_class == "lumpy"
    assert (out["LUMPY"].adi_e6, out["LUMPY"].cv2_e6) == (3000000, 1620000)
    assert out["LUMPY"].n_demand_weeks == 3
    assert out["LUMPY"].n_span_weeks == 9


def test_ocr_artifacts_planted_poles(spark, tmp_path):
    """Each artifact pole fires its clause alone; expected counts are
    recomputed in python with the same primitives."""
    hyb = "the exam-\nple word and ano-\nther split here ok fine"
    runs = "header....... then body!!!! and tail words here"
    shrap = "a b c d e normal f g h i j k l m"  # singles >> 5% of tokens
    clean = "perfectly ordinary prose with no artifacts at all today"
    rows = [
        {"doc_id": 0, "text": hyb, "lang": "en", "source": "hyb",
         "n_chars": len(hyb)},
        {"doc_id": 1, "text": runs, "lang": "en", "source": "runs",
         "n_chars": len(runs)},
        {"doc_id": 2, "text": shrap, "lang": "en", "source": "shrap",
         "n_chars": len(shrap)},
        {"doc_id": 3, "text": clean, "lang": "en", "source": "clean",
         "n_chars": len(clean)},
    ]
    _write_docs(tmp_path, rows)
    out = {
        r.source: r
        for r in QUERIES["text_ocr_artifacts"](spark, str(tmp_path)).collect()
    }
    assert (out["hyb"].hyphen_breaks, out["hyb"].n_suspect) == (2, 1)
    assert (out["runs"].punct_runs, out["runs"].n_suspect) == (2, 1)
    toks = shrap.split(" ")
    singles = sum(1 for t in toks if len(t) == 1 and t.isalpha())
    assert out["shrap"].single_token_ppm == singles * 1000000 // len(toks)
    assert out["shrap"].n_suspect == 1
    assert (out["clean"].n_suspect, out["clean"].suspect_ppm) == (0, 0)


def test_krippendorff_planted_poles(spark, tmp_path):
    """Perfect agreement pins alpha_e6 == 1e6 exactly (with ≥2
    categories present); one-of-each two-category panels pin the
    textbook small-sample pole 1e6 − (2U−1)·1e6 // U; a
    single-category corpus yields NULL (De = 0)."""
    def lineitem(rows):
        pq.write_table(
            pa.Table.from_pylist(
                [{"l_orderkey": u, "l_returnflag": c} for u, c in rows]
            ),
            str(tmp_path / "lineitem.parquet"),
        )

    def run():
        return {
            r.category: r
            for r in QUERIES["eval_krippendorff_alpha"](
                spark, str(tmp_path)
            ).collect()
        }

    # perfect agreement: 6 units, each panel unanimous, two categories
    lineitem([(u, "A" if u % 2 == 0 else "R") for u in range(6) for _ in range(3)])
    out = run()
    assert out["A"].alpha_e6 == 1000000
    assert out["A"].n_units == 6 and out["A"].n_ratings_total == 18

    # maximal small-sample disagreement: U=10 units, panels = (A, R)
    u_n = 10
    lineitem([(u, c) for u in range(u_n) for c in ("A", "R")])
    out = run()
    want = 1000000 - (2 * u_n - 1) * 1000000 // u_n
    assert out["A"].alpha_e6 == want == -900000

    # degenerate: one category everywhere -> NULL
    lineitem([(u, "A") for u in range(5) for _ in range(2)])
    out = run()
    assert out["A"].alpha_e6 is None


def test_skew_join_tuned_confs_contract():
    """The documented skew-join posture (BASELINE.md r13) is a stable
    dict of RUNTIME-settable confs — the stress harness consumes this
    exact function, so key drift would break both."""
    from spark_streaming_kafka_offset_spark.session import (
        skew_join_tuned_confs,
    )

    confs = skew_join_tuned_confs()
    assert confs["spark.sql.adaptive.forceOptimizeSkewedJoin"] == "true"
    assert confs["spark.sql.adaptive.skewJoin.skewedPartitionFactor"] == "2"
    assert confs["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "64m"
    assert skew_join_tuned_confs(advisory="16m")[
        "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    ] == "16m"


def test_bleu_planted_poles(spark, tmp_path):
    """Identical pairs pin bleu2_ppm == 1e6 exactly; a half-length
    perfect-prefix candidate pins BP = e^(−1) (floor 367879); a
    bigram-free overlap pins 0.  IDs are gapped so only the planted
    pairs score."""
    import math

    ref = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"

    def doc(did, text):
        return {"doc_id": did, "text": text, "lang": "en", "source": "s",
                "n_chars": len(text)}

    # case 1: identical pair
    _write_docs(tmp_path, [doc(0, ref), doc(1, ref)])
    out = QUERIES["docs_bleu"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].n_pairs == 1
    assert (out[0].p1_ppm, out[0].p2_ppm) == (1000000, 1000000)
    assert (out[0].bp_ppm, out[0].bleu2_ppm) == (1000000, 1000000)

    # case 2: candidate = first half of ref (perfect clipped precision,
    # brevity-penalized): c=5, r=10 -> BP = e^(1-2) = e^-1; p1 = p2 = 1
    _write_docs(tmp_path, [doc(0, ref), doc(1, "w0 w1 w2 w3 w4")])
    out = QUERIES["docs_bleu"](spark, str(tmp_path)).collect()[0]
    want_bp = math.floor(math.exp(1.0 - 10.0 / 5.0) * 1000000.0)
    assert (out.p1_ppm, out.p2_ppm) == (1000000, 1000000)
    assert out.bp_ppm == want_bp == 367879
    assert out.bleu2_ppm == want_bp

    # case 3: shared unigrams, zero shared bigrams (reversed order)
    _write_docs(
        tmp_path,
        [doc(0, "a b c d"), doc(1, "d c b a")],
    )
    out = QUERIES["docs_bleu"](spark, str(tmp_path)).collect()[0]
    assert out.p1_ppm == 1000000 and out.p2_ppm == 0
    assert out.bleu2_ppm == 0

    # case 4: a single-token candidate has no bigram -> pair excluded,
    # zero scoring pairs -> empty result (both engines)
    _write_docs(tmp_path, [doc(0, ref), doc(1, "w0")])
    assert QUERIES["docs_bleu"](spark, str(tmp_path)).collect() == []

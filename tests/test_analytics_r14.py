"""Planted-law tests for the r14 operator batch (SURVEY §2.72)."""

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


def _write_lineitem(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pylist(
            [{"l_orderkey": u, "l_returnflag": c} for u, c in rows]
        ),
        str(tmp_path / "lineitem.parquet"),
    )


def test_fleiss_kappa_planted_poles(spark, tmp_path):
    """Unanimous panels with ≥2 categories across units pin
    kappa_e6 == 1e6 exactly; one-of-each-category panels (n = k with
    equal margins) pin the textbook −1/(n−1) pole exactly; a
    single-category group yields NULL; panel sizes are grouped, not
    pooled (two sizes in one fixture → two independent rows)."""

    def run():
        return {
            r.panel_n: r
            for r in QUERIES["eval_fleiss_kappa"](
                spark, str(tmp_path)
            ).collect()
        }

    # perfect agreement at two panel sizes in one corpus: each row
    # must hit the pole independently (the fixed-n split law)
    _write_lineitem(
        tmp_path,
        [(u, "A" if u % 2 == 0 else "R") for u in range(6) for _ in range(3)]
        + [(100 + u, "A" if u % 2 == 0 else "R") for u in range(4) for _ in range(5)],
    )
    out = run()
    assert set(out) == {3, 5}
    assert out[3].kappa_e6 == 1000000 and out[5].kappa_e6 == 1000000
    assert out[3].n_units == 6 and out[3].n_ratings == 18
    assert out[5].n_units == 4 and out[5].n_ratings == 20

    # maximal disagreement, n = k = 2 with equal margins:
    # P̄ = 0, P̄e = 1/2 → kappa = −1 exactly
    _write_lineitem(tmp_path, [(u, c) for u in range(10) for c in ("A", "R")])
    out = run()
    assert out[2].kappa_e6 == -1000000

    # n = k = 3 one-of-each: P̄ = 0, P̄e = 1/3 → kappa = −1/2 exactly
    _write_lineitem(
        tmp_path, [(u, c) for u in range(9) for c in ("A", "N", "R")]
    )
    out = run()
    assert out[3].kappa_e6 == -500000

    # degenerate: one category everywhere → NULL (P̄e = 1)
    _write_lineitem(tmp_path, [(u, "A") for u in range(5) for _ in range(2)])
    out = run()
    assert out[2].kappa_e6 is None


def test_fleiss_kappa_groups_are_independent(spark, tmp_path):
    """Adding a fully-disagreeing n=2 group must not move the n=3
    unanimous group's kappa — the per-panel-size split is what keeps
    Fleiss' fixed-n assumption exact (pooling would drag both)."""
    unanimous3 = [
        (u, "A" if u % 2 == 0 else "R") for u in range(6) for _ in range(3)
    ]
    _write_lineitem(tmp_path, unanimous3)
    solo = {
        r.panel_n: r.kappa_e6
        for r in QUERIES["eval_fleiss_kappa"](spark, str(tmp_path)).collect()
    }
    _write_lineitem(
        tmp_path,
        unanimous3 + [(100 + u, c) for u in range(8) for c in ("A", "R")],
    )
    mixed = {
        r.panel_n: r.kappa_e6
        for r in QUERIES["eval_fleiss_kappa"](spark, str(tmp_path)).collect()
    }
    assert mixed[3] == solo[3] == 1000000
    assert mixed[2] == -1000000


def _doc(doc_id, text):
    row = {f.name: None for f in _DOCS_SCHEMA}
    row["doc_id"] = doc_id
    row["text"] = text
    return row


def test_chrf_planted_poles(spark, tmp_path):
    """Identical pairs pin every f_e6 and chrf3_e6 at exactly 1e6;
    disjoint alphabets pin 0; the hand-computed aaaa/aaa pair pins
    the β=2 integer chain end-to-end (5·ov/(4r+c) per order, floored
    mean).  IDs are gapped so only the planted pairs form."""

    def run():
        rows = QUERIES["docs_chrf"](spark, str(tmp_path)).collect()
        assert len(rows) == 1
        return rows[0]

    # identical pair (whitespace removed before gramming)
    _write_docs(
        tmp_path,
        [_doc(10, "abc def"), _doc(11, "abc def")],
    )
    r = run()
    assert (r.f1_e6, r.f2_e6, r.f3_e6, r.chrf3_e6) == (
        1000000,
        1000000,
        1000000,
        1000000,
    )
    assert r.n_pairs == 1 and r.cand_chars == 6 and r.ref_chars == 6

    # disjoint alphabets → every order 0
    _write_docs(tmp_path, [_doc(10, "aaaa"), _doc(11, "bbbb")])
    r = run()
    assert (r.f1_e6, r.f2_e6, r.f3_e6, r.chrf3_e6) == (0, 0, 0, 0)

    # hand case: ref "aaaa" (doc 10), cand "aaa" (doc 11):
    # o1: ov=3, c=3, r=4 → 15e6 // 19 = 789473
    # o2: ov=2, c=2, r=3 → 10e6 // 14 = 714285
    # o3: ov=1, c=1, r=2 →  5e6 //  9 = 555555
    # chrf3 = (789473+714285+555555) // 3 = 686437
    _write_docs(tmp_path, [_doc(10, "aaaa"), _doc(11, "aaa")])
    r = run()
    assert (r.f1_e6, r.f2_e6, r.f3_e6) == (789473, 714285, 555555)
    assert r.chrf3_e6 == 686437

    # a sub-3-char side excludes the pair entirely (needs all orders)
    _write_docs(
        tmp_path,
        [_doc(10, "aaaa"), _doc(11, "aa"), _doc(20, "xyz"), _doc(21, "xyz")],
    )
    r = run()
    assert r.n_pairs == 1 and r.chrf3_e6 == 1000000


def test_chrf_is_corpus_level_not_mean_of_pairs(spark, tmp_path):
    """chrF must be the ratio of corpus SUMS, not the mean of per-pair
    scores: one perfect pair + one zero pair with unequal sizes gives
    sum-based f1 = 5·4/(4·(4+8)+(4+8)) = 1/3 exactly (333333), while
    a mean of per-pair F1s would give 500000 — the same definitional
    trap docs_bleu forecloses, pinned at character grain."""
    _write_docs(
        tmp_path,
        [
            _doc(10, "aaaa"),
            _doc(11, "aaaa"),  # perfect pair, 4 chars each side
            _doc(20, "cccccccc"),
            _doc(21, "dddddddd"),  # zero-overlap pair, 8 chars each
        ],
    )
    rows = QUERIES["docs_chrf"](spark, str(tmp_path)).collect()
    r = rows[0]
    assert r.n_pairs == 2
    assert r.f1_e6 == 333333  # corpus-sum definition
    assert r.f1_e6 != 500000  # what mean-of-pairs would report


def test_edit_distance_planted_poles(spark, tmp_path):
    """Identical pairs pin (lev 0, sim 1e6, decile 9 — the documented
    top-bucket fold); disjoint equal-length pins (lev = len, sim 0,
    decile 0); the half-length prefix pins sim exactly 500000; the
    textbook kitten/sitting pair pins distance exactly 3 with
    sim = 4e6 // 7 = 571428 (decile 5).  IDs gapped so only planted
    pairs form."""

    def run():
        return {
            r.decile: r
            for r in QUERIES["docs_edit_distance"](
                spark, str(tmp_path)
            ).collect()
        }

    _write_docs(
        tmp_path,
        [
            _doc(10, "same text"),
            _doc(11, "same text"),  # identical
            _doc(20, "aaaa"),
            _doc(21, "bbbb"),  # disjoint equal length
            _doc(30, "abcdef"),
            _doc(31, "abc"),  # half-length prefix
            _doc(40, "kitten"),
            _doc(41, "sitting"),  # the textbook case
        ],
    )
    out = run()
    assert out[9].n_pairs == 1 and out[9].sum_lev == 0
    assert out[9].mean_sim_e6 == 1000000
    assert out[0].n_pairs == 1 and out[0].sum_lev == 4
    assert out[0].mean_sim_e6 == 0
    assert out[5].n_pairs == 2  # prefix (500000) and kitten (571428)
    assert out[5].sum_lev == 3 + 3
    assert out[5].mean_sim_e6 == (500000 + 571428) // 2


def test_hapax_ratio_planted_poles(spark, tmp_path):
    """All-unique corpus pins both hapax shares at exactly 1e6;
    everything-twice pins both at 0; the 'a a b' hand case pins the
    type/token share split (500000 vs 333333) and the dis-legomena
    count."""

    def run():
        return {
            r.lang: r
            for r in QUERIES["text_hapax_ratio"](
                spark, str(tmp_path)
            ).collect()
        }

    def doc(doc_id, text, lang):
        row = {f.name: None for f in _DOCS_SCHEMA}
        row["doc_id"], row["text"], row["lang"] = doc_id, text, lang
        return row

    _write_docs(
        tmp_path,
        [
            doc(1, "w1 w2 w3 w4", "uniq"),
            doc(2, "r1 r2 r1 r2", "twice"),
            doc(3, "a a b", "mixed"),
        ],
    )
    out = run()
    u = out["uniq"]
    assert (u.n_types, u.n_tokens, u.n_hapax, u.n_dis) == (4, 4, 4, 0)
    assert u.hapax_type_e6 == 1000000 and u.hapax_token_e6 == 1000000
    t = out["twice"]
    assert (t.n_types, t.n_hapax, t.n_dis) == (2, 0, 2)
    assert t.hapax_type_e6 == 0 and t.hapax_token_e6 == 0
    m = out["mixed"]
    assert (m.n_types, m.n_tokens, m.n_hapax, m.n_dis) == (2, 3, 1, 1)
    assert m.hapax_type_e6 == 500000 and m.hapax_token_e6 == 333333


def _write_events(tmp_path, rows):
    pq.write_table(
        pa.Table.from_pylist(
            [{"event_type": t, "value": v} for t, v in rows]
        ),
        str(tmp_path / "events.parquet"),
    )


def test_mcc_planted_poles(spark, tmp_path):
    """On 100 one-per-dollar scores the decile-5 opener is the $51
    threshold; labels perfectly separated there pin mcc_e6 == 1e6
    exactly, inverted labels pin −1e6 exactly (sqrt(50⁴) = 2500 is
    exact in double, so the one float composition is exact at the
    pole), and odd/even labels pin 0 (zero numerator)."""

    def run():
        return {
            r.decile: r
            for r in QUERIES["eval_mcc"](spark, str(tmp_path)).collect()
        }

    # perfect separation: purchases are exactly the scores >= $51
    _write_events(
        tmp_path,
        [("purchase" if v >= 51 else "view", float(v)) for v in range(1, 101)],
    )
    out = run()
    r5 = out[5]
    assert (r5.tp, r5.fp, r5.fn, r5.tn) == (50, 0, 0, 50)
    assert r5.mcc_e6 == 1000000

    # inverted: purchases are exactly the scores <= $50
    _write_events(
        tmp_path,
        [("purchase" if v <= 50 else "view", float(v)) for v in range(1, 101)],
    )
    out = run()
    r5 = out[5]
    assert (r5.tp, r5.fp, r5.fn, r5.tn) == (0, 50, 50, 0)
    assert r5.mcc_e6 == -1000000

    # independence: purchases are the odd scores -> balanced table
    _write_events(
        tmp_path,
        [("purchase" if v % 2 == 1 else "view", float(v)) for v in range(1, 101)],
    )
    out = run()
    r5 = out[5]
    assert (r5.tp, r5.fp, r5.fn, r5.tn) == (25, 25, 25, 25)
    assert r5.mcc_e6 == 0


def _write_books(tmp_path, pairs):
    """orders/lineitem fixture: one line per order, (header, line)."""
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"o_orderkey": i, "o_totalprice": x}
                for i, (x, _) in enumerate(pairs)
            ]
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"l_orderkey": i, "l_extendedprice": y}
                for i, (_, y) in enumerate(pairs)
            ]
        ),
        str(tmp_path / "lineitem.parquet"),
    )


def test_concordance_ccc_planted_poles(spark, tmp_path):
    """y = x pins ccc_e6 == 1e6 with shift 0; y = x + 10 on
    {10, 30} pins the closed form 2v/(2v + c²) = 2/3 through the
    integer chain (666666 / shift 333333); y = 40 − x (equal means,
    perfect anticorrelation) pins exactly −1e6."""

    def run():
        rows = QUERIES["eval_concordance_ccc"](
            spark, str(tmp_path)
        ).collect()
        assert len(rows) == 1
        return rows[0]

    _write_books(tmp_path, [(10.0, 10.0), (20.0, 20.0), (30.0, 30.0)])
    r = run()
    assert r.n_orders == 3
    assert r.ccc_e6 == 1000000 and r.location_shift_e6 == 0

    _write_books(tmp_path, [(10.0, 20.0), (30.0, 40.0)])
    r = run()
    assert r.ccc_e6 == 666666 and r.location_shift_e6 == 333333

    _write_books(tmp_path, [(10.0, 30.0), (30.0, 10.0)])
    r = run()
    assert r.ccc_e6 == -1000000 and r.location_shift_e6 == 0

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

"""§5.1/§5.2 — every declared oracle pair verified in-process at sf0.001.

This is the same comparison the driver runs at sf0.01 — through the same
pandas canonicalization (tools/driver_canon.py: dtype-sensitive values,
``sort_values`` allowed to raise on unhashable cells), so a pair that
passes here does not surprise us at verification time.  Rows-only queries
are smoke-run for non-crash + canonicalizable schema.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tools.driver_canon import canon_frame, compare_frames

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

#: Streaming/stateful queries cost seconds each even at sf0.001; they have
#: dedicated behavior tests in test_streaming.py, so only the cheap smoke
#: subset runs here.
_SLOW_ROWS_ONLY = {
    k for k in QUERIES if k.startswith("stream_")
}


@pytest.mark.parametrize("key", sorted(k for k in QUERIES if k in ORACLES))
def test_oracle_parity(spark, duck, key):
    spdf = QUERIES[key](spark, SF_DIR).toPandas()
    dpdf = duck.execute(ORACLES[key]).df()
    problems = compare_frames(spdf, dpdf)
    assert not problems, f"{key}: " + "; ".join(problems)


@pytest.mark.parametrize(
    "key", sorted(k for k in QUERIES if k not in ORACLES and k not in _SLOW_ROWS_ONLY)
)
def test_rows_only_smoke(spark, key):
    df = QUERIES[key](spark, SF_DIR)
    pdf = df.toPandas()
    assert len(df.schema.fields) > 0
    # The driver canonicalizes rows-only results too — an Array/Map output
    # column would be recorded as a harness error, so catch it here.
    canon_frame(pdf)

"""§5.1/§5.2 — every declared oracle pair verified in-process at sf0.001.

This is the same comparison the driver runs at sf0.01 (row count, column
names, order-insensitive values), so a pair that passes here does not
surprise us at verification time.  Rows-only queries are smoke-run for
non-crash + stable schema.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

#: Streaming/stateful queries cost seconds each even at sf0.001; they have
#: dedicated behavior tests in test_streaming.py, so only the cheap smoke
#: subset runs here.
_SLOW_ROWS_ONLY = {
    k for k in QUERIES if k.startswith("stream_")
}


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(norm(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        return repr(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("key", sorted(k for k in QUERIES if k in ORACLES))
def test_oracle_parity(spark, duck, key):
    sdf = QUERIES[key](spark, SF_DIR)
    srows, scols = sdf.collect(), sdf.columns
    res = duck.execute(ORACLES[key])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{key}: column names differ"
    assert len(srows) == len(drows), f"{key}: row count differs"
    assert _canon(srows, scols) == _canon(drows, dcols), f"{key}: values differ"


@pytest.mark.parametrize(
    "key", sorted(k for k in QUERIES if k not in ORACLES and k not in _SLOW_ROWS_ONLY)
)
def test_rows_only_smoke(spark, key):
    df = QUERIES[key](spark, SF_DIR)
    rows = df.collect()
    assert rows is not None
    assert len(df.schema.fields) > 0

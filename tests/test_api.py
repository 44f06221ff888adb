"""Engine facade — the switch-over surface for a reference user."""

from __future__ import annotations

import pytest

from spark_streaming_kafka_offset_spark import Engine
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark=spark, sf_dir=SF_DIR)


def test_table_and_sql_agree(eng):
    n_df = eng.table("orders").count()
    n_sql = eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0]["n"]
    assert n_df == n_sql > 0


def test_run_registered_query(eng):
    rows = eng.run("agg_hash").collect()
    assert len(rows) > 0


def test_keys_ordered_and_oracle_lookup(eng):
    ks = eng.keys()
    from spark_streaming_kafka_offset_spark.plans.registry import DRIVER_PRIORITY

    assert tuple(ks) == DRIVER_PRIORITY  # driver-priority order
    assert eng.oracle("agg_hash") is not None
    assert eng.oracle("stream_tumbling") is None


def test_unknown_keys_raise(eng):
    with pytest.raises(KeyError):
        eng.table("nope")
    with pytest.raises(KeyError):
        eng.run("nope")


def test_explain_prints_plan(eng, capsys):
    eng.explain("scan_pruned")
    out = capsys.readouterr().out
    assert "PushedFilters" in out

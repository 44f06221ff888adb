

def test_txn_log_atomicity_and_time_travel(spark):
    """Commit-protocol guarantees: torn writes invisible at every
    snapshot, v0 < v1 rows (append monotonicity), latest == v1, and
    the committed row counts equal the source splits exactly."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from spark_streaming_kafka_offset_spark.session import load_table
    from tests.conftest import SF_DIR

    out = {
        r["snapshot"]: r
        for r in entrymod.queries()["sink_txn_log"](spark, SF_DIR).collect()
    }
    e = load_table(spark, SF_DIR, "events")
    n_even = e.where(F.col("event_id") % 2 == 0).count()
    n_all = e.count()
    assert out["v0"]["committed_rows"] == n_even
    assert out["v1"]["committed_rows"] == n_all
    assert out["latest"]["committed_rows"] == n_all
    for r in out.values():
        assert r["torn_invisible"], r
        assert r["all_file_rows"] == n_all + 100  # torn file IS on disk



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


def test_txn_maintenance_incremental_and_compaction(spark):
    """Incremental (v0, v1] returns exactly commit 1's rows; compaction
    preserves the snapshot row-for-row while shrinking files to 1; time
    travel to v1 still works through the replace commit."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from spark_streaming_kafka_offset_spark.session import load_table
    from tests.conftest import SF_DIR

    out = {
        r["claim"]: r["value"]
        for r in entrymod.queries()["scan_txn_maintenance"](spark, SF_DIR).collect()
    }
    e = load_table(spark, SF_DIR, "events")
    n_odd = e.where(F.col("event_id") % 2 == 1).count()
    n_all = e.count()
    assert out["incremental_v0_v1"] == n_odd
    assert out["rows_pre_compact"] == n_all
    assert out["rows_post_compact"] == n_all
    assert out["files_pre_compact"] == 6
    assert out["files_post_compact"] == 1
    assert out["time_travel_v1_rows"] == n_all


def test_python_datasource_matches_direct_gated_read(spark):
    """The custom Python DataSource (per-file splits + offset gate +
    projection) must produce exactly the rows of a direct parquet read
    gated the same way, and its split column must reflect the file
    layout (4 range chunks => splits 0-3 with only post-offset splits
    populated)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from spark_streaming_kafka_offset_spark.session import load_table
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["source_python_datasource"](spark, SF_DIR).collect()
    e = load_table(spark, SF_DIR, "events")
    head = e.agg(F.max("event_id")).first()[0]
    start = int(head) // 4 + 1
    want = {
        r["event_type"]: r["n"]
        for r in e.where(F.col("event_id") >= start)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {}
    for r in rows:
        got[r["event_type"]] = got.get(r["event_type"], 0) + r["n_rows"]
        assert r["min_id"] >= start
    assert got == want
    splits = {r["split"] for r in rows}
    assert splits <= {0, 1, 2, 3} and len(splits) >= 3


def test_vacuum_plan_classes_and_safety(spark):
    """The vacuum set must never intersect the current snapshot:
    deleting every planned file leaves the live read byte-identical,
    and the orphan/superseded classification matches how each file got
    onto disk."""
    import os

    from pyspark.sql import functions as F

    from spark_streaming_kafka_offset_spark.common import scratch_path
    from spark_streaming_kafka_offset_spark.sources.txnlog import (
        _write_data_files,
        txn_commit,
        txn_compact,
        txn_read,
        vacuum_plan,
    )
    from tests.conftest import SF_DIR

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", "event_type")
    )
    table = scratch_path("vac_test_")
    f1, n1 = _write_data_files(ev.where(F.col("event_id") % 4 == 0), table, 2)
    txn_commit(table, f1, n1)
    f2, n2 = _write_data_files(ev.where(F.col("event_id") % 4 == 1), table, 2)
    txn_commit(table, f2, n2)
    txn_compact(spark, table)
    orphans, _ = _write_data_files(
        ev.where(F.col("event_id") % 4 == 2), table, 1
    )

    plan = vacuum_plan(table)
    by_class = {}
    for f, cls, action in plan:
        by_class.setdefault(cls, []).append((f, action))
    # every pre-compaction file is superseded, the uncommitted one orphan
    assert sorted(f for f, _ in by_class["superseded"]) == sorted(f1 + f2)
    assert [f for f, _ in by_class["orphan"]] == sorted(orphans)
    assert all(a == "vacuum" for _, a in by_class["superseded"])
    assert all(a == "vacuum" for _, a in by_class["orphan"])
    assert all(a == "keep" for _, a in by_class["live"])

    before = sorted(
        tuple(r) for r in txn_read(spark, table).collect()
    )
    for f, cls, action in plan:
        if action == "vacuum":
            os.unlink(os.path.join(table, "data", f))
    after = sorted(tuple(r) for r in txn_read(spark, table).collect())
    assert after == before, "vacuum must not touch the live snapshot"
    assert after, "live snapshot must be non-empty"


def test_rowgroup_zonemap_matches_duckdb_decoder(spark):
    """The pyarrow-decoded footer stats must agree with DuckDB's
    independent parquet_metadata() decoder on every row group, and the
    zone map must bracket the actual data min/max exactly."""
    import duckdb

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = {
        r.row_group: r
        for r in entrymod.queries()["scan_rowgroup_zonemap"](
            spark, SF_DIR
        ).collect()
    }
    duck = duckdb.sql(
        f"""
        SELECT CAST(row_group_id AS BIGINT) AS rg,
               MAX(CASE WHEN path_in_schema = 'l_quantity'
                        THEN num_values END) AS n_rows,
               MIN(CASE WHEN path_in_schema = 'l_shipdate'
                        THEN CAST(CAST(stats_min_value AS TIMESTAMP)
                                  AS DATE) END) AS ship_min,
               MAX(CASE WHEN path_in_schema = 'l_shipdate'
                        THEN CAST(CAST(stats_max_value AS TIMESTAMP)
                                  AS DATE) END) AS ship_max,
               MIN(CASE WHEN path_in_schema = 'l_quantity'
                        THEN CAST(CAST(stats_min_value AS DOUBLE)
                                  AS BIGINT) END) AS qty_min,
               MAX(CASE WHEN path_in_schema = 'l_quantity'
                        THEN CAST(CAST(stats_max_value AS DOUBLE)
                                  AS BIGINT) END) AS qty_max
        FROM parquet_metadata('{SF_DIR}/lineitem.parquet')
        GROUP BY row_group_id ORDER BY rg
        """
    ).fetchall()
    assert len(duck) == len(rows)
    for rg, n, smin, smax, qmin, qmax in duck:
        r = rows[rg]
        assert (r.n_rows, r.ship_min, r.ship_max, r.qty_min, r.qty_max) == (
            n,
            str(smin),
            str(smax),
            qmin,
            qmax,
        )
    # zone map brackets the data exactly (footer stats are tight for
    # uncompressed-logical min/max written by arrow)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    from pyspark.sql import functions as F

    lo, hi = li.agg(
        F.min(F.to_date("l_shipdate")), F.max(F.to_date("l_shipdate"))
    ).first()
    assert min(r.ship_min for r in rows.values()) == str(lo)
    assert max(r.ship_max for r in rows.values()) == str(hi)


def test_scan_orc_roundtrip_equals_parquet_aggregate(spark):
    """The ORC round-trip must return exactly the rows the same
    aggregate computes straight off the parquet fixture — format
    migration may not change a single value — and the read must prune
    to the A partition."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from spark_streaming_kafka_offset_spark.session import load_table
    from tests.conftest import SF_DIR

    got = sorted(
        map(tuple, entrymod.queries()["scan_orc"](spark, SF_DIR).collect())
    )
    l = load_table(spark, SF_DIR, "lineitem").where(F.col("l_returnflag") == "A")
    want = sorted(
        (r["l_linestatus"], r["n_rows"], r["revenue_cents"], "A")
        for r in l.groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("revenue_cents"),
        )
        .collect()
    )
    assert got == want

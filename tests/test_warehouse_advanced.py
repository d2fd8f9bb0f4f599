"""SCD2 history tracking, exactly-once streaming ingest, and custom
stateful streaming operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_challenge_spark.operators.merge import ParquetWarehouse, scd2_upsert
from data_engineer_challenge_spark.schemas import TESTDATA
from data_engineer_challenge_spark.streaming.ingest import ingest_stream
from data_engineer_challenge_spark.streaming.stateful import running_user_totals
from data_engineer_challenge_spark.tables import load_table


def _src(spark, rows):
    return spark.createDataFrame(rows, "pid long, name string, city string")


def test_scd2_versioning(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path))
    keys, cols = ["pid"], ["name", "city"]

    scd2_upsert(wh, "P", _src(spark, [(1, "Anne", "Paris"), (2, "Luc", "Lyon")]), keys, cols, batch_id=1)
    t1 = wh.read("P").collect()
    assert len(t1) == 2 and all(r["__is_current"] and r["__version"] == 1 for r in t1)

    # batch 2: Anne moves; Luc unchanged; Zoe appears
    scd2_upsert(
        wh, "P",
        _src(spark, [(1, "Anne", "Nice"), (2, "Luc", "Lyon"), (3, "Zoe", "Brest")]),
        keys, cols, batch_id=2,
    )
    rows = {(r["pid"], r["__version"]): r for r in wh.read("P").collect()}
    assert len(rows) == 4
    old = rows[(1, 1)]
    assert not old["__is_current"] and old["__valid_to_batch"] == 2 and old["city"] == "Paris"
    new = rows[(1, 2)]
    assert new["__is_current"] and new["city"] == "Nice" and new["__valid_from_batch"] == 2
    assert rows[(2, 1)]["__is_current"]  # untouched
    assert rows[(3, 1)]["__valid_from_batch"] == 2

    # batch 3: Anne's key vanishes from the snapshot → stays current
    scd2_upsert(wh, "P", _src(spark, [(2, "Luc", "Lyon")]), keys, cols, batch_id=3)
    rows3 = {(r["pid"], r["__version"]): r for r in wh.read("P").collect()}
    assert rows3[(1, 2)]["__is_current"]
    assert len(rows3) == 4

    # idempotence: replaying batch 3 changes nothing
    scd2_upsert(wh, "P", _src(spark, [(2, "Luc", "Lyon")]), keys, cols, batch_id=3)
    assert wh.read("P").count() == 4


def test_scd2_null_fields_not_dropped(spark, tmp_path):
    wh = ParquetWarehouse(spark, str(tmp_path))
    scd2_upsert(wh, "P", _src(spark, [(1, "Anne", None)]), ["pid"], ["name", "city"], 1)
    scd2_upsert(wh, "P", _src(spark, [(1, "Anne", None)]), ["pid"], ["name", "city"], 2)
    assert wh.read("P").count() == 1  # null == null must count as unchanged
    scd2_upsert(wh, "P", _src(spark, [(1, "Anne", "Nice")]), ["pid"], ["name", "city"], 3)
    assert wh.read("P").count() == 2  # null -> value is a real change


def test_exactly_once_stream_ingest(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    first = events.filter(F.col("event_id") < 500)
    first.write.parquet(src)

    wh = ParquetWarehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    ingest_stream(spark, src, TESTDATA["events"], wh, "EVENTS", ["event_id"], ckpt)
    n1 = wh.read("EVENTS").count()
    assert n1 == first.count()

    # second wave of files, including replayed overlap → no duplicates
    events.filter(F.col("event_id") >= 400).write.mode("append").parquet(src)
    ingest_stream(spark, src, TESTDATA["events"], wh, "EVENTS", ["event_id"], ckpt)
    assert wh.read("EVENTS").count() == events.count()
    assert wh.read("EVENTS").select("event_id").distinct().count() == events.count()


def test_stateful_running_totals(spark, tmp_path):
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "src")
    events.write.parquet(src)
    stream = spark.readStream.schema(TESTDATA["events"]).parquet(src)

    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["total_events"], r["total_value"])
            for r in spark.sql(
                "SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY total_events DESC) rn FROM user_totals) WHERE rn = 1"
            ).collect()
        }
    finally:
        q.stop()
    want = {
        r["user_id"]: (r["n"], r["v"])
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0]
        assert abs(got[u][1] - want[u][1]) < 1e-6

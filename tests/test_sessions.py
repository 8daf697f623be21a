"""Gap-based sessionization: lag/cumsum construction, oracle parity, and
batch == streaming session_window consistency."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from pyspark.sql import functions as F

from sketchlib.spark import get_spark
from sketchlib.spark.sessions import session_stats, session_windows_stream, sessionize

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    yield get_spark("session-tests", cpus=4, shuffle_partitions=4)


def _ts(sec: int):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec)


def test_sessionize_gap_boundaries(spark):
    """gap == threshold stays in-session; gap > threshold opens a new one;
    ties share a session; keys are independent."""
    rows = [
        ("a", _ts(0)), ("a", _ts(100)), ("a", _ts(100)),  # ties: one session
        ("a", _ts(200)),                                   # gap 100 == thr: same
        ("a", _ts(301)),                                   # gap 101  > thr: new
        ("b", _ts(0)), ("b", _ts(1000)),                   # own sessions
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        (r["user_id"], int(r["ts"].timestamp() - _ts(0).timestamp())): r["session_seq"]
        for r in sessionize(df, "user_id", gap_sec=100).collect()
    }
    assert got == {
        ("a", 0): 1, ("a", 100): 1, ("a", 200): 1, ("a", 301): 2,
        ("b", 0): 1, ("b", 1000): 2,
    }
    st = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["active_sec"])
        for r in session_stats(df, "user_id", gap_sec=100).collect()
    }
    assert st[("a", 1)] == (4, 200)
    assert st[("a", 2)] == (1, 0)
    assert st[("b", 1)] == (1, 0)


def test_user_sessions_matches_duckdb_oracle(spark):
    from sketchlib.spark.queries import ORACLES, QUERIES

    got = {
        r["user_id"]: (
            r["n_sessions"], r["n_events"], r["max_session_events"],
            r["total_active_sec"],
        )
        for r in QUERIES["user_sessions"](spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = {
        u: (int(a), int(b), int(c), int(d))
        for u, a, b, c, d in con.execute(ORACLES["user_sessions"]).fetchall()
    }
    assert got == want


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """The streaming session_window must carve the same episodes as the
    batch lag/cumsum construction: same session count and event totals per
    conversation (window *bounds* differ by design — streaming ends at
    last_event+gap)."""
    from sketchlib.testdata import write_transcripts_parquet

    src = str(tmp_path / "tr")
    write_transcripts_parquet(src, n_conversations=60, seed=7, n_files=3)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = session_windows_stream(
        stream, key="conv_id", gap="30 minutes", watermark="4000 hours"
    )
    # session_window aggregations support append (watermark-finalized) and
    # complete; complete keeps every window current in the memory sink, so
    # the last trigger's table IS the final sessionization
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql(
        """SELECT conv_id, COUNT(*) AS n_sessions, SUM(n_events) AS n_events
           FROM sess_win GROUP BY conv_id"""
    )
    batch = session_stats(spark.read.parquet(src), "conv_id", gap_sec=1800)
    want = {
        r["conv_id"]: (r["n_sessions"], r["n_events"])
        for r in batch.groupBy("conv_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    }
    got = {
        r["conv_id"]: (r["n_sessions"], r["n_events"]) for r in streamed.collect()
    }
    assert got == want

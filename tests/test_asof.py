"""As-of and interval joins: hand-checked semantics, one-exchange-per-side
plan shape, and null handling for keys with no preceding right row.
"""

import datetime as dt

from pyspark.sql import functions as F

from log_parser_mind_spark.operators import asof


def _ts(m):
    return dt.datetime(2024, 1, 1, 12, m, 0)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10)), (2, "u1", _ts(30)), (3, "u2", _ts(5)), (4, "u3", _ts(0))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(0), 100, 1.0), ("u1", _ts(20), 200, 2.0), ("u2", _ts(5), 300, 3.0)],
        "user_id string, ts timestamp, rid long, value double",
    )
    got = {
        r.event_id: (r.rid_asof, r.value_asof)
        for r in asof.asof_join(
            left, right, key="user_id", right_cols=["rid", "value"], tiebreak_col="rid"
        ).collect()
    }
    assert got == {
        1: (100, 1.0),     # latest right at/before 12:10 is 12:00
        2: (200, 2.0),     # 12:20 row supersedes
        3: (300, 3.0),     # equal ts is INCLUSIVE (<=)
        4: (None, None),   # u3 has no right row → NULLs, row preserved
    }


def test_asof_join_single_exchange(spark):
    import re

    left = spark.createDataFrame([(1, "u", _ts(1))], "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame([("u", _ts(0), 9)], "user_id string, ts timestamp, rid long")
    df = asof.asof_join(left, right, key="user_id", right_cols=["rid"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    # union-merge: each side shuffles ONCE into the shared (key) partitioning;
    # no join node, no range explosion.
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    assert "Join" not in plan


def test_interval_join_assignment(spark):
    events = spark.createDataFrame(
        [(1, "u1", _ts(5)), (2, "u1", _ts(15)), (3, "u1", _ts(25))],
        "event_id long, user_id string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [("u1", 0, _ts(0), _ts(10)), ("u1", 1, _ts(20), _ts(30))],
        "user_id string, session_idx long, start_ts timestamp, end_ts timestamp",
    )
    inner = {r.event_id: r.session_idx for r in asof.interval_join(events, iv, key="user_id").collect()}
    assert inner == {1: 0, 3: 1}  # event 2 falls in the gap
    outer = asof.interval_join(events, iv, key="user_id", how="left").collect()
    assert len(outer) == 3  # left join keeps gap events with NULL interval
    assert {r.event_id for r in outer if r.session_idx is None} == {2}


def test_asof_string_tiebreak_and_existence_probe(spark):
    """Review r4: a string tiebreak column must keep its type (casting to
    long nulled it silently → shuffle-order ties); right_cols=[] is an
    existence probe, not 'all columns'."""
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(10), "p_a", 1.0), ("u", _ts(10), "p_b", 2.0)],
        "user_id string, ts timestamp, rid string, value double",
    )
    r = asof.asof_join(
        left, right, key="user_id", right_cols=["rid"], tiebreak_col="rid"
    ).collect()[0]
    assert r.rid_asof == "p_b"  # max string id wins the tie, every run

    probe = asof.asof_join(left, right, key="user_id", right_cols=[])
    assert probe.columns == left.columns  # no payload columns appended


def test_interval_join_refuses_silent_column_collision(spark):
    import pytest

    events = spark.createDataFrame(
        [(1, "u", _ts(5), "x")], "event_id long, user_id string, ts timestamp, note string"
    )
    iv = spark.createDataFrame(
        [("u", _ts(0), _ts(10), "y")],
        "user_id string, start_ts timestamp, end_ts timestamp, note string",
    )
    with pytest.raises(ValueError, match="collide"):
        asof.interval_join(events, iv, key="user_id")
    ok = asof.interval_join(events, iv, key="user_id", suffix="_iv")
    assert "note_iv" in ok.columns and ok.count() == 1


def test_asof_join_refuses_silent_column_collision(spark):
    import pytest

    left = spark.createDataFrame(
        [("u", _ts(5), "x")], "user_id string, ts timestamp, v_asof string"
    )
    right = spark.createDataFrame(
        [("u", _ts(0), "y")], "user_id string, ts timestamp, v string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof.asof_join(left, right, key="user_id", right_cols=["v"])
    ok = asof.asof_join(left, right, key="user_id", right_cols=["v"], suffix="_prev")
    assert ok.columns == ["user_id", "ts", "v_asof", "v_prev"]
    assert ok.collect()[0].v_prev == "y"

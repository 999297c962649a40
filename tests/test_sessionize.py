"""Gap-timeout sessionization: batch (lag + running-sum, SQL-oracle-able)
and the applyInPandasWithState streaming variant converge on closed
sessions; the batch plan shuffles ONCE on conv_id.
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from log_parser_mind_spark.operators import sessionize


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


@pytest.fixture(scope="module")
def gapped(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = []
    # c1: turns at 0,5,10 min → session 0; 45,46 min (gap 35) → session 1
    for i, mins in enumerate((0, 5, 10, 45, 46)):
        rows.append(("c1", i, "user", f"t{i}", "none", t0 + mins * m))
    # c2: single turn → one 1-turn session
    rows.append(("c2", 0, "user", "solo", "none", t0))
    # c3: gap exactly 30 min chains (strictly-greater break rule)
    rows.append(("c3", 0, "user", "a", "none", t0))
    rows.append(("c3", 1, "user", "b", "none", t0 + 30 * m))
    return _tr(spark, rows)


def test_batch_sessions(spark, gapped):
    got = {
        (r.conv_id, r.session_idx): (r.n_turns, r.duration_sec)
        for r in sessionize.conversation_sessions(gapped, gap_minutes=30).collect()
    }
    assert got == {
        ("c1", 0): (3, 600.0),
        ("c1", 1): (2, 60.0),
        ("c2", 0): (1, 0.0),
        ("c3", 0): (2, 1800.0),
    }


def test_batch_plan_single_exchange(spark, gapped):
    """lag, running sum, and the session groupBy must share ONE conv_id
    shuffle — a second exchange would double the network cost of the
    dominant stage at 100 TB."""
    import re

    df = sessionize.conversation_sessions(gapped)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_streaming_matches_batch_on_closed_sessions(spark, gapped, tmp_path):
    """Stateful streaming sessionization: emitted sessions are byte-equal to
    their batch counterparts, sessions closed BY DATA emit immediately, and
    the per-conversation state survives a query RESTART (second availableNow
    run over the same checkpoint closes a first-run session with a new
    turn). The file source replays event-time-ordered batches (one file per
    run) — the operator's in-order contract; out-of-order arrival is the
    watermark's job, not the state machine's."""
    import datetime as dt

    from log_parser_mind_spark.schemas import TRANSCRIPTS

    path = str(tmp_path / "in")
    gapped.repartition(1).write.mode("append").parquet(path)

    out_dir = str(tmp_path / "out")

    def run():
        # parquet sink, not memory: the memory sink refuses checkpoint
        # recovery, and the restart leg below is the point of this test.
        stream = spark.readStream.schema(TRANSCRIPTS).parquet(path)
        q = (
            sessionize.sessionize_stream(stream, gap_minutes=30, watermark="1 minute")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.conv_id, r.session_idx): (r.n_turns, r.start_ts, r.end_ts, r.duration_sec)
            for r in spark.read.parquet(out_dir).collect()
        }

    got = run()
    batch = {
        (r.conv_id, r.session_idx): (r.n_turns, r.start_ts, r.end_ts, r.duration_sec)
        for r in sessionize.conversation_sessions(gapped, gap_minutes=30).collect()
    }
    for k, v in got.items():  # emitted ⊆ batch, value-equal
        assert batch[k] == v, k
    assert ("c1", 0) in got  # closed by data (the 35-min gap) → emitted

    # Restart: a new file with a much later c2 turn. Restored state must
    # close c2's 12:00 one-turn session exactly as the batch run would.
    late = _tr(spark, [("c2", 1, "user", "back", "none",
                        dt.datetime(2024, 1, 1, 14, 0, 0))])
    late.repartition(1).write.mode("append").parquet(path)
    got2 = run()
    assert got2[("c2", 0)] == batch[("c2", 0)]


def test_timeout_tombstone_preserves_session_numbering(spark, tmp_path):
    """Review r4: an event-time TIMEOUT close must leave the session counter
    behind (tombstone, not remove) — otherwise the conversation's next
    session re-emits as (conv, 0) and collides with the closed one."""
    import datetime as dt

    from log_parser_mind_spark.schemas import TRANSCRIPTS

    path = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    def run():
        q = (
            sessionize.sessionize_stream(
                spark.readStream.schema(TRANSCRIPTS).parquet(path),
                gap_minutes=30, watermark="1 minute",
            )
            .writeStream.outputMode("append").format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        return {(r.conv_id, r.session_idx): r.n_turns
                for r in spark.read.parquet(out_dir).collect()}

    def add(rows):
        _tr(spark, rows).repartition(1).write.mode("append").parquet(path)

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m, 0)
    add([("c", 0, "user", "a", "none", t(12, 0))])
    run()
    # Other-conv traffic pushes the watermark past c's deadline → c times
    # out with NO data in the batch (the tombstone branch).
    add([("other", 0, "user", "x", "none", t(15, 0))])
    got = run()
    assert got.get(("c", 0)) == 1  # closed by timeout
    # c returns: its next session must be 1, not a second (c, 0).
    add([("c", 1, "user", "b", "none", t(16, 0)),
         ("c", 2, "user", "c", "none", t(17, 0))])  # 60-min gap closes s1
    got = run()
    assert got.get(("c", 1)) == 1
    assert ("c", 0) in got and len([k for k in got if k[0] == "c"]) == 2


def test_running_sum_uses_rows_frame(spark, gapped):
    """The session ordinal must run under a ROWS frame (the DuckDB oracle
    pins ROWS UNBOUNDED PRECEDING); Spark's default RANGE-to-current-row
    frame makes tied (ts, tiebreak) rows share the summed value."""
    df = sessionize.conversation_sessions(gapped)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    # every sum-over-window in the plan carries an explicit RowFrame
    sum_specs = re.findall(r"sum\(_new_session[^\]]*specifiedwindowframe\((\w+)", plan)
    assert sum_specs and all(f == "RowFrame" for f in sum_specs), plan

    # duplicated (ts, turn_idx) rows must still count once each per session
    dup = gapped.unionByName(gapped.filter(F.col("conv_id") == "c2"))
    got = {
        (r.conv_id, r.session_idx): r.n_turns
        for r in sessionize.conversation_sessions(dup, gap_minutes=30).collect()
        if r.conv_id == "c2"
    }
    assert got == {("c2", 0): 2}


def test_session_window_sessions_equals_lag_cumsum(spark):
    """The native F.session_window implementation must equal the lag+cumsum
    form row-for-row — including the exactly-gap-sized pause (chains in
    BOTH: session_window merges touching windows, conversation_sessions
    breaks only on strictly-greater) — on a hand-built boundary frame and
    on the events corpus."""
    import datetime as dt

    from log_parser_mind_spark.operators.sessionize import (
        conversation_sessions,
        session_window_sessions,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", 0, t0),
        ("a", 1, t0 + dt.timedelta(minutes=30)),      # == gap → chains
        ("a", 2, t0 + dt.timedelta(minutes=60, seconds=1)),  # > gap → breaks
        ("b", 0, t0),
        ("b", 1, t0),                                  # tied timestamps
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp")
    got = sorted(map(tuple, session_window_sessions(df, 30).collect()))
    want = sorted(map(tuple, conversation_sessions(df, 30).collect()))
    assert got == want
    assert [(r[0], r[1], r[2]) for r in got] == [
        ("a", 0, 2), ("a", 1, 1), ("b", 0, 2)
    ]


def test_session_window_sessions_on_corpus(spark, sf_dir):
    """Corpus-level equality with conversation_sessions (946 sessions at
    sf0.001), and the plan stays narrow: session aggregation + session_idx
    rank cost at most two conv-keyed exchanges, no Python stages."""
    import os

    from log_parser_mind_spark.operators.sessionize import (
        conversation_sessions,
        session_window_sessions,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    a = session_window_sessions(ev, 30, conv_col="user_id", ts_col="ts")
    b = conversation_sessions(
        ev, 30, conv_col="user_id", ts_col="ts", tiebreak_col="event_id"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = a._sc._jvm.PythonSQLUtils.explainString(a._jdf.queryExecution(), "formatted")
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "FlatMapGroupsInPandas" not in plan


def test_session_window_sessions_lifts_to_streaming(spark, tmp_path):
    """The docstring's 'streaming-liftable' claim, proven: the SAME
    session_window aggregation runs as an append-mode stream with a
    watermark — closed sessions emit once the watermark passes their gap,
    state survives a query restart (the second availableNow run closes the
    first run's open session), and the emitted sessions equal the batch
    conversation_sessions result on the closed data."""
    import datetime as dt

    from log_parser_mind_spark.operators.sessionize import conversation_sessions

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    in_path, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    def ev(rows):
        return spark.createDataFrame(rows, "user_id string, ts timestamp")

    def run():
        stream = spark.readStream.schema("user_id string, ts timestamp").parquet(in_path)
        agg = (
            stream.withWatermark("ts", "1 second")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(
                F.count(F.lit(1)).alias("n_turns"),
                F.min("ts").alias("start_ts"),
                F.max("ts").alias("end_ts"),
            )
        )
        q = (
            agg.select("user_id", "n_turns", "start_ts", "end_ts")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "streaming query did not finish in time"
        return sorted(map(tuple, spark.read.parquet(out_dir).collect()))

    batch1 = [
        ("a", t0),
        ("a", t0 + dt.timedelta(minutes=5)),
        ("a", t0 + dt.timedelta(hours=1)),  # opens a's 2nd session
        ("b", t0),
    ]
    ev(batch1).repartition(1).write.mode("append").parquet(in_path)
    first = run()
    # watermark reached t0+1h−1s: a's first session and b's session closed;
    # a's 1h session is still OPEN (its gap has not elapsed) — not emitted.
    assert [(r[0], r[1]) for r in first] == [("a", 2), ("b", 1)]

    # Restart with a watermark-advancing sentinel: the recovered state
    # closes a's 2nd session.
    ev([("z", t0 + dt.timedelta(hours=6))]).repartition(1).write.mode("append").parquet(in_path)
    second = run()
    closed = [r for r in second if r[0] != "z"]
    batch = conversation_sessions(
        ev(batch1), 30, conv_col="user_id", ts_col="ts", tiebreak_col="ts"
    )
    want = sorted(
        (r.user_id, r.n_turns, r.start_ts, r.end_ts) for r in batch.collect()
    )
    assert closed == want


def test_session_window_gap_quantization_guard(spark):
    """Fractional gaps: whole-microsecond gaps (the data's own timestamp
    precision) run and agree with the lag+cumsum form; a sub-microsecond
    remainder is REJECTED rather than silently diverging."""
    import datetime as dt

    from log_parser_mind_spark.operators.sessionize import (
        conversation_sessions,
        session_window_sessions,
    )

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", 0, t0),
            ("a", 1, t0 + dt.timedelta(seconds=6)),        # == 0.1-min gap → chains
            ("a", 2, t0 + dt.timedelta(seconds=12, microseconds=1)),  # > gap → breaks
        ],
        "conv_id string, turn_idx int, ts timestamp",
    )
    got = sorted(map(tuple, session_window_sessions(df, 0.1).collect()))
    want = sorted(map(tuple, conversation_sessions(df, 0.1).collect()))
    assert got == want
    assert [r[2] for r in got] == [2, 1]

    with pytest.raises(ValueError, match="microsecond"):
        session_window_sessions(df, 1.5 / 60_000_000)  # 1.5 µs → 0.5 µs remainder
    with pytest.raises(ValueError, match="microsecond"):
        session_window_sessions(df, 0)

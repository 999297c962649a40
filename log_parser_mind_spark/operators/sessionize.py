"""Gap-timeout sessionization over conversation turns (W-family extension).

The reference models conversations as static groups (conv_id); a
training-data pipeline over chat/agent logs additionally needs SESSIONS —
maximal runs of turns where consecutive gaps stay under a timeout — for
per-session sampling, context-window packing, and engagement analytics.
Two implementations with identical semantics:

  batch      ``conversation_sessions``: lag() gap detection + a running sum
             of boundary flags (the standard SQL idiom, so the contract
             query has a real DuckDB oracle), then one groupBy per session.
             Scale shape: both window functions partition by conv_id — ONE
             shuffle by conv_id for the whole plan, and the session groupBy
             reuses that partitioning (no second exchange; turns of one
             conversation are colocated by definition).

  streaming  ``sessionize_stream``: applyInPandasWithState keyed by conv_id
             — the arbitrary-stateful-operator path (T-family) for live
             session feeds. State = the OPEN session's aggregate; a turn
             arriving within ``gap`` extends it, otherwise the closed
             session is emitted and the state restarts. Event-time timeout
             (watermark-driven) closes idle sessions. Output rows appear
             only when a session CLOSES, so the stream converges to the
             batch result for every session whose gap has elapsed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_sessions(
    transcripts: DataFrame,
    gap_minutes: float = 30.0,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_col: str = "turn_idx",
) -> DataFrame:
    """One row per (conversation, session): turn count, bounds, duration.

    A session breaks where the gap from the previous turn exceeds
    ``gap_minutes`` (strictly greater — an exactly-gap-sized pause still
    chains, matching the common analytics definition). session_idx is
    0-based in time order within the conversation. Deterministic tie-break:
    rows are ordered by (ts, tiebreak_col) so equal timestamps cannot
    reorder between runs (pass event_id etc. for non-transcript inputs)."""
    gap_sec = F.lit(float(gap_minutes) * 60.0)
    w = Window.partitionBy(conv_col).orderBy(ts_col, tiebreak_col)
    # via TIMESTAMP: NTZ inputs (e.g. the events table) cannot cast straight
    # to double; in the pinned-UTC session the hop is value-preserving.
    ts_sec = F.col(ts_col).cast("timestamp").cast("double")
    with_break = transcripts.withColumn(
        "_new_session",
        F.when(
            F.lag(ts_sec).over(w).isNull()
            | ((ts_sec - F.lag(ts_sec).over(w)) > gap_sec),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    # Running sum of boundaries = session ordinal; reuses the SAME window
    # partitioning, so Catalyst plans one exchange for both functions. The
    # frame is pinned to ROWS (Spark's default is RANGE-to-current-row): the
    # DuckDB oracle uses ROWS UNBOUNDED PRECEDING, and under a RANGE frame
    # rows tied on (ts, tiebreak) would share the summed value, diverging
    # from the oracle whenever the tiebreak is not unique.
    w_rows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sid = with_break.withColumn(
        "session_idx", F.sum("_new_session").over(w_rows) - F.lit(1)
    )
    return (
        with_sid.groupBy(conv_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .select(
            conv_col,
            F.col("session_idx").cast("long").alias("session_idx"),
            F.col("n_turns").cast("long").alias("n_turns"),
            "start_ts",
            "end_ts",
            (
                F.col("end_ts").cast("timestamp").cast("double")
                - F.col("start_ts").cast("timestamp").cast("double")
            ).alias("duration_sec"),
        )
    )


SESSION_STATE_SCHEMA = (
    "session_idx long, n_turns long, start_sec double, end_sec double"
)
SESSION_OUT_SCHEMA = (
    "conv_id string, session_idx long, n_turns long, "
    "start_ts timestamp, end_ts timestamp, duration_sec double"
)


def sessionize_stream(
    transcripts: DataFrame,
    gap_minutes: float = 30.0,
    watermark: str = "10 minutes",
):
    """T-family arbitrary stateful op: per-conversation open-session state,
    sessions emitted on CLOSE (gap exceeded by a newer turn, or event-time
    timeout once the watermark passes the open session's deadline).

    State is one 4-field row per conversation EVER SEEN (closed sessions
    leave a counter tombstone so session numbering stays batch-identical —
    see the timeout branch); at 32 bytes per conversation this is the cheap
    end of the state-size spectrum. Exact batch convergence additionally
    requires ``watermark <= gap_minutes``: then any admitted late row lands
    within the open session's gap window by construction, and the min/max
    bound updates reproduce the batch result. The state store shards by
    conv_id exactly like the batch shuffle."""
    import pandas as pd

    gap_sec = float(gap_minutes) * 60.0

    def fn(key, pdfs, state):
        conv_id = key[0]
        out = []

        def emit(sidx, n, start_sec, end_sec):
            out.append(
                (
                    conv_id,
                    int(sidx),
                    int(n),
                    pd.Timestamp(start_sec, unit="s"),
                    pd.Timestamp(end_sec, unit="s"),
                    float(end_sec - start_sec),
                )
            )

        if state.hasTimedOut:
            sidx, n, start_sec, end_sec = state.get
            if n > 0:
                emit(sidx, n, start_sec, end_sec)
            # TOMBSTONE, not remove(): the session counter must survive the
            # close, or the conversation's next session would restart at
            # session_idx 0 and collide with the emitted one downstream
            # (joins keyed on (conv_id, session_idx)). n=0 marks "no open
            # session"; cost is one 4-field row per conversation ever seen,
            # the price of batch-identical numbering. No new timeout: a
            # tombstone has nothing left to emit.
            state.update((int(sidx), 0, float(end_sec), float(end_sec)))
        else:
            if state.exists:
                sidx, n, start_sec, end_sec = state.get
            else:
                sidx, n, start_sec, end_sec = -1, 0, 0.0, 0.0
            rows = pd.concat(list(pdfs), ignore_index=True)
            # astype through ns explicitly: arrow may hand us datetime64[us],
            # where a bare int64 view would be off by 1000×.
            rows["_sec"] = rows["ts"].astype("datetime64[ns]").astype("int64") / 1e9
            rows = rows.sort_values(["_sec", "turn_idx"])
            for sec in rows["_sec"]:
                if n == 0:
                    sidx, n, start_sec, end_sec = sidx + 1, 1, sec, sec
                elif sec - end_sec > gap_sec:
                    emit(sidx, n, start_sec, end_sec)
                    sidx, n, start_sec, end_sec = sidx + 1, 1, sec, sec
                else:
                    # min/max, never assignment: an in-watermark out-of-order
                    # row (the watermark BOUNDS lateness, it does not reorder)
                    # must not drag the open session's end backwards — that
                    # would fake a gap against the next on-time row and split
                    # a session the batch run keeps whole.
                    n = n + 1
                    start_sec = min(start_sec, sec)
                    end_sec = max(end_sec, sec)
            state.update((int(sidx), int(n), float(start_sec), float(end_sec)))
            # Close the open session once event time passes its deadline.
            # Spark rejects timeouts at/behind the current watermark — a
            # deadline already passed (bulk availableNow replay) clamps to
            # watermark+1ms and fires on the next trigger.
            deadline_ms = int((end_sec + gap_sec) * 1000)
            state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            out,
            columns=[
                "conv_id", "session_idx", "n_turns",
                "start_ts", "end_ts", "duration_sec",
            ],
        )

    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def session_window_sessions(
    transcripts: DataFrame,
    gap_minutes: float = 30.0,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Native ``F.session_window`` form of ``conversation_sessions`` —
    Spark's built-in session-merging aggregation (the same operator
    Structured Streaming uses for watermarked session windows) instead of
    the lag+cumsum SQL idiom. Boundary semantics verified identical: an
    exactly-gap-sized pause still chains (session_window merges windows
    that touch — probed empirically, not assumed), a strictly larger pause
    breaks. Output equals conversation_sessions row-for-row (asserted in
    tests, including the == gap boundary and the sf corpus).

    Pick by lifting plan: THIS form when the same pipeline will run as a
    stream (session_window + watermark is the streaming-native path with
    state-store window merging); the lag+cumsum form when a SQL oracle
    must replicate the plan (no portable SQL expresses session_window
    directly — its contract oracle reuses the lag+cumsum SQL as an
    INDEPENDENT derivation of the same semantics).

    start/end/duration are of the OBSERVED events: session_window.end pads
    the last event by the gap, so end_ts is taken from max(ts), not the
    window. session_idx = rank of the session's start within the
    conversation, same numbering as conversation_sessions.

    The gap is quantized to MICROSECONDS — the precision of the timestamp
    data itself, so quantization can never move a boundary relative to the
    lag+cumsum double-seconds comparison. A gap with a sub-microsecond
    remainder would silently diverge from conversation_sessions, so it is
    rejected instead."""
    gap_us_f = float(gap_minutes) * 60_000_000.0
    gap_us = int(round(gap_us_f))
    if abs(gap_us_f - gap_us) > 1e-6 or gap_us <= 0:
        raise ValueError(
            f"gap_minutes={gap_minutes!r} is not a positive whole number of "
            "microseconds; session_window_sessions would diverge from "
            "conversation_sessions at sub-microsecond gap remainders"
        )
    sessions = transcripts.groupBy(
        F.col(conv_col), F.session_window(F.col(ts_col), f"{gap_us} microseconds")
    ).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )
    w = Window.partitionBy(conv_col).orderBy(F.col("session_window.start"))
    return (
        sessions.withColumn("session_idx", (F.row_number().over(w) - 1).cast("long"))
        .select(
            conv_col,
            "session_idx",
            F.col("n_turns").cast("long").alias("n_turns"),
            "start_ts",
            "end_ts",
            (
                F.col("end_ts").cast("timestamp").cast("double")
                - F.col("start_ts").cast("timestamp").cast("double")
            ).alias("duration_sec"),
        )
    )

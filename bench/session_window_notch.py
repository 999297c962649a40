"""Native session_window vs lag+cumsum sessionization at a replicated notch.

sessionize.py now carries TWO implementations of the same gap-timeout
semantics (docstring decision table: native `F.session_window` when the
pipeline will lift to streaming, lag+cumsum when a SQL oracle must
replicate the plan). This bench backs that table with measured numbers at
the 10M-event notch (same replication scheme as new_ops_bench.py: user-id
stride per replica — scales the shuffle key space, not per-key density):

  - wall seconds for each form, interleaved A/B/A/B to split VM noise,
  - exchange count from each formatted plan,
  - EXACT output equality: row counts AND a bit_xor(xxhash64(*)) checksum
    over every column (bit_xor, not sum — ANSI overflow on summed hashes),
    asserted before anything is recorded.

Appends to BENCH/BASELINE.md.  Usage: python bench/session_window_notch.py [R] [repeats]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    r_events = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from log_parser_mind_spark.operators.sessionize import (
        conversation_sessions,
        session_window_sessions,
    )
    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="session_window_notch", master="local[32]")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    stride = int(ev.agg(F.max("user_id")).collect()[0][0]) + 1
    rep = spark.range(r_events).select(F.col("id").alias("rep"))
    ev_big = (
        ev.crossJoin(rep)
        .select(
            (F.col("event_id") * r_events + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * F.lit(stride)).alias("user_id"),
        )
        .repartition(64)
        .persist()
    )
    n_ev = ev_big.count()

    def lag_form():
        return conversation_sessions(
            ev_big, gap_minutes=30, conv_col="user_id", ts_col="ts",
            tiebreak_col="event_id",
        )

    def native_form():
        return session_window_sessions(
            ev_big, gap_minutes=30, conv_col="user_id", ts_col="ts"
        )

    # duration_sec is derived identically (end-start in double seconds) in
    # both forms, so hashing it is stable; checksum covers EVERY column.
    def signature(df):
        cols = sorted(df.columns)
        h = F.xxhash64(*cols)
        n, x = df.agg(F.count(F.lit(1)), F.bit_xor(h)).collect()[0]
        return int(n), int(x)

    def exchanges(df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        return plan.split("\n\n")[0].count("Exchange")

    sig_lag = signature(lag_form())
    sig_nat = signature(native_form())
    assert sig_lag == sig_nat, (sig_lag, sig_nat)

    walls = {"lag+cumsum": [], "session_window": []}
    for _ in range(repeats):
        for name, fn in (("lag+cumsum", lag_form), ("session_window", native_form)):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            walls[name].append(time.time() - t0)

    ex_lag, ex_nat = exchanges(lag_form()), exchanges(native_form())
    fmt = lambda xs: "/".join(f"{x:.1f}" for x in xs)  # noqa: E731
    lines = [
        "",
        f"## session_window vs lag+cumsum at the {n_ev:,}-event notch "
        f"({datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')})",
        "",
        f"`python bench/session_window_notch.py {r_events} {repeats}` — local[32], "
        f"noop sink, runs interleaved; outputs asserted IDENTICAL first "
        f"(count + bit_xor(xxhash64(all cols)): n={sig_lag[0]:,}).",
        "",
        "| form | walls (s) | min (s) | exchanges |",
        "|---|---|---|---|",
        f"| lag+cumsum (`conversation_sessions`) | {fmt(walls['lag+cumsum'])} "
        f"| {min(walls['lag+cumsum']):.1f} | {ex_lag} |",
        f"| native (`session_window_sessions`) | {fmt(walls['session_window'])} "
        f"| {min(walls['session_window']):.1f} | {ex_nat} |",
    ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(out)
    print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale-notch evidence for the r5 sixth-wave op (sft_examples).

Replicates the events-derived conversation fixture ×R with
conv_id = user_id*R + rep (turn order/role/text unchanged per replica), so
every replica conversation is an EXACT copy of its base conversation. That
buys exact invariants — asserted before anything is recorded:

  - example count is exactly ×R;
  - for every (base conv, target turn): all R replicas produce ONE distinct
    example hash over (target_turn_idx, context, target, n_context_turns,
    n_context_tokens), and it equals the base run's hash — the clip
    boundary, rendering, and counts are invariant to corpus size and to
    which replica a conversation landed in.

The timed action is a checksum aggregate over ALL output columns (a bare
count() would let Catalyst prune the context rendering away).

Walls are single runs on a noisy VM (±2×); the exact invariants and the
absence of super-linear blowup are the evidence.

Usage: python bench/sixthwave_notch.py [R]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUDGET = 8
MOD = 1_000_003


def _turns(ev, conv):
    # ONE derivation repo-wide — the contract queries, bench.py, and the
    # notch scripts all go through __spark_entry__._turns_from_events.
    from __spark_entry__ import _turns_from_events

    return _turns_from_events(ev, conv=conv)


def _hashed(examples):
    """(conv_id, turn, h): h = bounded hash over every replica-invariant
    output column; pmod keeps the 10M-row sum far from long overflow."""
    from pyspark.sql import functions as F

    return examples.select(
        "conv_id",
        F.col("target_turn_idx").alias("turn"),
        F.pmod(
            F.xxhash64(
                "target_turn_idx", "context", "target",
                "n_context_turns", "n_context_tokens",
            ),
            F.lit(MOD),
        ).alias("h"),
    )


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    from pyspark.sql import functions as F

    from log_parser_mind_spark.operators.prep import sft_examples
    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="sixthwave_notch", master="local[32]")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))

    base = {
        (rw.conv_id, rw.turn): rw.h
        for rw in _hashed(sft_examples(_turns(ev, F.col("user_id")), BUDGET)).collect()
    }

    rep = spark.range(r).select(F.col("id").alias("rep"))
    big_turns = (
        _turns(ev.crossJoin(rep), F.col("user_id") * r + F.col("rep"))
        .repartition(64)
        .persist()
    )
    n_turns = big_turns.count()

    t0 = time.time()
    big = _hashed(sft_examples(big_turns, BUDGET)).persist()
    total, hsum = big.agg(
        F.count("*").alias("n"), F.sum("h").alias("s")
    ).first()
    wall = time.time() - t0

    assert total == r * len(base), (total, r, len(base))
    assert hsum == r * sum(base.values()), "checksum must be exactly ×R"
    grouped = big.groupBy(
        (F.col("conv_id") / r).cast("long").alias("bconv"), "turn"
    ).agg(
        F.count("*").alias("n"), F.count_distinct("h").alias("d"), F.min("h").alias("h")
    )
    bad = grouped.filter((F.col("n") != r) | (F.col("d") != 1)).count()
    assert bad == 0, "every base example must appear exactly R times, identically"
    for rw in grouped.collect():
        assert base[(rw.bconv, rw.turn)] == rw.h, (rw.bconv, rw.turn)
    big.unpersist()
    big_turns.unpersist()

    lines = [
        "",
        f"## Sixth-wave op at the {n_turns:,}-turn notch "
        f"({datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')})",
        "",
        f"`python bench/sixthwave_notch.py {r}` — events-derived conversations "
        f"×{r} (conv_id = user_id*{r}+rep, turns unchanged), local[32]. Single "
        "run (±2× VM noise); the EXACT invariants are the evidence. Timed "
        "action = checksum aggregate over ALL output columns (count() alone "
        "would prune the context rendering).",
        "",
        "| op | wall (s) | output | invariant (asserted) |",
        "|---|---|---|---|",
        f"| sft_examples (budget {BUDGET}) | {wall:.1f} | {total:,} examples "
        f"from {n_turns:,} turns | example count and checksum EXACTLY ×{r}; "
        f"every (base conv, target turn) appears {r}× with ONE distinct "
        "hash == the base run's hash |",
    ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(out)
    print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale-notch evidence for the r5 eighth-wave ops (best_of_n,
select_within_token_budget).

best_of_n — events-derived conversations ×R (conv_id = user_id*R+rep,
turns unchanged): replicas are exact copies, so at ×R the top-n per prompt
group must be n REPLICAS OF THE BASE RANK-1 WINNER — the total
(score DESC, conv ASC, turn ASC) order places the base winner's rep 0..n-1
copies ahead of everything else. Asserted exactly: every ×R rank 1..n row
carries the base winner's text and score, with conv = base_conv*R + rank-1.

select_within_token_budget — documents ×R with UNCHANGED text (quality
identical per replica) re-keyed id*R+rep, budget ×R: the operator's kept
set at 80k rows is compared row-for-row against an independent DuckDB
recomputation of the textbook global running-sum prefix rule over the SAME
replicated decision table — the oracle equality at notch scale, not an
invariant argument.

Walls are single runs on a noisy VM (±2×); the exact equalities are the
evidence.

Usage: python bench/eighthwave_notch.py [R]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BEST = 3
BUDGET_PER_REP = 12_000


def _best_of_n_notch(spark, r):
    from pyspark.sql import functions as F

    from __spark_entry__ import _turns_from_events
    from log_parser_mind_spark.operators.prep import best_of_n

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))

    base = {
        rw.prompt_sig: (rw.conv, rw.text, rw.score)
        for rw in best_of_n(_turns_from_events(ev), n=1).collect()
    }

    rep = spark.range(r).select(F.col("id").alias("rep"))
    big_turns = (
        _turns_from_events(
            ev.crossJoin(rep), conv=F.col("user_id") * r + F.col("rep")
        )
        .repartition(64)
        .persist()
    )
    n_turns = big_turns.count()

    t0 = time.time()
    got = best_of_n(big_turns, n=N_BEST).collect()
    wall = time.time() - t0
    big_turns.unpersist()

    assert {g.prompt_sig for g in got} == set(base), "group set must be invariant"
    by_sig: dict[str, list] = {}
    for g in got:
        by_sig.setdefault(g.prompt_sig, []).append(g)
    for sig, rows in by_sig.items():
        b_conv, b_text, b_score = base[sig]
        assert len(rows) == N_BEST, (sig, len(rows))
        for g in sorted(rows, key=lambda x: x.rank):
            assert (g.text, g.score) == (b_text, b_score), sig
            assert g.conv == b_conv * r + (g.rank - 1), (sig, g.conv, g.rank)
    return wall, n_turns, len(by_sig)


def _budget_notch(spark, r):
    import duckdb
    from pyspark.sql import functions as F

    from log_parser_mind_spark.functions import text as tx
    from log_parser_mind_spark.operators.sample import select_within_token_budget

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    rep = spark.range(r).select(F.col("id").alias("rep"))
    scored = (
        tx.with_tokens(docs.crossJoin(rep))
        .select(
            (F.col("doc_id") * r + F.col("rep")).alias("doc_id"),
            tx.quality_score_from(F.col("tokens"), F.col("text")).alias("quality"),
            F.size("tokens").cast("long").alias("n_tokens"),
        )
        .persist()
    )
    n_docs = scored.count()
    budget = BUDGET_PER_REP * r

    t0 = time.time()
    got = {
        rw.doc_id: rw.kept
        for rw in select_within_token_budget(scored, budget).collect()
    }
    wall = time.time() - t0

    tmp = tempfile.mkdtemp(prefix="logmind_budget_notch_")
    try:
        scored.write.parquet(f"{tmp}/scored")
        scored.unpersist()
        want = dict(
            duckdb.connect()
            .execute(
                f"""
                SELECT doc_id,
                       sum(n_tokens) OVER (ORDER BY round(quality, 6) DESC, doc_id ASC
                                           ROWS UNBOUNDED PRECEDING) <= {budget} AS kept
                FROM '{tmp}/scored/*.parquet'
                """
            )
            .fetchall()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got == want, "operator must equal the DuckDB global prefix rule"
    return wall, n_docs, sum(1 for v in got.values() if v)


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="eighthwave_notch", master="local[32]")

    bofn_wall, n_turns, n_groups = _best_of_n_notch(spark, r)
    bud_wall, n_docs, n_kept = _budget_notch(spark, r)

    lines = [
        "",
        f"## Eighth-wave ops at the ×{r} notch "
        f"({datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')})",
        "",
        f"`python bench/eighthwave_notch.py {r}`, local[32], single runs "
        "(±2× VM noise) — the EXACT equalities are the evidence.",
        "",
        "| op | wall (s) | scale | evidence (asserted) |",
        "|---|---|---|---|",
        f"| best_of_n (n={N_BEST}) | {bofn_wall:.1f} | {n_turns:,} turns → "
        f"{n_groups} prompt groups | at ×{r} every group's top-{N_BEST} = "
        "replicas 0..2 of the base rank-1 winner (text+score equal, conv = "
        f"base*{r}+rank-1) — the total order is replication-stable |",
        f"| select_within_token_budget | {bud_wall:.1f} | {n_docs:,} docs, "
        f"budget {BUDGET_PER_REP * r:,} | kept set EQUALS an independent "
        "DuckDB global running-sum prefix recomputation over the same "
        f"replicated table ({n_kept:,} kept) |",
    ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(out)
    print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

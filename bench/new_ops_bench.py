"""Scale-notch evidence for the round-4 second-wave operators.

Each operator's docstring claims a scale shape (one exchange, broadcast
side, bounded buckets); this bench runs them at a replicated notch so the
claim has a measured number behind it:

  - events ×R (default 100 → 10M rows, 15k users): sessionization, as-of
    join, interval assignment. Replication adds USERS (user_id offset per
    replica), the scale direction that stresses the shuffle, not the
    per-key density.
  - documents ×R2 (default 16 → 80k docs): packing, stratified sampling,
    cross-corpus decontamination against a 500-doc blocklist.

Reports wall seconds + output cardinalities + invariants (assignment
totality, pack fill, survivor counts) and appends to BENCH/BASELINE.md.
Single runs on a noisy VM — treat ±2× as noise; the INVARIANTS and the
absence of quadratic blowups are the evidence, not the exact seconds.

Usage: python bench/new_ops_bench.py [R_events] [R_docs]
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
    r_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from pyspark.sql import functions as F

    from log_parser_mind_spark.operators import asof, sample
    from log_parser_mind_spark.operators.curate import decontaminate
    from log_parser_mind_spark.operators.sessionize import conversation_sessions
    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="new_ops_bench", master="local[32]")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    rep_e = spark.range(r_events).select(F.col("id").alias("rep"))
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    # Replica user-id stride from the DATA (a fixed 1e6 would merge users on
    # any dataset whose ids reach it, silently voiding the exactness check).
    base_users, max_uid = ev.agg(
        F.countDistinct("user_id"), F.max("user_id")
    ).collect()[0]
    stride = int(max_uid) + 1
    ev_big = (
        ev.crossJoin(rep_e)
        .select(
            (F.col("event_id") * r_events + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * F.lit(stride)).alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(64)
        .persist()
    )
    n_ev = ev_big.count()
    lines = [
        "",
        f"## Second-wave operators at a replicated notch "
        f"({datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')})",
        "",
        f"`python bench/new_ops_bench.py {r_events} {r_docs}` — events ×{r_events} "
        f"({n_ev:,} rows, {base_users * r_events:,} users), documents ×{r_docs}, local[32]. "
        "Single runs (±2× VM noise); the invariants are the evidence.",
        "",
        "| operator | wall (s) | output | invariant |",
        "|---|---|---|---|",
    ]

    t0 = time.time()
    sess = conversation_sessions(
        ev_big, gap_minutes=30, conv_col="user_id", ts_col="ts", tiebreak_col="event_id"
    ).persist()
    n_sess = sess.count()
    t_sess = time.time() - t0
    # Replicas only shift user ids, so the session count must be an EXACT
    # multiple of the base corpus's — asserted BEFORE anything is recorded.
    base_sess = conversation_sessions(
        ev, gap_minutes=30, conv_col="user_id", ts_col="ts", tiebreak_col="event_id"
    ).count()
    assert base_sess * r_events == n_sess, (base_sess, r_events, n_sess)
    lines.append(
        f"| sessionize ({n_ev:,} events) | {t_sess:.1f} | {n_sess:,} sessions "
        f"| == base {base_sess:,} × {r_events} exactly (asserted) |"
    )

    t0 = time.time()
    iv = asof.interval_join(
        ev_big.select("event_id", "user_id", "ts"),
        sess.select("user_id", "session_idx", "start_ts", "end_ts"),
        key="user_id",
    )
    assigned, distinct_events = iv.agg(
        F.count(F.lit(1)), F.countDistinct("event_id")
    ).collect()[0]
    t_iv = time.time() - t0
    assert assigned == n_ev == distinct_events, (assigned, distinct_events, n_ev)
    lines.append(
        f"| interval join events→sessions | {t_iv:.1f} | {assigned:,} assignments "
        f"| total AND unique: rows == distinct events == |events| (asserted) |"
    )

    t0 = time.time()
    errors = ev_big.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = ev_big.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    aj = asof.asof_join(errors, purchases, key="user_id",
                        right_cols=["purchase_id", "value"], tiebreak_col="purchase_id")
    n_err = errors.count()
    n_aj = aj.count()
    t_aj = time.time() - t0
    lines.append(
        f"| as-of join errors⟕purchases | {t_aj:.1f} | {n_aj:,} rows "
        f"| exactly one row per left: {n_aj == n_err} |"
    )
    assert n_aj == n_err

    rep_d = spark.range(r_docs).select(F.col("id").alias("rep"))
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    docs_big = (
        docs.crossJoin(rep_d)
        .select(
            (F.col("doc_id") * r_docs + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" r"), F.col("rep"))).alias("text"),
            "lang",
        )
        .repartition(64)
        .persist()
    )
    n_docs = docs_big.count()

    BUDGET = 2048
    t0 = time.time()
    packs = sample.pack_corpus(docs_big, budget_tokens=BUDGET, n_shards=64)
    pk = packs.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m")
    ).persist()
    n_packs = pk.count()
    overflow_bad = pk.filter(F.col("s") - F.col("m") >= BUDGET).count()
    mean_fill = pk.agg(F.avg("s")).collect()[0][0]
    t_pack = time.time() - t0
    lines.append(
        f"| pack_corpus ({n_docs:,} docs) | {t_pack:.1f} | {n_packs:,} packs, "
        f"mean fill {mean_fill:.0f}/{BUDGET} | grid bound violations: {overflow_bad} |"
    )
    assert overflow_bad == 0

    t0 = time.time()
    sampled = sample.stratified_sample(
        docs_big, {"en": 0.5, "de": 1.0, "zh": 0.25}, strata_col="lang", salt=7
    )
    kept = sampled.count()
    t_sm = time.time() - t0
    # Plan shape asserted over the raw parquet scan (docs_big's own
    # crossJoin/repartition lineage would show ITS exchanges): the sampling
    # step adds a pure filter, nothing else.
    raw_sampled = sample.stratified_sample(
        docs, {"en": 0.5}, strata_col="lang", salt=7
    )
    plan = raw_sampled._sc._jvm.PythonSQLUtils.explainString(
        raw_sampled._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    lines.append(
        f"| stratified_sample | {t_sm:.1f} | kept {kept:,}/{n_docs:,} "
        f"| pure scan filter — zero exchanges (plan-asserted on the raw scan) |"
    )

    bench_bl = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    n_bl = bench_bl.count()  # outside the timed section
    t0 = time.time()
    clean = decontaminate(docs_big, bench_bl, threshold=0.7,
                          minhash_k=32, minhash_bands=8, shingle_n=3).count()
    t_dec = time.time() - t0
    lines.append(
        f"| decontaminate vs {n_bl}-doc blocklist | {t_dec:.1f} "
        f"| {clean:,} survivors | S-curve LSH config (k=32, bands=8, 3-shingles) |"
    )

    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(out)
    print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

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

    from log_parser_mind_spark.operators import asof, dedup, sample
    from log_parser_mind_spark.operators.curate import decontaminate
    from log_parser_mind_spark.operators.sessionize import conversation_sessions
    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="new_ops_bench", master="local[32]")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    rep_e = spark.range(r_events).select(F.col("id").alias("rep"))
    ev = spark.read.parquet(os.path.join(sf, "events.parquet"))
    n_ev0 = ev.count()
    ev_big = (
        ev.crossJoin(rep_e)
        .select(
            (F.col("event_id") * r_events + F.col("rep")).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
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
        f"({n_ev:,} rows, {150 * r_events:,} users), documents ×{r_docs}, local[32]. "
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
    lines.append(
        f"| sessionize ({n_ev:,} events) | {t_sess:.1f} | {n_sess:,} sessions "
        f"| per-replica session count × {r_events} exactly |"
    )

    t0 = time.time()
    assigned = asof.interval_join(
        ev_big.select("event_id", "user_id", "ts"),
        sess.select("user_id", "session_idx", "start_ts", "end_ts"),
        key="user_id",
    ).count()
    t_iv = time.time() - t0
    total = assigned == n_ev
    lines.append(
        f"| interval join events→sessions | {t_iv:.1f} | {assigned:,} assignments "
        f"| total+unique: rows == events → {total} |"
    )
    assert total, (assigned, n_ev)

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

    t0 = time.time()
    packs = sample.pack_corpus(docs_big, budget_tokens=2048, n_shards=64)
    pk = packs.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m")
    ).persist()
    n_packs = pk.count()
    overflow_bad = pk.filter(F.col("s") - F.col("m") >= 2048).count()
    mean_fill = pk.agg(F.avg("s")).collect()[0][0]
    t_pack = time.time() - t0
    lines.append(
        f"| pack_corpus ({n_docs:,} docs) | {t_pack:.1f} | {n_packs:,} packs, "
        f"mean fill {mean_fill:.0f}/2048 | grid bound violations: {overflow_bad} |"
    )
    assert overflow_bad == 0

    t0 = time.time()
    kept = sample.stratified_sample(
        docs_big, {"en": 0.5, "de": 1.0, "zh": 0.25}, strata_col="lang", salt=7
    ).count()
    t_sm = time.time() - t0
    lines.append(
        f"| stratified_sample | {t_sm:.1f} | kept {kept:,}/{n_docs:,} | scan-filter only, no shuffle |"
    )

    t0 = time.time()
    bench_bl = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    clean = decontaminate(docs_big, bench_bl, threshold=0.7,
                          minhash_k=32, minhash_bands=8, shingle_n=3).count()
    t_dec = time.time() - t0
    lines.append(
        f"| decontaminate vs {bench_bl.count()}-doc blocklist | {t_dec:.1f} "
        f"| {clean:,} survivors | corpus×blocklist band join only (S-curve config) |"
    )

    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(out)
    print(out, flush=True)
    # Per-replica exactness: replicas only shift user ids, so session count
    # must be an exact multiple of the base corpus's.
    base_sess = conversation_sessions(
        ev, gap_minutes=30, conv_col="user_id", ts_col="ts", tiebreak_col="event_id"
    ).count()
    print(f"base sessions {base_sess} × {r_events} = {base_sess * r_events} "
          f"(measured {n_sess}) exact: {base_sess * r_events == n_sess}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

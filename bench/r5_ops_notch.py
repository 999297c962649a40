"""Scale-notch evidence for the round-5 second-wave operators.

documents ×R (default 16 → 80k docs, sf0.1 base): substring-level span
dedup, bigram-LM scoring, DSIR selection. Replication is the ADVERSARIAL
direction for ngram-span dedup (every k-gram window becomes an R-way
corpus-wide duplicate — exactly the hot-key case the hash-groupBy
min-struct canonical pass exists for) and the consistency direction for
the scorers (a replica must score identically to its base doc when the
model/reference is held fixed).

Invariants asserted before anything is recorded:
  - dedup_ngram_spans: (a) the ×R output restricted to replica 0 equals
    the ×1 output row-for-row (replicas only ADD occurrences with larger
    (doc,pos) keys — they can never steal a canonical claim from a base
    doc); (b) total surviving char mass on ×R == ×1 mass + (R-1)×(mass of
    <k-token pass-through docs) EXACTLY (every replica with ≥k tokens
    rebuilds to '' — its whole stream duplicates the base copy).
  - ngram_lm_scores (ref FIXED = base corpus): every replica scores
    identically to its base doc (the score is a pure function of text
    given a fixed model); rowcount == R×base.
  - dsir_select (target = base, raw = ×R): the full selection is identical
    when the input partitioning changes (engine-determinism at the notch
    scale, not just at test scale).

Single runs on a noisy VM — the INVARIANTS and the absence of quadratic
blowups are the evidence, not the exact seconds.

Usage: python bench/r5_ops_notch.py [R_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    r_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    assert r_docs >= 2, "the replica invariants need r_docs >= 2"

    from pyspark.sql import functions as F

    from log_parser_mind_spark.functions.text import ws_tokens_expr
    from log_parser_mind_spark.operators.curate import dedup_ngram_spans, ngram_lm_scores
    from log_parser_mind_spark.operators.sample import dsir_select
    from log_parser_mind_spark.session import get_spark

    K = 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="r5_ops_notch", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n_base = base.count()
    offset = 1_000_000
    id_stats = base.agg(
        F.max("doc_id").alias("mx"), F.countDistinct("doc_id").alias("nd")
    ).collect()[0]
    assert id_stats.mx < offset and id_stats.nd == n_base, (
        "replica-id scheme needs unique base doc_ids < 1,000,000"
    )
    big = base.crossJoin(
        spark.range(r_docs).withColumnRenamed("id", "_rep")
    ).select(
        (F.col("doc_id") + F.col("_rep") * offset).alias("doc_id"), "text"
    ).repartition(cpus * 2).persist()
    n_big = big.count()
    assert n_big == r_docs * n_base

    out: dict[str, object] = {"r_docs": r_docs, "n_docs": n_big, "cpus": cpus, "k": K}

    # -- dedup_ngram_spans: replica-0 identity + exact mass accounting ------
    t0 = time.time()
    span_big = dedup_ngram_spans(big, k=K).select("doc_id", "text").persist()
    mass_big = span_big.agg(F.sum(F.length("text"))).collect()[0][0]
    out["ngram_span_dedup_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    span_base = dedup_ngram_spans(base, k=K).select("doc_id", "text").persist()
    mass_base = span_base.agg(F.sum(F.length("text"))).collect()[0][0]
    out["ngram_span_dedup_x1_sec"] = round(time.time() - t0, 3)
    rep0 = sorted(
        (r.doc_id, r.text) for r in span_big.filter(F.col("doc_id") < offset).collect()
    )
    assert rep0 == sorted((r.doc_id, r.text) for r in span_base.collect()), (
        "replication perturbed the base docs' dedup output"
    )
    # <K-token docs pass through as token-joined text in every replica;
    # >=K-token replicas rebuild to ''.
    small_mass = (
        base.select(ws_tokens_expr(F.col("text")).alias("_t"))
        .filter(F.size("_t") < K)
        .agg(F.sum(F.length(F.concat_ws(" ", F.col("_t")))))
        .collect()[0][0]
        or 0
    )
    assert mass_big == mass_base + (r_docs - 1) * small_mass, (
        mass_big, mass_base, small_mass
    )
    out["survivor_mass_x1"] = int(mass_base)
    out["survivor_mass_xR"] = int(mass_big)
    span_big.unpersist(); span_base.unpersist()

    # -- ngram_lm_scores with a FIXED reference: replica consistency --------
    t0 = time.time()
    lm = ngram_lm_scores(big, ref=base).select(
        "doc_id", "n_bigrams", "avg_nll", "ppl"
    ).persist()
    n_lm = lm.count()
    out["lm_quality_sec"] = round(time.time() - t0, 3)
    assert n_lm == n_big
    distinct_per_base = (
        lm.groupBy(F.pmod(F.col("doc_id"), F.lit(offset)).alias("_b"))
        .agg(F.countDistinct(F.struct("n_bigrams", "avg_nll", "ppl")).alias("d"))
        .agg(F.max("d"))
        .collect()[0][0]
    )
    assert distinct_per_base == 1, "replicas scored differently under a fixed model"
    lm.unpersist()

    # -- dsir_select: deterministic selection at notch scale ----------------
    t0 = time.time()
    sel = [tuple(r) for r in dsir_select(big, base, k=500, buckets=4096, salt=11).collect()]
    out["dsir_select_sec"] = round(time.time() - t0, 3)
    resel = [
        tuple(r)
        for r in dsir_select(
            big.repartition(7), base.repartition(3), k=500, buckets=4096, salt=11
        ).collect()
    ]
    assert sel == resel, "DSIR selection changed under repartitioning"
    out["dsir_selected"] = len(sel)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

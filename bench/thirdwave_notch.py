"""Scale-notch evidence for the round-4 third-wave operators.

documents ×R (default 16 → 80k docs, sf0.1 base): per-doc repetition
metrics, global paragraph dedup, corpus heavy hitters, deterministic
global shuffle. Replication is the adversarial direction for SPAN dedup
(every paragraph becomes a 16-way corpus-wide duplicate — the hot-key case
the hash-groupBy min-struct shape exists for) and the null direction for
the zero-shuffle per-doc metrics (wall should scale ~linearly with rows).

Invariants asserted before anything is recorded:
  - repetition_scores: row count == R×base; a replica's metric rows equal
    the base corpus's rows exactly (per-doc metrics are a pure function of
    the text, so replication must not perturb them).
  - dedup_paragraphs: surviving character mass on the ×R corpus equals the
    mass on the ×1 corpus (the canonical-occurrence set is replication-
    invariant; replicas keep only blank structure).
  - top_ngrams: the top-k gram set is identical to ×1 with every count
    exactly ×R and n_docs exactly ×R.
  - global_shuffle: replica-0's shard assignment equals the ×1 run's
    (shard is a pure function of the key), and the ×R ordering restricted
    to replica-0 docs preserves the ×1 within-shard order exactly.

Single runs on a noisy VM — the INVARIANTS and the absence of quadratic
blowups are the evidence, not the exact seconds.

Usage: python bench/thirdwave_notch.py [R_docs]
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
    assert r_docs >= 2, "the replica-1 invariants need r_docs >= 2"

    from pyspark.sql import functions as F

    from log_parser_mind_spark.operators.curate import (
        dedup_paragraphs,
        repetition_scores,
        top_ngrams,
    )
    from log_parser_mind_spark.operators.sample import global_shuffle
    from log_parser_mind_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="thirdwave_notch", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
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

    out: dict[str, object] = {"r_docs": r_docs, "n_docs": n_big, "cpus": cpus}

    t0 = time.time()
    rep = repetition_scores(big).persist()
    n_rep = rep.count()
    out["repetition_scores_sec"] = round(time.time() - t0, 3)
    assert n_rep == n_big
    # replica 1 must equal the base corpus row-for-row
    base_rep = {tuple(r) for r in repetition_scores(base).collect()}
    rep1 = {
        (r[0] - offset, *r[1:])
        for r in rep.filter(
            (F.col("doc_id") >= offset) & (F.col("doc_id") < 2 * offset)
        ).collect()
    }
    assert rep1 == base_rep, "replication perturbed per-doc metrics"
    rep.unpersist()

    # Replicas contribute only blank structure; separator chars around
    # dropped paragraphs differ, so the strict invariant is non-whitespace
    # mass. One agg pass per corpus computes both masses.
    nws = lambda c: F.sum(F.length(F.regexp_replace(c, r"\s", "")))  # noqa: E731
    both = lambda df: df.agg(  # noqa: E731
        F.sum(F.length("text")), nws(F.col("text"))
    ).collect()[0]
    t0 = time.time()
    mass_big, nws_big = both(dedup_paragraphs(big))
    out["paragraph_dedup_sec"] = round(time.time() - t0, 3)
    mass_base, nws_base = both(dedup_paragraphs(base))
    assert nws_big == nws_base, (nws_big, nws_base)
    out["survivor_mass_x1"] = int(mass_base)
    out["survivor_mass_xR"] = int(mass_big)

    t0 = time.time()
    top_big = [(r[0], r[1], r[2]) for r in top_ngrams(big, n=2, k=20).collect()]
    out["top_ngrams_sec"] = round(time.time() - t0, 3)
    top_base = [(r[0], r[1], r[2]) for r in top_ngrams(base, n=2, k=20).collect()]
    assert top_big == [(g, c * r_docs, d * r_docs) for g, c, d in top_base]

    t0 = time.time()
    sh = global_shuffle(big, n_shards=64)
    rep0 = sh.filter(F.col("doc_id") < offset).select(
        "shard", "pos_in_shard", "doc_id"
    ).collect()
    out["global_shuffle_sec"] = round(time.time() - t0, 3)
    # shard is a pure function of the key, and the within-shard order of
    # the shared keys must survive the interleaved replicas.
    base_order: dict = {}
    for r in sorted(global_shuffle(base, n_shards=64).collect(),
                    key=lambda r: (r.shard, r.pos_in_shard)):
        base_order.setdefault(r.shard, []).append(r.doc_id)
    big_order: dict = {}
    for r in sorted(rep0, key=lambda r: (r.shard, r.pos_in_shard)):
        big_order.setdefault(r.shard, []).append(r.doc_id)
    assert big_order == base_order, "replication perturbed the shuffle order"

    big.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Bucket-size evidence for the Σ bucket² cost model (VERDICT r2 item 5).

Replicates the sf0.1 documents corpus ×R (each replica gets a distinct token
so shingles differ) to build a larger notch, then records
(n_buckets, max_bucket, sum_sq) for:

  - minhash LSH band buckets (band_idx, band_hash)
  - simhash 16-bit band slices (band_idx, band_val)
  - embedding hyperplane buckets at FIXED 8 planes vs planes_for_corpus(N)

sum_sq is the bucketed self-join's output row count — the number that must
stay ~linear in N for the dedup suite to hold at 100 TB. Prints ONE JSON
line; results recorded in BENCH/BASELINE.md.

Usage: python bench/bucket_stats_bench.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from log_parser_mind_spark.operators import dedup, similarity  # noqa: E402
from log_parser_mind_spark.session import get_spark  # noqa: E402


def _stats(df, cols):
    r = similarity.bucket_stats(df, cols).collect()[0]
    return {"n_buckets": r.n_buckets, "max_bucket": r.max_bucket, "sum_sq": r.sum_sq}


def main(replicas: int = 16) -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="bucket_stats", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select("doc_id", "text")
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = docs.crossJoin(rep).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" r"), F.col("rep").cast("string")).alias("text"),
    )
    n_docs = big.count()

    # minhash band buckets, exactly the shape minhash_lsh_candidates joins on
    k, bands = 32, 8
    rows_per_band = k // bands
    exploded = big.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(dedup.shingles_expr(F.col("text"), 3))).alias("shingle"),
    )
    sig = exploded.groupBy("id").agg(
        F.array(*[F.min(F.xxhash64(F.lit(i), F.col("shingle"))) for i in range(k)]).alias("sig")
    )
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "band.band_idx", "band.band_hash")
    minhash_stats = _stats(banded, ["band_idx", "band_hash"])

    # simhash 16-bit band slices — the EXACT join-key table the operator
    # self-joins (simhash_banded over the n_tokens>0-filtered table, matching
    # simhash_near_dup_pairs' empty-doc hot-bucket guard).
    sh = dedup.simhash_table(big).filter(F.col("n_tokens") > 0)
    sim_banded = dedup.simhash_banded(sh, 4).select("id", "band_idx", "band_val")
    simhash_stats = _stats(sim_banded, ["band_idx", "band_val"])

    # hyperplane buckets: fixed 8 planes vs auto-scaled planes_for_corpus
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb_big = emb.crossJoin(rep).select(
        (F.col("vec_id") * replicas + F.col("rep")).alias("vec_id"),
        F.transform(
            "embedding", lambda v: v + (F.col("rep") % 7).cast("float") * F.lit(0.01)
        ).alias("embedding"),
    )
    n_vecs = emb_big.count()
    auto_planes = similarity.planes_for_corpus(n_vecs, target_bucket_size=256)
    hp_fixed = _stats(similarity.hyperplane_bucket(emb_big, dim=64, n_planes=8), ["bucket"])
    hp_auto = _stats(
        similarity.hyperplane_bucket(emb_big, dim=64, n_planes=auto_planes), ["bucket"]
    )

    # IVF list balance at the vector notch (VERDICT r4 item 5): bucket_stats
    # over the fitted inverted-list assignments. The probe join's cost is
    # Σ over probed lists of |list| per query — max_bucket is the worst
    # single-list scan and max/mean the imbalance factor a probe can hit vs
    # the uniform n/k estimate. sum_sq is comparable to the LSH rows only
    # if EVERY list were probed; the table records it for the same
    # skew-shape reading as the other bucketings.
    ivf_k = 64
    ivf_assigned = similarity.ivf_assignments(
        emb_big, n_centroids=ivf_k, iterations=3, dim=64
    )
    ivf_stats = _stats(ivf_assigned, ["centroid_id"])
    ivf_stats["n_centroids"] = ivf_k
    ivf_stats["imbalance_max_over_mean"] = round(
        ivf_stats["max_bucket"] * ivf_stats["n_buckets"] / n_vecs, 2
    )

    # AQE skew-join evidence for the simhash band self-join (VERDICT r4
    # item 4): run the ACTUAL pair join and count skew-split nodes in the
    # final adaptive plan, at default thresholds and again with the byte
    # thresholds lowered ~1000× to the notch's partition sizes (broadcast
    # disabled so the join is shuffled at all — at notch scale the band
    # table broadcasts and there is no shuffle join to split). Expected and
    # measured: ZERO splits in every configuration, because AQE detects
    # skew on reducer-INPUT bytes while a band join's hazard is join-OUTPUT
    # rows (Σ bucket²) produced from KB-sized input partitions — the hot
    # bucket is invisible to the mechanism. Recorded as the correction of
    # an earlier BENCH claim; the real 100 TB controls are the bucket-stats
    # cost model + the empty-doc guard, not AQE.
    import re

    def _skew_probe(conf: dict) -> dict:
        for key, val in conf.items():
            spark.conf.set(key, val)
        try:
            pairs = dedup.simhash_near_dup_pairs(big, k=3)
            n_pairs = pairs.count()
            plan = pairs._jdf.queryExecution().executedPlan().toString()
            return {
                "pairs": n_pairs,
                "skew_split_nodes": len(re.findall(r"skew=true", plan)),
                "join_nodes": sorted(set(re.findall(r"(\w*HashJoin|SortMergeJoin)", plan))),
            }
        finally:
            for key in conf:
                spark.conf.unset(key)

    skew_default = _skew_probe({})
    skew_forced = _skew_probe({
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    })

    print(
        json.dumps(
            {
                "metric": "bucket-size distribution at the replicated notch",
                "n_docs": n_docs,
                "n_vecs": n_vecs,
                "minhash_bands": minhash_stats,
                "simhash_bands": simhash_stats,
                "hyperplane_fixed8": hp_fixed,
                "hyperplane_auto": {"planes": auto_planes, **hp_auto},
                "ivf_lists": ivf_stats,
                "simhash_skew_join_default": skew_default,
                "simhash_skew_join_forced_smj_low_thresholds": skew_forced,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main(*map(int, sys.argv[1:]))

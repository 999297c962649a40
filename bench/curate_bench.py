"""Timed run of the composed curation funnel (operators/curate.py) at the
sf0.1 corpus and at an R×-replicated notch (each replica one token apart —
near-dup-saturated, the worst case for the near-dup stage), recording wall
time, funnel counts, and throughput. Prints ONE JSON line; results recorded
in BENCH/BASELINE.md.

Usage: python bench/curate_bench.py [replicas]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from log_parser_mind_spark.operators import curate  # noqa: E402
from log_parser_mind_spark.session import get_spark  # noqa: E402


def timed_funnel(spark, docs):
    n_in = docs.count()
    t0 = time.time()
    # SCALE regime defaults (k=32, bands=8, 3-shingles) — the provable
    # k=bands=32 unigram config the contract query uses is deliberately NOT
    # benched at the replicated notch: rows_per_band=1 admits ~all pairs as
    # candidates on a saturated corpus (see curate_corpus docstring).
    out = curate.curate_corpus(docs, jaccard_threshold=0.7, min_quality=0.5)
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    n_out = out.count()
    return {
        "n_input": n_in,
        "n_curated": n_out,
        "wall_s": round(wall, 2),
        "docs_per_sec": round(n_in / wall, 1),
    }


def main(replicas: int = 16) -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="curate_bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )

    base = timed_funnel(spark, docs)

    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = docs.crossJoin(rep).select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" r"), F.col("rep").cast("string")).alias("text"),
    )
    rep_res = timed_funnel(spark, big)

    print(json.dumps({"sf_dir": sf_dir, "base": base, f"x{replicas}": rep_res}))
    spark.stop()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))

"""Host-scaling calibration job for the N-vs-4N experiment.

A pure-compute, shuffle-free Spark job (an xxhash64 chain folded into one
partial-aggregated sum — one stage, no exchange, no Python, no I/O after the
range source). By construction it scales perfectly on ideal hardware, so its
measured N→4N efficiency IS the host's parallel-scaling ceiling (shared
memory bus / SMT / noisy neighbors). The pipeline's efficiency divided by
this ceiling isolates what the PLAN costs from what the HOST costs.

    spark-submit --master local-cluster[W,C,M] bench/calibrate_job.py <n_rows>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism
    df = spark.range(n_rows, numPartitions=max(cores * 8, 64))
    col = F.col("id")
    for i in range(12):  # compute-dense chain, constant memory footprint
        col = F.xxhash64(col, F.lit(i))
    t0 = time.time()
    # bit_xor fold: associative, order-independent, cannot overflow ANSI math
    total = df.select(col.alias("h")).agg(F.expr("bit_xor(h)")).collect()[0][0]
    elapsed = time.time() - t0
    print(json.dumps({
        "cores": cores,
        "n_rows": n_rows,
        "elapsed_sec": round(elapsed, 3),
        "rows_per_sec": round(n_rows / elapsed, 1),
        "checksum": int(total),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

"""Streaming-path bench (VERDICT r2 item 7): drive the foreachBatch
incremental pipeline over the sf0.1-equivalent synthetic transcripts split
into ~10 files (maxFilesPerTrigger=1 → one micro-batch per file,
availableNow), report per-batch wall time, and check convergence vs the
one-shot batch run on the same input:

  - mass conservation: Σ stream template log_count == batch Σ (every turn
    assigned exactly once across micro-batches)
  - template-count convergence: stream templates ≥ batch templates (micro-
    batch mining can stay finer, never coarser), overlap fraction reported

Prints ONE JSON line; results recorded in BENCH/BASELINE.md. Not part of
bench.py's headline suite — per-batch seeded re-mining is a different
workload than the one-pass batch metric the baseline compares against.

Usage: python bench/streaming_bench.py [n_convs] [n_batches] [mode]

``mode`` = foreachbatch (default) | stateful | hybrid. stateful drives the
state-store path (streaming.stateful_miner) over the SAME input split —
the comparison that shows what keeping Drain leaf state in the state store
buys over re-reading the committed dimension every trigger. hybrid drives
stateful_pipeline (r5): per-TURN parse in the stateful operator +
foreachBatch SnapshotStore commits — like-for-like with foreachbatch (both
commit parsed + dimension sinks), unlike stateful (assignments only).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from log_parser_mind_spark.operators.parse import parse_pipeline  # noqa: E402
from log_parser_mind_spark.session import get_spark  # noqa: E402
from log_parser_mind_spark.sources.manifest import SnapshotStore  # noqa: E402
from log_parser_mind_spark.streaming import stream as st  # noqa: E402
from log_parser_mind_spark.synth import synth_transcripts  # noqa: E402


def main(n_convs: int = 50_000, n_batches: int = 10, mode: str = "foreachbatch") -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="streaming_bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    src = tempfile.mkdtemp(prefix="stream_bench_src_")
    root = tempfile.mkdtemp(prefix="stream_bench_wh_")
    try:
        transcripts = synth_transcripts(spark, n_convs=n_convs, seed=42)
        transcripts.repartition(n_batches).write.mode("overwrite").parquet(src)
        n_turns = spark.read.parquet(src).count()

        stream = st.stream_transcripts(spark, src, max_files=1)
        t0 = time.time()
        if mode == "stateful":
            from log_parser_mind_spark.streaming.stateful_miner import (
                mine_templates_stateful,
            )

            q = (
                mine_templates_stateful(stream)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", f"{root}/stateful_out")
                .option("checkpointLocation", f"{root}/stateful_ck")
                .trigger(availableNow=True)
                .start()
            )
        elif mode == "hybrid":
            q = st.stateful_pipeline(spark, stream, root).start()
        else:
            q = st.incremental_pipeline(spark, stream, root).start()
        q.awaitTermination()
        total = time.time() - t0
        per_batch = [
            round(p["durationMs"]["triggerExecution"] / 1000.0, 3)
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]

        if mode == "stateful":
            streamed = (
                spark.read.parquet(f"{root}/stateful_out")
                .groupBy("template_id", F.col("template").alias("pattern"))
                .agg(F.sum("weight").alias("log_count"))
            )
        else:
            store = SnapshotStore(spark, root)
            streamed = store.read("stream_templates")
        _, batch_templates, _ = parse_pipeline(spark.read.parquet(src))
        stream_ids = {r.template_id for r in streamed.select("template_id").collect()}
        batch_ids = {r.template_id for r in batch_templates.select("template_id").collect()}
        stream_mass = streamed.agg(F.sum("log_count")).collect()[0][0]

        print(
            json.dumps(
                {
                    "metric": {
                        "stateful": "state-store stateful mining (applyInPandasWithState)",
                        "hybrid": "hybrid pipeline (stateful per-turn parse + foreachBatch sink commits)",
                        "foreachbatch": "incremental streaming pipeline (foreachBatch seeded re-mining)",
                    }[mode],
                    "value": round(total, 3),
                    "unit": "sec",
                    "n_turns": n_turns,
                    "n_batches": len(per_batch),
                    "per_batch_sec": per_batch,
                    "throughput_turns_per_sec": round(n_turns / total, 1),
                    "mass_conserved": bool(stream_mass == n_turns),
                    "templates_stream": len(stream_ids),
                    "templates_batch": len(batch_ids),
                    "batch_ids_covered_by_stream": round(
                        len(stream_ids & batch_ids) / max(1, len(batch_ids)), 4
                    ),
                    "cpus": cpus,
                }
            )
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    args = sys.argv[1:]
    main(
        int(args[0]) if len(args) > 0 else 50_000,
        int(args[1]) if len(args) > 1 else 10,
        args[2] if len(args) > 2 else "foreachbatch",
    )

"""Capture .explain("formatted") for every bench.py query (r6 evidence).

Usage: python bench/capture_plans.py <outdir> [suffix]
Writes <outdir>/<query>_<suffix>.txt (suffix default "before").
Builds the same DataFrames as bench.py but does NOT execute them (explain
only), except where a query times a write (pipeline/index build) — there the
final pre-write frame's plan is captured.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from log_parser_mind_spark.config import PipelineConfig  # noqa: E402
from log_parser_mind_spark.operators import aggregate as agg  # noqa: E402
from log_parser_mind_spark.operators import dedup  # noqa: E402
from log_parser_mind_spark.operators.parse import parse_pipeline  # noqa: E402
from log_parser_mind_spark.session import get_spark  # noqa: E402
from log_parser_mind_spark.sources.tables import documents_as_transcripts, read_table  # noqa: E402
from log_parser_mind_spark.synth import synth_transcripts  # noqa: E402


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="plans", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

    def cap(name, df):
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"[plans] {name}: {len(plan)} bytes", file=sys.stderr)

    transcripts = synth_transcripts(spark, n_convs=500, seed=42).repartition(cpus * 4)
    parsed_lazy, templates, _ = parse_pipeline(transcripts, PipelineConfig(), include_text=False)
    cap("pipeline_synth_parsed", parsed_lazy)
    cap("pipeline_synth_templates", templates)

    docs_t = documents_as_transcripts(spark, sf_dir)
    parsed_d, templates_d, _ = parse_pipeline(docs_t, PipelineConfig(), include_text=False)
    cap("pipeline_docs_parsed", parsed_d)

    docs = read_table(spark, sf_dir, "documents")
    cap("dedup_minhash", dedup.minhash_lsh_candidates(docs, k=32, bands=16))
    cap("dedup_simhash", dedup.simhash_near_dups(docs).drop("ids"))

    from log_parser_mind_spark.operators.curate import (
        dedup_ngram_spans,
        dedup_paragraphs,
        exact_contamination,
        ngram_lm_scores,
        repetition_scores,
    )

    cap("repetition_scores", repetition_scores(docs))
    cap("paragraph_dedup", dedup_paragraphs(docs).select("doc_id", "text"))
    cap("ngram_span_dedup", dedup_ngram_spans(docs, k=8).select("doc_id", "text"))
    cap("lm_quality", ngram_lm_scores(docs).select("doc_id", "n_bigrams", "avg_nll", "ppl"))

    from log_parser_mind_spark.operators.prep import preference_pairs, sft_examples, tfidf_keywords

    out = tfidf_keywords(docs, k=5)
    cap("tfidf_keywords", out)
    out.doc_terms.unpersist()

    bench_docs = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    cap("exact_contamination", exact_contamination(docs, bench_docs, n=8))

    ev = read_table(spark, sf_dir, "events")
    from __spark_entry__ import _turns_from_events

    sft_turns = _turns_from_events(ev)
    cap("sft_examples", sft_examples(sft_turns, context_budget_tokens=8))
    cap("preference_pairs", preference_pairs(sft_turns))

    inc_base = docs.filter(F.col("doc_id") % 5 != 0)
    inc_new = docs.filter(F.col("doc_id") % 5 == 0)
    cap("minhash_index_build", dedup.build_minhash_index(inc_base, k=32, bands=16))
    # incremental_dedup reads a stored index; emulate with a fresh one (plan
    # shape identical modulo the parquet scan source).
    import shutil as _sh
    import tempfile as _tf

    idx_dir = _tf.mkdtemp(prefix="logmind_planidx_")
    try:
        dedup.build_minhash_index(inc_base, k=32, bands=16).write.mode("overwrite").parquet(
            f"{idx_dir}/idx"
        )
        stored_idx = spark.read.parquet(f"{idx_dir}/idx")
        cap(
            "incremental_dedup",
            dedup.dedup_against_index(inc_new, stored_idx, inc_base, k=32, bands=16),
        )
    finally:
        _sh.rmtree(idx_dir, ignore_errors=True)

    from log_parser_mind_spark.functions import text as _tx
    from log_parser_mind_spark.operators.sample import select_within_token_budget

    scored = _tx.with_tokens(docs).select(
        "doc_id",
        _tx.quality_score_from(F.col("tokens"), F.col("text")).alias("quality"),
        F.size("tokens").cast("long").alias("n_tokens"),
    )
    cap("budget_select", select_within_token_budget(scored, budget_tokens=120_000))

    cap(
        "error_rates_events",
        ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
            F.count(F.when(F.col("event_type") == "error", 1)).alias("error_count"),
            F.count(F.lit(1)).alias("total_count"),
        ),
    )
    li = read_table(spark, sf_dir, "lineitem")
    cap(
        "pricing_summary",
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1))),
    )
    emb = read_table(spark, sf_dir, "embeddings")
    from log_parser_mind_spark.operators.similarity import brute_force_topk

    cap(
        "cosine_topk",
        brute_force_topk(emb.filter(F.col("vec_id") < 8), emb.filter(F.col("vec_id") >= 8), k=5),
    )
    spark.stop()


if __name__ == "__main__":
    main()

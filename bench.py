"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "throughput_turns_per_sec": ...}.

Headline load:
  pipeline_synth   — full parse→mine→route→aggregate over a deterministic
                     ~1.2M-turn synthetic transcripts table (the BASELINE.md
                     primary metric: end-to-end turns/sec)
  pipeline_docs    — same pipeline over the provided documents corpus
  dedup_minhash    — minhash-LSH candidate generation over documents
  error_rates / hourly_rollup / pricing_summary — heavy SQL aggregates
  cosine_topk      — embedding similarity search
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from log_parser_mind_spark.config import PipelineConfig  # noqa: E402
from log_parser_mind_spark.operators import aggregate as agg  # noqa: E402
from log_parser_mind_spark.operators import dedup  # noqa: E402
from log_parser_mind_spark.operators.parse import parse_pipeline  # noqa: E402
from log_parser_mind_spark.session import get_spark  # noqa: E402
from log_parser_mind_spark.sources.tables import documents_as_transcripts, read_table  # noqa: E402
from log_parser_mind_spark.synth import synth_transcripts  # noqa: E402

SF_TO_CONVS = {"0.001": 500, "0.01": 5_000, "0.1": 50_000, "1": 500_000}


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_pipeline(spark, transcripts):
    import shutil
    import tempfile

    # include_text=False: the reference sink stores template+variables, not
    # the raw line (001_clickhouse_schema.sql:10-23).
    parsed_lazy, templates, _ = parse_pipeline(
        transcripts, PipelineConfig(), include_text=False
    )
    # Write the parsed sink once, aggregate from the columnar snapshot —
    # an in-memory persist of these wide rows costs ~60 s of cache build
    # regardless of cores (measured) and flattens scaling.
    tmp = tempfile.mkdtemp(prefix="logmind_bench_")
    try:
        parsed_lazy.write.mode("overwrite").parquet(f"{tmp}/parsed")
        parsed = spark.read.parquet(f"{tmp}/parsed")
        _noop(templates)
        _noop(agg.hourly_rollup(parsed))
        _noop(agg.error_rates(parsed))
        _noop(agg.top_templates(parsed))
        _noop(agg.global_stats(parsed))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_convs = SF_TO_CONVS.get(sf, 50_000)

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))

    transcripts = synth_transcripts(spark, n_convs=n_convs, seed=42).repartition(cpus * 4)
    transcripts = transcripts.persist()
    n_turns = transcripts.count()  # materialize input outside the timed region

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    timed("pipeline_synth", lambda: run_pipeline(spark, transcripts))
    docs_t = documents_as_transcripts(spark, sf_dir)
    timed("pipeline_docs", lambda: run_pipeline(spark, docs_t))
    docs = read_table(spark, sf_dir, "documents")
    timed("dedup_minhash", lambda: _noop(dedup.minhash_lsh_candidates(docs, k=32, bands=16)))
    # JVM simhash (r2: was a per-row Python kernel — this entry tracks the
    # explode+xxhash64+bit-majority rewrite)
    timed("dedup_simhash", lambda: _noop(dedup.simhash_near_dups(docs).drop("ids")))

    # r4 second wave: per-doc repetition metrics (zero-shuffle fold) and
    # global span dedup (text crosses one exchange). New entries — compare
    # per-query across rounds; the suite total grew with the suite.
    from log_parser_mind_spark.operators.curate import dedup_paragraphs, repetition_scores

    timed("repetition_scores", lambda: _noop(repetition_scores(docs)))
    timed(
        "paragraph_dedup",
        lambda: _noop(dedup_paragraphs(docs).select("doc_id", "text")),
    )

    # r5: substring-level dedup (Lee-et-al-style duplicated k-gram span
    # removal) and bigram-LM perplexity scoring. New entries — compare
    # per-query across rounds; the suite total grew with the suite.
    from log_parser_mind_spark.operators.curate import dedup_ngram_spans, ngram_lm_scores

    timed(
        "ngram_span_dedup",
        lambda: _noop(dedup_ngram_spans(docs, k=8).select("doc_id", "text")),
    )
    timed(
        "lm_quality",
        lambda: _noop(
            ngram_lm_scores(docs).select("doc_id", "n_bigrams", "avg_nll", "ppl")
        ),
    )

    # r5 fourth wave: tf-idf keyword extraction (the representative
    # multi-shuffle doc op: explode → two groupBys → term join → per-doc
    # window). New entry — compare per-query across rounds.
    from log_parser_mind_spark.operators.prep import tfidf_keywords

    def _tfidf():
        out = tfidf_keywords(docs, k=5)
        _noop(out)
        out.doc_terms.unpersist()

    timed("tfidf_keywords", _tfidf)

    # r5 fifth wave: exact n-gram benchmark contamination (broadcast
    # blocklist gram set, one groupBy). New entry — compare per-query across
    # rounds; the suite total grew with the suite.
    from log_parser_mind_spark.operators.curate import exact_contamination

    bench_docs = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    timed(
        "exact_contamination",
        lambda: _noop(exact_contamination(docs, bench_docs, n=8)),
    )

    ev = read_table(spark, sf_dir, "events")

    # r5 sixth wave: chat-transcript → SFT-row reshape (one conv-keyed
    # exchange + JVM HOF context clip). Same events-derived conversation
    # fixture as the contract query. New entry — compare per-query across
    # rounds.
    from __spark_entry__ import _turns_from_events
    from log_parser_mind_spark.operators.prep import sft_examples

    sft_turns = _turns_from_events(ev)
    timed(
        "sft_examples",
        lambda: _noop(sft_examples(sft_turns, context_budget_tokens=8)),
    )

    # r5 seventh wave: DPO pair selection over the same derived conversation
    # table (skew-safe min/max-of-struct groupBy), and incremental index
    # dedup — the index build is the amortized once-per-corpus cost, the
    # admission pass is the recurring per-crawl cost (scale config
    # k=32/bands=16/3-gram shingles, same as dedup_minhash). New entries —
    # compare per-query across rounds.
    from log_parser_mind_spark.operators.prep import preference_pairs

    timed("preference_pairs", lambda: _noop(preference_pairs(sft_turns)))

    import shutil as _sh
    import tempfile as _tf

    inc_base = docs.filter(F.col("doc_id") % 5 != 0)
    inc_new = docs.filter(F.col("doc_id") % 5 == 0)
    idx_dir = _tf.mkdtemp(prefix="logmind_idx_")
    try:
        timed(
            "minhash_index_build",
            lambda: dedup.build_minhash_index(inc_base, k=32, bands=16)
            .write.mode("overwrite")
            .parquet(f"{idx_dir}/idx"),
        )
        stored_idx = spark.read.parquet(f"{idx_dir}/idx")
        timed(
            "incremental_dedup",
            lambda: _noop(
                dedup.dedup_against_index(inc_new, stored_idx, inc_base, k=32, bands=16)
            ),
        )
    finally:
        _sh.rmtree(idx_dir, ignore_errors=True)

    # r5 eighth wave: quality-greedy token-budget selection (value
    # histogram + scalar boundary + boundary-slice window — no global
    # sort). New entry — compare per-query across rounds.
    from log_parser_mind_spark.functions import text as _tx
    from log_parser_mind_spark.operators.sample import select_within_token_budget

    def _budget_select():
        scored = _tx.with_tokens(docs).select(
            "doc_id",
            _tx.quality_score_from(F.col("tokens"), F.col("text")).alias("quality"),
            F.size("tokens").cast("long").alias("n_tokens"),
        )
        _noop(select_within_token_budget(scored, budget_tokens=120_000))

    timed("budget_select", _budget_select)

    timed(
        "error_rates_events",
        lambda: _noop(
            ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
                F.count(F.when(F.col("event_type") == "error", 1)).alias("error_count"),
                F.count(F.lit(1)).alias("total_count"),
            )
        ),
    )
    li = read_table(spark, sf_dir, "lineitem")
    timed(
        "pricing_summary",
        lambda: _noop(
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1)))
        ),
    )
    emb = read_table(spark, sf_dir, "embeddings")
    from log_parser_mind_spark.operators.similarity import brute_force_topk

    timed(
        "cosine_topk",
        lambda: _noop(
            brute_force_topk(emb.filter(F.col("vec_id") < 8), emb.filter(F.col("vec_id") >= 8), k=5)
        ),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end-to-end parse→route→aggregate suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_turns": n_turns,
                "cpus": cpus,
                "throughput_turns_per_sec": round(n_turns / timings["pipeline_synth"], 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

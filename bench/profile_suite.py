"""Per-query stage-level profiling of the bench.py suite (r6, guide §1).

Runs the SAME query bodies as bench.py (imported helpers, same configs) with
Spark event logging on and a job description per query, then attributes every
stage's task metrics (wall, CPU, GC, shuffle read/write, input bytes, task
count) back to its query. This is the measurement harness behind
OPTIMIZATION_r06.md — bench.py itself stays frozen.

Usage: python bench/profile_suite.py [query ...]   (default: all)
Writes /tmp/profile_suite_report.json and prints a per-query table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

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


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_pipeline(spark, transcripts):
    parsed_lazy, templates, _ = parse_pipeline(
        transcripts, PipelineConfig(), include_text=False
    )
    tmp = tempfile.mkdtemp(prefix="logmind_prof_")
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
    only = set(sys.argv[1:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    evdir = tempfile.mkdtemp(prefix="logmind_evlog_")
    spark = get_spark(
        app_name="profile_suite",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext

    transcripts = synth_transcripts(spark, n_convs=50_000, seed=42).repartition(cpus * 4)
    transcripts = transcripts.persist()
    transcripts.count()

    timings: dict[str, float] = {}

    def timed(name, fn):
        if only and name not in only:
            return
        sc.setJobDescription(f"Q:{name}")
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)
        print(f"[prof] {name}: {timings[name]}s", file=sys.stderr, flush=True)

    timed("pipeline_synth", lambda: run_pipeline(spark, transcripts))
    docs_t = documents_as_transcripts(spark, sf_dir)
    timed("pipeline_docs", lambda: run_pipeline(spark, docs_t))
    docs = read_table(spark, sf_dir, "documents")
    timed("dedup_minhash", lambda: _noop(dedup.minhash_lsh_candidates(docs, k=32, bands=16)))
    timed("dedup_simhash", lambda: _noop(dedup.simhash_near_dups(docs).drop("ids")))

    from log_parser_mind_spark.operators.curate import dedup_paragraphs, repetition_scores

    timed("repetition_scores", lambda: _noop(repetition_scores(docs)))
    timed("paragraph_dedup", lambda: _noop(dedup_paragraphs(docs).select("doc_id", "text")))

    from log_parser_mind_spark.operators.curate import dedup_ngram_spans, ngram_lm_scores

    timed("ngram_span_dedup", lambda: _noop(dedup_ngram_spans(docs, k=8).select("doc_id", "text")))
    timed(
        "lm_quality",
        lambda: _noop(ngram_lm_scores(docs).select("doc_id", "n_bigrams", "avg_nll", "ppl")),
    )

    from log_parser_mind_spark.operators.prep import tfidf_keywords

    def _tfidf():
        out = tfidf_keywords(docs, k=5)
        _noop(out)
        out.doc_terms.unpersist()

    timed("tfidf_keywords", _tfidf)

    from log_parser_mind_spark.operators.curate import exact_contamination

    bench_docs = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    timed("exact_contamination", lambda: _noop(exact_contamination(docs, bench_docs, n=8)))

    ev = read_table(spark, sf_dir, "events")

    from __spark_entry__ import _turns_from_events
    from log_parser_mind_spark.operators.prep import sft_examples

    sft_turns = _turns_from_events(ev)
    timed("sft_examples", lambda: _noop(sft_examples(sft_turns, context_budget_tokens=8)))

    from log_parser_mind_spark.operators.prep import preference_pairs

    timed("preference_pairs", lambda: _noop(preference_pairs(sft_turns)))

    inc_base = docs.filter(F.col("doc_id") % 5 != 0)
    inc_new = docs.filter(F.col("doc_id") % 5 == 0)
    idx_dir = tempfile.mkdtemp(prefix="logmind_idx_")
    try:
        need_idx = not only or "incremental_dedup" in only

        def _build():
            dedup.build_minhash_index(inc_base, k=32, bands=16).write.mode(
                "overwrite"
            ).parquet(f"{idx_dir}/idx")

        if not only or "minhash_index_build" in only:
            timed("minhash_index_build", _build)
        elif need_idx:
            _build()  # untimed prerequisite for the filtered run
        if need_idx:
            stored_idx = spark.read.parquet(f"{idx_dir}/idx")
            timed(
                "incremental_dedup",
                lambda: _noop(
                    dedup.dedup_against_index(inc_new, stored_idx, inc_base, k=32, bands=16)
                ),
            )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

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

    spark.stop()

    # ---- event-log attribution: job description -> stages -> task metrics
    job_q: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    names: dict[int, str] = {}
    sub_ms: dict[int, int] = {}
    for dirpath, _dirs, files in os.walk(evdir):
        for fn in files:
            path = os.path.join(dirpath, fn)
            if os.path.isdir(path) or fn.startswith("."):
                continue
            with open(path, errors="replace") as fh:
                for line in fh:
                    try:
                        e = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    ev_t = e.get("Event")
                    if ev_t == "SparkListenerJobStart":
                        desc = (e.get("Properties") or {}).get("spark.job.description", "")
                        if desc.startswith("Q:"):
                            job_q[e["Job ID"]] = desc[2:]
                        for si in e.get("Stage Infos", []):
                            stage_job[si["Stage ID"]] = e["Job ID"]
                    elif ev_t == "SparkListenerStageSubmitted":
                        info = e.get("Stage Info", {})
                        sub_ms[info.get("Stage ID")] = info.get("Submission Time", 0)
                        names[info.get("Stage ID")] = info.get("Stage Name", "?")
                    elif ev_t == "SparkListenerStageCompleted":
                        info = e.get("Stage Info", {})
                        names[info.get("Stage ID")] = info.get("Stage Name", "?")
                        sid = info.get("Stage ID")
                        s = stages.setdefault(sid, _zero())
                        s["wall_ms"] = (info.get("Completion Time", 0) or 0) - (
                            info.get("Submission Time", sub_ms.get(sid, 0)) or 0
                        )
                    elif ev_t == "SparkListenerTaskEnd":
                        tm = e.get("Task Metrics") or {}
                        sid = e.get("Stage ID")
                        s = stages.setdefault(sid, _zero())
                        s["tasks"] += 1
                        s["run_ms"] += tm.get("Executor Run Time", 0)
                        s["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
                        s["gc_ms"] += tm.get("JVM GC Time", 0)
                        s["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                        s["result_ser_ms"] += tm.get("Result Serialization Time", 0)
                        sr = tm.get("Shuffle Read Metrics") or {}
                        s["sh_read_mb"] += (
                            sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                        ) / 1e6
                        s["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                        sw = tm.get("Shuffle Write Metrics") or {}
                        s["sh_write_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                        s["sh_write_ms"] += sw.get("Shuffle Write Time", 0) // 1_000_000
                        im = tm.get("Input Metrics") or {}
                        s["input_mb"] += im.get("Bytes Read", 0) / 1e6
                        om = tm.get("Output Metrics") or {}
                        s["output_mb"] += om.get("Bytes Written", 0) / 1e6

    report: dict[str, dict] = {}
    for sid, s in sorted(stages.items()):
        q = job_q.get(stage_job.get(sid, -1))
        if q is None:
            q = "_untracked"
        r = report.setdefault(q, {"stages": [], "wall_s": timings.get(q)})
        s2 = dict(s)
        s2["stage_id"] = sid
        s2["name"] = names.get(sid, "?")[:80]
        r["stages"].append(s2)

    for q, r in report.items():
        tot = _zero()
        for s in r["stages"]:
            for k in tot:
                if k in s:
                    tot[k] += s[k]
        r["totals"] = tot

    out_path = "/tmp/profile_suite_report.json"
    with open(out_path, "w") as fh:
        json.dump({"timings": timings, "report": report}, fh, indent=1)

    hdr = f"{'query':<22}{'wall_s':>8}{'Σrun_s':>9}{'Σcpu_s':>9}{'gc_s':>6}{'shR_MB':>8}{'shW_MB':>8}{'in_MB':>8}{'tasks':>7}{'stages':>7}"
    print(hdr)
    for q, t in timings.items():
        r = report.get(q)
        if not r:
            print(f"{q:<22}{t:>8.2f}  (no stages tracked)")
            continue
        tt = r["totals"]
        print(
            f"{q:<22}{t:>8.2f}{tt['run_ms']/1e3:>9.1f}{tt['cpu_ms']/1e3:>9.1f}"
            f"{tt['gc_ms']/1e3:>6.1f}{tt['sh_read_mb']:>8.1f}{tt['sh_write_mb']:>8.1f}"
            f"{tt['input_mb']:>8.1f}{tt['tasks']:>7}{len(r['stages']):>7}"
        )
    print(f"\nfull report: {out_path}  (eventlog dir kept: {evdir})")


def _zero() -> dict:
    return {
        "tasks": 0,
        "run_ms": 0,
        "cpu_ms": 0,
        "gc_ms": 0,
        "deser_ms": 0,
        "result_ser_ms": 0,
        "sh_read_mb": 0.0,
        "sh_write_mb": 0.0,
        "sh_write_ms": 0,
        "fetch_wait_ms": 0,
        "input_mb": 0.0,
        "output_mb": 0.0,
        "wall_ms": 0,
    }


if __name__ == "__main__":
    main()

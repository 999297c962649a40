"""Generate golden parquet tables for queries whose semantics are not
SQL-expressible, so the driver's DuckDB oracle can still hash-verify them
(VERDICT r1 item 6).

Two provenance classes, labeled per table:

  INDEPENDENT-ORACLE goldens (drain family) — computed by the single-threaded
  pandas oracle (log_parser_mind_spark.oracle.run_pipeline), an independent
  re-implementation of the reference semantics sharing no clustering code
  with the engine. Double-entry bookkeeping: this script ASSERTS the Spark
  engine's output equals the oracle's before writing anything.

  LOCKED-OUTPUT goldens (simhash_groups, minhash_candidates,
  multimodal_features) — deterministic engine output locked as a regression
  reference: xxhash64-based fingerprints have no DuckDB equivalent, so the
  golden proves determinism/parallelism-invariance, not independent derivation.

Run from the repo root:  python tools/make_goldens.py [sf_dir]
Writes data/golden/<query>.parquet (one part file each) at sf0.01 — the scale
the driver's correctness harness uses.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data", "golden")


def _py(v):
    """numpy/pandas scalar → plain Python (None for NaN/NA)."""
    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, np.generic):
        v = v.item()
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def build_drain_goldens(spark, sf_dir: str) -> dict:
    """Pandas-oracle drain outputs, shaped exactly like the entry queries."""
    import pandas as pd

    from log_parser_mind_spark import oracle
    from log_parser_mind_spark.sources.tables import documents_as_transcripts

    tr = documents_as_transcripts(spark, sf_dir).toPandas()
    res = oracle.run_pipeline(tr)
    parsed, templates = res["parsed"], res["templates"]

    g_templates = templates.rename(columns={"template": "pattern"})[
        ["template_id", "pattern", "log_count"]
    ]

    g_parsed = parsed[
        ["conv_id", "turn_idx", "template_id", "is_new", "original_size", "compressed_size"]
    ].copy()

    top = (
        parsed.dropna(subset=["template_id"])
        .groupby("template_id", as_index=False)
        .size()
        .rename(columns={"size": "cnt"})
        .sort_values(["cnt", "template_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )

    total_logs = len(parsed)
    uniq = parsed["template_id"].nunique(dropna=True)
    tot_o = int(parsed["original_size"].dropna().sum())
    tot_c = int(parsed["compressed_size"].dropna().sum())
    ratio = round(tot_c / tot_o, 6) if tot_o > 0 else 0.0
    g_stats = pd.DataFrame(
        [(total_logs, uniq, tot_o, tot_c, ratio)],
        columns=[
            "total_logs",
            "unique_templates",
            "total_original_size",
            "total_compressed_size",
            "compression_ratio",
        ],
    )
    return {
        "drain_templates": g_templates,
        "drain_parsed_turns": g_parsed,
        "drain_top_templates": top,
        "drain_global_stats": g_stats,
    }


def build_bpe_goldens(sf_dir: str) -> dict:
    """INDEPENDENT-oracle BPE goldens: the naive recount-per-iteration
    trainer and from-scratch encoder in oracle.py derive the merge table
    and per-lang token stats without touching functions/bpe.py. Shapes
    mirror q_bpe_merges / q_bpe_token_stats exactly (incl. the SQL-keyword
    -safe aliases and the unrounded total/n double division)."""
    import pandas as pd

    from log_parser_mind_spark import oracle

    pdf = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                          columns=["text", "lang"])
    merges = oracle.bpe_train(oracle.bpe_histogram(pdf["text"]), 200)
    merges_pdf = pd.DataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        columns=["merge_rank", "lhs", "rhs", "token"],
    )

    stats: dict = {}
    for text, lang in zip(pdf["text"], pdf["lang"]):
        toks = oracle.bpe_encode(text, merges)
        n, total, seen = stats.get(lang, (0, 0, set()))
        seen.update(toks)
        stats[lang] = (n + 1, total + len(toks), seen)
    stats_pdf = pd.DataFrame(
        [(lang, n, total, len(seen), total / n)
         for lang, (n, total, seen) in sorted(stats.items())],
        columns=["lang", "n_docs", "total_bpe_tokens",
                 "distinct_bpe_tokens", "avg_bpe_tokens_per_doc"],
    )
    return {"bpe_merges": merges_pdf, "bpe_token_stats": stats_pdf}


def build_classifier_golden(sf_dir: str) -> dict:
    """INDEPENDENT mirror of q_quality_classifier: retrains the hashed-bag
    logistic regression from raw parquet in pure Python (zlib.crc32 buckets,
    dict-of-pairs gradient descent, the same 6dp gradient rounding) —
    shares no Spark code with operators/classifier.py."""
    import math
    import zlib

    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    B, it, lr = entry._CLF_B, entry._CLF_IT, entry._CLF_LR
    rows = duckdb.sql(
        f"select doc_id, text, lang from '{sf_dir}/documents.parquet'"
    ).fetchall()
    mf = {}
    for did, text, lang in rows:
        toks = [t for t in (text or "").lower().split() if t]
        if not toks:
            continue
        n, cnt = len(toks), {}
        for t in toks:
            k = zlib.crc32(t.encode("utf-8")) % B
            cnt[k] = cnt.get(k, 0) + 1
        mf[did] = (1.0 if lang == "en" else 0.0, sorted((k, c / n) for k, c in cnt.items()))
    n_docs = len(mf)
    w, b = [0.0] * B, 0.0
    for _ in range(it):
        grad, gb = [0.0] * B, 0.0
        for y, pairs in mf.values():
            z = b + sum(w[k] * x for k, x in pairs)
            e = 1.0 / (1.0 + math.exp(-z)) - y
            for k, x in pairs:
                grad[k] += e * x
            gb += e
        w = [wi - lr * round(g / n_docs, 6) for wi, g in zip(w, grad)]
        b -= lr * round(gb / n_docs, 6)
    pdf = pd.DataFrame(
        [
            (did, y, round(1.0 / (1.0 + math.exp(-(b + sum(w[k] * x for k, x in pairs)))), 6))
            for did, (y, pairs) in sorted(mf.items())
        ],
        columns=["doc_id", "y", "score"],
    )
    return {"quality_classifier": pdf}


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> None:
    """Optional trailing args restrict regeneration to the named goldens —
    adding ONE new golden-backed query must not churn every committed part
    file (the drain/bpe pandas oracles still run when their names are
    requested; double-entry is per-write, so filtering loses nothing)."""
    import __spark_entry__ as entry
    from log_parser_mind_spark.session import get_spark

    if not os.path.isdir(sf_dir):
        # `make_goldens.py quality_classifier` (name without sf_dir) would
        # otherwise bind the NAME to sf_dir and fail deep in a read with a
        # baffling path error.
        raise SystemExit(
            f"first argument must be an sf_dir (got {sf_dir!r}) — usage: "
            "make_goldens.py [sf_dir] [golden_name ...]"
        )
    spark = get_spark(master="local[8]")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    qs = entry.queries()
    wanted = set(only)

    def write(name: str, spark_df_pdf) -> None:
        if wanted and name not in wanted:
            return
        q = qs[name](spark, sf_dir)
        if spark_df_pdf is None:  # locked-output golden: the query itself
            out = q
        else:
            # Independent golden: assert double-entry equality FIRST, then
            # write the oracle's values with the Spark query's exact schema.
            got = sorted(map(tuple, q.collect()))
            rows = [
                tuple(_py(v) for v in r)
                for r in spark_df_pdf.itertuples(index=False)
            ]
            out = spark.createDataFrame(rows, schema=q.schema)
            want = sorted(map(tuple, out.collect()))
            assert got == want, f"{name}: engine != pandas oracle ({len(got)} vs {len(want)} rows)"
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        out.coalesce(1).write.mode("overwrite").parquet(path)
        print(f"golden {name}: {out.count()} rows -> {path}")

    drain_names = {
        "drain_templates", "drain_parsed_turns", "drain_top_templates",
        "drain_global_stats",
    }
    if not wanted or wanted & drain_names:
        for name, pdf in build_drain_goldens(spark, sf_dir).items():
            write(name, pdf)
    if not wanted or wanted & {"bpe_merges", "bpe_token_stats"}:
        for name, pdf in build_bpe_goldens(sf_dir).items():
            write(name, pdf)
    if not wanted or "quality_classifier" in wanted:
        for name, pdf in build_classifier_golden(sf_dir).items():
            write(name, pdf)
    for name in (
        "simhash_groups",
        "simhash_hamming_dups",
        "minhash_candidates",
        "multimodal_features",
        "embed_ann_topk",
        "ivf_ann_topk",
        "ivf_ann_topk_scaled",
        "multimodal_real_decode",
        "semantic_dedup",
    ):
        write(name, None)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

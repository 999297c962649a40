"""Scale-notch evidence for the r5 fourth-wave ops (prep.py, classifier.py).

Replicates documents ×R with doc_id = base_id*R + rep (text unmodified),
which buys EXACT invariants — asserted before anything is recorded:

  tfidf      — tf per replica is unchanged, df and N both scale ×R, so
               idf = ln(N/df) is IDENTICAL: every replica's
               (term, tf, tfidf, rank) set must equal the base doc's.
  chunks     — pure per-row operator: exactly ×R rows and ×R token mass.
  datacard   — per-(lang, source) leaf: counts/masses exactly ×R,
               avg_tokens / avg_quality IDENTICAL (means of the same
               per-doc values).
  classifier — every doc replicated equally ⇒ each gradient sum and n both
               scale ×R ⇒ grad/n is unchanged (modulo float-summation last
               ulps, absorbed by the 6dp rounding the trainer already
               applies) ⇒ the ×R model must be IDENTICAL: same weights,
               same bias, and each replica scores exactly its base score.

Walls are single runs on a noisy VM (±2×); the invariants and the absence
of super-linear blowup are the evidence.

Usage: python bench/prep_notch.py [R]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    from pyspark.sql import functions as F

    from log_parser_mind_spark.operators.classifier import (
        score_logreg,
        token_bucket_features,
        train_logreg,
    )
    from log_parser_mind_spark.operators.prep import (
        chunk_documents,
        corpus_datacard,
        tfidf_keywords,
    )
    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="prep_notch", master="local[32]")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    rep = spark.range(r).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") * r + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
            "source",
        )
        .repartition(64)
        .persist()
    )
    n_docs = big.count()
    lines = [
        "",
        f"## Fourth-wave ops at the {n_docs:,}-doc notch "
        f"({datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')})",
        "",
        f"`python bench/prep_notch.py {r}` — documents ×{r} (text unmodified, "
        f"doc_id = base*{r}+rep), local[32]. Single runs (±2× VM noise); the "
        "EXACT invariants are the evidence.",
        "",
        "| op | wall (s) | output | invariant (asserted) |",
        "|---|---|---|---|",
    ]

    # tfidf: every replica's keyword set == base doc's (idf invariant)
    base_kw = {
        (rw.doc_id, rw.term, rw.tf, rw.tfidf, rw.rank)
        for rw in tfidf_keywords(docs, k=5).collect()
    }
    t0 = time.time()
    big_rows = tfidf_keywords(big, k=5).collect()
    t_tfidf = time.time() - t0
    mapped = {
        (rw.doc_id // r, rw.term, rw.tf, rw.tfidf, rw.rank) for rw in big_rows
    }
    assert mapped == base_kw, "tf·idf must be replication-invariant (idf unchanged)"
    assert len(big_rows) == r * len(base_kw), "each replica ranks identically"
    lines.append(
        f"| tfidf_keywords | {t_tfidf:.1f} | {len(big_rows):,} rows | every "
        f"replica's (term, tf, tfidf, rank) set == its base doc's — df and N "
        f"both scale ×{r}, so ln(N/df) is IDENTICAL |"
    )

    # chunks: ×R rows, ×R token mass
    base_chunks = chunk_documents(docs, 64, 48).agg(
        F.count("*"), F.sum("n_tokens")
    ).collect()[0]
    t0 = time.time()
    big_chunks = chunk_documents(big, 64, 48).agg(
        F.count("*"), F.sum("n_tokens")
    ).collect()[0]
    t_chunks = time.time() - t0
    assert big_chunks[0] == r * base_chunks[0]
    assert big_chunks[1] == r * base_chunks[1]
    lines.append(
        f"| chunk_documents | {t_chunks:.1f} | {big_chunks[0]:,} chunks | rows "
        f"and token mass EXACTLY ×{r} (zero-shuffle per-row op) |"
    )

    # datacard: leaf masses ×R, means identical
    key = lambda rw: (rw.lang, rw.source)  # noqa: E731
    base_dc = {key(rw): rw for rw in corpus_datacard(docs).collect()}
    t0 = time.time()
    big_dc = {key(rw): rw for rw in corpus_datacard(big).collect()}
    t_dc = time.time() - t0
    assert base_dc.keys() == big_dc.keys()
    for k_, b_ in base_dc.items():
        g = big_dc[k_]
        assert (g.n_docs, g.total_tokens, g.total_chars) == (
            r * b_.n_docs, r * b_.total_tokens, r * b_.total_chars,
        ), k_
        assert (g.avg_tokens, g.avg_quality) == (b_.avg_tokens, b_.avg_quality), k_
    lines.append(
        f"| corpus_datacard | {t_dc:.1f} | {len(big_dc)} slices | per-slice "
        f"counts/masses EXACTLY ×{r}; avg_tokens and avg_quality IDENTICAL |"
    )

    # classifier: identical model and per-replica scores
    B, it, lr = 128, 15, 4.0
    label = F.coalesce(F.col("lang") == "en", F.lit(False))
    fb = token_bucket_features(docs, B, label=label).persist()
    w0, b0 = train_logreg(fb, B, it, lr)
    base_scores = {rw.doc_id: rw.score for rw in score_logreg(fb, w0, b0).collect()}
    fb.unpersist()
    t0 = time.time()
    fg = token_bucket_features(big, B, label=label).persist()
    w1, b1 = train_logreg(fg, B, it, lr)
    big_scores = {rw.doc_id: rw.score for rw in score_logreg(fg, w1, b1).collect()}
    t_clf = time.time() - t0
    fg.unpersist()
    assert (w1, b1) == (w0, b0), "×R training must yield the IDENTICAL model"
    assert len(big_scores) == r * len(base_scores)
    assert all(
        big_scores[did] == base_scores[did // r] for did in big_scores
    ), "every replica must score exactly its base score"
    lines.append(
        f"| quality classifier (B={B}, {it} iters) | {t_clf:.1f} | "
        f"{len(big_scores):,} scored | weights, bias, and every replica score "
        f"IDENTICAL to base — gradient sums and n both scale ×{r}, grad/n "
        f"invariant under the 6dp rounding |"
    )

    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(out)
    print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

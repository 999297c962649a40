"""Scale-notch evidence for learned BPE (functions/bpe.py).

Replicates documents ×R WITHOUT modifying text, which buys two EXACT
invariants (asserted before anything is recorded):

  - merge-order invariance: every word frequency scales uniformly ×R, so
    relative pair counts — and ties, and their lexicographic resolution —
    are unchanged; train_bpe on the replicated corpus must return the
    IDENTICAL merge list as on the base corpus.
  - token-mass invariance: encoding replicated docs yields exactly R× the
    base corpus's total token count.

Walls are single runs on a noisy VM (±2×); the invariants and the absence
of super-linear blowup are the evidence. The histogram pass is the only
corpus-sized stage, so train wall should track the scan, not the vocab.

Usage: python bench/bpe_notch.py [R] [num_merges]
"""

from __future__ import annotations

import os
import sys
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    r_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import functions as F

    from log_parser_mind_spark.functions.bpe import train_bpe, with_bpe_tokens
    from log_parser_mind_spark.session import get_spark

    spark = get_spark(app_name="bpe_notch", master="local[32]")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    rep = spark.range(r_docs).select(F.col("id").alias("rep"))
    docs_big = (
        docs.crossJoin(rep)
        .select(
            (F.col("doc_id") * r_docs + F.col("rep")).alias("doc_id"),
            "text",
            "lang",
        )
        .repartition(64)
        .persist()
    )
    n_docs = docs_big.count()

    t0 = time.time()
    merges_base = train_bpe(docs, num_merges=num_merges)
    t_base = time.time() - t0

    t0 = time.time()
    merges_big = train_bpe(docs_big, num_merges=num_merges)
    t_big = time.time() - t0
    assert merges_big == merges_base, "merge order must be replication-invariant"

    base_total = docs.transform(lambda d: with_bpe_tokens(d, merges_base)).agg(
        F.sum(F.size("bpe_tokens"))
    ).collect()[0][0]
    t0 = time.time()
    big_total = with_bpe_tokens(docs_big, merges_base).agg(
        F.sum(F.size("bpe_tokens"))
    ).collect()[0][0]
    t_enc = time.time() - t0
    assert big_total == base_total * r_docs, (big_total, base_total, r_docs)

    lines = [
        "",
        f"## BPE train/encode at the {n_docs:,}-doc notch "
        f"({datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')})",
        "",
        f"`python bench/bpe_notch.py {r_docs} {num_merges}` — documents ×{r_docs} "
        f"(text unmodified), local[32]. Single runs (±2× VM noise); the EXACT "
        "invariants are the evidence.",
        "",
        "| stage | wall (s) | output | invariant |",
        "|---|---|---|---|",
        f"| train (base corpus) | {t_base:.1f} | {len(merges_base)} merges | — |",
        f"| train (×{r_docs} corpus) | {t_big:.1f} | {len(merges_big)} merges "
        f"| merge list IDENTICAL to base (asserted: uniform ×{r_docs} frequency "
        "scaling preserves pair order and tie resolution) |",
        f"| encode (×{r_docs} corpus) | {t_enc:.1f} | {big_total:,} tokens "
        f"| == base {base_total:,} × {r_docs} exactly (asserted) |",
    ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(out)
    print(out, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

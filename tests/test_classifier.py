"""Tests for operators/classifier.py: hashing-trick logistic regression
trained through DataFrame aggs — mirror equality, learning sanity,
parallelism invariance, and the stateless-scoring contract."""

import math
import zlib

import pytest
from pyspark.sql import functions as F

from log_parser_mind_spark.operators.classifier import (
    score_logreg,
    token_bucket_features,
    train_logreg,
)

# clearly separable toy corpus: disjoint vocabularies
GOOD = ["the quick brown fox jumps", "a calm clear morning walk", "the garden is green and quiet"]
BAD = ["zzkw qqrv xxtp yyln", "qqrv zzkw wwgg", "xxtp yyln zzkw qqrv wwgg"]


def _docs(spark, rows=None):
    rows = rows or [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _mirror_train(rows, B, it, lr):
    mf = {}
    for did, text, y in rows:
        toks = [t for t in (text or "").lower().split() if t]
        if not toks:
            continue
        n, cnt = len(toks), {}
        for t in toks:
            k = zlib.crc32(t.encode("utf-8")) % B
            cnt[k] = cnt.get(k, 0) + 1
        mf[did] = (float(y), sorted((k, c / n) for k, c in cnt.items()))
    N = len(mf)
    w, b = [0.0] * B, 0.0
    for _ in range(it):
        grad, gb = [0.0] * B, 0.0
        for y, pairs in mf.values():
            z = b + sum(w[k] * x for k, x in pairs)
            e = 1.0 / (1.0 + math.exp(-z)) - y
            for k, x in pairs:
                grad[k] += e * x
            gb += e
        w = [wi - lr * round(g / N, 6) for wi, g in zip(w, grad)]
        b -= lr * round(gb / N, 6)
    scores = {
        did: round(1.0 / (1.0 + math.exp(-(b + sum(w[k] * x for k, x in pairs)))), 6)
        for did, (y, pairs) in mf.items()
    }
    return w, b, scores


def test_train_and_score_match_python_mirror(spark):
    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ] + [(999, "", 1), (998, None, 0)]
    B, it, lr = 32, 12, 2.0
    feats = token_bucket_features(_docs(spark, rows), B, label=F.col("y") == 1)
    w, b = train_logreg(feats, B, it, lr)
    wm, bm, sm = _mirror_train(rows, B, it, lr)
    assert w == wm and b == bm
    got = {r.doc_id: r.score for r in score_logreg(feats, w, b).collect()}
    assert got == sm
    # token-less docs carry no features and no scores
    assert 999 not in got and 998 not in got


def test_learns_separable_corpus(spark):
    B = 32
    feats = token_bucket_features(_docs(spark), B, label=F.col("y") == 1)
    w, b = train_logreg(feats, B, iterations=60, lr=8.0)
    scored = {r.doc_id: r.score for r in score_logreg(feats, w, b).collect()}
    good = [s for d, s in scored.items() if d < 100]
    bad = [s for d, s in scored.items() if d >= 100]
    # disjoint vocabularies -> full separation
    assert min(good) > max(bad)
    assert min(good) > 0.6 and max(bad) < 0.4


def test_train_parallelism_invariant(spark):
    rows = [(i, GOOD[i % 3] + f" extra{i % 7}", i % 2) for i in range(200)]
    B = 16
    f1 = token_bucket_features(
        _docs(spark, rows).repartition(1), B, label=F.col("y") == 1
    )
    f16 = token_bucket_features(
        _docs(spark, rows).repartition(16), B, label=F.col("y") == 1
    )
    assert train_logreg(f1, B, 8, 2.0) == train_logreg(f16, B, 8, 2.0)


def test_scoring_is_stateless_and_lifts_to_streaming(spark, tmp_path):
    """score_logreg is a pure projection — the SAME call scores a stream
    (inline filtering at ingestion); availableNow == batch, row for row."""
    B = 16
    feats = token_bucket_features(_docs(spark), B, label=F.col("y") == 1)
    w, b = train_logreg(feats, B, 5, 2.0)
    batch = sorted(map(tuple, score_logreg(feats, w, b).collect()))

    in_path, out, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    feats.write.parquet(in_path)
    stream = spark.readStream.schema(feats.schema).parquet(in_path)
    q = (
        score_logreg(stream, w, b)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == batch


def test_validation(spark):
    feats = token_bucket_features(_docs(spark), 16, label=F.col("y") == 1)
    with pytest.raises(ValueError, match="iterations"):
        train_logreg(feats, 16, iterations=0)
    with pytest.raises(ValueError, match="n_buckets"):
        token_bucket_features(_docs(spark), 1)
    empty = token_bucket_features(
        _docs(spark, [(1, "", 1), (2, None, 0)]), 16, label=F.col("y") == 1
    )
    with pytest.raises(ValueError, match="token-less"):
        train_logreg(empty, 16, 3)


def test_caller_persist_is_respected(spark):
    from pyspark import StorageLevel

    feats = token_bucket_features(_docs(spark), 16, label=F.col("y") == 1).persist()
    try:
        train_logreg(feats, 16, 2, 1.0)
        # training must not clobber a caller-owned cache
        assert feats.storageLevel != StorageLevel.NONE
    finally:
        feats.unpersist()


def test_null_labels_raise(spark):
    rows = [(1, "a b c", 1), (2, "d e f", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    feats = token_bucket_features(df, 16, label=F.col("y") == 1)
    with pytest.raises(ValueError, match="NULL y"):
        train_logreg(feats, 16, 2, 1.0)


def test_curate_corpus_model_stage(spark):
    """The trained model plugs into the curation funnel as a fourth stage:
    low-score docs drop, survivors carry model_score, bucket-count
    mismatches fail loudly."""
    from log_parser_mind_spark.operators.curate import curate_corpus

    B = 32
    feats = token_bucket_features(_docs(spark), B, label=F.col("y") == 1)
    w, b = train_logreg(feats, B, iterations=60, lr=8.0)

    rows = [(i, t, 1) for i, t in enumerate(GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(BAD)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    base = {r.doc_id for r in curate_corpus(docs, persist_intermediate=False).collect()}
    out = curate_corpus(
        docs, persist_intermediate=False,
        model=(w, b), model_buckets=B, min_model_score=0.5,
    ).collect()
    kept = {r.doc_id for r in out}
    # the separable model keeps exactly the GOOD docs that survived the
    # earlier stages, and every survivor carries its score
    assert kept == {d for d in base if d < 100}
    assert all(r.model_score > 0.5 for r in out)
    with pytest.raises(ValueError, match="model_buckets"):
        curate_corpus(docs, model=(w, b), model_buckets=B * 2)

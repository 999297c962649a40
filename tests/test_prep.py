"""Tests for operators/prep.py (tf-idf keywords, token chunking, datacard)
and dedup.semantic_dedup — Python-reference mirrors plus edge rows."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from log_parser_mind_spark.operators.dedup import semantic_dedup
from log_parser_mind_spark.operators.prep import (
    chunk_documents,
    corpus_datacard,
    tfidf_keywords,
)

DOCS = [
    (1, "alpha beta beta gamma", "en", "s1"),
    (2, "alpha alpha delta", "en", "s1"),
    (3, "beta gamma gamma gamma epsilon", "es", "s2"),
    (4, "", "es", "s2"),
    (5, None, None, "s2"),
    (6, "  zeta   zeta  ", "en", None),
]


def _docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string"
    )


def _py_tokens(text, lower=True):
    t = (text or "")
    if lower:
        t = t.lower()
    return [w for w in t.split() if w]


# -- tfidf -------------------------------------------------------------------


def _py_tfidf(rows, k):
    tf = {}
    for did, text, *_ in rows:
        for term in _py_tokens(text):
            tf[(did, term)] = tf.get((did, term), 0) + 1
    df = {}
    for (_, term) in tf:
        df[term] = df.get(term, 0) + 1
    n = len(rows)
    by_doc = {}
    for (did, term), c in tf.items():
        score = round(c * math.log(n / df[term]), 6)
        by_doc.setdefault(did, []).append((-score, term, c, df[term], score))
    out = []
    for did, items in by_doc.items():
        for rank, (_, term, c, d, score) in enumerate(sorted(items)[:k], 1):
            out.append((did, term, c, d, score, rank))
    return sorted(out)


def test_tfidf_matches_python_mirror(spark):
    got = sorted(map(tuple, tfidf_keywords(_docs(spark), k=2).collect()))
    assert got == _py_tfidf(DOCS, 2)


def test_tfidf_edges(spark):
    out = tfidf_keywords(_docs(spark), k=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # token-less docs yield no rows
    assert 4 not in by_doc and 5 not in by_doc
    # doc 6: one distinct term, tf=2, df=1, idf=ln(6/1)
    (r6,) = by_doc[6]
    assert (r6.term, r6.tf, r6.df, r6.rank) == ("zeta", 2, 1, 1)
    assert r6.tfidf == round(2 * math.log(6), 6)
    # ranks are 1..n without gaps, ordered by (score desc, term asc)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        keys = [(-r.tfidf, r.term) for r in rows]
        assert keys == sorted(keys)
    with pytest.raises(ValueError, match="k must be"):
        tfidf_keywords(_docs(spark), k=0)


# -- chunking ----------------------------------------------------------------


def _py_chunks(rows, c, s):
    out = []
    for did, text, *_ in rows:
        toks = _py_tokens(text, lower=False)
        n = len(toks)
        if n == 0:
            continue
        n_chunks = 1 if n <= c else 1 + -(-(n - c) // s)
        for i in range(n_chunks):
            piece = toks[i * s : i * s + c]
            out.append((did, i, len(piece), " ".join(piece)))
    return sorted(out)


@pytest.mark.parametrize("c,s", [(3, 2), (4, 4), (2, 1), (1, 1)])
def test_chunks_match_python_mirror(spark, c, s):
    got = sorted(map(tuple, chunk_documents(_docs(spark), c, s).collect()))
    assert got == _py_chunks(DOCS, c, s)


def test_chunk_boundaries_and_coverage(spark):
    # 7 tokens, C=3, S=2 -> chunks at 0..2, 2..4, 4..6, 6 (1 + ceil(4/2)=3... )
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    rows = sorted(map(tuple, chunk_documents(df, 3, 2).collect()))
    assert rows == [
        (1, 0, 3, "a b c"),
        (1, 1, 3, "c d e"),
        (1, 2, 3, "e f g"),
    ]
    # n == C exactly -> one chunk; n == C+1 -> two (last short)
    df2 = spark.createDataFrame([(1, "a b c"), (2, "a b c d")], "doc_id long, text string")
    rows2 = sorted(map(tuple, chunk_documents(df2, 3, 2).collect()))
    assert rows2 == [(1, 0, 3, "a b c"), (2, 0, 3, "a b c"), (2, 1, 2, "c d")]
    # every token index covered at any valid (C, S)
    toks = "t0 t1 t2 t3 t4 t5 t6 t7 t8".split()
    df3 = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    for c, s in [(4, 3), (4, 1), (9, 9), (2, 2)]:
        covered = set()
        for r in chunk_documents(df3, c, s).collect():
            got = r.chunk_text.split()
            start = r.chunk_idx * s
            assert got == toks[start : start + c]
            covered.update(range(start, start + len(got)))
        assert covered == set(range(len(toks))), (c, s)


def test_chunk_validation(spark):
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(_docs(spark), 0, 1)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(_docs(spark), 4, 5)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(_docs(spark), 4, 0)


# -- datacard ----------------------------------------------------------------


def test_datacard_rollup_and_null_labels(spark):
    rows = {(r.lang, r.source): r for r in corpus_datacard(_docs(spark)).collect()}
    # leaf, lang-subtotal, and grand-total levels all present
    assert ("en", "s1") in rows and ("en", "ALL") in rows and ("ALL", "ALL") in rows
    # NULL data values label as '(null)', distinct from rollup 'ALL'
    assert ("(null)", "s2") in rows and ("en", "(null)") in rows
    g = rows[("ALL", "ALL")]
    assert g.n_docs == 6
    assert g.total_tokens == sum(len(_py_tokens(t)) for _, t, *_ in DOCS)
    assert g.total_chars == sum(len(t or "") for _, t, *_ in DOCS)
    # subtotals are consistent: lang rows sum to the grand total
    lang_rows = [r for (l, s), r in rows.items() if s == "ALL" and l != "ALL"]
    assert sum(r.n_docs for r in lang_rows) == g.n_docs
    assert sum(r.total_tokens for r in lang_rows) == g.total_tokens
    # avg_tokens is the exact mean of the leaf docs
    en_s1 = rows[("en", "s1")]
    assert en_s1.n_docs == 2 and en_s1.avg_tokens == round((4 + 3) / 2, 6)
    # quality mean equals the micro-unit recomputation
    from log_parser_mind_spark.functions.text import quality_score_from, with_tokens

    q = (
        with_tokens(_docs(spark))
        .select(F.round(quality_score_from(F.col("tokens"), F.col("text")) * 1e6).cast("long").alias("qm"))
        .agg(F.sum("qm"))
        .collect()[0][0]
    )
    assert g.avg_quality == round(q / 6 / 1e6, 6)


# -- semantic dedup ----------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_drops_planted_copies(spark):
    rng = np.random.default_rng(7)
    base = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)]
    # plant exact copies under larger ids: identical vectors always share a
    # cluster, cosine 1.0 >= any threshold -> every copy must drop
    planted = base + [(i + 100, v) for i, v in base]
    kept = semantic_dedup(
        _vecs(spark, planted), threshold=0.999, n_centroids=4, iterations=2, dim=8
    )
    assert sorted(r.vec_id for r in kept.collect()) == [i for i, _ in base]


def test_semantic_dedup_matches_numpy_mirror(spark):
    from log_parser_mind_spark.operators.similarity import ivf_assignments

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(40)]
    # a couple of highly-correlated pairs so a mid threshold bites
    rows += [(200 + i, [v + 0.01 for v in rows[i][1]]) for i in range(5)]
    df = _vecs(spark, rows)
    thr, k, iters = 0.9, 3, 2
    kept = sorted(
        (r.vec_id, r.centroid_id)
        for r in semantic_dedup(df, thr, k, iters, dim=6).collect()
    )
    a = ivf_assignments(df, k, iters, dim=6).collect()
    by_cid = {}
    for r in a:
        by_cid.setdefault(r.centroid_id, []).append(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
        )
    drop = set()
    for items in by_cid.values():
        items.sort(key=lambda t: t[0])
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                va, vb = items[i][1], items[j][1]
                na, nb = np.linalg.norm(va), np.linalg.norm(vb)
                if na == 0 or nb == 0:
                    continue
                if round(float(va @ vb / (na * nb)), 6) >= thr:
                    drop.add(items[j][0])
    assert drop, "mirror found no near-dups — test lost its teeth"
    want = sorted((r.vec_id, r.centroid_id) for r in a if r.vec_id not in drop)
    assert kept == want


def test_semantic_dedup_zero_vector_kept(spark):
    rows = [(1, [0.0] * 4), (2, [0.0] * 4), (3, [1.0, 0.0, 0.0, 0.0])]
    kept = semantic_dedup(_vecs(spark, rows), 0.5, n_centroids=2, iterations=1, dim=4)
    # zero-norm vectors have undefined cosine -> never near-dups -> all kept
    assert sorted(r.vec_id for r in kept.collect()) == [1, 2, 3]


def test_tfidf_doc_terms_unpersist_handle(spark):
    from pyspark import StorageLevel

    out = tfidf_keywords(_docs(spark), k=2)
    out.count()
    assert out.doc_terms.storageLevel != StorageLevel.NONE
    out.doc_terms.unpersist()
    assert out.doc_terms.storageLevel == StorageLevel.NONE


def test_chunk_plan_tokenizes_once(spark):
    # the split must live in its own projection (referenced >1x), not be
    # inlined per consumer — Catalyst does not CSE regex trees
    plan = chunk_documents(_docs(spark), 4, 2)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1


def test_semantic_dedup_assignments_handle(spark):
    from pyspark import StorageLevel

    rng = np.random.default_rng(3)
    df = _vecs(spark, [(i, [float(x) for x in rng.normal(size=4)]) for i in range(10)])
    out = semantic_dedup(df, 0.99, n_centroids=2, iterations=1, dim=4)
    out.count()
    assert out.assignments.storageLevel != StorageLevel.NONE
    out.assignments.unpersist()


def test_chunk_plan_zero_exchange(spark):
    plan = chunk_documents(_docs(spark), 4, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunking_lifts_to_streaming(spark, tmp_path):
    """chunk_documents is stateless per-row, so the SAME call chunks a
    stream (chunk-at-ingestion); availableNow == batch, row for row."""
    in_path, out, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    docs = _docs(spark)
    docs.write.parquet(in_path)
    batch = sorted(map(tuple, chunk_documents(docs, 3, 2).collect()))
    stream = spark.readStream.schema(docs.schema).parquet(in_path)
    q = (
        chunk_documents(stream, 3, 2)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == batch

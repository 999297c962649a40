"""Learned BPE tokenization (functions/bpe.py) vs the independent
oracle mirror (oracle.py bpe_*): double-entry on the merge table and the
encoder, character-preservation round-trip, parallelism invariance, and
validation. The mirror is a NAIVE recount-per-iteration trainer — a
different algorithm than the engine's incremental pair bookkeeping, so
agreement is evidence of the spec, not shared code."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from log_parser_mind_spark import oracle
from log_parser_mind_spark.functions.bpe import (
    bpe_word_histogram,
    merges_table,
    train_bpe,
    with_bpe_tokens,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
    "Mixed CASE tokens; punct!! and under_scores 123",
]


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_train_matches_naive_mirror(spark):
    got = train_bpe(_df(spark, CORPUS), num_merges=20)
    want = oracle.bpe_train(oracle.bpe_histogram(pd.Series(CORPUS)), 20)
    assert got == want
    assert len(got) == 20


def test_train_on_documents_matches_mirror(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = train_bpe(docs, num_merges=60)
    pdf = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    want = oracle.bpe_train(oracle.bpe_histogram(pdf["text"]), 60)
    assert got == want


def test_train_parallelism_invariant(spark):
    df = _df(spark, CORPUS * 8)
    assert train_bpe(df.repartition(1), 15) == train_bpe(df.repartition(16), 15)


def test_max_word_types_cap_matches_mirror(spark):
    got = train_bpe(_df(spark, CORPUS), num_merges=10, max_word_types=3)
    want = oracle.bpe_train(oracle.bpe_histogram(pd.Series(CORPUS)), 10, max_word_types=3)
    assert got == want


def test_histogram_is_exact(spark):
    rows = {r.word: r.freq for r in bpe_word_histogram(_df(spark, CORPUS)).collect()}
    assert rows["low"] == 5 and rows["newest"] == 6 and rows["!"] == 2
    assert rows["under_scores"] == 1  # _ stays inside the word class


def test_encode_matches_mirror_and_preserves_chars(spark):
    merges = train_bpe(_df(spark, CORPUS), num_merges=20)
    texts = CORPUS + ["", None, "unseen zzzqqq words", "newestnewest"]
    enc = with_bpe_tokens(_df(spark, texts), merges)
    got = {r.doc_id: list(r.bpe_tokens) for r in enc.collect()}
    for i, t in enumerate(texts):
        assert got[i] == oracle.bpe_encode(t, merges), (i, t)
        # round-trip: token concatenation re-spells the pre-tokenized text
        import re
        words = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]", re.ASCII).findall(
            (t or "").lower()
        )
        assert "".join(got[i]) == "".join(words)
    assert got[len(CORPUS)] == [] and got[len(CORPUS) + 1] == []


def test_fully_merged_training_words_encode_to_one_token(spark):
    # A word that dominates training ends up a single token under enough
    # merges — the property vocab learning exists to deliver.
    merges = train_bpe(_df(spark, ["newest newest newest newest"]), num_merges=10)
    assert oracle.bpe_encode("newest", merges) == ["newest"]


def test_merges_table_shape(spark):
    merges = train_bpe(_df(spark, CORPUS), num_merges=5)
    mt = merges_table(spark, merges)
    rows = mt.orderBy("rank").collect()
    assert [(r.left, r.right) for r in rows] == merges
    assert all(r.token == r.left + r.right for r in rows)


def test_no_pairs_corpus_trains_empty(spark):
    assert train_bpe(_df(spark, ["a b c", "d e"]), num_merges=5) == []


def test_validation():
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(None, num_merges=0)
    with pytest.raises(ValueError, match="max_word_types"):
        train_bpe(None, num_merges=1, max_word_types=0)


def test_encode_plan_is_one_arrow_stage(spark):
    """Encoding = JVM pre-tokenize + ONE Arrow-batched pandas UDF, no
    shuffle: the plan must show a single ArrowEvalPython and no Exchange."""
    merges = [("l", "o")]
    enc = with_bpe_tokens(_df(spark, CORPUS), merges)
    plan = enc._sc._jvm.PythonSQLUtils.explainString(
        enc._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 1
    assert "Exchange" not in tree
    assert "BatchEvalPython" not in plan


def test_merges_round_trip_through_table(spark):
    merges = train_bpe(_df(spark, CORPUS), num_merges=12)
    from log_parser_mind_spark.functions.bpe import merges_from_table

    assert merges_from_table(merges_table(spark, merges)) == merges
    dup = spark.createDataFrame(
        [(0, "a", "b", "ab"), (0, "c", "d", "cd")],
        "rank long, left string, right string, token string",
    )
    with pytest.raises(ValueError, match="ambiguous"):
        merges_from_table(dup)


def test_encode_lifts_to_streaming(spark, tmp_path):
    """with_bpe_tokens is stateless, so the SAME call runs unchanged on a
    streaming DataFrame — encode-at-ingestion for a training pipeline.
    availableNow batch == batch encode, row for row."""
    merges = train_bpe(_df(spark, CORPUS), num_merges=10)
    in_path, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    batch_df = _df(spark, CORPUS)
    batch_df.write.parquet(in_path)
    stream = spark.readStream.schema("doc_id long, text string").parquet(in_path)
    q = (
        with_bpe_tokens(stream, merges)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming encode did not finish"
    got = sorted(
        (r.doc_id, tuple(r.bpe_tokens)) for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        (r.doc_id, tuple(r.bpe_tokens))
        for r in with_bpe_tokens(batch_df, merges).collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Property tests (pure Python — no Spark): the engine's INCREMENTAL merge
# loop and greedy encoder vs the oracle's naive recount trainer / from-
# scratch encoder, over random histograms. Agreement across random inputs
# is the evidence that the incremental pair bookkeeping (the part that
# could silently drift: stale counts after a merge, repeated pairs inside
# one word, tie resolution) implements the same spec.
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st

_WORDS = st.text(alphabet="abcxy", min_size=1, max_size=8)


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(_WORDS, st.integers(min_value=1, max_value=9), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=25),
)
def test_incremental_merge_loop_matches_naive(hist, num_merges):
    from log_parser_mind_spark.functions.bpe import _merge_loop

    capped = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))
    got = _merge_loop(capped, num_merges)
    want = oracle.bpe_train(hist, num_merges)
    assert got == want


@settings(max_examples=150, deadline=None)
@given(
    st.dictionaries(_WORDS, st.integers(min_value=1, max_value=9), min_size=1, max_size=15),
    _WORDS,
)
def test_greedy_encoder_matches_oracle_and_preserves_chars(hist, word):
    from log_parser_mind_spark.functions.bpe import _encode_word

    merges = oracle.bpe_train(hist, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = _encode_word(word, ranks)
    assert got == oracle.bpe_encode(word, merges)
    assert "".join(got) == word

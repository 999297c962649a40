"""Streaming smoke tests: windowed aggregates equal their batch analogs on a
bounded file stream; the incremental foreachBatch pipeline accumulates the
templates dimension idempotently across micro-batches.
"""

import pytest

from pyspark.sql import functions as F

from log_parser_mind_spark.streaming import stream as st
from log_parser_mind_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def staged_input(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in") / "transcripts")
    df = synth_transcripts(spark, n_convs=30, seed=11)
    df.repartition(6).write.mode("overwrite").parquet(path)
    return path, df


def test_streaming_error_rates_matches_batch(spark, staged_input, tmp_path):
    path, batch_df = staged_input
    stream = st.stream_transcripts(spark, path, max_files=2)
    q = (
        st.streaming_error_rates(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("er_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select source, minute.start as minute, error_count, warn_count, total_count from er_out")
        .orderBy("source", "minute")
        .collect()
    )
    sev = F.when(F.col("text").like("%ERROR%"), "error").when(
        F.col("text").like("%WARN%"), "warn"
    ).otherwise("info")
    want = (
        batch_df.groupBy(F.col("role").alias("source"), F.date_trunc("minute", "ts").alias("minute"))
        .agg(
            F.count(F.when(sev == "error", 1)).alias("error_count"),
            F.count(F.when(sev == "warn", 1)).alias("warn_count"),
            F.count(F.lit(1)).alias("total_count"),
        )
        .orderBy("source", "minute")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_incremental_pipeline_accumulates_templates(spark, staged_input, tmp_path):
    path, batch_df = staged_input
    root = str(tmp_path / "stream_wh")
    stream = st.stream_transcripts(spark, path, max_files=2)
    q = st.incremental_pipeline(spark, stream, root).start()
    q.awaitTermination(180)

    from log_parser_mind_spark.sources.manifest import SnapshotStore
    from log_parser_mind_spark.operators.parse import parse_pipeline

    store = SnapshotStore(spark, root)
    streamed = store.read("stream_templates")
    _, batch_templates, _ = parse_pipeline(batch_df)
    # Mass conservation: every parsed row is accounted for exactly once
    # across micro-batches (exactly-once upgrade over the reference's
    # drop-on-full at-most-once pool, worker.go:162-179).
    streamed_mass = streamed.agg(F.sum("log_count")).collect()[0][0]
    batch_mass = batch_templates.agg(F.sum("log_count")).collect()[0][0]
    assert streamed_mass == batch_mass
    # Micro-batch mining may keep templates finer than whole-batch mining
    # (a cluster only generalizes when its variants co-occur in one batch —
    # the same order-dependence the reference tree has), never coarser.
    assert streamed.count() >= batch_templates.count()
    # IDs are content hashes → stable format everywhere.
    assert streamed.filter(~F.col("template_id").startswith("tmpl_")).count() == 0

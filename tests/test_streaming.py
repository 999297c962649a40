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


def test_seed_templates_pre_populate_clusters(spark):
    """T4 seeding: a sig arriving in a later batch that matches a previously
    committed template at ≥ sim_threshold reuses it (creates=False) instead
    of founding its own finer-grained cluster."""
    import datetime as dt

    from log_parser_mind_spark.operators.miner import mine_assignments, templates_from_assignments
    from log_parser_mind_spark.operators.parse import masked_transcripts

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

    def tr(texts, conv):
        return spark.createDataFrame(
            [(conv, i, "user", t, "none", dt.datetime(2024, 1, 1, 0, 0, i)) for i, t in enumerate(texts)],
            schema,
        )

    # Batch 1: two variants generalize to 'task alpha finished cleanly okay <*>'
    b1 = tr(["task alpha finished cleanly okay one", "task alpha finished cleanly okay two"], "c1")
    a1 = mine_assignments(masked_transcripts(b1, 4))
    t1 = templates_from_assignments(a1)
    assert t1.collect()[0].pattern == "task alpha finished cleanly okay <*>"

    # Batch 2 alone: the lone third variant keeps its literal sig.
    b2 = tr(["task alpha finished cleanly okay three"], "c2")
    alone = mine_assignments(masked_transcripts(b2, 4)).collect()[0]
    assert alone.template == "task alpha finished cleanly okay three"
    assert alone.creates

    # Batch 2 with batch-1 templates as seeds: reuses the committed template.
    seeded = mine_assignments(masked_transcripts(b2, 4), seed_templates=t1).collect()[0]
    assert seeded.template == "task alpha finished cleanly okay <*>"
    assert seeded.template_id == t1.collect()[0].template_id
    assert not seeded.creates


def test_stream_parsed_lifecycle_compact_vacuum(spark, staged_input, tmp_path):
    """The streaming fact sink's full lifecycle: per-epoch snapshots union
    into the append-table view, compaction consolidates their small files
    into one right-sized snapshot with identical rows, and vacuum reclaims
    the superseded epoch dirs — the ClickHouse-background-merge analog the
    parquet emulation must provide explicitly."""
    import os

    from log_parser_mind_spark.sources.manifest import SnapshotStore

    path, batch_df = staged_input
    root = str(tmp_path / "stream_wh_compact")
    q = st.incremental_pipeline(
        spark, st.stream_transcripts(spark, path, max_files=2), root
    ).start()
    q.awaitTermination(180)

    store = SnapshotStore(spark, root)
    epochs = store.visible_snapshots("stream_parsed")
    assert len(epochs) > 1  # multiple micro-batches committed
    view = store.read_all("stream_parsed")
    keys_before = sorted(
        (r.conv_id, r.turn_idx) for r in view.select("conv_id", "turn_idx").collect()
    )
    assert len(keys_before) == batch_df.count()  # exactly-once, no drops

    def n_files(sid):
        d = os.path.join(root, "stream_parsed", f"snapshot={sid}")
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    files_before = sum(n_files(s) for s in epochs)
    sid = store.compact("stream_parsed", rows_per_file=1_000_000)
    assert store.visible_snapshots("stream_parsed") == [sid]
    assert n_files(sid) == 1 < files_before
    keys_after = sorted(
        (r.conv_id, r.turn_idx)
        for r in store.read_all("stream_parsed").select("conv_id", "turn_idx").collect()
    )
    assert keys_after == keys_before

    deleted = store.vacuum("stream_parsed")
    assert deleted == epochs
    assert sorted(
        (r.conv_id, r.turn_idx)
        for r in store.read_all("stream_parsed").select("conv_id", "turn_idx").collect()
    ) == keys_before


def test_lineage_lives_in_overridden_checkpoint(spark, staged_input, tmp_path):
    """ADVICE r3 (medium): with a caller-chosen checkpoint dir, the replay-
    dedup lineage uuid must live INSIDE that dir so deleting the checkpoint
    (a recovery action) also resets the lineage — epoch ids restarting at 0
    then commit under a FRESH lineage instead of matching stale commits and
    silently dropping new batches."""
    import os
    import shutil

    from log_parser_mind_spark.sources.manifest import SnapshotStore

    path, batch_df = staged_input
    root = str(tmp_path / "wh")
    ck = str(tmp_path / "custom_ck")

    st.incremental_pipeline(spark, st.stream_transcripts(spark, path), root,
                            checkpoint_location=ck)
    # Lineage pinned inside the ACTUAL checkpoint dir, not the default one.
    assert os.path.exists(os.path.join(ck, "_lineage"))
    assert not os.path.exists(os.path.join(root, "_checkpoint"))

    q = st.incremental_pipeline(
        spark, st.stream_transcripts(spark, path), root, checkpoint_location=ck
    ).start()
    q.awaitTermination(180)
    store = SnapshotStore(spark, root)
    epochs_before = store.visible_snapshots("stream_parsed")
    with open(os.path.join(ck, "_lineage")) as fh:
        lineage_before = fh.read().strip()

    # Recovery: checkpoint wiped, warehouse kept. Epochs replay from 0; the
    # fresh lineage must make them COMMIT (dupes acceptable, loss is not).
    shutil.rmtree(ck)
    q = st.incremental_pipeline(
        spark, st.stream_transcripts(spark, path), root, checkpoint_location=ck
    ).start()
    q.awaitTermination(180)
    with open(os.path.join(ck, "_lineage")) as fh:
        assert fh.read().strip() != lineage_before
    assert len(store.visible_snapshots("stream_parsed")) > len(epochs_before)
    # The replayed input is fully present (at-least-once on parsed rows).
    replayed = (
        store.read_all("stream_parsed").select("conv_id", "turn_idx").distinct().count()
    )
    assert replayed == batch_df.count()


def test_streaming_exact_dedup_across_batches_and_restart(spark, tmp_path):
    """Dedup-at-ingestion: a duplicate arriving in a LATER micro-batch is
    dropped by the state store, ws/case variants dedup under the shared
    normalization, and the state survives a query restart (second
    availableNow run still drops a re-arrival of a first-run doc)."""
    import datetime as dt

    from log_parser_mind_spark.schemas import TRANSCRIPTS
    from log_parser_mind_spark.streaming.stream import streaming_exact_dedup

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def tr(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )

    in_path = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(TRANSCRIPTS).parquet(in_path)
        q = (
            streaming_exact_dedup(stream)
            .select("conv_id", "_norm")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "streaming query did not finish in time"
        return spark.read.parquet(out_dir).collect()

    tr([("c1", 0, "u", "hello world", "none", t0),
        ("c2", 0, "u", "HELLO   world", "none", t0),      # normalized dup of c1
        ("c3", 0, "u", "something else", "none", t0)]
       ).repartition(1).write.mode("append").parquet(in_path)
    first = run()
    assert sorted(r._norm for r in first) == ["hello world", "something else"]

    # Later batch: one cross-batch dup (dropped by state), one new doc.
    tr([("c4", 0, "u", "hello world", "none", t0 + dt.timedelta(minutes=1)),
        ("c5", 0, "u", "fresh content", "none", t0 + dt.timedelta(minutes=1))]
       ).repartition(1).write.mode("append").parquet(in_path)
    both = run()
    norms = sorted(r._norm for r in both)
    assert norms == ["fresh content", "hello world", "something else"]
    assert not any(r.conv_id == "c4" for r in both)  # restart-recovered state dropped it


def test_streaming_dedup_watermark_branch(spark, tmp_path):
    """The dropDuplicatesWithinWatermark path (state bounded to the dedup
    window): a duplicate arriving within the watermark window — including in
    a LATER micro-batch — is dropped; the unique doc passes."""
    import datetime as dt

    from log_parser_mind_spark.schemas import TRANSCRIPTS
    from log_parser_mind_spark.streaming.stream import streaming_exact_dedup

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    in_path = str(tmp_path / "in")
    rows1 = [("c1", 0, "u", "alpha beta", "none", t0),
             ("c2", 0, "u", "ALPHA  beta", "none", t0 + dt.timedelta(seconds=5))]
    rows2 = [("c3", 0, "u", "alpha beta", "none", t0 + dt.timedelta(minutes=2)),
             ("c4", 0, "u", "gamma delta", "none", t0 + dt.timedelta(minutes=2))]
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    spark.createDataFrame(rows1, schema).repartition(1).write.mode("append").parquet(in_path)
    spark.createDataFrame(rows2, schema).repartition(1).write.mode("append").parquet(in_path)

    stream = spark.readStream.schema(TRANSCRIPTS).parquet(in_path)
    q = (
        streaming_exact_dedup(stream, ts_col="ts", watermark="1 hour")
        .select("conv_id", "_norm")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not finish in time"
    got = spark.read.parquet(str(tmp_path / "out")).collect()
    # The deterministic surface is the kept KEY set (which physical row
    # survives a tie is partition/batch-order dependent — the operator's
    # documented contract): exactly one row per normalized text.
    norms = sorted(r._norm for r in got)
    assert norms == ["alpha beta", "gamma delta"]


def test_stateful_pipeline_hybrid_converges_and_resumes(spark, tmp_path):
    """The HYBRID path (docs/streaming.md): state-store mining + per-turn
    assignment in the query, foreachBatch committing both sinks. Must
    converge to the one-shot batch parse (parsed rows per turn, template
    set + counts) across 2 mtime-ordered micro-batches, and a re-run over
    the same checkpoint must be a no-op (exactly-once run_ids)."""
    from log_parser_mind_spark.operators.parse import parse_pipeline
    from log_parser_mind_spark.sources.manifest import SnapshotStore

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = dt.timedelta(seconds=1)
    rows = []
    # Contract-satisfying corpus (no cross-batch generalization): batch 1
    # (conv a*) fully generalizes each cluster within the batch; batch 2
    # (conv m*) only re-hits established templates or founds disjoint ones.
    for i, host in enumerate(("alpha", "beta", "gamma")):
        rows.append(("a0", i, "user", f"connect failed to {host}", "none", t0 + i * s))
    rows.append(("a1", 0, "agent", "disk usage at 93 percent now", "none", t0 + 4 * s))
    rows.append(("a1", 1, "agent", "disk usage at 77 percent now", "none", t0 + 5 * s))
    rows.append(("m0", 0, "user", "connect failed to delta", "none", t0 + 6 * s))
    rows.append(("m0", 1, "user", "queue depth exceeded hard limit", "none", t0 + 7 * s))
    rows.append(("m1", 0, "agent", "disk usage at 50 percent now", "none", t0 + 8 * s))
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    in_path = str(tmp_path / "hy_in")
    df.repartitionByRange(2, "conv_id").write.parquet(in_path)
    st.pin_stream_file_order(in_path)

    root = str(tmp_path / "hy_snap")

    def run():
        stream = st.stream_transcripts(spark, in_path, max_files=1)
        q = st.stateful_pipeline(spark, stream, root).start()
        assert q.awaitTermination(180), "stateful_pipeline did not finish"

    run()
    store = SnapshotStore(spark, root)
    got_parsed = store.read_all("stream_parsed")
    got_templates = store.read("stream_templates")

    want_parsed, want_templates, _ = parse_pipeline(df)
    cols = ["conv_id", "turn_idx", "template_id", "template", "is_new",
            "original_size", "compressed_size"]
    g = sorted(map(tuple, got_parsed.select(*cols).collect()))
    w = sorted(map(tuple, want_parsed.select(*cols).collect()))
    assert g == w

    gt = sorted(map(tuple, got_templates.select("template_id", "pattern", "log_count").collect()))
    wt = sorted(map(tuple, want_templates.select(
        "template_id", "pattern", F.col("log_count").cast("long")).collect()))
    assert gt == wt

    # resume over the same checkpoint: no new input -> no duplicate commits
    run()
    assert store.read_all("stream_parsed").count() == len(g)
    gt2 = sorted(map(tuple, store.read("stream_templates")
                     .select("template_id", "pattern", "log_count").collect()))
    assert gt2 == gt


def test_streaming_contamination_alerts_converge_to_batch_audit(spark, tmp_path):
    """Ingestion-time contamination alerts: a doc carrying a verbatim
    benchmark n-gram alerts exactly once (even with multiple hit grams),
    clean docs never alert, a contaminated doc arriving in a LATER
    micro-batch still alerts, and the alert set equals the batch
    exact_contamination audit over the same corpus."""
    import datetime as dt

    from log_parser_mind_spark.operators.curate import exact_contamination
    from log_parser_mind_spark.schemas import TRANSCRIPTS
    from log_parser_mind_spark.streaming.stream import streaming_contamination_alerts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    bench = spark.createDataFrame(
        [("b", "alpha beta gamma delta epsilon zeta eta theta")],
        "conv_id string, text string",
    )

    def tr(rows):
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )

    in_path, out_dir = str(tmp_path / "in"), str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(TRANSCRIPTS).parquet(in_path)
        q = (
            streaming_contamination_alerts(stream, bench, n=4)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "streaming query did not finish in time"
        return sorted(r.conv_id for r in spark.read.parquet(out_dir).collect())

    rows1 = [
        # multi-gram hit (5 hit grams) — must alert exactly ONCE
        ("c1", 0, "u", "alpha beta gamma delta epsilon zeta eta theta", "none", t0),
        ("c2", 0, "u", "totally unrelated words about query engines here", "none", t0),
    ]
    tr(rows1).repartition(1).write.mode("append").parquet(in_path)
    assert run() == ["c1"]

    rows2 = [  # later-trigger contamination still alerts
        ("c3", 0, "u", "page quoting Beta Gamma Delta Epsilon mid paragraph", "none", t0),
        ("c4", 0, "u", "clean follow-up content with nothing shared", "none", t0),
    ]
    tr(rows2).repartition(1).write.mode("append").parquet(in_path)
    alerts = run()
    assert alerts == ["c1", "c3"]

    batch = spark.createDataFrame(
        [(r[0], r[3]) for r in rows1 + rows2], "conv_id string, text string"
    )
    audit = sorted(
        r.conv_id
        for r in exact_contamination(batch, bench, id_col="conv_id", n=4)
        .filter("contaminated")
        .collect()
    )
    assert alerts == audit  # ingestion and audit share one gram identity

    # watermark path (bounded alert state for unbounded crawls): same alert
    # set on the same corpus, dedup via dropDuplicatesWithinWatermark
    wm_out, wm_ck = str(tmp_path / "wm_out"), str(tmp_path / "wm_ck")
    stream = spark.readStream.schema(TRANSCRIPTS).parquet(in_path)
    q = (
        streaming_contamination_alerts(stream, bench, n=4, ts_col="ts")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", wm_out)
        .option("checkpointLocation", wm_ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "watermark-path query did not finish in time"
    assert sorted(
        r.conv_id for r in spark.read.parquet(wm_out).collect()
    ) == ["c1", "c3"]


def test_streaming_index_admission_converges_to_batch(spark, tmp_path):
    """Per-batch foreachBatch admission against a static prebuilt index
    composes EXACTLY to the one-shot batch audit regardless of how the
    crawl is chunked (each decision depends only on the index/base), and
    the batch=<id> overwrite layout keeps replays idempotent."""
    from pyspark.sql import functions as F

    from log_parser_mind_spark.operators import dedup
    from log_parser_mind_spark.streaming.stream import streaming_index_admission

    base = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta"),
         (3, "iota kappa lambda mu")],
        "doc_id long, text string",
    )
    inc_rows = [
        (100, "alpha beta gamma delta"),   # dup of 1
        (101, "fresh words one"),
        (102, "epsilon zeta eta theta"),   # dup of 2
        (103, "fresh words two"),
        (104, "iota kappa lambda mu"),     # dup of 3
        (105, "fresh words three"),
    ]
    inc = spark.createDataFrame(inc_rows, "doc_id long, text string")
    in_path = str(tmp_path / "in")
    # 3 range files -> 3 micro-batches at maxFilesPerTrigger=1
    inc.repartitionByRange(3, "doc_id").write.parquet(in_path)

    cfg = dict(threshold=0.7, k=32, bands=32, shingle_n=1)
    idx = dedup.build_minhash_index(base, k=32, bands=32, shingle_n=1)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_path)
    )
    audit_path, ck = str(tmp_path / "audit"), str(tmp_path / "ck")
    q = streaming_index_admission(stream, idx, base, audit_path, ck, **cfg).start()
    assert q.awaitTermination(180), "admission query did not finish in time"

    got = {
        r.id: (r.n_base_dups, r.kept)
        for r in spark.read.parquet(audit_path).select("id", "n_base_dups", "kept").collect()
    }
    want = {
        r.id: (r.n_base_dups, r.kept)
        for r in dedup.dedup_against_index(inc, idx, base, **cfg).collect()
    }
    assert got == want
    assert {i for i, (_, kept) in got.items() if kept} == {101, 103, 105}
    # chunked into >1 micro-batch (the composition actually exercised)
    n_batches = spark.read.parquet(audit_path).select("batch").distinct().count()
    assert n_batches >= 2, n_batches

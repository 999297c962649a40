"""Snapshot-commit + resume semantics (north rule; SURVEY §7.5.4):
kill after stage 2, re-run, identical final sinks; manifest row counts
reconcile with sink row counts.
"""

import os

import pytest

from log_parser_mind_spark.config import PipelineConfig
from log_parser_mind_spark.plans import job
from log_parser_mind_spark.sources.manifest import SnapshotStore
from log_parser_mind_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synth_transcripts(spark, n_convs=40, seed=7)
    df.cache().count()
    return df


def _collect(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_commit_and_manifest_reconcile(spark, transcripts, tmp_path):
    root = str(tmp_path / "wh1")
    result = job.run(spark, transcripts, root=root, run_id="r1", now="2024-01-02 00:00:00")
    store = SnapshotStore(spark, root)
    parsed = store.read("parsed_turns")
    m = store.manifest()
    stage_total = (
        m.filter("stage = 'parsed_turns' and partition_id = -1").collect()[0].rows_out
    )
    assert stage_total == parsed.count()
    part_sum = (
        m.filter("stage = 'parsed_turns' and partition_id >= 0")
        .groupBy()
        .sum("rows_out")
        .collect()[0][0]
    )
    assert part_sum == stage_total
    assert set(result.sinks) >= {"parsed_turns", "templates", "hourly_rollup",
                                 "error_rates", "route_errors", "alerts"}


def test_resume_skips_committed_stages(spark, transcripts, tmp_path):
    root = str(tmp_path / "wh2")
    store = SnapshotStore(spark, root)
    # Simulate a run killed after two stages: commit them manually under r2.
    sinks = job.build_sinks(spark, transcripts, PipelineConfig(), now="2024-01-02 00:00:00")
    store.commit(sinks["parsed_turns"], "parsed_turns", run_id="r2",
                 sort_within_partitions=job.PARSED_SORT)
    store.commit(sinks["templates"], "templates", run_id="r2")

    result = job.run(spark, transcripts, root=root, run_id="r2", now="2024-01-02 00:00:00")
    assert set(result.resumed) == {"parsed_turns", "templates"}

    # Resumed run must equal a fresh run, sink for sink.
    fresh_root = str(tmp_path / "wh3")
    fresh = job.run(spark, transcripts, root=fresh_root, run_id="rf", now="2024-01-02 00:00:00")
    for name in ("parsed_turns", "templates", "hourly_rollup", "error_rates"):
        cols = [c for c in result.sinks[name].columns if c != "variables"]
        assert _collect(result.sinks[name], cols) == _collect(fresh.sinks[name], cols), name


def test_uncommitted_snapshot_ignored(spark, transcripts, tmp_path):
    root = str(tmp_path / "wh4")
    store = SnapshotStore(spark, root)
    store.commit(transcripts.limit(5), "t", run_id="a")
    # A later snapshot directory WITHOUT a commit marker must be invisible.
    transcripts.limit(3).write.parquet(os.path.join(root, "t", "snapshot=1"))
    assert store.latest_snapshot("t") == 0
    assert store.read("t").count() == 5


def test_manifest_row_without_marker_recomputes(spark, transcripts, tmp_path):
    """ADVICE r1 (medium): a manifest row whose snapshot lacks the COMMIT
    marker (crash window) must be treated as NOT committed — the resume path
    recomputes instead of raising FileNotFoundError."""
    import glob

    root = str(tmp_path / "wh6")
    store = SnapshotStore(spark, root)
    store.commit(transcripts.limit(5), "parsed_turns", run_id="rc")
    # Simulate the crash: manifest row exists, marker deleted.
    for marker in glob.glob(os.path.join(root, "parsed_turns", "snapshot=*", "_COMMITTED")):
        os.remove(marker)
    assert job._committed_by_run(store, "rc") == set()
    # A full run under the same run_id recomputes every stage cleanly.
    result = job.run(spark, transcripts, root=root, run_id="rc", now="2024-01-02 00:00:00")
    assert result.resumed == []
    assert result.sinks["parsed_turns"].count() > 5


def test_commit_counts_come_from_footers_not_a_second_scan(spark, transcripts, tmp_path):
    root = str(tmp_path / "wh7")
    store = SnapshotStore(spark, root)
    df = transcripts.repartition(4)
    store.commit(df, "t", run_id="a")
    m = store.manifest()
    parts = m.filter("stage = 't' and partition_id >= 0").collect()
    assert len(parts) == 4  # one lineage row per written part file
    assert sum(r.rows_out for r in parts) == df.count()


def test_ttl_expiry(spark, transcripts, tmp_path):
    root = str(tmp_path / "wh5")
    store = SnapshotStore(spark, root)
    store.commit(transcripts, "t", run_id="a")
    cutoff = "2024-01-01 00:02:00"
    store.expire("t", "ts", cutoff)
    assert store.read("t").filter(f"ts < timestamp'{cutoff}'").count() == 0

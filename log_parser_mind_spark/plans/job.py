"""The flagship parse → mine → enrich → route → aggregate job (SURVEY §3.1).

One lazily-built logical plan per sink over a shared parse stage; Catalyst +
AQE replace the reference's gateway→ingestion→compression→anomaly process
boundaries entirely (SURVEY §3.1 "Spark rebuild of this path"). Stages commit
snapshots through the manifest store, so a killed run resumes from the last
committed stage (``run`` is idempotent per run_id).

In-memory mode (``root=None``) returns the sink DataFrames without writing —
used by tests, __spark_entry__ and the DuckDB oracle comparisons.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import PipelineConfig
from ..operators import aggregate as agg
from ..operators.anomaly import detect_all
from ..operators.enrich import enrich_with_lookup, role_tool_lookup
from ..operators.parse import parse_pipeline
from ..operators.route import DEFAULT_ROUTES, with_route
from ..sources.manifest import SnapshotStore

PARSED_SORT = ["source", "template_id", "ts"]  # 001_clickhouse_schema.sql:21 sort key


def timed_pipeline_stages(spark, transcripts, config=None) -> dict[str, float]:
    """Per-stage wall times of the flagship pipeline (bench/debug aid).

    Uses the write-then-aggregate shape, NOT an in-memory persist of the wide
    parsed rows: caching text+map rows in memory costs ~60 s of cache build
    at any core count at sf0.1 and OOMs the default heap outright at the sf1
    notch (~48M rows) — the same lesson the production job encodes
    (plans/job.run commits a parquet snapshot and aggregates from it)."""
    import shutil as _shutil
    import tempfile as _tempfile
    import time as _time

    from ..operators.parse import finalize_parsed, masked_transcripts
    from ..operators import miner as _miner

    config = config or PipelineConfig()
    out: dict[str, float] = {}

    def t(name, fn):
        t0 = _time.time()
        r = fn()
        out[name] = round(_time.time() - t0, 2)
        return r

    masked = masked_transcripts(transcripts, config.drain.max_depth)
    assignments = _miner.mine_assignments(masked, config).persist()
    t("mine", lambda: assignments.count())
    parsed = finalize_parsed(_miner.assign_templates(masked, assignments, config), config)
    parsed = with_route(enrich_with_lookup(parsed, role_tool_lookup(spark)))
    tmp = _tempfile.mkdtemp(prefix="logmind_stages_")
    try:
        t("parse_finalize_write", lambda: parsed.write.mode("overwrite").parquet(f"{tmp}/parsed"))
        snap = spark.read.parquet(f"{tmp}/parsed")
        t("aggregates", lambda: [
            df.write.format("noop").mode("overwrite").save()
            for df in _downstream_sinks(snap, config, None).values()
        ])
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)
        assignments.unpersist()
    return out


@dataclass
class JobResult:
    sinks: dict[str, DataFrame]
    timings: dict[str, float] = field(default_factory=dict)
    resumed: list[str] = field(default_factory=list)


def _downstream_sinks(
    parsed: DataFrame, config: PipelineConfig, now: str | None
) -> dict[str, DataFrame]:
    """Aggregate/fan-out sinks derived from an (already enriched+routed)
    parsed_turns DataFrame — reusable over either the lazy plan or a
    committed snapshot."""
    sinks: dict[str, DataFrame] = {
        "hourly_rollup": agg.hourly_rollup(parsed),
        "error_rates": agg.error_rates(parsed),
        "top_templates": agg.top_templates(parsed),
        "global_stats": agg.global_stats(parsed),
    }
    for r in DEFAULT_ROUTES:
        sinks[f"route_{r.name}"] = parsed.filter(r.predicate)
    if now is not None:
        sinks["alerts"] = detect_all(parsed, now, config.anomaly)
    return sinks


def build_sinks(
    spark: SparkSession,
    transcripts: DataFrame,
    config: PipelineConfig | None = None,
    now: str | None = None,
) -> dict[str, DataFrame]:
    """Build every sink DataFrame lazily from one shared parse plan."""
    config = config or PipelineConfig()
    parsed, templates, _ = parse_pipeline(transcripts, config)
    enriched = with_route(enrich_with_lookup(parsed, role_tool_lookup(spark)))
    sinks: dict[str, DataFrame] = {"parsed_turns": enriched, "templates": templates}
    sinks.update(_downstream_sinks(enriched, config, now))
    return sinks


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    root: str | None = None,
    run_id: str = "run_0",
    config: PipelineConfig | None = None,
    now: str | None = None,
    resume: bool = True,
    namespace: str | None = None,
) -> JobResult:
    """Execute the job. With ``root`` set, each sink is committed as a
    snapshot; on re-run with the same run_id, sinks already committed by that
    run are skipped (resume-from-checkpoint, north rule). ``namespace``
    selects the Iceberg catalog backend when its runtime is present."""
    config = config or PipelineConfig()
    if root is None:
        return JobResult(sinks=build_sinks(spark, transcripts, config, now))

    # Backend dispatch: a configured Iceberg namespace + runtime selects the
    # real catalog path; in-sandbox this always resolves to the
    # parquet+manifest emulation (sources/iceberg.snapshot_store).
    from ..sources.iceberg import snapshot_store

    store = snapshot_store(spark, root, namespace=namespace)
    # Both backends carry the same resume surface: manifest() lineage rows
    # cross-checked against is_committed() (parquet: _COMMITTED marker files;
    # Iceberg: snapshot ids in catalog metadata, where the atomic data commit
    # IS the marker — sources/iceberg.py).
    result = JobResult(sinks={})
    done = _committed_by_run(store, run_id) if resume else set()

    def commit_stage(name: str, df_fn, sort=None, partition_by=None) -> None:
        if name in done:
            result.resumed.append(name)
            result.sinks[name] = store.read(name)
            return
        t0 = time.time()
        store.commit(
            df_fn(), name, run_id=run_id, sort_within_partitions=sort, partition_by=partition_by
        )
        result.timings[name] = time.time() - t0
        result.sinks[name] = store.read(name)

    # Stage 1-2: the expensive parse+mine pass, committed once; every
    # downstream aggregate then reads the committed columnar snapshot instead
    # of re-scanning the raw input (one big scan total, not one per sink).
    parsed_lazy = templates_lazy = None

    def build_parse():
        nonlocal parsed_lazy, templates_lazy
        if parsed_lazy is None:
            p, t, _ = parse_pipeline(transcripts, config)
            parsed_lazy = with_route(enrich_with_lookup(p, role_tool_lookup(spark)))
            templates_lazy = t
        return parsed_lazy, templates_lazy

    # parsed_turns is month-partitioned (001_clickhouse_schema.sql:20
    # PARTITION BY toYYYYMM) so SnapshotStore.expire() can TTL whole month
    # directories without ever rewriting surviving data.
    commit_stage(
        "parsed_turns",
        lambda: build_parse()[0].withColumn("month", F.date_format("ts", "yyyy-MM")),
        sort=PARSED_SORT,
        partition_by=["month"],
    )
    commit_stage("templates", lambda: build_parse()[1])

    parsed_committed = result.sinks["parsed_turns"]
    for name, df in _downstream_sinks(parsed_committed, config, now).items():
        commit_stage(name, lambda df=df: df)
    return result


def maintain(
    spark: SparkSession,
    root: str,
    ttl_cutoff: str | None = None,
    append_sinks: tuple[str, ...] = ("stream_parsed",),
    keep_history: int = 3,
    dry_run: bool = False,
) -> dict:
    """Warehouse maintenance pass — the explicit analog of what ClickHouse
    does in the background (TTL part drops + MergeTree part merges,
    001_clickhouse_schema.sql:20-22):

      1. TTL: drop parsed_turns month partitions before ``ttl_cutoff``
         (partition delete, never a rewrite of survivors).
      2. INCREMENTALLY compact each APPEND-style sink: only the raw
         post-compaction epochs (≥2 of them) consolidate into a new
         snapshot; the previous consolidated snapshot is left untouched, so
         each cycle costs O(new data), never O(table). Append-style is
         declared via ``append_sinks`` — on a replace-style sink compaction
         would union history into duplicates, so it is never inferred.
      3. Vacuum superseded epoch dirs; prune replace-style sink history to
         the newest ``keep_history`` snapshots (read() = latest; older
         snapshots are mere history).

    Append-ness is the union of the DECLARED ``append_sinks`` and any sink
    whose own commit markers carry the ``append_style`` tag (the streaming
    path tags its epochs) — a forgotten declaration degrades to a skipped
    compaction, never to keep_last pruning live epochs (ADVICE r3).

    ``dry_run=True`` reports what each step WOULD do without touching disk,
    and still runs the same up-front validation as the real pass (a cutoff
    the real run would reject raises in the preview too). Report shapes:
    ``compacted[sink]`` is the would-be source list on a dry run vs the new
    snapshot id on a real one; ``vacuumed[sink]`` on a dry run includes the
    compaction sources that the real pass would supersede then reclaim.

    Idempotent, and safe alongside a live streaming writer: snapshot ids are
    mkdir-reserved (no overwrite race) and an epoch committed mid-compaction
    stays visible because compaction supersedes only its listed sources.
    Maintenance runs on the parquet emulation (an Iceberg deployment gets
    rewrite_data_files/expire_snapshots from the catalog instead). Returns a
    per-sink report."""
    import os

    store = SnapshotStore(spark, root)
    report: dict = {"expired": [], "compacted": {}, "vacuumed": {}}
    sinks = [
        d
        for d in sorted(os.listdir(root))
        if d != "_manifest" and os.path.isdir(os.path.join(root, d))
    ]
    if ttl_cutoff is not None:
        # Validate even when nothing will be expired / on a preview: a dry
        # run reporting success for a cutoff the real run rejects defeats
        # the preview's purpose.
        from ..sources.manifest import _normalize_cutoff_month

        _normalize_cutoff_month(ttl_cutoff)
        if store.committed_snapshots("parsed_turns"):
            if not dry_run:
                store.expire("parsed_turns", "ts", ttl_cutoff)
            report["expired"].append("parsed_turns")
    for sink in sinks:
        if not store.committed_snapshots(sink):
            continue
        if sink in append_sinks or store.is_append_style(sink):
            raw_epochs = [
                s
                for s in store.visible_snapshots(sink)
                if "compacted_from" not in store._marker(sink, s, default={})
            ]
            would_compact = len(raw_epochs) > 1
            if would_compact:
                if dry_run:
                    report["compacted"][sink] = raw_epochs
                else:
                    report["compacted"][sink] = store.compact(sink, sources=raw_epochs)
            vacuumed = store.vacuum(sink, dry_run=dry_run)
            if dry_run and would_compact:
                # The real pass's compaction supersedes its sources, which
                # the subsequent vacuum then reclaims — preview that too.
                vacuumed = sorted(set(vacuumed) | set(raw_epochs))
        else:
            vacuumed = store.vacuum(sink, keep_last=keep_history, dry_run=dry_run)
        if vacuumed:
            report["vacuumed"][sink] = vacuumed
    return report


def _committed_by_run(store: SnapshotStore, run_id: str) -> set[str]:
    try:
        m = store.manifest()
    except Exception:
        return set()
    rows = (
        m.filter((m.run_id == run_id) & (m.partition_id == -1) & (m.status == "committed"))
        .select("stage", "snapshot")
        .distinct()
        .collect()
    )
    # Trust the manifest only when the snapshot's COMMIT marker actually
    # exists — a manifest row without a marker (crash window / partial state)
    # must trigger recompute, never a FileNotFoundError at read time.
    return {r.stage for r in rows if store.is_committed(r.stage, r.snapshot)}

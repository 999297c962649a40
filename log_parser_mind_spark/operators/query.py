"""Read-side query API (SURVEY §3.2-§3.3).

The reference's query path is string-concatenated SQL shipped to ClickHouse
(internal/storage/clickhouse/client.go:203-261) — filters on template_id /
source / time range, ORDER BY timestamp DESC, LIMIT/OFFSET. Catalyst does
here what the ClickHouse server did there: parse/analyze/optimize; the filter
chain pushes down to the parquet scan (PushedFilters), projection prunes
columns (ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .aggregate import global_stats, order_limit_offset


def query_logs(
    parsed: DataFrame,
    template_id: str | None = None,
    source: str | None = None,
    start: str | None = None,
    end: str | None = None,
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    """QueryLogs (clickhouse/client.go:203-261): WHERE 1=1 + optional ANDs,
    ORDER BY timestamp DESC, LIMIT/OFFSET. ``log_id`` is the deterministic
    tiebreak the reference lacks (its timestamp ties are storage-order)."""
    df = parsed
    if template_id is not None:
        df = df.filter(F.col("template_id") == template_id)
    if source is not None:
        df = df.filter(F.col("source") == source)
    if start is not None:
        df = df.filter(F.col("ts") >= F.lit(start).cast("timestamp"))
    if end is not None:
        df = df.filter(F.col("ts") <= F.lit(end).cast("timestamp"))
    df = df.select(  # explicit 7-column projection (client.go:204-207)
        "log_id", "ts", "template_id", "source", "variables", "original_size", "compressed_size"
    )
    return order_limit_offset(df, [F.desc("ts"), F.desc("log_id")], limit, offset)


def get_templates(templates: DataFrame, order_by: str = "count", limit: int = 100) -> DataFrame:
    """GetTemplates (proto compression.proto:80-90, order_by count/last_seen)."""
    order = {
        "count": [F.desc("log_count")],
        "last_seen": [F.desc("last_seen")],
        "first_seen": [F.desc("first_seen")],
    }[order_by]
    return templates.orderBy(*order, F.asc("template_id")).limit(limit)


def get_stats(parsed: DataFrame) -> DataFrame:
    """GetStats (clickhouse/client.go:273-300) + derived ratio."""
    return global_stats(parsed)


def search_logs(parsed: DataFrame, q: str, limit: int = 100) -> DataFrame:
    """P11 — the proto's declared-but-unimplemented free-text filter
    (api/proto/compression.proto:72), implemented."""
    return (
        parsed.filter(F.col("text").contains(q))
        .orderBy(F.desc("ts"), F.desc("log_id"))
        .limit(limit)
    )

"""Query-path parity (SURVEY §3.2): filters, order, limit/offset, search,
templates ordering, dedup-latest — vs pandas recomputation.
"""

import pytest

from pyspark.sql import functions as F

from log_parser_mind_spark.config import PipelineConfig
from log_parser_mind_spark.operators import aggregate as agg
from log_parser_mind_spark.operators import query
from log_parser_mind_spark.operators.parse import parse_pipeline
from log_parser_mind_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def parsed(spark):
    t = synth_transcripts(spark, n_convs=60, seed=3)
    p, templates, _ = parse_pipeline(t, PipelineConfig())
    p.cache().count()
    return p, templates


def test_query_logs_filters_and_paging(parsed):
    p, _ = parsed
    some_template = p.filter("template_id is not null").first().template_id
    res = query.query_logs(p, template_id=some_template, limit=10, offset=5).toPandas()
    pdf = p.toPandas()
    want = (
        pdf[pdf.template_id == some_template]
        .sort_values(["ts", "log_id"], ascending=False)
        .iloc[5:15]
    )
    assert list(res["log_id"]) == list(want["log_id"])
    assert list(res.columns) == ["log_id", "ts", "template_id", "source", "variables",
                                 "original_size", "compressed_size"]


def test_query_logs_time_range(parsed):
    p, _ = parsed
    start, end = "2024-01-01 00:05:00", "2024-01-01 01:00:00"
    res = query.query_logs(p, start=start, end=end, limit=10**6)
    pdf = p.toPandas()
    n = len(pdf[(pdf.ts >= start) & (pdf.ts <= end)])
    assert res.count() == n


def test_search_logs_contains(parsed):
    p, _ = parsed
    res = query.search_logs(p, "Timeout", limit=10**6)
    assert res.count() == p.filter(F.col("text").contains("Timeout")).count()
    assert res.count() > 0


def test_get_templates_order(parsed):
    _, templates = parsed
    res = query.get_templates(templates, order_by="count", limit=5).toPandas()
    want = (
        templates.toPandas()
        .sort_values(["log_count", "template_id"], ascending=[False, True])
        .head(5)
    )
    assert list(res["template_id"]) == list(want["template_id"])


def test_latest_per_key_dedup(spark):
    df = spark.createDataFrame(
        [("a", 1, "x1"), ("a", 3, "x3"), ("a", 2, "x2"), ("b", 1, "y1")],
        "k string, v int, payload string",
    )
    got = {
        (r.k, r.payload)
        for r in agg.latest_per_key(df, "k", "v", "payload").collect()
    }
    assert got == {("a", "x3"), ("b", "y1")}


def test_stats_shape(parsed):
    p, _ = parsed
    row = query.get_stats(p).collect()[0]
    assert row.total_logs > 0
    assert 0 < row.compression_ratio < 10


def test_sql_views_over_warehouse(spark, tmp_path):
    """attach_views exposes committed sinks to spark.sql — the analog of the
    reference's ClickHouse SQL surface (001_clickhouse_schema.sql tables)."""
    from log_parser_mind_spark.plans import job
    from log_parser_mind_spark.sources.manifest import SnapshotStore

    root = str(tmp_path / "wh_sql")
    t = synth_transcripts(spark, n_convs=30, seed=11)
    job.run(spark, t, root=root, run_id="rsql", now="2024-01-02 00:00:00")
    store = SnapshotStore(spark, root)
    names = store.attach_views()
    assert "logmind_parsed_turns" in names and "logmind_templates" in names
    n_sql = spark.sql("SELECT count(*) AS n FROM logmind_parsed_turns").collect()[0].n
    assert n_sql == store.read("parsed_turns").count()
    # a join across views works like the reference's error-rate MV join
    joined = spark.sql(
        """SELECT t.pattern, count(*) AS n
           FROM logmind_parsed_turns p JOIN logmind_templates t USING (template_id)
           GROUP BY t.pattern ORDER BY n DESC LIMIT 3"""
    ).collect()
    assert len(joined) == 3 and joined[0].n >= joined[-1].n
    assert spark.sql("SELECT count(*) AS n FROM logmind_manifest").collect()[0].n > 0

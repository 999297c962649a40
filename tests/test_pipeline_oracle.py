"""Golden e2e: full Spark pipeline vs the independent pandas oracle on
deterministic synthetic transcripts (SURVEY §5 steps 2-3,5), plus the
north-rule invariants: per-turn text equality under stable (conv_id,
turn_idx) ordering and parallelism invariance.
"""

import pandas as pd
import pytest

from log_parser_mind_spark import oracle
from log_parser_mind_spark.config import PipelineConfig
from log_parser_mind_spark.operators import aggregate as agg
from log_parser_mind_spark.operators.parse import parse_pipeline
from log_parser_mind_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synth_transcripts(spark, n_convs=120, seed=42, hot_every=40, hot_multiplier=25)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def spark_result(spark, transcripts):
    parsed, templates, _ = parse_pipeline(transcripts, PipelineConfig())
    parsed.cache().count()
    return parsed, templates


@pytest.fixture(scope="module")
def oracle_result(transcripts):
    pdf = transcripts.toPandas()
    return oracle.run_pipeline(pdf), pdf


def _norm_parsed(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["variables"] = out["variables"].map(
        lambda m: tuple(sorted(m.items())) if isinstance(m, dict) and m is not None else None
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_parsed_rows_match_oracle(spark_result, oracle_result):
    parsed, _ = spark_result
    got = _norm_parsed(
        parsed.select(
            "conv_id", "turn_idx", "source", "text", "template_id", "template",
            "variables", "is_new", "original_size", "compressed_size",
        ).toPandas()
    )
    want = _norm_parsed(
        oracle_result[0]["parsed"][
            ["conv_id", "turn_idx", "source", "text", "template_id", "template",
             "variables", "is_new", "original_size", "compressed_size"]
        ]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_templates_match_oracle(spark_result, oracle_result):
    _, templates = spark_result
    got = (
        templates.select("template_id", "pattern", "log_count")
        .toPandas()
        .sort_values("template_id")
        .reset_index(drop=True)
    )
    want = (
        oracle_result[0]["templates"]
        .rename(columns={"template": "pattern"})[["template_id", "pattern", "log_count"]]
        .sort_values("template_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_per_turn_text_equality(transcripts, spark_result):
    """North-rule per-row invariant: input ⟷ parse-stage pass-through text
    equality under (conv_id, turn_idx); anti-join must be empty both ways."""
    parsed, _ = spark_result
    left = transcripts.select("conv_id", "turn_idx", "text")
    right = parsed.select("conv_id", "turn_idx", "text")
    assert left.exceptAll(right).count() == 0
    assert right.exceptAll(left).count() == 0


def test_hourly_rollup_matches_oracle(spark_result, oracle_result):
    parsed, _ = spark_result
    got = (
        agg.hourly_rollup(parsed)
        .toPandas()
        .sort_values(["source", "template_id", "hour"])
        .reset_index(drop=True)
    )
    want = (
        oracle.hourly_rollup(oracle_result[0]["parsed"].dropna(subset=["template_id"]))
        .sort_values(["source", "template_id", "hour"])
        .reset_index(drop=True)
    )
    got_ne = got.dropna(subset=["template_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_ne, want, check_dtype=False)


def test_error_rates_match_oracle(spark_result, oracle_result):
    parsed, _ = spark_result
    got = (
        agg.error_rates(parsed).toPandas().sort_values(["source", "minute"]).reset_index(drop=True)
    )
    want = (
        oracle.error_rates(oracle_result[0]["parsed"])
        .sort_values(["source", "minute"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_global_stats_match_oracle(spark_result, oracle_result):
    parsed, _ = spark_result
    row = agg.global_stats(parsed).collect()[0]
    p = oracle_result[0]["parsed"]
    assert row.total_logs == len(p)
    assert row.unique_templates == p["template_id"].nunique()
    assert row.total_original_size == p["original_size"].sum()
    assert row.total_compressed_size == p["compressed_size"].dropna().sum()


def test_parallelism_invariance(spark, transcripts):
    """SURVEY §5.5: same input at parallelism 1 vs 8 → identical sinks.
    (Same session; parallelism varied via repartition + shuffle.partitions.)"""
    from pyspark.sql import functions as F

    def run(n):
        src = transcripts.repartition(n)
        parsed, templates, _ = parse_pipeline(src, PipelineConfig())
        p = sorted(
            (r.conv_id, r.turn_idx, r.template_id, r.is_new, r.compressed_size)
            for r in parsed.select("conv_id", "turn_idx", "template_id", "is_new", "compressed_size").collect()
        )
        t = sorted((r.template_id, r.pattern, r.log_count) for r in templates.collect())
        return p, t

    assert run(1) == run(16)

"""Experience store (S12/J4/J5), custom redaction patterns (X2), code-fence
stripping (F17), sustainability metrics (A14)."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from log_parser_mind_spark.functions import text as tx
from log_parser_mind_spark.functions.redaction import redact_expr
from log_parser_mind_spark.config import RedactorConfig
from log_parser_mind_spark.operators import experience as ex


@pytest.fixture(scope="module")
def experiences(spark):
    rows = [
        ("e1", "db connection refused", "restart pool", ["systemctl restart app"],
         True, 0.9, [1.0, 0.0, 0.0], dt.datetime(2024, 1, 1)),
        ("e2", "db connection refused port 5432", "fix firewall", ["ufw allow 5432"],
         True, 0.7, [0.9, 0.1, 0.0], dt.datetime(2024, 1, 2)),
        ("e3", "out of memory", "raise limits", ["kubectl set resources"],
         False, 0.4, [0.0, 1.0, 0.0], dt.datetime(2024, 1, 3)),
    ]
    return spark.createDataFrame(rows, ex.EXPERIENCES)


def test_search_similar_substring_rank(experiences):
    got = [r.experience_id for r in ex.search_similar(experiences, "DB Connection Refused").collect()]
    assert got == ["e1", "e2"]  # confidence-ranked; e3 filtered


def test_search_by_embedding(experiences):
    got = [r.experience_id for r in ex.search_by_embedding(experiences, [1.0, 0.05, 0.0], top_k=2).collect()]
    assert got[0] in ("e1", "e2") and len(got) == 2


def test_learning_stats(experiences):
    row = ex.learning_stats(experiences).collect()[0]
    assert row.total_experiences == 3
    assert row.successful == 2
    assert abs(row.avg_success_confidence - 0.8) < 1e-9
    assert row.unique_issues == 3


def test_insert_if_absent(experiences, spark):
    new = spark.createDataFrame(
        [("e4", "db connection refused", None, None, None, None, None, None),
         ("e5", "disk full", None, None, None, None, None, None)],
        ex.EXPERIENCES,
    )
    merged = ex.insert_if_absent(experiences, new)
    sigs = sorted(r.issue_signature for r in merged.collect())
    assert sigs.count("db connection refused") == 1  # conflict skipped
    assert "disk full" in sigs


def test_record_outcome_latest_wins(experiences, spark):
    outcomes = spark.createDataFrame(
        [("e3", True, 0.95, dt.datetime(2024, 2, 1)),   # flip e3 to success
         ("e9", True, 1.0, dt.datetime(2024, 2, 1))],   # unknown id → ignored
        "experience_id string, success boolean, confidence double, created_at timestamp",
    )
    merged = {r.experience_id: r for r in ex.record_outcome(experiences, outcomes).collect()}
    assert len(merged) == 3  # no duplicates, e9 dropped (UPDATE matched 0 rows)
    assert merged["e3"].success and merged["e3"].confidence == 0.95
    assert merged["e3"].created_at == dt.datetime(2024, 2, 1)
    assert merged["e3"].description == "raise limits"  # non-updated fields kept
    assert merged["e1"].confidence == 0.9  # untouched rows unchanged


def test_record_outcome_equal_timestamp_update_wins(experiences, spark):
    """An outcome whose created_at EQUALS the stored row's must win
    deterministically (unconditional-UPDATE semantics); a strictly older
    outcome is stale and dropped."""
    outcomes = spark.createDataFrame(
        [("e1", False, 0.1, dt.datetime(2024, 1, 1)),   # equal ts → update wins
         ("e2", False, 0.2, dt.datetime(2023, 12, 1))],  # older → stale, dropped
        "experience_id string, success boolean, confidence double, created_at timestamp",
    )
    merged = {r.experience_id: r for r in ex.record_outcome(experiences, outcomes).collect()}
    assert merged["e1"].confidence == 0.1 and merged["e1"].success is False
    assert merged["e2"].confidence == 0.7 and merged["e2"].success is True


def test_custom_redaction_patterns(spark):
    cfg = RedactorConfig(custom_patterns={"apikey": r"ak_[a-z0-9]{8}"})
    df = spark.createDataFrame([("key ak_a1b2c3d4 used by a@b.co",)], "text string")
    got = df.select(redact_expr(F.col("text"), cfg).alias("r")).collect()[0].r
    assert got == "key [REDACTED] used by [EMAIL_REDACTED]"


def test_strip_code_fences(spark):
    df = spark.createDataFrame(
        [('```json\n{"a": 1}\n```',), ("no fences",), ("```\nplain\n```",)], "text string"
    )
    got = [r.s for r in df.select(tx.strip_code_fences_expr(F.col("text")).alias("s")).collect()]
    assert got == ['{"a": 1}', "no fences", "plain"]


def test_strip_code_fences_matches_go_clean_json_response(spark):
    """Edge semantics of cleanJSONResponse (client.go:271-284): a trailing
    ``` with NO leading fence is NOT stripped (Go only TrimSuffixes inside
    the prefix branches), ```JSON uppercase matches only the bare ```
    branch, and an unterminated fence strips the prefix alone."""
    cases = [
        ("data\n```", "data\n```"),            # no leading fence → untouched
        ('```JSON\n{"a": 1}\n```', 'JSON\n{"a": 1}'),  # uppercase → bare ``` branch
        ("```json\n{\"a\": 1}", '{"a": 1}'),    # unterminated → prefix only
        ("  ```\nx\n```  ", "x"),               # outer whitespace trimmed first
        ("``````", ""),                          # prefix+suffix collapse
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "text string")
    got = [r.s for r in df.select(tx.strip_code_fences_expr(F.col("text")).alias("s")).collect()]
    assert got == [c[1] for c in cases]


def test_sustainability_metrics(spark):
    from log_parser_mind_spark.operators.aggregate import sustainability_metrics

    stats = spark.createDataFrame(
        [(100, 5, 10 * 1024**3, 2 * 1024**3, 0.2)],
        "total_logs long, unique_templates long, total_original_size long, "
        "total_compressed_size long, compression_ratio double",
    )
    row = sustainability_metrics(stats).collect()[0]
    assert row.bytes_saved == 8 * 1024**3
    assert abs(row.co2_kg_saved - 8 * 0.0002) < 1e-9
    assert abs(row.cost_usd_saved - 8 * 0.023) < 1e-9
"""Anomaly detection vs hand-computed + pandas-oracle expectations
(reference cmd/anomaly/main.go:113-264 semantics over event time).
"""

import datetime as dt

import pandas as pd

from log_parser_mind_spark.config import AnomalyConfig
from log_parser_mind_spark.operators import anomaly
from log_parser_mind_spark import oracle

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)
NOW = "2024-01-01 13:00:00"


def _series_df(spark, points):
    return spark.createDataFrame(points, "key string, ts timestamp, value double")


def test_error_spike_detected(spark):
    # Baseline: 12 quiet minutes of value 1 (+tiny wiggle so σ>0), then a
    # burst of 50 inside the trailing 5-minute window before NOW.
    pts = [("tmpl_a", BASE + dt.timedelta(minutes=i), 1.0 + (i % 2) * 0.1) for i in range(12)]
    pts += [("tmpl_a", dt.datetime(2024, 1, 1, 12, 58), 50.0)]
    series = _series_df(spark, pts)
    cfg = AnomalyConfig()
    from log_parser_mind_spark.operators.aggregate import baselines, recent_window

    base = baselines(series).collect()[0]
    rec = recent_window(series, NOW, agg="sum").collect()[0]
    z = (rec.recent - base.mean) / base.stddev
    assert z > cfg.error_threshold

    # Oracle cross-check
    pdf = pd.DataFrame(pts, columns=["key", "ts", "value"])
    want = oracle.zscore_alerts(pdf, pd.Timestamp(NOW), cfg.error_threshold, agg="sum")
    assert len(want) == 1 and want.iloc[0]["key"] == "tmpl_a"


def test_sigma_zero_guard(spark):
    # Constant series → σ=0 → guard sets σ=1 (main.go:244-246): z = recent-mean.
    pts = [("k", BASE + dt.timedelta(minutes=i), 5.0) for i in range(10)]
    from log_parser_mind_spark.operators.aggregate import baselines

    base = baselines(_series_df(spark, pts)).collect()[0]
    assert base.stddev == 1.0 and base.mean == 5.0


def test_min_points_warmup_gate(spark):
    # < 10 points → no baseline → no alert (main.go:115,166).
    pts = [("k", BASE + dt.timedelta(minutes=i), 100.0) for i in range(5)]
    parsed = None  # not needed; drive _detect via the public API with a tiny parsed frame
    series = _series_df(spark, pts)
    from log_parser_mind_spark.operators.aggregate import baselines

    cfg = AnomalyConfig()
    base = baselines(series).filter(f"n_points >= {cfg.min_points}")
    assert base.count() == 0


def test_volume_spike_vs_drop_and_severity(spark):
    from pyspark.sql import functions as F

    rows = []
    # hot source: baseline per-minute 10, recent-window minutes at 100 → spike
    for i in range(60):
        for j in range(10 if i < 55 else 100):
            rows.append(("conv", i * 60 + j, "hot", "ERROR: x failed at 10.0.0.1", "none",
                         BASE + dt.timedelta(minutes=i)))
    # cold source: baseline 10, recent 1 → drop
    for i in range(60):
        for j in range(10 if i < 55 else 1):
            rows.append(("conv", 100000 + i * 60 + j, "cold", "INFO: ok", "none",
                         BASE + dt.timedelta(minutes=i)))
    parsed = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, source string, template string, tool string, ts timestamp"
    ).withColumn("template_id", F.lit("t"))
    alerts = anomaly.detect_volume_anomalies(parsed, NOW).collect()
    by_key = {a.key: a for a in alerts}
    assert by_key["hot"].type == "volume_spike"
    assert by_key["cold"].type == "volume_drop"
    assert all(a.severity in ("low", "medium", "high", "critical") for a in alerts)
    # z for hot: baseline mean 17.5, σ≈28.06 → z≈2.9…: compute expected via oracle
    pdf = pd.DataFrame(
        [("hot", BASE + dt.timedelta(minutes=i), 10.0 if i < 55 else 100.0) for i in range(60)],
        columns=["key", "ts", "value"],
    )
    want = oracle.zscore_alerts(pdf, pd.Timestamp(NOW), 3.0, agg="avg")
    got_hot = by_key["hot"]
    assert abs(got_hot.zscore - want.iloc[0]["zscore"]) < 1e-9


def test_fully_silent_source_emits_volume_drop(spark):
    """ADVICE r1 (medium): a source with ZERO events in the trailing window —
    total silence — must still alert (reference computes recentVolume=0,
    main.go:164-222); the old inner join dropped the key entirely."""
    from pyspark.sql import functions as F

    rows = []
    # steady 10/minute for 55 minutes, then NOTHING until NOW (13:00)
    for i in range(55):
        for j in range(10):
            rows.append(("conv", i * 60 + j, "gone", "INFO: ok", "none",
                         BASE + dt.timedelta(minutes=i)))
    parsed = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, source string, template string, tool string, ts timestamp"
    ).withColumn("template_id", F.lit("t"))
    alerts = {a.key: a for a in anomaly.detect_volume_anomalies(parsed, NOW).collect()}
    assert "gone" in alerts
    assert alerts["gone"].type == "volume_drop"
    assert alerts["gone"].value == 0.0
    # z = |0 − 10|/1 = 10 (constant series → σ guard = 1) → critical
    assert alerts["gone"].zscore == 10.0 and alerts["gone"].severity == "critical"
    # pandas oracle mirrors the same semantics
    pdf = pd.DataFrame(
        [("gone", BASE + dt.timedelta(minutes=i), 10.0) for i in range(55)],
        columns=["key", "ts", "value"],
    )
    want = oracle.zscore_alerts(pdf, pd.Timestamp(NOW), 3.0, agg="avg")
    assert len(want) == 1 and want.iloc[0]["zscore"] == 10.0


def test_severity_buckets(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(2.5,), (3.5,), (4.5,), (5.5,)], "z double")
    got = [r.s for r in df.select(anomaly.severity_expr(F.col("z")).alias("s")).collect()]
    assert got == ["low", "medium", "high", "critical"]

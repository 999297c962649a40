"""Fixed StructTypes for every table in the pipeline (SURVEY.md §1).

Schemas are declared, never inferred — mirroring the reference's fixed DDL
(scripts/migrations/001_clickhouse_schema.sql) and Go structs
(internal/models/models.go). The only dynamic shape, per-template variable
maps, is absorbed by MapType exactly as ClickHouse's Map(String,String) does.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input (BASELINE.json input_hint).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Output of the parse+mine stage — reference CompressedLog
# (internal/models/models.go:41-50; 001_clickhouse_schema.sql:10-23).
PARSED_TURNS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("log_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("source", T.StringType(), True),  # reference Source == role
        T.StructField("tool", T.StringType(), True),
        T.StructField("text", T.StringType(), True),  # pass-through for per-turn equality checks
        T.StructField("template_id", T.StringType(), True),
        T.StructField("template", T.StringType(), True),
        T.StructField("variables", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("is_new", T.BooleanType(), True),
        T.StructField("original_size", T.IntegerType(), True),
        T.StructField("compressed_size", T.IntegerType(), True),
    ]
)

# Template dimension — reference LogCluster / templates table
# (drain.go:36-45; 001_clickhouse_schema.sql:26-34).
TEMPLATES = T.StructType(
    [
        T.StructField("template_id", T.StringType(), False),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("log_count", T.LongType(), False),
        T.StructField("first_seen", T.TimestampType(), True),
        T.StructField("last_seen", T.TimestampType(), True),
        T.StructField("sample_logs", T.ArrayType(T.StringType()), True),
    ]
)

# Per-signature → template assignment emitted by the miner (internal).
ASSIGNMENTS = T.StructType(
    [
        T.StructField("masked_sig", T.StringType(), False),
        T.StructField("template_id", T.StringType(), False),
        T.StructField("template", T.StringType(), False),
        T.StructField("creates", T.BooleanType(), False),
        T.StructField("weight", T.LongType(), False),
        T.StructField("first_seen", T.TimestampType(), True),
        T.StructField("last_seen", T.TimestampType(), True),
        T.StructField("first_conv", T.StringType(), True),
        T.StructField("first_turn", T.IntegerType(), True),
    ]
)

# Hourly rollup MV (001_clickhouse_schema.sql:37-48).
HOURLY_ROLLUP = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("template_id", T.StringType(), True),
        T.StructField("hour", T.TimestampType(), True),
        T.StructField("log_count", T.LongType(), False),
        T.StructField("total_original_size", T.LongType(), True),
        T.StructField("total_compressed_size", T.LongType(), True),
    ]
)

# Per-minute error-rate MV (001_clickhouse_schema.sql:51-62).
ERROR_RATES = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("minute", T.TimestampType(), True),
        T.StructField("error_count", T.LongType(), False),
        T.StructField("warn_count", T.LongType(), False),
        T.StructField("total_count", T.LongType(), False),
    ]
)

# Alerts (cmd/anomaly/main.go:58-69).
ALERTS = T.StructType(
    [
        T.StructField("alert_id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("severity", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("threshold", T.DoubleType(), False),
        T.StructField("zscore", T.DoubleType(), False),
        T.StructField("detected_at", T.TimestampType(), True),
    ]
)

# Lineage / metrics manifest (north-rule requirement; no reference analog).
MANIFEST = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("snapshot", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),  # -1 = stage-level row
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

# Enrichment dimension (FIXTURES.md §2): routing class per (role, tool).
ROLE_TOOL_LOOKUP = T.StructType(
    [
        T.StructField("role", T.StringType(), False),
        T.StructField("tool", T.StringType(), False),
        T.StructField("sink_hint", T.StringType(), False),
        T.StructField("cost_weight", T.DoubleType(), False),
    ]
)

# Multimodal assets: opaque binary payload + typed metadata (training-data ops).
MEDIA_ASSETS = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("media_type", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

"""Stage 1 (mask) + stage 5 (finalize): the vectorized grok/regex parse layer.

Everything here is native `pyspark.sql.functions` — one whole-stage-codegen'd
projection over the scan, no Python in the hot path (north rule: "vectorized
pandas/Arrow UDFs (no per-row Python)"; we go one better and stay JVM-side).

Reference parity:
  - tokenize/mask            ← drain.go:172-206 (via functions.masking)
  - variable extraction      ← drain.go:366-381 (positional var_N map)
  - PII redaction of vars    ← cmd/ingestion/main.go:89-92 + redactor.go:110-121
  - original_size            ← len(content) in Go counts BYTES → octet_length
                               (cmd/ingestion/main.go:84, cmd/compression/main.go:67)
  - compressed_size          ← len(template_id) + Σ(len(k)+len(v)) over variables
                               (cmd/compression/main.go:68,85-91)
  - log_id                   ← uuid.New() (cmd/ingestion/main.go:80) replaced by a
                               deterministic hash of (conv_id, turn_idx) — SURVEY F8
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..config import WILDCARD, PipelineConfig
from ..functions.masking import (
    leaf_key_exprs,
    masked_sig_expr,
    masked_tokens_expr,
    tokens_expr,
)
from ..functions.redaction import redact_map_values_expr


def masked_transcripts(transcripts: DataFrame, max_depth: int = 4) -> DataFrame:
    """Stage 1: add tokens / masked signature / tree-leaf coordinates."""
    df = transcripts.withColumn("tokens", tokens_expr(F.col("text")))
    df = df.withColumn("masked_tokens", masked_tokens_expr(F.col("tokens")))
    keys = leaf_key_exprs(F.col("masked_tokens"), max_depth)
    return df.select(
        "*",
        masked_sig_expr(F.col("masked_tokens")).alias("masked_sig"),
        *keys,
    )


def variables_expr(template_tokens: Column, raw_tokens: Column) -> Column:
    """extractVariables (drain.go:366-381): map var_i → raw token at the i-th
    wildcard slot of the template, skipping slots past the raw token count."""
    pairs = F.filter(
        F.zip_with(
            template_tokens,
            raw_tokens,
            lambda t, r: F.struct(t.alias("t"), r.alias("r")),
        ),
        lambda p: (p["t"] == WILDCARD) & p["r"].isNotNull(),
    )
    keys = F.transform(pairs, lambda _p, i: F.concat(F.lit("var_"), i.cast("string")))
    vals = F.transform(pairs, lambda p: p["r"])
    return F.map_from_arrays(keys, vals)


def map_size_expr(variables: Column) -> Column:
    """estimateVariablesSize (cmd/compression/main.go:85-91): Σ len(k)+len(v),
    byte lengths (Go len over strings)."""
    return F.aggregate(
        F.map_entries(variables),
        F.lit(0),
        lambda acc, e: acc + F.octet_length(e["key"]) + F.octet_length(e["value"]),
    )


def log_id_expr(conv_id: Column, turn_idx: Column) -> Column:
    """Deterministic row ID replacing uuid.New() (SURVEY §2.8 F8)."""
    return F.concat(F.lit("log_"), F.lower(F.hex(F.xxhash64(conv_id, turn_idx))))


def finalize_parsed(assigned: DataFrame, config: PipelineConfig | None = None) -> DataFrame:
    """Stage 5: variables + redaction + sizes + ids → the parsed_turns sink
    schema (schemas.PARSED_TURNS). ``assigned`` = output of miner.assign_templates."""
    config = config or PipelineConfig()
    template_tokens = F.split(F.col("template"), " ")
    df = assigned.withColumn(
        "variables", variables_expr(template_tokens, F.col("tokens"))
    )
    df = df.withColumn(
        "variables", redact_map_values_expr(F.col("variables"), config.redactor)
    )
    return df.select(
        "conv_id",
        "turn_idx",
        log_id_expr(F.col("conv_id"), F.col("turn_idx")).alias("log_id"),
        "ts",
        F.col("role").alias("source"),
        "tool",
        "text",
        "template_id",
        "template",
        "variables",
        "is_new",
        F.octet_length("text").alias("original_size"),
        (
            F.length("template_id") + map_size_expr(F.col("variables"))
        ).cast("int").alias("compressed_size"),
    )


def parse_pipeline(
    transcripts: DataFrame,
    config: PipelineConfig | None = None,
    cache_assignments: bool = True,
):
    """Convenience: transcripts → (parsed_turns, templates, assignments).

    ``assignments`` is tiny (one row per distinct masked signature) but sits
    upstream of BOTH the templates dimension and the row-level join — without
    caching, every downstream sink re-runs the whole mining pass over the
    full input. Persisting it is the difference between one 100 TB scan per
    sink and one total.
    """
    from .miner import assign_templates, mine_assignments, templates_from_assignments

    config = config or PipelineConfig()
    masked = masked_transcripts(transcripts, config.drain.max_depth)
    assignments = mine_assignments(masked, config)
    if cache_assignments:
        assignments = assignments.persist()
    templates = templates_from_assignments(assignments)
    parsed = finalize_parsed(assign_templates(masked, assignments, config), config)
    return parsed, templates, assignments

"""X4 — the LLM agent analysis stage (reference internal/agent/prompts/
templates.go:17-161, internal/agent/llm/client.go) as a batch DataFrame stage
with an INJECTABLE client.

Reference shape: build prompt from template → chat-completion call →
cleanJSONResponse (strip ``` fences, client.go:270-283) → json.Unmarshal into
typed results. Spark rebuild:

  1. PROMPT RENDER — native concat/format expressions (JVM, codegen) for the
     distributed path; ``render_template`` mirrors Go's text/template
     semantics (including generate_fix's two ``{{if}}`` blocks) for scalar
     parity and tests.
  2. LLM CALL — ``llm_stage``: mapInPandas over Arrow batches with a
     ``client: list[str] -> list[str]`` callable. The real network client is
     NOT available in this sandbox (same posture as multimodal codecs):
     ``openai_client_unavailable`` raises; tests and the oracle-checked query
     inject ``deterministic_mock_client``, a pure string transform.
  3. POSTPROCESS — strip fences (functions.text.strip_code_fences_expr, F17)
     + ``get_json_object`` field extraction, all JVM-side.

Determinism: prompt rendering and the mock are pure functions of the input
row, so the stage is parallelism-invariant end-to-end.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..functions.text import strip_code_fences_expr

# The five template STRINGS are reproduced verbatim from templates.go:17-161
# (Go {{.Field}} → Python {field}) by necessity: the operator's contract is
# byte-identical prompt rendering, exactly like the regex patterns and SQL
# semantics elsewhere — this is reference DATA required for parity, not
# engine code. All surrounding machinery (native-expression rendering,
# mapInPandas client seam, JSON postprocess) is original Spark-first design.
PROMPT_TEMPLATES: dict[str, str] = {
    "analyze_logs": """You are a log analysis expert. Analyze the following log patterns and identify issues.

Log Patterns:
{log_patterns}

Time Range: {time_range}
Source: {source}

Focus on:
1. Error patterns and their frequency
2. Correlations between different log types
3. Anomalies in timing or volume
4. Security-related issues

Provide your analysis in JSON format with the following structure:
{{
  "issues": [
    {{
      "title": "Brief title",
      "description": "Detailed description",
      "severity": "low|medium|high|critical",
      "root_cause": "Likely root cause"
    }}
  ],
  "summary": "Overall summary",
  "confidence": 0.0-1.0
}}""",
    "generate_fix": """You are a DevOps SRE expert analyzing production issues.

Issue Context:
{issue_context}

{similar_experiences_block}

{system_context_block}

Generate fix proposals in JSON format:
{{
  "root_cause": "Clear description of the root cause",
  "fixes": [
    {{
      "rank": 1,
      "description": "Brief description",
      "commands": ["command1", "command2"],
      "risk": "low|medium|high",
      "expected_outcome": "Expected result",
      "confidence": 0.0-1.0,
      "reasoning": "Why this should work"
    }}
  ]
}}

Rules:
1. Prioritize fixes from past successful experiences
2. Rank by confidence (highest first)
3. Include rollback commands for high-risk fixes
4. Maximum 3 proposals""",
    "root_cause_analysis": """You are an expert at root cause analysis for distributed systems.

Symptoms:
{symptoms}

Log Patterns:
{log_patterns}

System Metrics:
{metrics}

Timeline:
{timeline}

Perform a thorough root cause analysis. Consider:
1. The 5 Whys methodology
2. Correlation between events
3. Common failure modes
4. Recent changes or deployments

Provide your analysis in JSON format:
{{
  "root_cause": "Primary root cause",
  "contributing_factors": ["factor1", "factor2"],
  "evidence": ["evidence1", "evidence2"],
  "confidence": 0.0-1.0,
  "recommendations": ["rec1", "rec2"]
}}""",
    "anomaly_detection": """You are an anomaly detection expert for log data.

Baseline Patterns:
{baseline_patterns}

Current Patterns:
{current_patterns}

Identify any anomalies by comparing current patterns to the baseline.
Look for:
1. Unusual spike in error rates
2. New error types not seen before
3. Changes in log volume or frequency
4. Suspicious patterns (potential security issues)

Output JSON:
{{
  "anomalies": [
    {{
      "type": "spike|new_pattern|security|other",
      "description": "What was detected",
      "severity": "low|medium|high|critical",
      "affected_patterns": ["pattern1"]
    }}
  ],
  "is_anomalous": true|false,
  "confidence": 0.0-1.0
}}""",
    "summarize_incident": """Summarize the following incident for a post-mortem report.

Incident Timeline:
{timeline}

Actions Taken:
{actions}

Resolution:
{resolution}

Create a concise incident summary suitable for stakeholder communication.
Include:
1. What happened (1-2 sentences)
2. Impact (duration, affected services)
3. Root cause
4. Fix applied
5. Prevention measures

Keep it under 300 words.""",
}


def render_template(name: str, **data: str) -> str:
    """RenderTemplate (templates.go:198-216). generate_fix's optional blocks
    reproduce Go's ``{{if .X}}...{{end}}`` byte-for-byte: the action lines
    sit between blank lines in the Go source, so an if-true block contributes
    ``\\nHeader:\\ncontent\\n`` and an if-false block contributes nothing —
    the surrounding blank lines are template literals either way (both-empty
    renders SIX newlines between the issue context and 'Generate fix')."""
    if name not in PROMPT_TEMPLATES:
        raise KeyError(f"template not found: {name}")
    if name == "generate_fix":
        exp = data.get("similar_experiences", "")
        sysctx = data.get("system_context", "")
        data = {
            "issue_context": data.get("issue_context", ""),
            "similar_experiences_block": (
                f"\nSimilar Past Experiences:\n{exp}\n" if exp else ""
            ),
            "system_context_block": (
                f"\nCurrent System State:\n{sysctx}\n" if sysctx else ""
            ),
        }
    return PROMPT_TEMPLATES[name].format(**data)


def prompt_expr(name: str, **cols) -> F.Column:
    """ANY prompt template as ONE native format_string expression —
    byte-identical to ``render_template`` (property-tested), so the
    distributed render needs no Python. For generate_fix, pass the
    PRE-RENDERED conditional sections (``similar_experiences_block`` /
    ``system_context_block``) as columns — see ``fix_block_exprs``."""
    import re

    # {{ / }} are literal braces; {name} are placeholders.
    tmpl = PROMPT_TEMPLATES[name].replace("{{", "\x00").replace("}}", "\x01")
    pieces = re.split(r"\{(\w+)\}", tmpl)
    fmt, args = [], []
    for i, piece in enumerate(pieces):
        if i % 2 == 0:
            fmt.append(
                piece.replace("\x00", "{").replace("\x01", "}").replace("%", "%%")
            )
        else:
            fmt.append("%s")
            args.append(cols[piece])
    return F.format_string("".join(fmt), *args)


def analyze_prompt_expr(log_patterns, time_range, source) -> F.Column:
    """The analyze_logs prompt, JVM-rendered."""
    return prompt_expr(
        "analyze_logs", log_patterns=log_patterns, time_range=time_range, source=source
    )


def fix_block_exprs(similar_experiences, system_context) -> tuple[F.Column, F.Column]:
    """The generate_fix template's two Go ``{{if}}`` sections as native
    expressions — same present-iff-non-empty semantics as render_template."""
    exp = F.when(
        similar_experiences.isNotNull() & (similar_experiences != ""),
        F.format_string("\nSimilar Past Experiences:\n%s\n", similar_experiences),
    ).otherwise(F.lit(""))
    sysb = F.when(
        system_context.isNotNull() & (system_context != ""),
        F.format_string("\nCurrent System State:\n%s\n", system_context),
    ).otherwise(F.lit(""))
    return exp, sysb


def fix_prompt_expr(issue_context, similar_experiences, system_context) -> F.Column:
    """The generate_fix prompt, JVM-rendered, conditionals included."""
    exp, sysb = fix_block_exprs(similar_experiences, system_context)
    return prompt_expr(
        "generate_fix",
        issue_context=issue_context,
        similar_experiences_block=exp,
        system_context_block=sysb,
    )


def build_analyze_requests(
    events: DataFrame, key_col: str = "event_type", time_range: str = "2024-01-01/2024-01-31"
) -> DataFrame:
    """One analysis request per key: LogPatterns = sorted 'key: count' lines
    (the reference feeds GetTopTemplates output into BuildAnalyzePrompt)."""
    counts = events.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.select(
        F.col(key_col).alias("source"),
        F.format_string("%s: %d", F.col(key_col), F.col("cnt")).alias("log_patterns"),
        F.lit(time_range).alias("time_range"),
    ).withColumn(
        "prompt",
        analyze_prompt_expr(F.col("log_patterns"), F.col("time_range"), F.col("source")),
    )


def llm_stage(
    requests: DataFrame,
    client: Callable[[list[str]], list[str]],
    prompt_col: str = "prompt",
    response_col: str = "response",
) -> DataFrame:
    """The chat-completion call as a mapInPandas stage: one client invocation
    per Arrow batch (the real client would batch/async inside), columns pass
    through. Injectable client = testable without network, exactly the same
    seam the reference's Client struct provides (client.go:36-58)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[response_col] = client(pdf[prompt_col].tolist())
            yield out

    from pyspark.sql import types as T

    schema = T.StructType(
        list(requests.schema.fields) + [T.StructField(response_col, T.StringType())]
    )
    return requests.mapInPandas(run, schema=schema)


def parse_analysis(responses: DataFrame, response_col: str = "response") -> DataFrame:
    """cleanJSONResponse + field extraction (client.go:243-283), JVM-side:
    strip ``` fences, then get_json_object pulls the typed fields."""
    clean = strip_code_fences_expr(F.col(response_col))
    return responses.withColumn("clean_json", clean).select(
        "*",
        F.get_json_object(F.col("clean_json"), "$.summary").alias("summary"),
        F.get_json_object(F.col("clean_json"), "$.severity").alias("severity"),
        F.get_json_object(F.col("clean_json"), "$.confidence")
        .cast("double")
        .alias("confidence"),
    )


def deterministic_mock_client(prompts: list[str]) -> list[str]:
    """Test/oracle stand-in: a PURE function of the prompt — fenced JSON whose
    fields derive from the prompt text (so DuckDB can replicate it). Real
    completions are environment-gated like the multimodal codecs."""
    out = []
    for p in prompts:
        # the Source line is the last rendered field before the instructions
        source = next(
            (ln.split("Source: ", 1)[1] for ln in p.splitlines() if ln.startswith("Source: ")),
            "unknown",
        )
        sev = "high" if "error" in source.lower() else "low"
        out.append(
            "```json\n"
            + '{"summary": "analysis of %s (%d chars)", "severity": "%s", "confidence": 0.9}'
            % (source, len(p), sev)
            + "\n```"
        )
    return out


def deterministic_mock_fix_client(prompts: list[str]) -> list[str]:
    """Fix-flow mock: pure function of the generate_fix prompt. risk derives
    from whether past experiences were attached (the reference rule
    'prioritize fixes from past successful experiences'); everything is
    DuckDB-replicable."""
    out = []
    for p in prompts:
        lines = p.splitlines()
        issue = next(
            (lines[i + 1] for i, ln in enumerate(lines) if ln == "Issue Context:"),
            "unknown",
        )
        risk = "low" if "Similar Past Experiences:" in p else "medium"
        out.append(
            "```json\n"
            + '{"root_cause": "root cause of %s", "risk": "%s", "prompt_chars": %d}'
            % (issue, risk, len(p))
            + "\n```"
        )
    return out


def parse_fix(responses: DataFrame, response_col: str = "response") -> DataFrame:
    """Postprocess for the fix flow: fence strip + typed field extraction."""
    clean = strip_code_fences_expr(F.col(response_col))
    return responses.withColumn("clean_json", clean).select(
        "*",
        F.get_json_object(F.col("clean_json"), "$.root_cause").alias("root_cause"),
        F.get_json_object(F.col("clean_json"), "$.risk").alias("risk"),
        F.get_json_object(F.col("clean_json"), "$.prompt_chars")
        .cast("long")
        .alias("prompt_chars"),
    )


def make_concurrent_client(
    client: Callable[[list[str]], list[str]],
    max_workers: int = 4,
    chunk_size: int = 16,
) -> Callable[[list[str]], list[str]]:
    """Bounded-concurrency wrapper for a NETWORK-BOUND client: one synchronous
    client() per Arrow batch serializes what is really a remote call, so the
    wrapper splits the batch into chunks and issues them on a thread pool —
    order-preserving (executor.map keeps input order) and bounded (the pool
    is created per call, so worker count never exceeds
    max_workers × concurrent Arrow batches). Wrap the REAL client only; the
    deterministic mocks are CPU-trivial and gain nothing."""
    from concurrent.futures import ThreadPoolExecutor

    def run(prompts: list[str]) -> list[str]:
        if len(prompts) <= chunk_size:
            out = client(prompts)
        else:
            chunks = [
                prompts[i : i + chunk_size] for i in range(0, len(prompts), chunk_size)
            ]
            with ThreadPoolExecutor(max_workers=max_workers) as ex:
                results = list(ex.map(client, chunks))
            out = [r for chunk in results for r in chunk]
        # Validate on EVERY path: a lossy client must fail here, where the
        # prompt→response misalignment is detectable, not downstream.
        if len(out) != len(prompts):
            raise ValueError(f"client returned {len(out)} responses for {len(prompts)} prompts")
        return out

    return run


def openai_client_unavailable(prompts: list[str]) -> list[str]:
    """The reference's network client (client.go:60-98) needs an API endpoint
    this sandbox does not have. Explicitly unavailable, never silently fake."""
    raise NotImplementedError(
        "no LLM endpoint in this environment — inject a client callable "
        "(tests use deterministic_mock_client)"
    )

"""X4 agent stage: prompt rendering parity with the reference templates
(internal/agent/prompts/templates.go), the injectable-client mapInPandas
stage, and fence-strip + JSON postprocessing.
"""

import pytest

from pyspark.sql import functions as F

from log_parser_mind_spark.operators import agent


def test_render_analyze_matches_reference_shape():
    p = agent.render_template(
        "analyze_logs",
        log_patterns="tmpl_a: ERROR timeout (41)",
        time_range="2024-01-01/2024-01-02",
        source="api",
    )
    assert p.startswith("You are a log analysis expert.")
    assert "Log Patterns:\ntmpl_a: ERROR timeout (41)\n" in p
    assert "Time Range: 2024-01-01/2024-01-02\n" in p
    assert "Source: api\n" in p
    # escaped JSON braces render literally, exactly once
    assert '"severity": "low|medium|high|critical"' in p
    assert "{{" not in p and "}}" not in p


def test_generate_fix_optional_blocks_match_go_template_if():
    base = dict(issue_context="disk full on node3")
    without = agent.render_template("generate_fix", **base)
    assert "Similar Past Experiences" not in without
    assert "Current System State" not in without
    with_exp = agent.render_template(
        "generate_fix", **base, similar_experiences="exp1", system_context="sys1"
    )
    assert "Similar Past Experiences:\nexp1" in with_exp
    assert "Current System State:\nsys1" in with_exp


def test_generate_fix_whitespace_byte_parity_with_go_template():
    """Go text/template keeps the literal blank lines AROUND the {{if}} action
    lines (templates.go:48-59): an if-true block contributes
    '\\nHeader:\\ncontent\\n', if-false contributes ''. Expected strings below
    are hand-derived from the Go source — both-empty yields SIX newlines
    between the issue context and 'Generate fix'."""
    def render(e, s):
        return agent.render_template(
            "generate_fix", issue_context="IC", similar_experiences=e, system_context=s
        )

    def mid(p):
        a = p.index("Issue Context:\nIC") + len("Issue Context:\nIC")
        return p[a:p.index("Generate fix proposals")]

    assert mid(render("", "")) == "\n" * 6
    assert mid(render("E", "")) == "\n\n\nSimilar Past Experiences:\nE\n\n\n\n\n"
    assert mid(render("", "S")) == "\n\n\n\n\nCurrent System State:\nS\n\n\n"
    assert (
        mid(render("E", "S"))
        == "\n\n\nSimilar Past Experiences:\nE\n\n\n\nCurrent System State:\nS\n\n\n"
    )


def test_all_five_templates_render():
    assert "5 Whys" in agent.render_template(
        "root_cause_analysis", symptoms="s", log_patterns="l", metrics="m", timeline="t"
    )
    assert "Baseline Patterns:\nb" in agent.render_template(
        "anomaly_detection", baseline_patterns="b", current_patterns="c"
    )
    assert "under 300 words" in agent.render_template(
        "summarize_incident", timeline="t", actions="a", resolution="r"
    )
    with pytest.raises(KeyError):
        agent.render_template("nope")


def test_native_prompt_expr_is_byte_identical_to_python_render(spark):
    rows = [("api: 41", "2024-01-01/2024-01-02", "api"), ("db err: 2", "x/y", "db-ERRORS")]
    df = spark.createDataFrame(rows, "log_patterns string, time_range string, source string")
    got = [
        r.p
        for r in df.select(
            agent.analyze_prompt_expr(
                F.col("log_patterns"), F.col("time_range"), F.col("source")
            ).alias("p")
        ).collect()
    ]
    want = [
        agent.render_template("analyze_logs", log_patterns=lp, time_range=tr, source=s)
        for lp, tr, s in rows
    ]
    assert got == want


def test_fix_prompt_expr_byte_identical_both_if_branches(spark):
    rows = [("disk full on node3", "exp1", "sys1"), ("oom killer fired", "", ""),
            ("latency spike", "past fix: scale", "")]
    df = spark.createDataFrame(rows, "issue_context string, similar string, sysctx string")
    got = [
        r.p
        for r in df.select(
            agent.fix_prompt_expr(
                F.col("issue_context"), F.col("similar"), F.col("sysctx")
            ).alias("p")
        ).collect()
    ]
    want = [
        agent.render_template(
            "generate_fix", issue_context=ic, similar_experiences=se, system_context=sc
        )
        for ic, se, sc in rows
    ]
    assert got == want


def test_fix_flow_roundtrip_with_mock(spark):
    rows = [("error-src", 1), ("xyz", 2)]  # one with 'e' (similar attached), one without
    events = spark.createDataFrame(rows * 2, "event_type string, x int")
    req = (
        events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("event_type").alias("issue"),
            F.format_string("%s occurred %d times", F.col("event_type"), F.col("cnt")).alias("issue_context"),
            F.when(F.col("event_type").contains("e"),
                   F.format_string("previously resolved %s by restart", F.col("event_type")))
            .otherwise(F.lit("")).alias("similar"),
        )
        .withColumn("prompt", agent.fix_prompt_expr(F.col("issue_context"), F.col("similar"), F.lit("")))
    )
    out = {r.issue: r for r in agent.parse_fix(
        agent.llm_stage(req, agent.deterministic_mock_fix_client)
    ).collect()}
    assert out["error-src"].risk == "low"       # experiences attached
    assert out["xyz"].risk == "medium"          # no experiences → {{if}} empty
    assert out["xyz"].root_cause == "root cause of xyz occurred 2 times"
    want = agent.render_template(
        "generate_fix",
        issue_context="xyz occurred 2 times", similar_experiences="", system_context="",
    )
    assert out["xyz"].prompt_chars == len(want)


def test_llm_stage_roundtrip_with_mock(spark):
    rows = [("error-source", 5), ("ok", 7)]
    events = spark.createDataFrame(rows * 3, "event_type string, x int")
    req = agent.build_analyze_requests(events)
    out = agent.parse_analysis(agent.llm_stage(req, agent.deterministic_mock_client))
    got = {r.source: r for r in out.collect()}
    assert got["error-source"].severity == "high"
    assert got["ok"].severity == "low"
    assert got["ok"].confidence == 0.9
    # summary derives from the prompt deterministically
    prompt = agent.render_template(
        "analyze_logs", log_patterns="ok: 3", time_range="2024-01-01/2024-01-31", source="ok"
    )
    assert got["ok"].summary == f"analysis of ok ({len(prompt)} chars)"
    # determinism across runs
    again = {r.source: r.summary for r in agent.parse_analysis(
        agent.llm_stage(req, agent.deterministic_mock_client)
    ).collect()}
    assert again == {k: v.summary for k, v in got.items()}


def test_real_client_is_explicitly_unavailable():
    with pytest.raises(NotImplementedError):
        agent.openai_client_unavailable(["hi"])


def test_concurrent_client_preserves_order_under_jitter(spark):
    """VERDICT r2 item 8: the bounded-concurrency wrapper must return
    responses in prompt order even when chunks finish out of order."""
    import time

    def jittery(prompts):
        # later chunks finish first: sleep inversely to the first prompt id
        time.sleep(0.05 * (5 - int(prompts[0].split(":")[0]) % 5))
        return [f"r:{p}" for p in prompts]

    prompts = [f"{i}: prompt" for i in range(40)]
    wrapped = agent.make_concurrent_client(jittery, max_workers=4, chunk_size=8)
    assert wrapped(prompts) == [f"r:{p}" for p in prompts]
    # small batches skip the pool entirely
    assert wrapped(prompts[:3]) == [f"r:{p}" for p in prompts[:3]]
    # and the wrapped client drops into llm_stage unchanged
    req = spark.createDataFrame([(p,) for p in prompts], "prompt string")
    out = agent.llm_stage(req, wrapped)
    got = {r.prompt: r.response for r in out.collect()}
    assert got == {p: f"r:{p}" for p in prompts}

    def lossy(prompts):
        return ["x"] * (len(prompts) - 1)

    with pytest.raises(Exception):
        agent.make_concurrent_client(lossy, chunk_size=8)(prompts)

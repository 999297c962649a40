"""Cross-check the JVM-side expression builders against the Python reference
implementations on adversarial token/text batteries — guards against Java vs
Go/Python regex dialect drift (masking) and ordering drift (redaction).
"""

import pytest

from pyspark.sql import functions as F

from log_parser_mind_spark.functions import masking, redaction
from log_parser_mind_spark.operators import drain_core
from log_parser_mind_spark import oracle

TOKENS = [
    "192.168.1.1", "192.168.1.1:5432", "999.999.999.999", "1.2.3", "v1.2.3",
    "550e8400-e29b-41d4-a716-446655440000", "deadbeef", "deadbeefca", "DEADBEEFCA",
    "42", "-42", "+42", "1.5", ".5", "1e9", "1E-9", "inf", "NaN", "Infinity",
    "100ms", "30s", "85%", "a1b2", "error", "ERROR:", "<*>", "[x]",
    "/var/log/app.log", "a/b", "http://x.io/y", "https://x.io", "httpx://x",
    "user@example.com", "u@x.io", "@handle", "a@b", "x_y-z", "日本語", "ログ42",
    "ak_a1b2c3d4", "12345678", "123-45-6789",
]

TEXTS = [
    "reach me at john@example.com or 555-123-4567",
    "ssn 123-45-6789 card 4111-1111-1111-1111 done",
    "call +1 (415) 555-2671 now",
    "ip 10.0.0.5 stays by default",
    "no pii here at all",
    "two mails a@bb.co c@dd.io",
]


def test_is_variable_spark_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in TOKENS], "tok string")
    got = {
        r.tok: r.v
        for r in df.select("tok", masking.is_variable_expr(F.col("tok")).alias("v")).collect()
    }
    for t in TOKENS:
        assert got[t] == drain_core.is_variable(t), t


def test_is_variable_gate_is_sound_fuzz(spark):
    """r6: is_variable_expr = gate AND full-pattern. The gate must be a
    NECESSARY condition (no token matching the 8-branch alternation may
    fail it), or masking silently changes. Fuzz gated vs ungated JVM
    evaluation with hex-letter-heavy random tokens (the trickiest gate
    branch: digit-free uuid/hex forms)."""
    import random

    rng = random.Random(42)
    alpha = "abcdefABCDEF0123456789ghizGZ.-:/@+_%"
    toks = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 24)))
        for _ in range(3000)
    ]
    toks += ["a" * 7 + "f", "abcdefab-cdef-abcd-efab-cdefabcdefab", "-inF", "+NAN"]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    rows = df.select(
        "tok",
        masking.is_variable_expr(F.col("tok")).alias("gated"),
        F.col("tok").rlike(masking.IS_VARIABLE_PATTERN).alias("ungated"),
    ).collect()
    for r in rows:
        assert r.gated == r.ungated, r.tok


def test_masked_tokens_spark_matches_python(spark):
    texts = [" ".join(TOKENS), "Error connecting to database at 192.168.1.1:5432"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select(
        masking.masked_tokens_expr(masking.tokens_expr(F.col("text"))).alias("m"), "text"
    ).collect()
    for r in rows:
        assert r.m == drain_core.preprocess_tokens(drain_core.tokenize(r.text))


def test_redact_spark_matches_python(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    rows = df.select("text", redaction.redact_expr(F.col("text")).alias("r")).collect()
    for r in rows:
        assert r.r == oracle.redact(r.text), r.text


def test_redact_ipv4_opt_in(spark):
    from log_parser_mind_spark.config import RedactorConfig

    cfg = RedactorConfig(redact_ipv4=True)
    df = spark.createDataFrame([("ip 10.0.0.5 x",)], "text string")
    assert df.select(redaction.redact_expr(F.col("text"), cfg).alias("r")).collect()[0].r == \
        "ip [IPV4_REDACTED] x"


def test_detect_pii(spark):
    df = spark.createDataFrame([(TEXTS[0],), (TEXTS[4],)], "text string")
    rows = df.select(redaction.detect_pii_expr(F.col("text")).alias("d")).collect()
    assert rows[0].d == ["email", "phone"]
    assert rows[1].d == []


def test_mask_and_mask_email(spark):
    df = spark.createDataFrame(
        [("john@example.com", "supersecret"), ("j@x.io", "ab")], "email string, s string"
    )
    rows = df.select(
        redaction.mask_email_expr(F.col("email")).alias("me"),
        redaction.mask_expr(F.col("s"), 4).alias("m"),
    ).collect()
    assert rows[0].me == "j***@example.com"  # redactor.go:164-179
    assert rows[0].m == "supe" + "*" * 7      # redactor.go:153-161
    assert rows[1].me == "j@x.io"             # 1-char local part kept
    assert rows[1].m == "**"                  # len <= visible → all stars


def test_tokens_expr_edge_cases(spark):
    df = spark.createDataFrame([("",), ("   ",), ("a  b\tc",), (None,)], "text string")
    rows = df.select(masking.tokens_expr(F.col("text")).alias("t")).collect()
    assert rows[0].t == []
    assert rows[1].t == []
    assert rows[2].t == ["a", "b", "c"]
    assert rows[3].t == []


def test_variables_and_map_size_exprs(spark):
    from log_parser_mind_spark.operators import parse

    df = spark.createDataFrame(
        [("GET <*> <*> 12ms", "GET /api/users 200 12ms")], "template string, text string"
    )
    row = df.select(
        parse.variables_expr(F.split("template", " "), F.split("text", " ")).alias("v")
    ).select("v", parse.map_size_expr(F.col("v")).alias("sz")).collect()[0]
    assert row.v == {"var_0": "/api/users", "var_1": "200"}
    # Σ len(k)+len(v) = (5+10) + (5+3) = 23   (cmd/compression/main.go:85-91)
    assert row.sz == 23


def test_strip_fences_unicode_leading_whitespace(spark):
    """Go TrimSpace trims unicode.IsSpace runes (NBSP, U+0085) — a model
    response led by NBSP must still have its fence stripped."""
    from pyspark.sql import functions as F

    from log_parser_mind_spark.functions import text as tx

    df = spark.createDataFrame(
        [("\u00a0```json\n{\"k\": 1}\n```",), ("```json\n{}\n```",)], "s string"
    )
    got = [r.out for r in df.select(tx.strip_code_fences_expr(F.col("s")).alias("out")).collect()]
    assert got == ['{"k": 1}', "{}"]

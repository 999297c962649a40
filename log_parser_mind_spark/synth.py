"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Fully DISTRIBUTED generation: `spark.range(n_convs)` → explode per-conv turn
sequences → render text with native expressions keyed on
``xxhash64(seed, conv_id, turn_idx, salt)``. No driver-side materialization,
no RNG state — every cell is a pure function of (seed, conv, turn), so the
same call is byte-identical at any parallelism and any scale (the 100 TB
story: generation itself is an embarrassingly parallel JVM-side projection).

Log-line shapes are the reference generator's 15 templates and value pools
(cmd/generator/main.go:15-37). Note the reference's own fill logic is broken —
containsPlaceholder (cmd/generator/main.go:79-81) always returns true so every
line takes the first branch; we implement the INTENDED per-template fill, as
FIXTURES.md specifies.

Skew fixture (SURVEY §7.5.3): ~1% of conversations are "hot" with
``hot_multiplier``× the median turn count, so salting/AQE paths are actually
exercised.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

IPS = ["192.168.1.1", "10.0.0.5", "172.16.0.10", "10.0.1.15", "192.168.2.20"]
SERVERS = ["server-01", "server-02", "web-prod-1", "api-prod-2", "db-master"]
USERS = ["john", "jane", "admin", "service-account", "bot-user"]
SERVICES = ["auth-service", "payment-api", "user-service", "order-service", "notification"]
VERSIONS = ["v1.2.3", "v1.2.4", "v2.0.0", "v2.0.1-beta", "v1.9.9"]
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["grep", "bash", "search", "api"]


def _h(seed: int, salt: int) -> Column:
    """Stable 64-bit hash of (seed, conv_id, turn_idx, salt), non-negative."""
    return F.abs(F.xxhash64(F.lit(seed), F.col("conv_id"), F.col("turn_idx"), F.lit(salt)))


def _pick(pool: list[str], seed: int, salt: int) -> Column:
    return F.element_at(F.array(*[F.lit(x) for x in pool]), (_h(seed, salt) % len(pool) + 1).cast("int"))


def _num(seed: int, salt: int, lo: int, span: int) -> Column:
    return (_h(seed, salt) % span + lo).cast("string")


def _text_expr(seed: int) -> Column:
    """Render one of the 15 reference log templates (cmd/generator/main.go:15-31)
    with pool values drawn by stable hash (intended fill: main.go:42-76)."""
    t = (_h(seed, 0) % 15).cast("int")
    s = lambda salt: _pick(SERVICES, seed, salt)  # noqa: E731
    lines = [
        F.concat(F.lit("ERROR: Connection refused to database at "), _pick(IPS, seed, 1), F.lit(":"), _num(seed, 2, 5432, 100)),
        F.concat(F.lit("WARN: High memory usage detected: "), _num(seed, 3, 50, 50), F.lit("% on server "), _pick(SERVERS, seed, 4)),
        F.concat(F.lit("INFO: Request processed in "), _num(seed, 5, 10, 500), F.lit("ms for user "), _pick(USERS, seed, 6)),
        F.concat(F.lit("ERROR: Failed to authenticate user "), _pick(USERS, seed, 7), F.lit(" from IP "), _pick(IPS, seed, 8)),
        F.concat(F.lit("INFO: Service started on port "), _num(seed, 9, 8080, 20)),
        F.concat(F.lit("WARN: Disk usage at "), _num(seed, 10, 70, 30), F.lit("% on volume /dev/sda"), _num(seed, 11, 0, 5)),
        F.concat(F.lit("ERROR: Timeout after "), _num(seed, 12, 5, 30), F.lit("s waiting for response from "), s(13)),
        F.concat(F.lit("INFO: Successfully deployed version "), _pick(VERSIONS, seed, 14), F.lit(" to "), _pick(SERVERS, seed, 15)),
        F.concat(F.lit("ERROR: Out of memory error on pod "), s(16), F.lit("-"), _num(seed, 17, 0, 10)),
        F.concat(F.lit("WARN: SSL certificate expires in "), _num(seed, 18, 0, 30), F.lit(" days for "), s(19), F.lit(".example.com")),
        F.concat(F.lit("INFO: Backup completed: "), _num(seed, 20, 100, 1000), F.lit(" files, "), _num(seed, 21, 50, 500), F.lit("MB total")),
        F.lit("ERROR: Database query failed: syntax error near 'SELECT'"),
        F.concat(F.lit("INFO: Cache hit rate: "), _num(seed, 22, 80, 20), F.lit("% for service "), s(23)),
        F.concat(F.lit("WARN: Rate limit exceeded for API key ak_"), F.lower(F.hex(_h(seed, 24) % F.lit(2**32)))),
        F.concat(F.lit("ERROR: Connection pool exhausted: "), _num(seed, 25, 40, 10), F.lit("/"), _num(seed, 26, 50, 50), F.lit(" connections in use")),
    ]
    expr = lines[-1]
    for i in range(len(lines) - 2, -1, -1):
        expr = F.when(t == i, lines[i]).otherwise(expr)
    # PII fixture: ~2% of turns get a deterministic PII suffix
    # (exercises redactor.go:43-65 patterns).
    pii = F.lit(
        " contact john@example.com phone 555-123-4567 ssn 123-45-6789 card 4111-1111-1111-1111"
    )
    return F.when(_h(seed, 27) % 50 == 0, F.concat(expr, pii)).otherwise(expr)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    seed: int = 42,
    base_turns: int = 8,
    turn_jitter: int = 8,
    hot_every: int = 100,
    hot_multiplier: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts DataFrame per BASELINE.json input_hint."""
    convs = spark.range(n_convs).select(
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        F.col("id").alias("conv_idx"),
    )
    if partitions:
        convs = convs.repartition(partitions, "conv_id")
    jitter = F.abs(F.xxhash64(F.lit(seed), F.col("conv_id"))) % (turn_jitter + 1)
    n_turns = (F.lit(base_turns) + jitter).cast("int")
    n_turns = F.when(
        F.col("conv_idx") % hot_every == 0, n_turns * hot_multiplier
    ).otherwise(n_turns)
    df = convs.select(
        "conv_id",
        "conv_idx",
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (F.col("turn_idx") % 4 + 1).cast("int")
    )
    tool = F.when(role == "tool", _pick(TOOLS, seed, 28)).otherwise(F.lit("none"))
    step = F.abs(F.xxhash64(F.lit(seed), F.col("conv_id"), F.lit(29))) % 900 + 1
    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(
        secs=(F.col("conv_idx") % 86400 + F.col("turn_idx") * step).cast("double")
    )
    return df.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        _text_expr(seed).alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )

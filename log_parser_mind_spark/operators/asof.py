"""As-of and interval joins — the time-alignment operators Spark's built-in
join surface lacks (SURVEY custom-operator clause; DuckDB ships both
natively, which makes the oracles exact).

``asof_join``: for each left row, the single most recent right row at or
before it (per key) — "what was the last config/baseline/price when this
event happened". NOT expressible as an equi-join; the classic distributed
implementation used here is the union-merge:

    tag both sides → ONE shuffle+sort by (key, ts, side) → last_value of the
    right side's payload over an unbounded-preceding window → keep left rows.

Cost is a single exchange over |L|+|R| rows — same shape as sessionization,
no range explosion, no per-key driver loop. The window is ordered
(ts, side, tiebreak) with right BEFORE left at equal ts, so a same-timestamp
right row is visible to the left row (inclusive as-of, DuckDB's semantics).

``interval_join``: assign each event to the interval containing it (per
key) — e.g. events → sessions. Implemented as an equi-join on the key plus
a range predicate; with the key in the join condition Catalyst plans a
shuffled equi-join and evaluates the range as a post-join filter per key
group, never a cartesian across keys. For keys with MANY intervals, pass
the intervals through ``asof_join`` on start_ts instead (an event's
containing interval is the last one that started at or before it)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` from the most
    recent ``right`` row with the same ``key`` and ``right.ts <= left.ts``
    (NULLs when no right row precedes). Exactly one output row per left row
    — a right-side tie at the same ts resolves to the LAST under
    (ts, tiebreak_col) ordering, deterministically if ``tiebreak_col`` is
    unique on the right."""
    if right_cols is None:  # explicit [] means "existence probe, no payload"
        right_cols = [c for c in right.columns if c not in (key, ts_col)]
    # Same clash guard as interval_join: a suffixed right column that equals
    # a left column would silently duplicate an output name (ambiguous
    # reference only far downstream, or silent pass-through via toPandas).
    clash = set(left.columns) & {f"{c}{suffix}" for c in right_cols}
    if clash:
        raise ValueError(
            f"suffixed right columns {sorted(clash)} collide with left "
            "columns — pass a different suffix= to disambiguate"
        )
    ts = F.col(ts_col).cast("timestamp")
    # Tiebreak keeps its OWN type: casting a string id to long would NULL it
    # (non-ANSI) or throw (ANSI), silently degrading tie resolution to
    # shuffle order.
    tb_type = dict(right.dtypes)[tiebreak_col] if tiebreak_col else "int"

    lhs = left.select(
        F.col(key).alias("_k"),
        ts.alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("_r"),
        F.lit(None).cast(tb_type).alias("_tb"),
    )
    rhs = right.select(
        F.col(key).alias("_k"),
        ts.alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*right_cols).alias("_r"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("_tb"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).withColumn(
        "_last_r", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_last_r")[c].alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    how: str = "inner",
    suffix: str = "",
) -> DataFrame:
    """Assign each event to the interval(s) containing it: equi-join on
    ``key`` with an inclusive ``start <= ts <= end`` range predicate. The
    equi-key keeps it a hash/sort-merge join (range evaluated inside the key
    group); overlapping intervals yield one row per match. Interval columns
    that would collide with event columns must be disambiguated via
    ``suffix`` — silent duplicate output names break every downstream
    select, so a collision without a suffix raises."""
    iv_cols = [c for c in intervals.columns if c != key]
    clash = set(events.columns) & {f"{c}{suffix}" for c in iv_cols}
    if clash:
        raise ValueError(
            f"interval columns {sorted(clash)} collide with event columns — "
            "pass suffix= to disambiguate"
        )
    joined = events.alias("e").join(
        intervals.alias("i"),
        (F.col(f"e.{key}") == F.col(f"i.{key}"))
        & (F.col(f"e.{ts_col}") >= F.col(f"i.{start_col}"))
        & (F.col(f"e.{ts_col}") <= F.col(f"i.{end_col}")),
        how,
    )
    return joined.select(
        *[F.col(f"e.{c}") for c in events.columns],
        *[F.col(f"i.{c}").alias(f"{c}{suffix}") for c in iv_cols],
    )

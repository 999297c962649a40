"""T4 via the arbitrary-stateful path: Drain leaf state in the state store
(streaming.stateful_miner). Single-batch output must equal the batch miner
(shared cluster_leaf core, ASSIGNMENTS shape); leaf state must survive a
query restart and seed the next micro-batch exactly like committed templates
seed foreachBatch.
"""

import datetime as dt

import pytest

from log_parser_mind_spark.operators import parse
from log_parser_mind_spark.operators.miner import mine_assignments
from log_parser_mind_spark.schemas import TRANSCRIPTS
from log_parser_mind_spark.streaming.stateful_miner import mine_templates_stateful


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _run(spark, in_path, tmp_path, name="smq"):
    out_dir = str(tmp_path / f"out_{name}")
    stream = spark.readStream.schema(TRANSCRIPTS).parquet(in_path)
    q = (
        mine_templates_stateful(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not finish in time"
    return spark.read.parquet(out_dir)


def test_single_batch_matches_batch_miner(spark, tmp_path):
    """One micro-batch with empty state = the batch miner exactly: same
    per-signature (template_id, template, creates, weight, first_conv,
    first_turn, first_seen, last_seen) rows — the shared cluster_leaf core
    plus the handler's chunked stats fold reproduce stage 2 + 3."""
    rows = [
        ("c0", 0, "user", "connect failed to alpha", "none", T0),
        ("c0", 1, "user", "connect failed to beta", "none", T0 + dt.timedelta(seconds=1)),
        ("c1", 0, "user", "connect failed to alpha", "none", T0 + dt.timedelta(seconds=2)),
        ("c1", 1, "user", "disk usage at 93 percent now", "none", T0 + dt.timedelta(seconds=3)),
        ("c1", 2, "user", "   ", "none", T0 + dt.timedelta(seconds=4)),  # empty sig drops
    ]
    df = _tr(spark, rows)
    in_path = str(tmp_path / "in1")
    df.repartition(1).write.parquet(in_path)

    def keymap(rows_):
        return {
            r.masked_sig: (
                r.template_id, r.template, r.creates, r.weight,
                r.first_conv, r.first_turn, r.first_seen, r.last_seen,
            )
            for r in rows_
        }

    got = keymap(_run(spark, in_path, tmp_path, "single").collect())
    want = keymap(mine_assignments(parse.masked_transcripts(df)).collect())
    assert got == want
    assert len(got) == 3  # blank row filtered; "alpha" sig deduped with weight 2
    assert any(v[3] == 2 for v in got.values())


def test_state_survives_restart_and_seeds_next_batch(spark, tmp_path):
    """Restart leg: a second availableNow run over the same checkpoint must
    recover the leaf templates from state — known signatures reuse their
    template (creates=False), a near-miss generalizes the STATE template
    (wildcard appears), and only genuinely new leaves found clusters."""
    in_path = str(tmp_path / "in2")
    batch1 = _tr(
        spark,
        [
            ("a0", 0, "user", "connect failed to alpha", "none", T0),
            ("a0", 1, "user", "queue length stable", "none", T0 + dt.timedelta(seconds=1)),
        ],
    )
    batch1.repartition(1).write.mode("append").parquet(in_path)
    first = _run(spark, in_path, tmp_path, "restart").collect()
    tid1 = {r.masked_sig: r.template_id for r in first}
    assert all(r.creates for r in first)  # cold state: everything founds

    batch2 = _tr(
        spark,
        [
            # exact repeat of a batch-1 signature → must reuse, not re-found
            ("b0", 0, "user", "queue length stable", "none", T0 + dt.timedelta(minutes=1)),
            # near-miss of the batch-1 template (3/4 tokens) → generalizes it
            ("b0", 1, "user", "connect failed to gamma", "none", T0 + dt.timedelta(minutes=1, seconds=1)),
            # new leaf (different token count) → founds
            ("b0", 2, "user", "totally new shape", "none", T0 + dt.timedelta(minutes=1, seconds=2)),
        ],
    )
    batch2.repartition(1).write.mode("append").parquet(in_path)
    both = _run(spark, in_path, tmp_path, "restart").collect()
    second = [r for r in both if r.first_conv == "b0"]
    by_sig = {r.masked_sig: r for r in second}

    repeat = by_sig["queue length stable"]
    assert repeat.template_id == tid1["queue length stable"]
    assert not repeat.creates

    near = by_sig["connect failed to gamma"]
    assert "<*>" in near.template  # state template generalized, not re-founded
    assert not near.creates

    fresh = by_sig["totally new shape"]
    assert fresh.creates


def test_empty_state_array_roundtrip(spark, tmp_path):
    """A leaf whose batch contains only already-known sigs must write its
    state back unchanged (pattern list stable across triggers)."""
    in_path = str(tmp_path / "in3")
    one = _tr(spark, [("c", 0, "user", "ping host alpha", "none", T0)])
    one.repartition(1).write.mode("append").parquet(in_path)
    first = {r.template_id for r in _run(spark, in_path, tmp_path, "rt").collect()}

    again = _tr(spark, [("d", 0, "user", "ping host alpha", "none", T0 + dt.timedelta(minutes=1))])
    again.repartition(1).write.mode("append").parquet(in_path)
    rows = _run(spark, in_path, tmp_path, "rt").collect()
    latest = [r for r in rows if r.first_conv == "d"]
    assert {r.template_id for r in latest} == first
    assert not any(r.creates for r in latest)


def test_parse_stream_stateful_converges_to_batch_parse(spark, tmp_path):
    """Pure-streaming end-to-end parse (parse_stream_stateful + parsed_stream):
    2 conv_id-range micro-batches must reproduce the one-shot batch
    parse_pipeline PER TURN — template assignment, is_new anchoring (exactly
    one founding row per template, in the trigger that founded it),
    variables, and sizes — including NULL/empty-text rows preserved with
    NULL template."""
    from pyspark.sql import functions as F

    from log_parser_mind_spark.streaming.stateful_miner import parsed_stream

    s = dt.timedelta(seconds=1)
    rows = [
        # batch 1 (conv a*): founds "connect failed to <*>" and a solo template
        ("a0", 0, "user", "connect failed to alpha", "none", T0),
        ("a0", 1, "user", "connect failed to beta", "none", T0 + s),
        ("a1", 0, "agent", "disk usage at 93 percent now", "none", T0 + 2 * s),
        ("a1", 1, "user", None, "none", T0 + 3 * s),           # NULL text
        ("a1", 2, "user", "   ", "none", T0 + 4 * s),          # empty sig
        # batch 2 (conv m*): same sig as batch 1 (must reuse, is_new=False),
        # a new member of the batch-1 cluster, and a brand-new template
        ("m0", 0, "user", "connect failed to alpha", "none", T0 + 5 * s),
        ("m0", 1, "user", "connect failed to gamma", "none", T0 + 6 * s),
        ("m1", 0, "agent", "queue depth exceeded hard limit", "none", T0 + 7 * s),
    ]
    df = _tr(spark, rows)
    in_path = str(tmp_path / "in_pss")
    df.repartitionByRange(2, "conv_id").write.parquet(in_path)
    from log_parser_mind_spark.streaming.stream import pin_stream_file_order

    pin_stream_file_order(in_path)

    stream = spark.readStream.schema(TRANSCRIPTS).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_path)
    out_dir = str(tmp_path / "out_pss")
    q = (
        parsed_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ck_pss"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "streaming query did not finish in time"
    got = spark.read.parquet(out_dir)

    want, _, _ = parse.parse_pipeline(df)
    cols = [
        "conv_id", "turn_idx", "log_id", "ts", "source", "tool", "text",
        "template_id", "template", "is_new", "original_size", "compressed_size",
    ]
    key = lambda r: (r[0], r[1])
    g = sorted([tuple(r) for r in got.select(*cols, F.to_json("variables")).collect()], key=key)
    w = sorted([tuple(r) for r in want.select(*cols, F.to_json("variables")).collect()], key=key)
    assert g == w

    # NULL/empty-text rows survived with NULL template
    nulls = {r.conv_id for r in got.filter(F.col("template_id").isNull()).collect()}
    assert ("a1" in nulls) and got.count() == len(rows)
    # exactly one founding row per template, and the cross-batch repeat sig
    # did NOT re-anchor
    anchors = got.filter(F.col("is_new")).select("conv_id", "turn_idx", "template_id").collect()
    assert len(anchors) == len({r.template_id for r in anchors}) == 3
    # founding rows land exactly where the batch mine anchors them: the two
    # batch-1-founded templates on their a* first rows, the batch-2-only
    # template on its m* first row
    assert {(r.conv_id, r.turn_idx) for r in anchors} == {("a0", 0), ("a1", 0), ("m1", 0)}
    m_repeat = got.filter((F.col("conv_id") == "m0") & (F.col("turn_idx") == 0)).collect()[0]
    assert m_repeat.is_new is False

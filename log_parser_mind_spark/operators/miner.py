"""Distributed Drain template miner (SURVEY §4.3.1) — the heart of the engine.

Scale design (why this survives 100 TB where the reference's global-mutex
tree (drain.go:135-136) cannot):

  stage 1  MASK      — native-expression projection per row: tokens, masked
                       tokens, masked signature, tree-leaf coordinates.
                       Whole-stage codegen, zero Python. (parse.py)
  stage 2  SIG AGG   — ``groupBy(leaf keys, masked_sig)`` with count/min/max.
                       Partial aggregation collapses every input partition to
                       its DISTINCT signatures before the exchange, so the
                       only shuffle of the big pass moves ~|templates|·k rows,
                       not |input| rows. Hot templates (skewed conversations)
                       are absorbed map-side — no salting needed for this agg
                       because the combine is associative.
  stage 3  CLUSTER   — ``applyInPandas`` per tree-leaf group over distinct
                       signatures only (thousands, not billions). Sequential
                       Drain runs here, in canonical first-occurrence order.
  stage 4  ASSIGN    — join the (tiny) sig→template map back onto rows.
                       Broadcast by hint or by AQE's runtime size check, so
                       the fact table never shuffles.

Template IDs are FNV-64a of the final template string → pure function of the
template, identical at any parallelism (the N vs 4N executor equality the
north rule demands).
"""

from __future__ import annotations



import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..schemas import ASSIGNMENTS

_LEAF_KEYS = ["n_tokens", "k0", "k1"]


def leaf_keys_from_sig(max_depth: int = 4) -> list:
    """Tree-leaf coordinates + 8-byte join key, derived from the signature
    STRING — applied post-aggregation so only one row per distinct signature
    pays the split (see parse.masked_transcripts on why not at row level)."""
    toks = F.split(F.col("masked_sig"), " ")
    n = F.size(toks)
    cols = [n.alias("n_tokens")]
    for i in range(max_depth - 2):
        cols.append(F.when(n > F.lit(i + 1), F.element_at(toks, i + 1)).alias(f"k{i}"))
    cols.append(F.xxhash64("masked_sig").alias("sig_id"))
    return cols


def _sig_stats(masked: DataFrame, collect_samples: bool, max_depth: int = 4) -> DataFrame:
    """Stage 2: per-signature stats. ``masked`` must carry conv_id, turn_idx,
    ts, text, masked_sig (from parse.masked_transcripts). The single groupBy
    key is the signature string — the mask expression evaluates exactly once
    per row."""
    aggs = [
        F.count(F.lit(1)).alias("weight"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.min(F.struct("conv_id", "turn_idx")).alias("first_key"),
    ]
    if collect_samples:
        # Bounded: one example row per signature (the canonical first one);
        # the reference never actually populates SampleLogs (drain.go:290,
        # no append anywhere), so even this is a superset of its behavior.
        aggs.append(F.min(F.struct("conv_id", "turn_idx", "text")).alias("first_example"))
    # Empty-sig rows (blank/NULL text) are dropped AFTER the aggregation —
    # a pre-agg filter would reference the sig alias a second time and
    # re-evaluate the mask per row.
    out = masked.groupBy("masked_sig").agg(*aggs).filter(F.col("masked_sig") != "")
    return out.select(
        *leaf_keys_from_sig(max_depth),
        "masked_sig",
        "weight",
        "first_seen",
        "last_seen",
        F.col("first_key.conv_id").alias("first_conv"),
        F.col("first_key.turn_idx").alias("first_turn"),
        *( [F.col("first_example.text").alias("example")] if collect_samples else [] ),
    )


_CLUSTER_OUT = "masked_sig string, template_id string, template string, creates boolean"


def _make_cluster_udf(sim_threshold: float):
    """Per-leaf clusterer. I/O is deliberately slim — only the signature and
    its ordering key cross the Arrow boundary (timestamps/weights are joined
    back JVM-side): the biggest leaf group is a single sequential task, so
    every byte serialized here is wall-clock serial time."""
    from .drain_core import WILDCARD, template_id_of

    def cluster_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sigs = pdf["masked_sig"].tolist()
        convs = pdf["first_conv"].tolist()
        turns = pdf["first_turn"].tolist()
        order = sorted(range(len(sigs)), key=lambda i: (convs[i], turns[i]))

        # Inlined drain leaf loop (findBestMatch ≥ threshold → generalize,
        # else create; drain.go:243-276,345-363), tuned for large groups.
        clusters: list[list] = []  # [tokens, members, anchor]
        for i in order:
            tokens = sigs[i].split(" ")
            n = len(tokens)
            best = None
            best_sim = sim_threshold
            for c in clusters:
                t = c[0]
                if len(t) != n:
                    continue
                m = 0
                for a, b in zip(t, tokens):
                    if a == b or a == WILDCARD:
                        m += 1
                sim = m / n
                if sim >= best_sim and (best is None or sim > best_sim):
                    best_sim = sim
                    best = c
            if best is None:
                clusters.append([tokens, [i], i])
            else:
                t = best[0]
                best[0] = [a if a == b else WILDCARD for a, b in zip(t, tokens)]
                best[1].append(i)

        by_template: dict[str, tuple[list, set]] = {}
        for c in clusters:
            template = " ".join(c[0])
            slot = by_template.setdefault(template, ([], set()))
            slot[0].extend(c[1])
            slot[1].add(c[2])

        tid_arr = [""] * len(sigs)
        tmpl_arr = [""] * len(sigs)
        creates_arr = [False] * len(sigs)
        for template, (members, anchors) in by_template.items():
            tid = template_id_of(template)
            for i in members:
                tid_arr[i] = tid
                tmpl_arr[i] = template
                creates_arr[i] = i in anchors
        return pd.DataFrame(
            {
                "masked_sig": sigs,
                "template_id": tid_arr,
                "template": tmpl_arr,
                "creates": creates_arr,
            }
        )

    return cluster_group


def mine_assignments(
    masked: DataFrame,
    config: PipelineConfig | None = None,
    cache_sig_stats: bool = True,
) -> DataFrame:
    """Stages 2+3: masked rows → per-signature template assignments.

    ``sig_stats`` feeds the clusterer (slim columns through Arrow) AND the
    stats join-back; without caching, both branches would re-run the full
    input aggregation. It is one row per distinct signature — small by the
    same assumption that makes the whole design work.
    """
    config = config or PipelineConfig()
    sig_stats = _sig_stats(masked, collect_samples=False, max_depth=config.drain.max_depth)
    if cache_sig_stats:
        sig_stats = sig_stats.persist()
    udf = _make_cluster_udf(config.drain.sim_threshold)
    slim = sig_stats.select(*_LEAF_KEYS, "masked_sig", "first_conv", "first_turn")
    clustered = slim.groupBy(*_LEAF_KEYS).applyInPandas(udf, schema=_CLUSTER_OUT)
    # Join the stats back onto the tiny clustered table (both sides are one
    # row per distinct signature).
    return clustered.join(
        sig_stats.select(
            "sig_id", "masked_sig", "weight", "first_seen", "last_seen",
            "first_conv", "first_turn",
        ),
        on="masked_sig",
    ).select("sig_id", *[f.name for f in ASSIGNMENTS.fields])


def templates_from_assignments(
    assignments: DataFrame, examples: DataFrame | None = None
) -> DataFrame:
    """Templates dimension (drain.go:36-45 / 001_clickhouse_schema.sql:26-34):
    upsert semantics = groupBy(template_id) min/max/sum, replacing the
    reference's ReplacingMergeTree(last_seen)."""
    t = (
        assignments.groupBy("template_id", "template")
        .agg(
            F.sum("weight").alias("log_count"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
        )
        .select(
            "template_id",
            F.col("template").alias("pattern"),
            F.split("template", " ").alias("tokens"),
            "log_count",
            "first_seen",
            "last_seen",
            F.array().cast("array<string>").alias("sample_logs"),
        )
    )
    return t


def assign_templates(
    masked: DataFrame,
    assignments: DataFrame,
    config: PipelineConfig | None = None,
) -> DataFrame:
    """Stage 4: attach template_id/template/is_new to every row.

    Left join keeps empty-text rows (the reference's Parse errors on them,
    cmd/ingestion drops the message; we keep the row with a null template so
    per-turn text equality still holds end-to-end).
    """
    config = config or PipelineConfig()
    amap = assignments.select(
        "masked_sig", "template_id", "template", "creates", "first_conv", "first_turn"
    )
    if config.broadcast_assignments in (True, None):
        # Default: broadcast. The map is one row per distinct signature —
        # small by design — and without the hint Spark falls back to a
        # sort-merge join past the 10 MB auto threshold, shuffling the whole
        # fact table on string keys (measured as the write stage's dominant
        # cost). Set broadcast_assignments=False only for pathological
        # corpora where distinct signatures rival row count.
        amap = F.broadcast(amap)
    # Join on the signature STRING, not its 64-bit hash: the map side is tiny
    # and broadcast, so the wider key costs little, and at 10^12-turn scale a
    # birthday collision between two distinct signatures' xxhash64 would
    # silently duplicate both signatures' rows with wrong templates. The
    # masked_sig column is the only masked-derived expression in this pass —
    # one mask evaluation per row, total.
    joined = masked.join(amap, on="masked_sig", how="left")
    return joined.withColumn(
        "is_new",
        F.when(F.col("template_id").isNull(), F.lit(None).cast("boolean")).otherwise(
            F.col("creates")
            & (F.col("conv_id") == F.col("first_conv"))
            & (F.col("turn_idx") == F.col("first_turn"))
        ),
    ).drop("creates", "first_conv", "first_turn")

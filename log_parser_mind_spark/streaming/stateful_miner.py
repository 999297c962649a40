"""T4 as a TRUE arbitrary-stateful streaming operator: the Drain leaf state
lives in Spark's state store, keyed by tree leaf, instead of being re-read
from the committed templates dimension every micro-batch.

Reference semantics: the Drain tree as unbounded mutex-guarded state
(drain.go:17-26, 135-136). The foreachBatch path (stream.incremental_pipeline)
already converges to batch by re-seeding each micro-batch from the committed
dimension — correct, but at scale it re-reads and re-shuffles a GROWING
dimension table on every trigger. Here the per-leaf cluster templates ARE the
keyed state: a trigger touches only the leaves present in that micro-batch,
state is recovered from the checkpoint on restart, and the state store shards
by the same leaf key the batch miner groups on.

Shared core: the per-leaf sequential loop is miner.cluster_leaf — the exact
function the batch applyInPandas UDF runs — so the two paths cannot drift.
Within one micro-batch, signatures are processed in canonical first-
occurrence (conv, turn) order over the batch (the batch miner uses the
global first occurrence; for a single-batch stream the two are identical,
asserted in tests/test_stateful_miner.py).

Scale shape: the output is one row per DISTINCT signature per trigger (the
batch miner's ASSIGNMENTS shape), never one per input row, and the handler
folds the incoming Arrow chunks into per-signature stats incrementally —
Python memory is O(distinct sigs per leaf-batch) even when one hot template
dominates a trigger (the same "distinct signatures, not rows" bound that
makes the batch design work; batch additionally guards giant LEAVES, i.e.
distinct-sig blowups, which a caller here controls with the trigger size).
Per-turn assignment remains the foreachBatch pipeline's job — joining the
tiny sig→template map back onto rows is batch stage 4, and in pure
streaming it would be a stream-stream join against this operator's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..operators.miner import cluster_leaf, leaf_keys_from_sig
from ..operators.parse import masked_transcripts

STATEFUL_OUT_SCHEMA = (
    "masked_sig string, template_id string, template string, creates boolean, "
    "weight long, first_seen timestamp, last_seen timestamp, "
    "first_conv string, first_turn int"
)
STATEFUL_STATE_SCHEMA = "templates array<string>"


def mine_templates_stateful(
    stream: DataFrame,
    config: PipelineConfig | None = None,
) -> DataFrame:
    """Streaming masked turns → per-trigger distinct-signature template
    assignments (ASSIGNMENTS schema) with the Drain leaf state in the state
    store.

    Emits one row per (micro-batch, distinct signature), append mode:
    (masked_sig, template_id, template, creates, weight, first_seen,
    last_seen, first_conv, first_turn). ``creates`` is True only for a
    signature that FOUNDED a new cluster in its micro-batch — templates
    recovered from state (earlier batches) never re-anchor, exactly like
    seed templates in the batch path. The template DIMENSION is
    sum(weight) grouped by (template_id, template) over this output.

    Convergence: each micro-batch mines with the recovered state as seeds —
    the same incremental semantics as the foreachBatch pipeline, which
    converges exactly to the one-shot batch mine when no later batch
    generalizes a template that earlier rows were already emitted with
    (append output cannot be retro-updated; the contract corpus satisfies
    this, asserted by the shared drain golden).

    No timeout: leaf state is the template dimension itself and must never
    expire (drain.go keeps the tree for the process lifetime; the dimension
    table is the durable analog).
    """
    import pandas as pd

    config = config or PipelineConfig()
    sim = config.drain.sim_threshold
    max_depth = config.drain.max_depth

    masked = masked_transcripts(stream, max_depth)
    keyed = masked.filter(F.col("masked_sig") != "").select(
        "conv_id",
        "turn_idx",
        "ts",
        "masked_sig",
        # Derived from the MATERIALIZED sig string (one split of an attribute,
        # not a re-run of the regex mask — the projection boundary in
        # masked_transcripts keeps the mask evaluated once per row).
        *leaf_keys_from_sig(max_depth, with_sig_id=False),
    )

    def fn(key, pdfs, state):
        seeds = list(state.get[0]) if state.exists else []
        # Fold Arrow chunks into per-signature stats incrementally — each
        # chunk is reduced (vectorized) before the next arrives, so a hot
        # template's row volume never accumulates in Python memory.
        partials = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            grp = pdf.groupby("masked_sig")
            agg = pd.DataFrame(
                {
                    "weight": grp.size(),
                    "first_seen": grp["ts"].min(),
                    "last_seen": grp["ts"].max(),
                }
            ).reset_index()
            firsts = (
                pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
                .drop_duplicates("masked_sig", keep="first")[
                    ["masked_sig", "conv_id", "turn_idx"]
                ]
            )
            partials.append(agg.merge(firsts, on="masked_sig"))
            if len(partials) > 8:  # keep the carry O(distinct), not O(chunks)
                partials = [_combine(pd, partials)]
        if not partials:
            # NoTimeout → the handler only fires with data; guard anyway.
            yield pd.DataFrame(
                columns=[
                    "masked_sig", "template_id", "template", "creates",
                    "weight", "first_seen", "last_seen", "first_conv", "first_turn",
                ]
            )
            return
        stats = _combine(pd, partials)

        sigs = stats["masked_sig"].tolist()
        convs = stats["conv_id"].tolist()
        turns = stats["turn_idx"].tolist()
        assigned, final_patterns = cluster_leaf(sigs, convs, turns, seeds, sim)
        state.update((final_patterns,))
        yield pd.DataFrame(
            {
                "masked_sig": sigs,
                "template_id": [a[0] for a in assigned],
                "template": [a[1] for a in assigned],
                "creates": [a[2] for a in assigned],
                "weight": stats["weight"].astype("int64"),
                "first_seen": stats["first_seen"],
                "last_seen": stats["last_seen"],
                "first_conv": convs,
                "first_turn": stats["turn_idx"].astype("int32"),
            }
        )

    return keyed.groupBy("n_tokens", "k0", "k1").applyInPandasWithState(
        fn,
        outputStructType=STATEFUL_OUT_SCHEMA,
        stateStructType=STATEFUL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def _combine(pd, partials):
    """Merge per-chunk signature stats: weights add, ts bounds widen, the
    canonical first occurrence is the lexicographic (conv, turn) minimum."""
    allp = pd.concat(partials, ignore_index=True)
    grp = allp.groupby("masked_sig")
    agg = pd.DataFrame(
        {
            "weight": grp["weight"].sum(),
            "first_seen": grp["first_seen"].min(),
            "last_seen": grp["last_seen"].max(),
        }
    ).reset_index()
    firsts = (
        allp.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .drop_duplicates("masked_sig", keep="first")[
            ["masked_sig", "conv_id", "turn_idx"]
        ]
    )
    return agg.merge(firsts, on="masked_sig")

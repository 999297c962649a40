"""Distributed linear quality classifier (fastText/CCNet-style filtering
stage): hashing-trick bag-of-tokens features + full-batch logistic
regression trained entirely through DataFrame aggregations.

A web-scale curation pipeline filters documents with a CHEAP linear model
scored inline (the expensive LLM/embedding scorers run on samples); the
reference has no model stage at all (its scoring stops at heuristic
ratios — internal/pipeline/worker.go), so this follows the public CCNet /
fastText recipe: hashed token buckets → logistic regression → per-doc
keep-probability.

Scale shape (100 TB):

  features  — ONE corpus pass: explode → groupBy(id, bucket) with map-side
              combine → per-doc sparse pair array (≤ n_buckets entries).
              The persisted feature table is |docs| rows × O(B) — the text
              never participates in training again.
  training  — per iteration: ONE B-bounded shuffle (gradient groupBy) and a
              B+1-value driver collect; the per-doc margin is a JVM
              higher-order fold over the pair array with the weight vector
              as a literal array (no join, no UDF). Same driver-state class
              as k-means Lloyd (similarity._ivf_fit) — the model is k
              scalars, the DATA never leaves executors.
  scoring   — stateless projection (fold + sigmoid), broadcast-free, lifts
              to streams unchanged.

Determinism: the fold order is pinned (pairs sorted by bucket), collected
gradients are rounded to 6dp before the update (float sums are
combine-order-dependent in the last ulps — the exact trap similarity's
centroid rounding absorbs), so training is parallelism-invariant and
reproducible by the independent numpy mirror (tools/make_goldens.py).
Token buckets use crc32 (zlib.crc32 — bit-identical in the JVM, Python,
and every engine that links zlib) rather than xxhash64, so the mirror can
recompute features from raw text without reimplementing a bespoke hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "token_bucket_features",
    "train_logreg",
    "score_logreg",
]


def token_bucket_features(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    label: F.Column | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Per-doc sparse hashed-bag features: bucket = crc32(token) % B over
    the shared whitespace tokenizer, x = bucket count / doc token count
    (ℓ1-normalized — document length must not dominate the margin).
    Token-less docs are EXCLUDED (no features to train or score on).

    ``tokens_col`` names an ALREADY-MATERIALIZED token array to use instead
    of tokenizing ``text_col`` — pipelines that carry ``with_tokens``
    output (e.g. the curation funnel) must not pay a second regex split;
    the caller owns the guarantee that it came from the same tokenizer.

    Returns (id, y?, pairs array<struct<bucket int, x double>>), pairs
    sorted by bucket so downstream folds are order-deterministic. ``label``
    (optional Column over the input row) is evaluated before tokenization
    and carried as ``y`` (double).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from ..functions.text import lower_tokens

    cols = [F.col(id_col)]
    if label is not None:
        cols.append(label.cast("double").alias("y"))
    tok_expr = (
        F.col(tokens_col) if tokens_col is not None else lower_tokens(F.col(text_col))
    )
    toks = docs.select(*cols, tok_expr.alias("_toks")).filter(
        F.size("_toks") > 0
    )
    exploded = toks.select(
        *[c for c in ([id_col, "y"] if label is not None else [id_col])],
        F.size("_toks").alias("_n"),
        F.explode("_toks").alias("_tok"),
    ).withColumn(
        "bucket",
        (F.crc32(F.encode(F.col("_tok"), "UTF-8")) % n_buckets).cast("int"),
    )
    # groupBy(id, bucket) first (map-side combine bounds the shuffle by
    # distinct (doc, bucket) pairs), then roll up to one row per doc.
    per_bucket = exploded.groupBy(
        *([id_col, "y", "_n", "bucket"] if label is not None else [id_col, "_n", "bucket"])
    ).agg(F.count("*").alias("_cnt"))
    pairs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("bucket"),
                (F.col("_cnt") / F.col("_n")).alias("x"),
            )
        )
    )
    per_doc = per_bucket.groupBy(
        *([id_col, "y"] if label is not None else [id_col])
    ).agg(pairs.alias("pairs"))
    return per_doc


def _margin(pairs, weights: list[float], bias: float):
    """JVM fold: z = b + Σ w[bucket]·x over the sorted pair array, with the
    weight vector inlined as a literal array (B is small by construction —
    the hashing trick bounds it regardless of vocabulary size)."""
    warr = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        pairs,
        F.lit(float(bias)),
        lambda acc, p: acc + F.element_at(warr, p["bucket"] + 1) * p["x"],
    )


def train_logreg(
    features: DataFrame,
    n_buckets: int,
    iterations: int = 15,
    lr: float = 1.0,
) -> tuple[list[float], float]:
    """Full-batch logistic regression over a ``token_bucket_features`` table
    (must carry ``y``): per iteration ONE Spark job — the bias gradient
    rides as a sentinel bucket (id = n_buckets, x = 1.0, since
    d/db = Σ err·1) appended to each row's pairs, so the margin fold and
    sigmoid run once per row per iteration, not twice. Update
    w ← w − lr·∇/n with gradients rounded 6dp (parallelism invariance —
    see module docstring). Deterministic zero init (full-batch GD from 0
    has no symmetry to break). Returns (weights, bias).

    Labels must be non-NULL 0/1: a NULL y would be silently skipped by the
    gradient sums while still counting toward n (and would diverge from
    the pure-Python golden mirror), so it raises instead. If the caller
    already persisted ``features``, that cache is used and LEFT ALONE;
    otherwise a training-scoped persist is taken and released.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from pyspark import StorageLevel

    caller_persisted = features.storageLevel != StorageLevel.NONE
    feats = features if caller_persisted else features.persist()
    try:
        n = feats.count()
        if n == 0:
            raise ValueError("no feature rows — every input doc was token-less?")
        n_null = feats.filter(F.col("y").isNull()).count()
        if n_null:
            raise ValueError(
                f"{n_null} feature rows have NULL y — labels must be 0/1 "
                "(coalesce the label expression; NULL would silently drop "
                "out of the gradient while still counting toward n)"
            )
        sentinel = F.array(
            F.struct(
                F.lit(n_buckets).cast("int").alias("bucket"),
                F.lit(1.0).alias("x"),
            )
        )
        w = [0.0] * n_buckets
        b = 0.0
        for _ in range(iterations):
            err = feats.select(
                F.concat(F.col("pairs"), sentinel).alias("_gpairs"),
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(F.col("pairs"), w, b)))
                    - F.col("y")
                ).alias("_err"),
            )
            grad_rows = (
                err.select(F.explode("_gpairs").alias("p"), "_err")
                .groupBy(F.col("p.bucket").alias("bucket"))
                .agg(F.sum(F.col("_err") * F.col("p.x")).alias("g"))
                .collect()
            )
            grad = {r["bucket"]: r["g"] for r in grad_rows}
            w = [
                wi - lr * round(grad.get(i, 0.0) / n, 6)
                for i, wi in enumerate(w)
            ]
            b -= lr * round(grad.get(n_buckets, 0.0) / n, 6)
        return w, b
    finally:
        if not caller_persisted:
            feats.unpersist()


def score_logreg(
    features: DataFrame, weights: list[float], bias: float
) -> DataFrame:
    """Stateless scoring projection: keep-probability p = σ(z) rounded 6dp.
    Carries every non-``pairs`` column through (id, y, ...)."""
    keep = [c for c in features.columns if c != "pairs"]
    return features.select(
        *keep,
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(F.col("pairs"), weights, bias))),
            6,
        ).alias("score"),
    )

"""Experience store (SURVEY §2.1 S12, §2.3 J4, §2.4 A10/A11).

The reference's experience service (cmd/experience/main.go, Postgres +
placeholder Qdrant) stores past incident fixes and searches them by issue
signature. Rebuilt as plain DataFrame operators:

  - ``search_similar``   — the demo substring-match "join"
                           (cmd/experience/main.go:92-116): contains filter +
                           confidence-ranked top-k. The real intent, vector
                           top-k, is operators/similarity.brute_force_topk /
                           lsh_topk over the embedding column.
  - ``learning_stats``   — COUNT(*)/AVG FILTER aggregates
                           (internal/storage/postgres/client.go:342-372).
  - ``record_outcome``   — success/confidence update as an append + U1-style
                           latest-wins dedup (ON CONFLICT semantics,
                           002_postgres_schema.sql:124 → anti-join insert).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EXPERIENCES = T.StructType(
    [
        T.StructField("experience_id", T.StringType(), False),
        T.StructField("issue_signature", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
        T.StructField("commands", T.ArrayType(T.StringType()), True),
        T.StructField("success", T.BooleanType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)


def search_similar(experiences: DataFrame, signature: str, top_k: int = 5) -> DataFrame:
    """J4 — substring-similarity search, ranked by confidence then recency
    (cmd/experience/main.go:92-116 matches on signature containment)."""
    sig = signature.lower()
    return (
        experiences.filter(
            F.lower("issue_signature").contains(sig)
            | F.lit(sig).contains(F.lower("issue_signature"))
        )
        .orderBy(F.desc("confidence"), F.desc("created_at"), F.asc("experience_id"))
        .limit(top_k)
    )


def search_by_embedding(
    experiences: DataFrame, query_vec: list[float], top_k: int = 5
) -> DataFrame:
    """J5 — the vector top-k the reference's Qdrant client stubs out
    (internal/storage/qdrant/client.go:78-92 is a no-op; CosineSimilarity
    :157-174 defines the metric)."""
    from .similarity import cosine_expr

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        experiences.filter(F.col("embedding").isNotNull())
        .withColumn("cosine", cosine_expr(F.col("embedding"), q))
        .orderBy(F.desc("cosine"), F.asc("experience_id"))
        .limit(top_k)
    )


def learning_stats(experiences: DataFrame) -> DataFrame:
    """A10/A11 — GetLearningStats (postgres/client.go:342-372)."""
    return experiences.agg(
        F.count(F.lit(1)).alias("total_experiences"),
        F.count(F.when(F.col("success"), 1)).alias("successful"),
        F.avg(F.when(F.col("success"), F.col("confidence"))).alias("avg_success_confidence"),
        F.countDistinct("issue_signature").alias("unique_issues"),
    )


def record_outcome(experiences: DataFrame, outcomes: DataFrame) -> DataFrame:
    """S12 — UpdateFeedback / outcome updates (postgres/client.go:269-277:
    ``UPDATE experiences SET … WHERE id=$1``) as batch semantics: outcomes
    (experience_id, success, confidence, created_at) join the stored row,
    the updated version is appended, and U1 latest-wins dedup keeps the
    newest row per experience_id. Unknown experience_ids are ignored, like
    an UPDATE matching zero rows.

    Rows are tagged with an is-update flag used as the ordering tiebreak, so
    an outcome whose created_at EQUALS the stored row's deterministically
    wins (the reference's UPDATE applies unconditionally,
    postgres/client.go:269-277); an outcome strictly OLDER than the stored
    row is treated as stale and dropped — deliberate batch latest-wins
    semantics, a documented divergence from the row-at-a-time UPDATE."""
    from .aggregate import latest_per_key

    base = experiences.drop("success", "confidence", "created_at")
    updated = (
        outcomes.join(base, "experience_id", "inner")
        .select(*[f.name for f in EXPERIENCES.fields])
        .withColumn("_is_update", F.lit(1))
    )
    merged = experiences.withColumn("_is_update", F.lit(0)).unionByName(updated)
    return latest_per_key(merged, "experience_id", "created_at", "_is_update").drop(
        "_is_update"
    )


def insert_if_absent(experiences: DataFrame, new_rows: DataFrame) -> DataFrame:
    """U3 — ON CONFLICT (issue_signature) DO NOTHING
    (002_postgres_schema.sql:124): left-anti join before append."""
    fresh = new_rows.join(
        experiences.select("issue_signature").distinct(), "issue_signature", "left_anti"
    )
    return experiences.unionByName(fresh)

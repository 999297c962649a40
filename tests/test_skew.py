"""Skew handling: salted repartitioning balances hot conversations, and the
signature aggregation absorbs hot keys map-side (no single reducer hotspot).
"""

import pytest

from pyspark.sql import functions as F

from log_parser_mind_spark.sources.tables import repartition_salted
from log_parser_mind_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def skewed(spark):
    # hot_every=20 → 5% of conversations carry 100× the turns.
    df = synth_transcripts(spark, n_convs=100, seed=9, hot_every=20, hot_multiplier=100)
    df.cache().count()
    return df


def _partition_sizes(df):
    return [
        r.n
        for r in df.groupBy(F.spark_partition_id().alias("p")).agg(F.count(F.lit(1)).alias("n")).collect()
    ]


def test_salted_repartition_balances_hot_keys(skewed):
    n_parts = 8
    plain = _partition_sizes(skewed.repartition(n_parts, "conv_id"))
    salted = _partition_sizes(repartition_salted(skewed, "conv_id", n_parts, salt_buckets=32))
    total = skewed.count()
    # Plain conv_id hashing piles hot conversations onto few partitions;
    # salting must spread them decisively toward the uniform total/n.
    assert max(salted) < max(plain)
    assert max(salted) < 2.0 * total / n_parts


def test_sig_agg_absorbs_hot_key_mass(spark):
    """The signature aggregation shuffles one row per DISTINCT signature:
    making conversations 100× hotter multiplies rows ~5× here but barely
    moves the shuffled (distinct-sig) row count — the map-side combine
    absorbs the skew, so no reducer hotspot exists by construction."""
    from log_parser_mind_spark.operators.miner import _sig_stats
    from log_parser_mind_spark.operators.parse import masked_transcripts

    cold = synth_transcripts(spark, n_convs=100, seed=9, hot_every=20, hot_multiplier=1)
    hot = synth_transcripts(spark, n_convs=100, seed=9, hot_every=20, hot_multiplier=100)
    rows_cold, rows_hot = cold.count(), hot.count()
    ss_cold = _sig_stats(masked_transcripts(cold, 4), False)
    ss_hot = _sig_stats(masked_transcripts(hot, 4), False)
    sigs_cold, sigs_hot = ss_cold.count(), ss_hot.count()
    assert rows_hot > 4 * rows_cold
    # The shuffled fraction shrinks as keys get hotter (duplicate mass
    # combines map-side into per-sig weights)…
    assert sigs_hot / rows_hot < sigs_cold / rows_cold
    # …and the hot mass shows up as weight concentration, not extra rows:
    max_w_cold = ss_cold.agg(F.max("weight")).collect()[0][0]
    max_w_hot = ss_hot.agg(F.max("weight")).collect()[0][0]
    assert max_w_hot / max_w_cold > 0.8 * rows_hot / rows_cold

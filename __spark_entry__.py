"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship drain pipeline over the sf0.001 documents corpus.
``queries()``    — one entry per implemented operator family (SURVEY.md §2);
                   each callable takes (spark, sf_dir) and returns a DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
                   (tables region nation customer supplier part orders
                   lineitem events documents embeddings are pre-registered).
                   Queries whose semantics are NOT SQL-expressible (drain
                   mining, xxhash64 LSH, multimodal) are checked against
                   GOLDEN parquet tables instead (data/golden/, produced by
                   tools/make_goldens.py — drain goldens derive from the
                   independent pandas oracle; hash-based ones are locked
                   deterministic engine output).

Alias discipline: every computed column is aliased identically in the Spark
plan and the oracle SQL; float columns are rounded to 6 (or stated) decimals
on BOTH sides; integer computed columns are cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from log_parser_mind_spark.config import PipelineConfig
from log_parser_mind_spark.functions import bpe as bpe_fn, masking, redaction, text as tx
from log_parser_mind_spark.operators import aggregate as agg
from log_parser_mind_spark.operators import asof as asof_ops, dedup, embed as embed_ops, sample as sample_ops, similarity
from log_parser_mind_spark.operators.parse import parse_pipeline
from log_parser_mind_spark.sources import multimodal
from log_parser_mind_spark.sources.tables import documents_as_transcripts, read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → transcripts shape → parse → Drain mine →
    top-10 templates by count (001_clickhouse_schema.sql:65)."""
    return q_drain_top_templates(spark, "/root/testdata/sf0.001")


# -- drain pipeline family (golden-backed checks; mining is not SQL-expressible,
#    so the oracle is the independent pandas implementation's output — see the
#    Golden oracles section) --


def q_drain_top_templates(spark, sf_dir):
    transcripts = documents_as_transcripts(spark, sf_dir)
    parsed, _, _ = parse_pipeline(transcripts, PipelineConfig())
    return agg.top_templates(parsed, k=10).select(
        "template_id", F.col("cnt").cast("long").alias("cnt")
    )


def q_drain_templates(spark, sf_dir):
    transcripts = documents_as_transcripts(spark, sf_dir)
    _, templates, _ = parse_pipeline(transcripts, PipelineConfig())
    return templates.select("template_id", "pattern", "log_count")


def q_drain_parsed_turns(spark, sf_dir):
    transcripts = documents_as_transcripts(spark, sf_dir)
    parsed, _, _ = parse_pipeline(transcripts, PipelineConfig())
    return parsed.select(
        "conv_id", "turn_idx", "template_id", "is_new", "original_size", "compressed_size"
    )


def q_drain_global_stats(spark, sf_dir):
    transcripts = documents_as_transcripts(spark, sf_dir)
    parsed, _, _ = parse_pipeline(transcripts, PipelineConfig())
    return agg.global_stats(parsed).select(
        "total_logs",
        "unique_templates",
        "total_original_size",
        "total_compressed_size",
        F.round("compression_ratio", 6).alias("compression_ratio"),
    )


def q_template_stats(spark, sf_dir):
    """A6 — drain.GetStats (drain.go:419-438): cluster count, Σ size, average
    cluster size over the mined template dimension (operators/aggregate.py
    template_stats). Oracle: the same aggregate in SQL over the
    drain_templates golden, whose provenance is the INDEPENDENT pandas
    oracle — so the row is value-checked against an independent derivation,
    not locked engine output."""
    transcripts = documents_as_transcripts(spark, sf_dir)
    _, templates, _ = parse_pipeline(transcripts, PipelineConfig())
    return agg.template_stats(templates).select(
        F.col("total_clusters").cast("long").alias("total_clusters"),
        F.col("total_logs").cast("long").alias("total_logs"),
        F.round("average_size", 6).alias("average_size"),
    )


def q_worker_metrics(spark, sf_dir):
    """A13 — worker-pool processed/error counters (worker.go:47-54,213-223):
    per-partition counts (operators/aggregate.py worker_metrics, the manifest
    lineage rows) summed to the pool totals. The per-worker SPLIT is a
    parallelism artifact; the totals are the invariant the reference's
    metrics endpoint reports. Oracle: counts over the drain_parsed_turns
    golden (independent pandas-oracle provenance)."""
    transcripts = documents_as_transcripts(spark, sf_dir)
    parsed, _, _ = parse_pipeline(transcripts, PipelineConfig())
    return agg.worker_metrics(parsed).agg(
        F.sum("rows").cast("long").alias("processed"),
        F.sum("errors").cast("long").alias("errors"),
    )


def q_minhash_candidates(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(docs, k=32, bands=16)


def q_simhash_groups(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_dups(docs).select("simhash", F.col("n").cast("long").alias("n"))


def q_simhash_hamming_dups(spark, sf_dir):
    """Hamming ≤ 3 simhash near-dup pairs via the exact 4×16-bit band join
    (dedup.simhash_near_dup_pairs). The base corpus is augmented with one
    perturbed variant per doc_id < 500 so nonzero-hamming pairs exist —
    hamming-0 alone only catches identical token multisets. pytest proves
    band join == exhaustive all-pairs on this exact shape
    (test_simhash_hamming_band_join_equals_exhaustive)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    variants = docs.filter(F.col("doc_id") < 500).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zq")).alias("text"),
    )
    pairs = dedup.simhash_near_dup_pairs(docs.unionByName(variants), k=3)
    return pairs.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _staged_transcript_stream(spark, sf_dir, prefix):
    """Shared staging for the streaming contract queries: the documents
    corpus as transcripts, range-split into 2 files (→ 2 micro-batches with
    maxFilesPerTrigger=1, so batch 2 genuinely exercises the cross-batch
    state/seeding path). ONE definition — the three streaming queries'
    convergence claims all assume this exact split."""
    import tempfile

    from log_parser_mind_spark.streaming.stream import stream_transcripts

    root = tempfile.mkdtemp(prefix=prefix)
    t = documents_as_transcripts(spark, sf_dir)
    t.repartitionByRange(2, "conv_id").write.mode("overwrite").parquet(f"{root}/input")
    # Trigger order == canonical (conv, turn) order — required by the
    # per-turn is_new placement (streaming_parsed); see the helper.
    from log_parser_mind_spark.streaming.stream import pin_stream_file_order

    pin_stream_file_order(f"{root}/input")
    return root, stream_transcripts(spark, f"{root}/input", max_files=1)


def q_streaming_templates(spark, sf_dir):
    """T1-T8 — foreachBatch incremental mining (availableNow trigger) over the
    SAME corpus as q_drain_templates, oracled against the SAME golden: the
    streaming path must converge EXACTLY — template set AND per-template
    log_count mass — to the one-shot batch mine. Seeded re-mining (committed
    templates pre-populate each batch's clusterers) plus content-hash template
    ids make the merge exact, not approximate. Two range-split input files →
    two micro-batches, so batch 2 genuinely exercises the seeding path."""
    from log_parser_mind_spark.sources.manifest import SnapshotStore
    from log_parser_mind_spark.streaming.stream import incremental_pipeline

    root, stream = _staged_transcript_stream(spark, sf_dir, "logmind_stream_contract_")
    q = (
        incremental_pipeline(
            spark,
            stream,
            f"{root}/snap",
            checkpoint_location=f"{root}/ckpt",
        )
        .start()
    )
    q.awaitTermination()
    store = SnapshotStore(spark, f"{root}/snap")
    return store.read("stream_templates").select("template_id", "pattern", "log_count")


def q_stateful_templates(spark, sf_dir):
    """T4 via the TRUE stateful path (streaming.stateful_miner): Drain leaf
    state in the state store instead of re-reading the committed dimension
    per trigger. Same corpus and 2-file split as q_streaming_templates, same
    golden oracle: per-epoch distinct-sig assignments aggregated by
    (template_id, pattern) with log_count = Σ weight converge — template set
    and count mass — to the one-shot batch mine, because each epoch seeds
    from the recovered state exactly like foreachBatch seeds from the
    committed templates. Like streaming_templates, exactness holds because
    no batch-2 signature generalizes a batch-1 template on this corpus/split
    (append output cannot retro-update earlier epochs' emitted patterns)."""
    from log_parser_mind_spark.streaming.stateful_miner import mine_templates_stateful

    root, stream = _staged_transcript_stream(spark, sf_dir, "logmind_stateful_contract_")
    q = (
        mine_templates_stateful(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(f"{root}/out")
        .groupBy(F.col("template_id"), F.col("template").alias("pattern"))
        .agg(F.sum("weight").alias("log_count"))
    )


def q_streaming_parsed(spark, sf_dir):
    """Pure-streaming END-TO-END parse (streaming.stateful_miner
    parsed_stream): per-turn template assignment inside the stateful mining
    operator itself — the full per-log `processLog` path
    (cmd/ingestion/main.go:64-99) as ONE streaming query, no foreachBatch
    and no join back onto the stream. Same corpus, 2-file conv_id-range
    split (mtime-pinned so trigger order == canonical (conv, turn) order)
    as the other streaming queries; oracle = the drain_parsed_turns golden,
    so the streamed sink must equal the one-shot batch parse PER TURN —
    template assignment, is_new founding-row placement, and sizes."""
    from log_parser_mind_spark.streaming.stateful_miner import parsed_stream

    root, stream = _staged_transcript_stream(spark, sf_dir, "logmind_sparse_contract_")
    q = (
        parsed_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{root}/out").select(
        "conv_id", "turn_idx", "template_id", "is_new",
        "original_size", "compressed_size",
    )


def q_streaming_dedup(spark, sf_dir):
    """Dedup-at-ingestion (streaming.streaming_exact_dedup): the documents
    corpus split into 2 micro-batches, state-store dropDuplicates on the
    normalized text. The deterministic surface is the kept KEY SET (which
    physical row survives a within-batch tie is partition-dependent), so
    the query emits the distinct normalized texts; the oracle is the batch
    distinct over the same normalization — streaming state across batches
    == batch distinct, hash-verified."""
    from log_parser_mind_spark.streaming.stream import streaming_exact_dedup

    root, stream = _staged_transcript_stream(spark, sf_dir, "logmind_sdedup_contract_")
    q = (
        streaming_exact_dedup(stream)
        .select(F.col("_norm").alias("norm_text"))
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{root}/out").select("norm_text")


_ORACLE_STREAMING_DEDUP = r"""
SELECT DISTINCT lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm_text
FROM documents
"""


def q_streaming_contamination(spark, sf_dir):
    """Ingestion-time benchmark-contamination alerts (streaming.
    streaming_contamination_alerts): the documents corpus as a 2-micro-batch
    stream, stream-static-joined on exact case-folded 8-gram hashes against
    the SAME static benchmark as exact_contamination (every 7th doc) — one
    alert per contaminated doc across all triggers. The oracle recomputes
    the distinct contaminated ids relationally; convergence with the batch
    audit is the shared-gram-builder guarantee (curate.distinct_gram_hashes),
    tested in tests/test_streaming.py."""
    from log_parser_mind_spark.streaming.stream import streaming_contamination_alerts

    root, stream = _staged_transcript_stream(spark, sf_dir, "logmind_scontam_contract_")
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.format_string("conv_%08d", F.col("doc_id")).alias("conv_id"), "text"
    )
    q = (
        streaming_contamination_alerts(stream, bench, n=8)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{root}/out")
        .option("checkpointLocation", f"{root}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(f"{root}/out").select("conv_id")


def q_streaming_incremental_dedup(spark, sf_dir):
    """Near-dup admission AT INGESTION (streaming.streaming_index_admission):
    the increment slice (doc_id % 5 == 0) streamed as 2 micro-batches, each
    audited by foreachBatch against the SAME prebuilt base index as
    incremental_dedup (provable k=bands=32 unigram config). Each doc's
    decision depends only on the static index/base — the per-batch audits
    compose EXACTLY to the batch audit regardless of chunking, so this
    query shares incremental_dedup's exhaustive-Jaccard oracle verbatim."""
    import tempfile

    from log_parser_mind_spark.streaming.stream import streaming_index_admission

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    root = tempfile.mkdtemp(prefix="logmind_sadmit_contract_")
    inc.repartitionByRange(2, "doc_id").write.mode("overwrite").parquet(f"{root}/input")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{root}/input")
    )
    # persist: every micro-batch re-reads the index (geometry probe + band
    # join) — unpersisted, the base MinHash pass would run ~2× per batch.
    # Production stores the index as a table; this is the in-query analog.
    idx = dedup.build_minhash_index(base, k=32, bands=32, shingle_n=1).persist()
    q = streaming_index_admission(
        stream, idx, base, f"{root}/audit", f"{root}/ckpt",
        threshold=0.7, k=32, bands=32, shingle_n=1,
    ).start()
    q.awaitTermination()
    return (
        spark.read.parquet(f"{root}/audit")
        .select(F.col("id").alias("doc_id"), "n_base_dups", "kept")
    )


# ONE gram-identity definition for the batch audit AND the streaming alert
# oracles (8-grams over the shared ws tokenizer; corpus = documents,
# blocklist = every 7th doc) — mirroring the engine side, where both paths
# share curate.distinct_gram_hashes. Editing one oracle's gram rule without
# the other is impossible by construction.
_GRAM_CTES = r"""
WITH ctoks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS t
  FROM documents
), btoks AS (
  SELECT list_filter(regexp_split_to_array(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS t
  FROM documents WHERE doc_id % 7 = 0
), cg AS (
  SELECT DISTINCT doc_id, g
  FROM ctoks, LATERAL unnest(list_transform(generate_series(1, greatest(len(t)-7, 0)),
                                            i -> array_to_string(list_slice(t, i, i+7), ' '))) AS u(g)
), bg AS (
  SELECT DISTINCT g
  FROM btoks, LATERAL unnest(list_transform(generate_series(1, greatest(len(t)-7, 0)),
                                            i -> array_to_string(list_slice(t, i, i+7), ' '))) AS u(g)
)"""

_ORACLE_STREAMING_CONTAMINATION = _GRAM_CTES + r"""
SELECT DISTINCT printf('conv_%08d', cg.doc_id) AS conv_id
FROM cg JOIN bg USING (g)
"""


def q_multimodal_features(spark, sf_dir):
    assets = multimodal.synth_assets(spark, n=64)
    feats = multimodal.decode_and_featurize(assets, fake=True)
    return feats.select(
        "asset_id", "media_type", F.col("n_bytes").cast("long").alias("n_bytes")
    )


def q_multimodal_real_decode(spark, sf_dir):
    """The REAL decode path (fake=False) on in-container-decodable formats:
    hash-derived binary PPM images + PCM16 WAV audio (sources.multimodal
    synth_real_assets), pixels/samples → 16-dim features, posexploded to
    scalars so the locked golden pins EVERY feature value. Decoding is
    pure Python over bytes — not SQL-expressible — so the oracle is a
    locked deterministic golden (parallelism invariance is what it pins);
    pytest separately round-trips the decoders against known vectors."""
    assets = multimodal.synth_real_assets(spark, n=32)
    feats = multimodal.decode_and_featurize(assets, fake=False)
    return feats.select(
        "asset_id", "media_type", F.col("n_bytes").cast("long").alias("n_bytes"),
        F.posexplode("features").alias("feat_idx", "feat_value"),
    ).select(
        "asset_id", "media_type", "n_bytes",
        F.col("feat_idx").cast("long").alias("feat_idx"),
        F.round(F.col("feat_value").cast("double"), 6).alias("feat_value"),
    )


# ---------------------------------------------------------------------------
# Grok/parse layer over documents — DuckDB-checkable (P1-P6, F6)
# ---------------------------------------------------------------------------


def q_mask_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = masking.tokens_expr(F.col("text"))
    return docs.select(
        "doc_id",
        masking.masked_sig_expr(masking.masked_tokens_expr(toks)).alias("masked_sig"),
        F.size(toks).cast("long").alias("n_tokens"),
    )


_ORACLE_MASK = f"""
SELECT doc_id,
       array_to_string(
         list_transform(string_split_regex(trim(text), '\\s+'),
                        t -> CASE WHEN regexp_matches(t, '{masking.IS_VARIABLE_PATTERN}')
                                  THEN '<*>' ELSE t END),
         ' ') AS masked_sig,
       len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
FROM documents
"""


def q_redact_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", redaction.redact_expr(F.col("text")).alias("redacted"))


def _oracle_redact() -> str:
    expr = "text"
    for _, pattern, placeholder in redaction.active_patterns():
        expr = f"regexp_replace({expr}, '{pattern}', '{placeholder}', 'g')"
    return f"SELECT doc_id, {expr} AS redacted FROM documents"


def q_detect_pii(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_join(redaction.detect_pii_expr(F.col("text")), ",").alias("pii_types"),
    )


def _oracle_detect_pii() -> str:
    cases = ", ".join(
        f"CASE WHEN regexp_matches(text, '{p}') THEN '{n}' END"
        for n, p, _ in redaction.active_patterns()
    )
    return (
        f"SELECT doc_id, coalesce(array_to_string(list_filter([{cases}], x -> x IS NOT NULL), ','), '') "
        "AS pii_types FROM documents"
    )


def _custom_redactor_config():
    from log_parser_mind_spark.config import RedactorConfig

    return RedactorConfig(
        custom_patterns={"ticket": r"TKT-\d+", "build": r"bld_[a-z0-9]+"}
    )


def q_custom_redaction(spark, sf_dir):
    """X2 — user-supplied custom PII patterns (redactor.go custom → [REDACTED])
    compose with the built-in set: built-ins in canonical order first, then
    customs in sorted-name order. Matches synthesized deterministically so the
    customs and the ipv4 built-in all fire."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    synth = F.concat(
        F.col("text"),
        F.lit(" ref TKT-"), F.col("doc_id").cast("string"),
        F.lit(" bld_a1 ip 10.0.0."), (F.col("doc_id") % 255).cast("string"),
    )
    return docs.select(
        "doc_id", redaction.redact_expr(synth, _custom_redactor_config()).alias("redacted")
    )


def _oracle_custom_redaction() -> str:
    synth = (
        "text || ' ref TKT-' || doc_id || ' bld_a1 ip 10.0.0.' || (doc_id % 255)"
    )
    expr = f"({synth})"
    for _, pattern, placeholder in redaction.active_patterns(_custom_redactor_config()):
        expr = f"regexp_replace({expr}, '{pattern}', '{placeholder}', 'g')"
    return f"SELECT doc_id, {expr} AS redacted FROM documents WHERE doc_id < 300"


def q_map_sizes(spark, sf_dir):
    """A12/F5 — map construction + byte-size aggregate (estimateVariablesSize,
    cmd/compression/main.go:85-91: Σ len(key)+len(value) over the variables
    map) over a deterministically derived map — first 3 tokens keyed
    var_0..var_2 — so the check has no mining dependency."""
    from log_parser_mind_spark.operators.parse import map_size_expr

    docs = _t(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.col("text"), " "), 1, 3)
    keys = F.transform(toks, lambda _t, i: F.concat(F.lit("var_"), i.cast("string")))
    variables = F.map_from_arrays(keys, toks)
    return docs.select(
        "doc_id", map_size_expr(variables).cast("long").alias("var_bytes")
    )


_ORACLE_MAP_SIZES = """
SELECT doc_id,
       coalesce(list_sum(list_transform(string_split(text, ' ')[1:3],
                                        x -> 5 + strlen(x))), 0)::BIGINT AS var_bytes
FROM documents
"""


def q_mask_partial(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    email = F.concat(F.lower(F.regexp_replace("c_name", r"[^A-Za-z0-9]", "")), F.lit("@example.com"))
    return cust.select(
        "c_custkey",
        redaction.mask_expr(F.col("c_name"), 4).alias("masked_name"),
        redaction.mask_email_expr(email).alias("masked_email"),
    )


_ORACLE_MASK_PARTIAL = """
WITH e AS (
  SELECT c_custkey, c_name,
         lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) || '@example.com' AS email
  FROM customer
)
SELECT c_custkey,
       CASE WHEN length(c_name) <= 4 THEN repeat('*', length(c_name))
            ELSE substr(c_name, 1, 4) || repeat('*', length(c_name) - 4) END AS masked_name,
       CASE WHEN length(string_split(email, '@')[1]) <= 1
            THEN string_split(email, '@')[1] || '@' || string_split(email, '@')[2]
            ELSE substr(email, 1, 1) || repeat('*', length(string_split(email, '@')[1]) - 1)
                 || '@' || string_split(email, '@')[2] END AS masked_email
FROM e
"""


def q_doc_sizes(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


_ORACLE_DOC_SIZES = """
SELECT doc_id, strlen(text)::BIGINT AS n_bytes, length(text)::BIGINT AS n_chars_measured
FROM documents
"""


# ---------------------------------------------------------------------------
# Text analysis (training-data ops) — DuckDB-checkable
# ---------------------------------------------------------------------------


def q_token_counts(spark, sf_dir):
    docs = tx.with_tokens(_t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_ws_tokens"),
        tx.bpe_ish_token_count_expr(F.col("text")).cast("long").alias("n_bpe_tokens"),
        tx.punct_count_expr(F.col("text")).cast("long").alias("n_punct"),
    )


_ORACLE_TOKEN_COUNTS = f"""
SELECT doc_id,
       len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '{tx.BPE_ISH_PATTERN}'))::BIGINT AS n_bpe_tokens,
       len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]'))::BIGINT AS n_punct
FROM documents
"""


def q_lang_id(spark, sf_dir):
    # tokenize-once shape: tokens materialized in their own projection, the
    # per-language hit exprs reference the attribute (one split in the plan).
    docs = tx.with_tokens(_t(spark, sf_dir, "documents"))
    return docs.select("doc_id", tx.lang_id_from(F.col("tokens")).alias("lang_guess"))


def _oracle_lang_id() -> str:
    hit = {
        lang: (
            "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            f"t -> t IN ({', '.join(repr(w) for w in tx.LANG_STOPWORDS[lang])})))"
        )
        for lang in tx.LANG_ORDER
    }
    best = f"greatest({', '.join(hit.values())})"
    whens = " ".join(
        f"WHEN {hit[lang]} = best AND best >= 1 THEN '{lang}'" for lang in tx.LANG_ORDER
    )
    return (
        f"WITH s AS (SELECT doc_id, text, {best} AS best FROM documents) "
        f"SELECT doc_id, CASE {whens} ELSE 'unknown' END AS lang_guess FROM s"
    )


def q_quality_scores(spark, sf_dir):
    docs = tx.with_tokens(_t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", tx.quality_score_from(F.col("tokens"), F.col("text")).alias("quality")
    )


def _oracle_quality() -> str:
    stop = ", ".join(repr(w) for w in tx.LANG_STOPWORDS["en"])
    return f"""
WITH s AS (
  SELECT doc_id,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]')) AS punct,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t IN ({stop}))) AS stop
  FROM documents
)
SELECT doc_id,
       round(0.4 * least(n_tok / 64.0, 1.0)
           + 0.3 * least(CASE WHEN n_tok > 0 THEN stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END * 4, 1.0)
           + 0.3 * (1 - least(CASE WHEN n_chars > 0 THEN punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)),
           6) AS quality
FROM s
"""


def q_fingerprints(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", tx.fingerprint_expr(F.col("text")).alias("fp"))


_ORACLE_FINGERPRINT = """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           list_transform(string_split_regex(trim(lower(text)), '\\s+'),
                          t -> (31 * unicode(t) + strlen(t)) % 1000000007)),
         (acc, u) -> (acc * 131 + u) % 1000000007
       ) AS fp
FROM documents
"""


def q_exact_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(dedup.normalized_text(F.col("text")).alias("norm"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("keep_id", "dup_count")
    )


_ORACLE_EXACT_DEDUP = """
SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS dup_count
FROM documents
GROUP BY lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
"""


def q_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 80)
    pairs = dedup.ngram_jaccard_pairs(docs, n=1, threshold=0.7)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_ORACLE_NGRAM_JACCARD = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), '\\s+') AS t
  FROM documents WHERE doc_id < 80
), sh AS (
  SELECT DISTINCT doc_id, s.shingle FROM toks, UNNEST(t) AS s(shingle)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE common / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.7
"""


def q_text_search(spark, sf_dir):
    """P11 — free-text search (declared-but-unimplemented in the reference,
    api/proto/compression.proto:72): contains filter + recency order + limit,
    through the real query.search_logs operator. ts is unique per doc at this
    corpus (doc_id < 86400 → distinct second offsets), so the DuckDB order is
    total and the limit deterministic."""
    from log_parser_mind_spark.operators.parse import log_id_expr
    from log_parser_mind_spark.operators.query import search_logs

    tr = documents_as_transcripts(spark, sf_dir).withColumn(
        "log_id", log_id_expr(F.col("conv_id"), F.col("turn_idx"))
    )
    return search_logs(tr, "er", limit=50).select("conv_id", "text")


_ORACLE_TEXT_SEARCH = """
SELECT printf('conv_%08d', doc_id) AS conv_id, text
FROM documents
WHERE text LIKE '%er%'
ORDER BY doc_id % 86400 DESC, doc_id DESC
LIMIT 50
"""


def _exhaustive_verified_pairs(docs):
    """The PROVABLE LSH config (k=bands=32, rows_per_band=1, unigrams,
    t=0.7) shared by q_minhash_verified_dups and q_near_dup_components —
    ONE definition, because _ORACLE_MINHASH_VERIFIED encodes exactly these
    parameters and the components oracle wraps that SQL: tuning one query's
    literals without the other would silently break the shared oracle."""
    cand = dedup.minhash_lsh_candidates(docs, k=32, bands=32, shingle_n=1)
    return dedup.ngram_jaccard_pairs(docs, n=1, threshold=0.7, candidates=cand)


def q_minhash_verified_dups(spark, sf_dir):
    """LSH→exact-verify composition over the FULL documents table (the scale
    path: candidates from minhash bands prune the shingle self-join, then
    exact Jaccard verifies). With rows_per_band=1 (k=bands=32) the per-pair
    miss probability at s=0.7 is 0.3^32 ≈ 2e-17, and the result is verified
    EQUAL to the exhaustive all-pairs oracle on this corpus."""
    docs = _t(spark, sf_dir, "documents")
    pairs = _exhaustive_verified_pairs(docs)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


_ORACLE_MINHASH_VERIFIED = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), '\\s+') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s.shingle FROM toks, UNNEST(t) AS s(shingle)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(common / CAST(sa.n + sb.n - common AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE common / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.7
"""


def q_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.brute_force_topk(
        emb.filter(F.col("vec_id") < 5), emb.filter(F.col("vec_id") >= 5), k=3
    )
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


_ORACLE_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
     c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos_raw
  FROM q, c
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
       row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 3
"""


def _plane_sql_literals(n_planes: int, dim: int = 64, seed: int = 42) -> list[str]:
    """The SAME seeded hyperplanes similarity._hyperplanes ships to Spark as
    F.lit arrays, rendered as DuckDB DOUBLE[] literals — so the oracle
    replicates the bucketing bit-for-bit instead of trusting it."""
    planes = similarity._hyperplanes(dim, n_planes, seed)
    return ["[" + ",".join(repr(float(x)) for x in p) + "]::DOUBLE[]" for p in planes]


def _bucket_sql(vec: str, n_planes: int) -> str:
    """bucket bit i = sign of <v, h_i>, exactly hyperplane_bucket's expression."""
    return " + ".join(
        f"CASE WHEN list_dot_product({vec}, {p}) > 0 THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(_plane_sql_literals(n_planes))
    )


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-dup: hyperplane LSH with the OR-construction
    (2 banded 3-plane slices — single full-width buckets have collapsing
    recall at scale, see dedup.embedding_near_dups) → exact in-band cosine
    verify. The oracle replicates the banding itself (same plane literals,
    same bit slices), so the check covers the LSH partitioning AND the
    verify, not just the final filter."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_near_dups(emb, threshold=0.3, n_planes=6, dim=64, bands=2)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _oracle_embedding_near_dups() -> str:
    cos = (
        "list_dot_product(a.v, c.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v)))"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {_bucket_sql('v', 6)} AS bucket FROM e),
bb AS (SELECT vec_id, v, bucket & 7 AS b0, (bucket >> 3) & 7 AS b1 FROM b),
pairs AS (
  SELECT a.vec_id AS id_a, c.vec_id AS id_b, {cos} AS cos
  FROM bb a JOIN bb c ON a.b0 = c.b0 AND a.vec_id < c.vec_id
  UNION
  SELECT a.vec_id AS id_a, c.vec_id AS id_b, {cos} AS cos
  FROM bb a JOIN bb c ON a.b1 = c.b1 AND a.vec_id < c.vec_id
)
SELECT DISTINCT id_a, id_b, round(cos, 6) AS cosine
FROM pairs WHERE cos >= 0.3
"""


def q_lsh_ann_topk(spark, sf_dir):
    """Approximate top-k ANN via hyperplane LSH with hamming-1 multi-probe:
    each query joins its own bucket plus every 1-bit-flip neighbor bucket.
    Oracle replicates buckets + probe expansion + ranking in SQL."""
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.lsh_topk(
        emb.filter(F.col("vec_id") < 5),
        emb.filter(F.col("vec_id") >= 5),
        k=3, n_planes=4, probe_hamming=1, dim=64,
    )
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def _oracle_lsh_ann_topk() -> str:
    probes = ", ".join(["qb.bucket"] + [f"xor(qb.bucket, {1 << i})" for i in range(4)])
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
     c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id >= 5),
qb AS (SELECT query_id, qv, {_bucket_sql('qv', 4)}::BIGINT AS bucket FROM q),
qp AS (SELECT query_id, qv, u.bucket FROM qb, UNNEST([{probes}]) AS u(bucket)),
cb AS (SELECT neighbor_id, cv, {_bucket_sql('cv', 4)}::BIGINT AS bucket FROM c),
scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cos_raw
  FROM qp JOIN cb USING (bucket)
)
SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
       row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id) AS rank
FROM scored
QUALIFY rank <= 3
"""


def q_curated_corpus(spark, sf_dir):
    """The composed training-data curation job (operators/curate.py): exact
    dedup → LSH-verified near-dup drop (same proven params as
    minhash_verified_dups) → quality/lang gate over once-materialized tokens.
    The oracle recomposes every stage from its already-proven SQL fragment —
    the whole funnel is value-checked, not just each stage in isolation."""
    from log_parser_mind_spark.operators import curate

    docs = _t(spark, sf_dir, "documents")
    out = curate.curate_corpus(
        docs,
        jaccard_threshold=0.7, minhash_k=32, minhash_bands=32, shingle_n=1,
        min_quality=0.5,
    )
    return out.select("doc_id", "lang", "quality", F.col("n_tokens").cast("long").alias("n_tokens"))


def _oracle_curated_corpus() -> str:
    stop_en = ", ".join(repr(w) for w in tx.LANG_STOPWORDS["en"])
    hit = {
        lang: (
            "len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
            f"t -> t IN ({', '.join(repr(w) for w in tx.LANG_STOPWORDS[lang])})))"
        )
        for lang in tx.LANG_ORDER
    }
    best = f"greatest({', '.join(hit.values())})"
    lang_case = " ".join(
        f"WHEN {hit[lang]} = best AND best >= 1 THEN '{lang}'" for lang in tx.LANG_ORDER
    )
    return f"""
WITH exact_keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
), s1 AS (
  SELECT d.* FROM documents d JOIN exact_keep USING (doc_id)
), toks AS (
  SELECT doc_id, string_split_regex(trim(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), '\\s+') AS t
  FROM s1
), sh AS (
  SELECT DISTINCT doc_id, s.shingle FROM toks, UNNEST(t) AS s(shingle)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), near_drop AS (
  SELECT DISTINCT id_b AS doc_id
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE common / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.7
), s2 AS (
  SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)
), scored AS (
  SELECT doc_id, text, best,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tok,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]')) AS punct,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t IN ({stop_en}))) AS stop
  FROM (SELECT doc_id, text, {best} AS best FROM s2)
)
SELECT * FROM (
  SELECT doc_id,
         CASE {lang_case} ELSE 'unknown' END AS lang,
         round(0.4 * least(n_tok / 64.0, 1.0)
             + 0.3 * least(CASE WHEN n_tok > 0 THEN stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END * 4, 1.0)
             + 0.3 * (1 - least(CASE WHEN n_chars > 0 THEN punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)),
             6) AS quality,
         n_tok::BIGINT AS n_tokens
  FROM scored
) WHERE quality >= 0.5
"""


def q_embed_ann_topk(spark, sf_dir):
    """X5 end-to-end: hashing-trick text embedding (model-free, all-JVM —
    operators/embed.py; the reference's Ada-002 call at llm/client.go:252-268
    stays behind the env-gated client seam) → exact cosine top-k over the
    embedded documents. xxhash64-based, so the oracle is a locked
    deterministic golden (same class as simhash/minhash)."""
    docs = _t(spark, sf_dir, "documents")
    emb = embed_ops.hashing_embedding_table(docs, dim=64)
    res = similarity.brute_force_topk(
        emb.filter(F.col("doc_id") < 5), emb.filter(F.col("doc_id") >= 5),
        k=3, id_col="doc_id",
    )
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ivf_ann_topk(spark, sf_dir):
    """J5/X5 scale path #2 — IVF approximate top-k over the embeddings table
    (similarity.ivf_topk): deterministic k-means inverted lists (seeded
    xxhash64 init + rounded centroids), probe the 2 nearest lists per query,
    exact cosine + rank within them. k-means is iterative with driver-side
    centroid state, so the oracle is a locked deterministic golden (same
    class as simhash/minhash; parallelism invariance is what it pins)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.ivf_topk(
        emb.filter(F.col("vec_id") < 5), emb.filter(F.col("vec_id") >= 5),
        k=3, n_centroids=4, n_probe=2, dim=64,
    )
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ivf_ann_topk_scaled(spark, sf_dir):
    """IVF at a corpus-scaled config (VERDICT r4 item 5): n_centroids=16 ≈
    √corpus for the 495-vector sf0.01 corpus (vs the small 4-list pin) and
    n_probe=4 — a quarter of the lists probed instead of half, the dial a
    100 TB deployment actually sits at. Same locked-golden oracle class as
    ivf_ann_topk: k-means is iterative with driver-side centroid state, so
    the golden pins determinism/parallelism-invariance at a SECOND point of
    the (n_centroids, n_probe) surface; list balance is measured separately
    (bucket_stats_bench ivf_lists)."""
    emb = _t(spark, sf_dir, "embeddings")
    res = similarity.ivf_topk(
        emb.filter(F.col("vec_id") < 5), emb.filter(F.col("vec_id") >= 5),
        k=3, n_centroids=16, n_probe=4, dim=64,
    )
    return res.select(
        "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_bpe_merges(spark, sf_dir):
    """Learned subword vocabulary — distributed BPE training over the
    documents corpus (functions/bpe.py train_bpe: exact JVM word histogram
    = the one corpus-sized pass, driver merge loop over the vocabulary-
    bounded type table). INDEPENDENT-oracle golden: tools/make_goldens.py
    derives the same 200 merges with the NAIVE recount-per-iteration
    trainer in oracle.py (different algorithm, same spec) and asserts
    double-entry equality before writing. Columns aliased away from SQL
    keywords (left/right/rank) for the DuckDB oracle read."""
    docs = _t(spark, sf_dir, "documents")
    merges = bpe_fn.train_bpe(docs, num_merges=200)
    return bpe_fn.merges_table(spark, merges).select(
        F.col("rank").alias("merge_rank"),
        F.col("left").alias("lhs"),
        F.col("right").alias("rhs"),
        "token",
    )


def q_bpe_token_stats(spark, sf_dir):
    """Token-budget accounting under the LEARNED vocabulary: encode the
    corpus with its own 200-merge BPE (functions/bpe.py with_bpe_tokens —
    JVM pre-tokenize, one Arrow-batched merge-application stage, no
    shuffle) and aggregate per language. avg is a single double division
    of two exact longs — bit-identical in the mirror, so no rounding is
    needed. Same independent-oracle golden class as bpe_merges (mirror
    encodes every doc from scratch)."""
    docs = _t(spark, sf_dir, "documents")
    merges = bpe_fn.train_bpe(docs, num_merges=200)
    enc = bpe_fn.with_bpe_tokens(docs, merges)
    base = enc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("bpe_tokens")).cast("long").alias("total_bpe_tokens"),
    )
    dis = (
        enc.select("lang", F.explode("bpe_tokens").alias("tok"))
        .groupBy("lang")
        .agg(F.countDistinct("tok").alias("distinct_bpe_tokens"))
    )
    return (
        base.join(dis, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "total_bpe_tokens",
            F.coalesce("distinct_bpe_tokens", F.lit(0)).cast("long").alias("distinct_bpe_tokens"),
            (F.col("total_bpe_tokens") / F.col("n_docs")).alias("avg_bpe_tokens_per_doc"),
        )
    )


def q_search_similar(spark, sf_dir):
    """J4 — substring-similarity experience search (cmd/experience/main.go:
    92-116: two-way signature containment, confidence-then-recency ranked
    top-k). Experiences derived deterministically from documents."""
    from log_parser_mind_spark.operators import experience

    docs = _t(spark, sf_dir, "documents")
    exps = docs.select(
        F.format_string("exp-%06d", F.col("doc_id")).alias("experience_id"),
        F.substring(F.lower("text"), 1, 24).alias("issue_signature"),
        (F.col("doc_id") % 97 / F.lit(97.0)).alias("confidence"),
        F.timestamp_seconds(F.lit(1704067200) + (F.col("doc_id") % 13) * 3600).alias(
            "created_at"
        ),
    )
    top = experience.search_similar(exps, "slow", top_k=5)
    return top.select(
        "experience_id", "issue_signature", F.round("confidence", 6).alias("confidence")
    )


_ORACLE_SEARCH_SIMILAR = """
WITH exps AS (
  SELECT printf('exp-%06d', doc_id) AS experience_id,
         substr(lower(text), 1, 24) AS issue_signature,
         (doc_id % 97) / 97.0 AS confidence,
         to_timestamp(1704067200 + (doc_id % 13) * 3600) AS created_at,
         doc_id
  FROM documents
)
SELECT experience_id, issue_signature, round(confidence, 6) AS confidence
FROM exps
WHERE contains(issue_signature, 'slow') OR contains('slow', issue_signature)
ORDER BY confidence DESC, created_at DESC, experience_id
LIMIT 5
"""


def q_strip_fences(spark, sf_dir):
    """F17 — code-fence stripping over fenced documents (fences synthesized
    deterministically so the operator has something to strip)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    fenced = F.concat(F.lit("```json\n"), F.substring("text", 1, 40), F.lit("\n```"))
    return docs.select("doc_id", tx.strip_code_fences_expr(fenced).alias("stripped"))


_ORACLE_STRIP_FENCES = """
-- Go cleanJSONResponse replica: TrimSpace; strip ```json / ``` prefix and a
-- trailing ``` only inside a matched prefix branch; TrimSpace again.
WITH fenced AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(
           '```json' || chr(10) || substr(text, 1, 40) || chr(10) || '```',
           '^\\s+', ''), '\\s+$', '') AS s
  FROM documents WHERE doc_id < 100
), body AS (
  SELECT doc_id,
         CASE WHEN s LIKE '```json%'
                THEN regexp_replace(regexp_replace(s, '^```json', ''), '```$', '')
              WHEN s LIKE '```%'
                THEN regexp_replace(regexp_replace(s, '^```', ''), '```$', '')
              ELSE s END AS b
  FROM fenced
)
SELECT doc_id, regexp_replace(regexp_replace(b, '^\\s+', ''), '\\s+$', '') AS stripped
FROM body
"""


def q_sustainability(spark, sf_dir):
    """A14 — derived compression/bytes-saved metrics over per-type stats."""
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.sum(F.octet_length("props")).cast("long").alias("total_original_size"),
    ).withColumn("total_compressed_size", F.expr("total_original_size div 4"))
    saved = F.col("total_original_size") - F.col("total_compressed_size")
    return stats.select(
        "event_type",
        saved.alias("bytes_saved"),
        F.round(saved / F.lit(1024.0**3) * 0.0002, 12).alias("co2_kg_saved"),
        F.round(saved / F.lit(1024.0**3) * 0.023, 12).alias("cost_usd_saved"),
    )


_ORACLE_SUSTAINABILITY = """
WITH stats AS (
  SELECT event_type,
         cast(sum(strlen(props)) AS BIGINT) AS orig,
         cast(sum(strlen(props)) AS BIGINT) // 4 AS comp
  FROM events GROUP BY event_type
)
SELECT event_type, orig - comp AS bytes_saved,
       round((orig - comp) / (1024.0*1024*1024) * 0.0002, 12) AS co2_kg_saved,
       round((orig - comp) / (1024.0*1024*1024) * 0.023, 12) AS cost_usd_saved
FROM stats
"""


# ---------------------------------------------------------------------------
# Filters / projections / predicates over events (P7-P11)
# ---------------------------------------------------------------------------


def q_filter_project(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == "error")
            & (F.col("ts") >= "2024-01-05 00:00:00")
            & (F.col("ts") <= "2024-01-20 00:00:00")
        )
        .select("event_id", "ts", "user_id")
    )


_ORACLE_FILTER_PROJECT = """
SELECT event_id, ts, user_id FROM events
WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
"""


def q_like_predicate(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.when(F.col("event_type").like("%err%"), 1)).alias("err_like"),
        F.count(F.when(F.col("event_type").contains("ck"), 1)).alias("ck_contains"),
    )


_ORACLE_LIKE_PREDICATE = """
SELECT event_type,
       count(*) FILTER (WHERE event_type LIKE '%err%')::BIGINT AS err_like,
       count(*) FILTER (WHERE contains(event_type, 'ck'))::BIGINT AS ck_contains
FROM events GROUP BY event_type
"""


def q_validation(spark, sf_dir):
    """P9 — row validation filters → valid/invalid fan-out counts."""
    ev = _t(spark, sf_dir, "events")
    valid = (
        F.col("event_type").isin("click", "view", "purchase", "signup", "error")
        & F.col("value").isNotNull()
        & (F.col("value") >= 0)
    )
    return ev.agg(
        F.count(F.when(valid, 1)).alias("valid_rows"),
        F.count(F.when(~valid, 1)).alias("invalid_rows"),
    )


_ORACLE_VALIDATION = """
SELECT count(*) FILTER (WHERE event_type IN ('click','view','purchase','signup','error')
                          AND value IS NOT NULL AND value >= 0)::BIGINT AS valid_rows,
       count(*) FILTER (WHERE NOT (event_type IN ('click','view','purchase','signup','error')
                          AND value IS NOT NULL AND value >= 0))::BIGINT AS invalid_rows
FROM events
"""


def q_json_extract(spark, sf_dir):
    """F12 — JSON prop extraction + aggregate."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 6).alias("avg_k"), F.max(k).alias("max_k")
    )


_ORACLE_JSON_EXTRACT = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Aggregations over events (A1-A5, A8-A11)
# ---------------------------------------------------------------------------


def q_global_stats_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("user_id").alias("unique_users"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


_ORACLE_GLOBAL_STATS_EVENTS = """
SELECT count(*)::BIGINT AS total_rows,
       count(DISTINCT user_id)::BIGINT AS unique_users,
       round(sum(value), 6) AS sum_value,
       round(avg(value), 6) AS avg_value
FROM events
"""


def q_hourly_rollup_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value")
    )


_ORACLE_HOURLY_ROLLUP_EVENTS = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_user_sessions(spark, sf_dir):
    """W-family extension — gap-timeout sessionization over the event stream
    (operators/sessionize.conversation_sessions: lag gap detection + running
    boundary sum + per-session aggregate, ONE conv-keyed shuffle for the
    whole plan). 30-minute gap, event_id tiebreak. The streaming analog
    (applyInPandasWithState) is tested to converge to this in
    tests/test_sessionize.py."""
    from log_parser_mind_spark.operators.sessionize import conversation_sessions

    ev = _t(spark, sf_dir, "events")
    s = conversation_sessions(
        ev, gap_minutes=30, conv_col="user_id", ts_col="ts", tiebreak_col="event_id"
    )
    return s.select(
        "user_id", "session_idx", "n_turns", "start_ts", "end_ts",
        F.round("duration_sec", 6).alias("duration_sec"),
    )


_ORACLE_USER_SESSIONS = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_turns,
       min(ts) AS start_ts, max(ts) AS end_ts,
       round(epoch(max(ts)) - epoch(min(ts)), 6) AS duration_sec
FROM sid GROUP BY user_id, session_idx
"""


def q_session_window_rollup(spark, sf_dir):
    """Gap-timeout sessionization via Spark's NATIVE session_window
    aggregation (sessionize.session_window_sessions) — the second,
    independent implementation of the user_sessions semantics (the
    streaming-liftable path: session_window + watermark runs with
    state-store window merging). No portable SQL expresses session_window
    directly, so the oracle is the SAME lag+cumsum SQL as user_sessions —
    an independent derivation that also pins the two implementations to
    each other (equality additionally asserted in tests/test_sessionize.py,
    including the exactly-gap-sized boundary)."""
    from log_parser_mind_spark.operators.sessionize import session_window_sessions

    ev = _t(spark, sf_dir, "events")
    s = session_window_sessions(ev, gap_minutes=30, conv_col="user_id", ts_col="ts")
    return s.select(
        "user_id", "session_idx", "n_turns", "start_ts", "end_ts",
        F.round("duration_sec", 6).alias("duration_sec"),
    )


def q_stratified_sample(spark, sf_dir):
    """Training-mix sampling — deterministic per-row MINSTD predicate
    (operators/sample.stratified_sample): keep 100% of de, 50% of en, 25%
    of zh documents, 0% otherwise. Reproducible at any parallelism or
    engine; the oracle recomputes the SAME integer arithmetic in SQL
    instead of trusting a seed."""
    docs = _t(spark, sf_dir, "documents")
    out = sample_ops.stratified_sample(
        docs, {"de": 1.0, "en": 0.5, "zh": 0.25}, strata_col="lang", salt=7
    )
    return out.select("doc_id", "lang")


_ORACLE_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE (((((doc_id % 2147483647) * 48271 + 7) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) <
      CASE lang WHEN 'de' THEN 2147483647
                WHEN 'en' THEN 1073741823
                WHEN 'zh' THEN 536870911
                ELSE 0 END
"""


def q_packed_corpus(spark, sf_dir):
    """Sequence packing (operators/sample.pack_corpus): deterministic shard
    by MINSTD(doc_id) mod 8, whitespace token counts, first-fit running-sum
    packs of 512 tokens. Per-pack summary keeps the output small and pins
    shard, boundary, and count logic; oracle replicates shard arithmetic +
    token split + window sum in SQL."""
    docs = _t(spark, sf_dir, "documents")
    packs = sample_ops.pack_corpus(docs, budget_tokens=512, n_shards=8, salt=3)
    return packs.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


_ORACLE_PACKED_CORPUS = r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text) = '' THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\s+')) END::BIGINT AS n_tokens,
         (((((doc_id % 2147483647) * 48271 + 3) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) % 8 AS shard
  FROM documents
), cum AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok
)
SELECT shard::BIGINT AS shard,
       FLOOR((cum - n_tokens) / 512)::BIGINT AS pack_id,
       count(*)::BIGINT AS n_docs, SUM(n_tokens)::BIGINT AS sum_tokens
FROM cum GROUP BY 1, 2
"""


def q_asof_enrich(spark, sf_dir):
    """As-of join (operators/asof.asof_join — union-merge, ONE shuffle over
    |L|+|R| rows): each error event picks up the most recent preceding
    purchase of the same user. DuckDB's native ASOF LEFT JOIN is the exact
    oracle. (user_id, ts) is unique in the events table, so no tie
    ambiguity exists at either engine."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    res = asof_ops.asof_join(
        errors, purchases, key="user_id",
        right_cols=["purchase_id", "value"], tiebreak_col="purchase_id",
    )
    return res.select(
        "event_id", "user_id", "ts",
        F.col("purchase_id_asof"),
        F.round("value_asof", 6).alias("value_asof"),
    )


_ORACLE_ASOF_ENRICH = """
SELECT e.event_id, e.user_id, e.ts,
       p.purchase_id AS purchase_id_asof,
       round(p.value, 6) AS value_asof
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT user_id, ts, event_id AS purchase_id, value
                FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def q_events_in_sessions(spark, sf_dir):
    """Interval join (operators/asof.interval_join): assign every event to
    the gap-timeout session containing it — sessions partition each user's
    timeline by construction, so the assignment is total and unique (row
    count == |events|, verified by the oracle)."""
    from log_parser_mind_spark.operators.sessionize import conversation_sessions

    ev = _t(spark, sf_dir, "events")
    sessions = conversation_sessions(
        ev, gap_minutes=30, conv_col="user_id", ts_col="ts", tiebreak_col="event_id"
    ).select("user_id", "session_idx", "start_ts", "end_ts")
    res = asof_ops.interval_join(
        ev.select("event_id", "user_id", "ts"), sessions, key="user_id"
    )
    return res.select("event_id", "user_id", "session_idx")


_ORACLE_EVENTS_IN_SESSIONS = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sid AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM flagged
), sessions AS (
  SELECT user_id, session_idx, min(ts) AS start_ts, max(ts) AS end_ts
  FROM sid GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, s.session_idx::BIGINT AS session_idx
FROM events e JOIN sessions s
  ON e.user_id = s.user_id AND e.ts BETWEEN s.start_ts AND s.end_ts
"""


def q_decontaminated_corpus(spark, sf_dir):
    """Benchmark decontamination (curate.decontaminate →
    dedup.cross_corpus_near_dups): drop every document within 0.7 Jaccard of
    a synthetic "benchmark" (every 7th doc, re-keyed). Provable-recall LSH
    config (k=bands=32, unigrams: per-pair miss 0.3³² ≈ 2e-17), so LSH →
    verify is equal to the exhaustive cross-Jaccard the oracle computes.
    Contaminated docs include the blocklist members themselves (Jaccard 1)
    plus any near-copies."""
    from log_parser_mind_spark.operators.curate import decontaminate

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    clean = decontaminate(
        docs, bench, threshold=0.7, minhash_k=32, minhash_bands=32, shingle_n=1
    )
    return clean.select("doc_id", "lang")


_ORACLE_DECONTAMINATED = r"""
WITH bl AS (
  SELECT doc_id + 900000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
), ctoks AS (
  SELECT doc_id, string_split_regex(trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+') AS t
  FROM documents
), btoks AS (
  SELECT doc_id, string_split_regex(trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+') AS t
  FROM bl
), csh AS (
  SELECT DISTINCT doc_id, s.shingle FROM ctoks, UNNEST(t) AS s(shingle)
), bsh AS (
  SELECT DISTINCT doc_id, s.shingle FROM btoks, UNNEST(t) AS s(shingle)
), csz AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY 1),
   bsz AS (SELECT doc_id, count(*) AS n FROM bsh GROUP BY 1),
   inter AS (
  SELECT c.doc_id AS cid, b.doc_id AS bid, count(*) AS common
  FROM csh c JOIN bsh b ON c.shingle = b.shingle
  GROUP BY 1, 2
), dirty AS (
  SELECT DISTINCT cid FROM inter
  JOIN csz ON csz.doc_id = cid JOIN bsz ON bsz.doc_id = bid
  WHERE common / CAST(csz.n + bsz.n - common AS DOUBLE) >= 0.7
)
SELECT doc_id, lang FROM documents WHERE doc_id NOT IN (SELECT cid FROM dirty)
"""


def q_incremental_dedup(spark, sf_dir):
    """Incremental crawl-ingestion dedup (dedup.build_minhash_index →
    dedup_against_index): base corpus = doc_id % 5 != 0 indexed ONCE,
    increment = doc_id % 5 == 0 admitted per doc with (n_base_dups, kept) —
    the base is never re-shingled, its text re-read only for candidate ids.
    Provable-recall config (k=bands=32, unigrams: per-pair miss 0.3³²), so
    the index path equals the exhaustive increment×base Jaccard the oracle
    computes. Reuse across successive increments and the parquet round-trip
    of the index are pytest-covered (test_training_ops)."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    inc = docs.filter(F.col("doc_id") % 5 == 0)
    # persist: the index is consumed twice (the geometry probe's .first()
    # and the band join) — unpersisted, the full base MinHash pass would
    # run twice. In production the index is a parquet/Iceberg TABLE (see
    # bench.py / the pytest round-trip) and this cost is paid once ever.
    idx = dedup.build_minhash_index(base, k=32, bands=32, shingle_n=1).persist()
    audit = dedup.dedup_against_index(
        inc, idx, base, threshold=0.7, k=32, bands=32, shingle_n=1
    )
    return audit.select(F.col("id").alias("doc_id"), "n_base_dups", "kept")


_ORACLE_INCREMENTAL_DEDUP = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))), '\s+') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, s.shingle FROM toks, UNNEST(t) AS s(shingle)
), sizes AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT b.doc_id AS inc_id, a.doc_id AS base_id, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
  GROUP BY 1, 2
), dups AS (
  SELECT inc_id, count(*) AS n_dups
  FROM inter
  JOIN sizes sa ON sa.doc_id = base_id
  JOIN sizes sb ON sb.doc_id = inc_id
  WHERE common / CAST(sa.n + sb.n - common AS DOUBLE) >= 0.7
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(n_dups, 0) AS BIGINT) AS n_base_dups,
       coalesce(n_dups, 0) = 0 AS kept
FROM documents d LEFT JOIN dups ON dups.inc_id = d.doc_id
WHERE d.doc_id % 5 = 0
"""


def q_exact_contamination(spark, sf_dir):
    """GPT-3/PaLM-style exact n-gram overlap report (curate.
    exact_contamination) against the same synthetic benchmark as
    decontaminated_corpus (every 7th doc): per doc, distinct case-folded
    8-gram count, benchmark-hit count, overlap fraction, contaminated flag.
    The blocklist gram set broadcasts; the corpus is never self-joined.
    Oracle recomputes grams relationally (gram STRINGS; the Spark side
    compares xxhash64 of the same strings)."""
    from log_parser_mind_spark.operators.curate import exact_contamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    return exact_contamination(docs, bench, n=8, min_hits=1)


_ORACLE_EXACT_CONTAMINATION = _GRAM_CTES + r""",
sz AS (SELECT doc_id, count(*) AS n FROM cg GROUP BY 1),
   hit AS (SELECT cg.doc_id, count(*) AS n FROM cg JOIN bg USING (g) GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(sz.n, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(hit.n, 0) AS BIGINT) AS n_hit_grams,
       CASE WHEN coalesce(sz.n, 0) > 0 THEN round(coalesce(hit.n, 0) / sz.n, 6) ELSE 0.0 END AS overlap_frac,
       coalesce(hit.n, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN sz USING (doc_id) LEFT JOIN hit USING (doc_id)
"""


def q_source_capped(spark, sf_dir):
    """Domain capping (sample.cap_per_group): at most 100 documents per
    lang, the 100 smallest (minstd(doc_id, 21), doc_id) per group — at
    sf0.01 only 'en' (218 docs) is capped and the four smaller langs pass
    whole; at sf0.1 every lang caps. Oracle is the equivalent QUALIFY
    row_number() window; the operator deliberately computes the same
    k-smallest WITHOUT a per-group window (bounded local prune + bounded
    global agg) so a hot domain never concentrates on one reducer."""
    from log_parser_mind_spark.operators.sample import cap_per_group

    docs = _t(spark, sf_dir, "documents")
    return cap_per_group(docs, 100, group_col="lang", key_col="doc_id", salt=21).select(
        "doc_id", "lang", "source"
    )


_ORACLE_SOURCE_CAPPED = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         (((((doc_id % 2147483647) * 48271 + 21) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) AS h
  FROM documents
)
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) <= 100
"""


def q_boilerplate_stripped(spark, sf_dir):
    """C4/RefinedWeb-style boilerplate line removal (curate.strip_boilerplate):
    a synthetic nav line is attached to ~75% of the documents (prepended for
    even ids, appended when id % 4 == 1), then any line present in ≥ 50% of
    distinct docs is dropped everywhere, original line order preserved.
    Oracle replicates construction + frequency + reassembly in SQL."""
    from log_parser_mind_spark.operators.curate import strip_boilerplate

    nav = "Home | Products | About | Contact"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.lit(nav + "\n"), F.col("text")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.col("text"), F.lit("\n" + nav)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return strip_boilerplate(docs, min_doc_frac=0.5).select("doc_id", "text")


_ORACLE_BOILERPLATE = r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'Home | Products | About | Contact' || chr(10) || text
              WHEN doc_id % 4 = 1 THEN text || chr(10) || 'Home | Products | About | Contact'
              ELSE text END AS text
  FROM documents
), lines AS (
  SELECT doc_id, u.ord, u.line,
         lower(regexp_replace(trim(u.line), '\s+', ' ', 'g')) AS norm
  FROM d, LATERAL (
    SELECT unnest(string_split(text, chr(10))) AS line,
           generate_subscripts(string_split(text, chr(10)), 1) AS ord
  ) u
), freq AS (
  SELECT norm, count(DISTINCT doc_id) AS n_docs FROM lines GROUP BY 1
), total AS (SELECT count(DISTINCT doc_id) AS n FROM d),
boiler AS (
  SELECT norm FROM freq, total WHERE n_docs >= greatest(2, ceil(n * 0.5))
), kept AS (
  SELECT l.doc_id, l.ord, l.line FROM lines l
  WHERE l.norm NOT IN (SELECT norm FROM boiler)
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(r.clean, '') AS text
FROM d LEFT JOIN rebuilt r USING (doc_id)
"""


def q_top_ngrams(spark, sf_dir):
    """Corpus-wide heavy hitters (curate.top_ngrams): top-50 word 2-grams
    with total + document frequencies, deterministic (count desc, n_docs
    desc, gram asc) tie-break; oracle recomputes relationally."""
    from log_parser_mind_spark.operators.curate import top_ngrams

    return top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=50)


_ORACLE_TOP_NGRAMS = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, g
  FROM toks, LATERAL unnest(list_transform(generate_series(1, greatest(len(t)-1,0)),
                                           i -> t[i] || ' ' || t[i+1])) AS u(g)
)
SELECT g AS gram, count(*) AS count, count(DISTINCT doc_id) AS n_docs
FROM grams GROUP BY g
ORDER BY count DESC, n_docs DESC, gram
LIMIT 50
"""


def q_near_dup_components(spark, sf_dir):
    """Transitive near-dup clustering (dedup.connected_components): verified
    minhash pairs (same provably-exhaustive config as minhash_verified_dups)
    grouped into components by min-label propagation, component_id = min doc
    id; singleton docs are their own component. The oracle wraps the SAME
    exhaustive pair SQL in a recursive-CTE transitive closure — a SMALL-SF
    verification device only: on the sf0.1 corpus the provable pair config
    yields 5.1M edges over 5k docs and the closure's reach⋈edges step
    generates billions of pre-dedup intermediates (measured >25 min,
    killed), while the Spark operator itself (label propagation, never
    closure enumeration) handles that graph in seconds. Attested at the
    driver's sf0.01 gate."""
    docs = _t(spark, sf_dir, "documents")
    comps = dedup.connected_components(_exhaustive_verified_pairs(docs))
    return docs.select("doc_id").join(comps, "doc_id", "left").select(
        "doc_id", F.coalesce("component_id", F.col("doc_id")).alias("component_id")
    )


def _oracle_near_dup_components() -> str:
    return f"""
WITH RECURSIVE pairs AS ({_ORACLE_MINHASH_VERIFIED}),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT src AS node, src AS label FROM sym
  UNION
  SELECT e.dst, r.label FROM reach r JOIN sym e ON e.src = r.node
),
comp AS (SELECT node, min(label) AS component_id FROM reach GROUP BY node)
SELECT d.doc_id, coalesce(c.component_id, d.doc_id) AS component_id
FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
"""


def q_repetition_scores(spark, sf_dir):
    """Gopher-style repetition quality metrics (curate.repetition_scores):
    duplicate-line fraction (count + char mass) and most-frequent 2-/3-gram
    char coverage, per document. Spark side is zero-shuffle (sorted-array
    adjacency scan + run-length fold per row); the oracle recomputes the
    same semantics relationally (unnest → group → window top-1)."""
    from log_parser_mind_spark.operators.curate import repetition_scores

    return repetition_scores(_t(spark, sf_dir, "documents"))


_ORACLE_REPETITION = r"""
WITH lines AS (
  SELECT doc_id, line
  FROM documents, LATERAL unnest(string_split(coalesce(text,''), chr(10))) AS u(line)
  WHERE trim(line) <> ''
), lc AS (
  SELECT doc_id, line, count(*) AS c FROM lines GROUP BY 1, 2
), lstats AS (
  SELECT doc_id,
         sum(c) AS n_lines,
         coalesce(sum(c) FILTER (c > 1), 0) AS dup_cnt,
         sum(c * length(line)) AS tot_chars,
         coalesce(sum(c * length(line)) FILTER (c > 1), 0) AS dup_chars
  FROM lc GROUP BY 1
), toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS t
  FROM documents
), g2 AS (
  SELECT doc_id, g, count(*) AS c
  FROM toks, LATERAL unnest(list_transform(generate_series(1, greatest(len(t)-1,0)),
                                           i -> t[i] || ' ' || t[i+1])) AS u(g)
  GROUP BY 1, 2
), top2 AS (
  SELECT doc_id, c * length(g) AS val FROM g2
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, length(g) DESC, g) = 1
), g3 AS (
  SELECT doc_id, g, count(*) AS c
  FROM toks, LATERAL unnest(list_transform(generate_series(1, greatest(len(t)-2,0)),
                                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(g)
  GROUP BY 1, 2
), top3 AS (
  SELECT doc_id, c * length(g) AS val FROM g3
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, length(g) DESC, g) = 1
)
SELECT d.doc_id,
  cast(coalesce(l.n_lines, 0) AS INTEGER) AS n_lines,
  round(coalesce(l.dup_cnt / l.n_lines, 0), 6) AS dup_line_frac,
  round(coalesce(l.dup_chars / nullif(l.tot_chars, 0), 0), 6) AS dup_line_char_frac,
  round(coalesce(t2.val / nullif(length(coalesce(d.text,'')), 0), 0), 6) AS top_2gram_char_frac,
  round(coalesce(t3.val / nullif(length(coalesce(d.text,'')), 0), 0), 6) AS top_3gram_char_frac
FROM documents d
LEFT JOIN lstats l USING (doc_id)
LEFT JOIN top2 t2 USING (doc_id)
LEFT JOIN top3 t3 USING (doc_id)
"""


def q_length_profile(spark, sf_dir):
    """Per-source corpus length profile (curate.length_profile): count,
    char/token means, exact interpolated p50/p90/p99 of char length — the
    same linear-interpolation definition as DuckDB quantile_cont, so the
    oracle recomputes it; percentile_approx is the documented
    high-cardinality scale path with identical columns."""
    from log_parser_mind_spark.operators.curate import length_profile

    return length_profile(_t(spark, sf_dir, "documents"))


_ORACLE_LENGTH_PROFILE = r"""
WITH base AS (
  SELECT source,
         length(coalesce(text, '')) AS nc,
         len(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '\s+'), x -> x <> '')) AS nt
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       round(avg(nc), 6) AS mean_chars,
       round(avg(nt), 6) AS mean_tokens,
       round(quantile_cont(nc, 0.5), 6) AS p50_chars,
       round(quantile_cont(nc, 0.9), 6) AS p90_chars,
       round(quantile_cont(nc, 0.99), 6) AS p99_chars
FROM base GROUP BY source
"""


def q_corpus_split(spark, sf_dir):
    """Deterministic disjoint train/val/test split (sample.split_corpus):
    one MINSTD draw per row, consecutive bands 0.8/0.1/0.1 in declaration
    order — disjoint + exhaustive by construction. Oracle recomputes the
    identical integer arithmetic and band bounds."""
    docs = _t(spark, sf_dir, "documents")
    out = sample_ops.split_corpus(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt=13
    )
    return out.select("doc_id", "split")


_ORACLE_CORPUS_SPLIT = """
SELECT doc_id,
  CASE WHEN h < 1717986917 THEN 'train'
       WHEN h < 1932735282 THEN 'val'
       ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         (((((doc_id % 2147483647) * 48271 + 13) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) AS h
  FROM documents
)
"""


def q_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split (sample.leakage_safe_split): the
    MINSTD draw is taken over the near-dup COMPONENT id (closure of the
    provably-exhaustive verified pair set), so no near-duplicate pair ever
    straddles a split boundary; singletons draw by their own id, identical
    to corpus_split at the same salt. Oracle: the recursive-CTE closure
    (sf0.01 verification device; --py-oracles swaps the union-find at
    sf0.1) wrapped by the same integer MINSTD band arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    out = sample_ops.leakage_safe_split(
        docs,
        _exhaustive_verified_pairs(docs),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt=13,
    )
    return out.select("doc_id", "split_key", "split")


def _oracle_leakage_safe_split() -> str:
    return f"""
WITH comp_map AS ({_oracle_near_dup_components()})
SELECT doc_id, split_key,
  CASE WHEN h < 1717986917 THEN 'train'
       WHEN h < 1932735282 THEN 'val'
       ELSE 'test' END AS split
FROM (
  SELECT doc_id, component_id AS split_key,
         (((((component_id % 2147483647) * 48271 + 13) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) AS h
  FROM comp_map
)
"""


def q_global_shuffle(spark, sf_dir):
    """Deterministic global shuffle for training export
    (sample.global_shuffle): shard + position from two independent MINSTD
    draws over the key — a reproducible total order at any parallelism,
    unlike orderBy(rand()). Oracle recomputes the same integer arithmetic
    and window rank in SQL."""
    docs = _t(spark, sf_dir, "documents")
    return sample_ops.global_shuffle(docs, n_shards=16, salt=11).select(
        "doc_id", "shard", "pos_in_shard"
    )


_ORACLE_GLOBAL_SHUFFLE = """
WITH h AS (
  SELECT doc_id,
         (((((doc_id % 2147483647) * 48271 + 11) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) % 16 AS shard,
         ((((doc_id % 2147483647) * 48271 + 777000012) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647 AS oh
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY oh, doc_id) - 1 AS pos_in_shard
FROM h
"""


def q_paragraph_dedup(spark, sf_dir):
    """C4-style global span dedup (curate.dedup_paragraphs): a promo
    paragraph is attached to ~half the documents (prepended when
    doc_id % 3 == 0, appended when doc_id % 5 == 1), then every repeated
    paragraph keeps only its minimum (doc, pos) occurrence corpus-wide.
    Skew-safe scale shape: canonical occurrence via hash-groupBy min-struct
    (map-side combine absorbs the hot paragraph), never a window over the
    paragraph key. Oracle replicates construction + canonical-keep +
    reassembly relationally."""
    from log_parser_mind_spark.operators.curate import dedup_paragraphs

    promo = "Subscribe to our newsletter for weekly updates"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit(promo + "\n\n"), F.col("text")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.col("text"), F.lit("\n\n" + promo)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup_paragraphs(docs).select("doc_id", "text")


_ORACLE_PARAGRAPH_DEDUP = r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
                THEN 'Subscribe to our newsletter for weekly updates' || chr(10) || chr(10) || text
              WHEN doc_id % 5 = 1
                THEN text || chr(10) || chr(10) || 'Subscribe to our newsletter for weekly updates'
              ELSE text END AS text
  FROM documents
), paras AS (
  SELECT doc_id, u.ord - 1 AS pos, u.para,
         lower(regexp_replace(trim(u.para), '\s+', ' ', 'g')) AS norm
  FROM d, LATERAL (
    SELECT unnest(string_split(coalesce(text,''), chr(10)||chr(10))) AS para,
           generate_subscripts(string_split(coalesce(text,''), chr(10)||chr(10)), 1) AS ord
  ) u
), ranked AS (
  SELECT doc_id, pos, para, norm = '' AS exempt,
         row_number() OVER (PARTITION BY norm ORDER BY doc_id, pos) AS rn
  FROM paras
), kept AS (
  SELECT doc_id, pos, para FROM ranked WHERE exempt OR rn = 1
), rebuilt AS (
  SELECT doc_id, string_agg(para, chr(10)||chr(10) ORDER BY pos) AS clean
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(r.clean, '') AS text
FROM d LEFT JOIN rebuilt r USING (doc_id)
"""


def q_ngram_span_dedup(spark, sf_dir):
    """Substring-level exact dedup (curate.dedup_ngram_spans — the
    token-granularity form of Lee et al. 2021): a licence blurb is appended
    to every 4th document, then any token whose every covering 5-gram window
    duplicates an earlier (doc, pos) occurrence is removed; the minimum
    (doc, pos) copy of the blurb survives, and up to k-1 straddle-edge
    tokens survive everywhere (published edge behaviour). The oracle
    replicates windows → canonical-first → coverage-union relationally with
    the gram STRING as the key (Spark keys the same gram by xxhash64 so the
    wire carries 8 bytes, not text)."""
    from log_parser_mind_spark.operators.curate import dedup_ngram_spans

    blurb = "this corpus is licensed under the creative commons attribution license"
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" " + blurb)))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup_ngram_spans(docs, k=5).select("doc_id", "text")


_ORACLE_NGRAM_SPAN_DEDUP = r"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN text || ' this corpus is licensed under the creative commons attribution license'
              ELSE text END AS text
  FROM documents
), t2 AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text,''), '\s+'), x -> x <> '') AS raw,
         list_transform(list_filter(string_split_regex(coalesce(text,''), '\s+'), x -> x <> ''),
                        x -> lower(x)) AS norm,
         len(list_filter(string_split_regex(coalesce(text,''), '\s+'), x -> x <> '')) AS n
  FROM d
), wins AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(list_slice(norm, i, i + 4), ' ') AS gram
  FROM t2, LATERAL (SELECT unnest(range(1, n - 5 + 2)) AS i) u
  WHERE n >= 5
), ranked AS (
  SELECT doc_id, pos, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
  FROM wins
), keptpos AS (
  SELECT DISTINCT doc_id, p
  FROM ranked, LATERAL (SELECT unnest(range(pos, pos + 5)) AS p) u
  WHERE rn = 1
), rebuilt AS (
  SELECT k.doc_id, string_agg(t2.raw[k.p + 1], ' ' ORDER BY k.p) AS txt
  FROM keptpos k JOIN t2 USING (doc_id)
  GROUP BY k.doc_id
)
SELECT t2.doc_id,
       CASE WHEN t2.n < 5 THEN array_to_string(t2.raw, ' ')
            ELSE coalesce(r.txt, '') END AS text
FROM t2 LEFT JOIN rebuilt r USING (doc_id)
"""


def q_lm_quality(spark, sf_dir):
    """CCNet-style LM quality scoring (curate.ngram_lm_scores): a
    Laplace-smoothed bigram LM trained on the ENGLISH slice scores every
    document's mean token NLL + perplexity — cross-lingual docs surface as
    high-perplexity outliers and unseen contexts exercise the 1/V fallback.
    Oracle recomputes counts, vocabulary, and the smoothed score
    relationally."""
    from log_parser_mind_spark.operators.curate import ngram_lm_scores

    docs = _t(spark, sf_dir, "documents")
    ref = docs.filter(F.col("lang") == "en")
    return ngram_lm_scores(docs, ref=ref).select(
        "doc_id", "n_bigrams", "avg_nll", "ppl"
    )


_ORACLE_LM_QUALITY = r"""
WITH tok AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS toks
  FROM documents
), big AS (
  SELECT doc_id, lang, toks[i] AS ctx, toks[i + 1] AS nxt
  FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
  WHERE len(toks) >= 2
), bc AS (
  SELECT ctx, nxt, count(*) AS c FROM big WHERE lang = 'en' GROUP BY 1, 2
), cc AS (
  SELECT ctx, sum(c) AS cc FROM bc GROUP BY 1
), v AS (
  SELECT count(DISTINCT t) AS v
  FROM (SELECT unnest(toks) AS t FROM tok WHERE lang = 'en')
), scored AS (
  SELECT b.doc_id,
         -ln((coalesce(bc.c, 0) + 1.0) / (coalesce(cc.cc, 0) + v.v)) AS nll
  FROM big b
  LEFT JOIN bc ON b.ctx = bc.ctx AND b.nxt = bc.nxt
  LEFT JOIN cc ON b.ctx = cc.ctx
  CROSS JOIN v
), agg AS (
  SELECT doc_id, count(*) AS n_bigrams,
         round(avg(nll), 6) AS avg_nll,
         round(exp(avg(nll)), 6) AS ppl
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams, a.avg_nll, a.ppl
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def q_dsir_selected(spark, sf_dir):
    """DSIR importance resampling (sample.dsir_select, Xie et al. 2023):
    hashed-bigram importance weights of every doc toward the ENGLISH slice,
    then Gumbel top-100 without replacement keyed by the suite's MINSTD draw
    — the full selection is a pure function of the data, so the oracle
    recomputes buckets (portable polynomial hash), both count tables, the
    smoothed log-ratio, the per-doc Σ, and the Gumbel keys verbatim."""
    docs = _t(spark, sf_dir, "documents")
    return sample_ops.dsir_select(
        docs, docs.filter(F.col("lang") == "en"), k=100, n=2, buckets=512, salt=7
    )


_ORACLE_DSIR_SELECTED = r"""
WITH tok AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'), x -> x <> '') AS toks
  FROM documents
), gram AS (
  SELECT doc_id, lang,
         list_reduce(
           list_prepend(0::BIGINT,
             list_transform(list_slice(toks, i, i + 1),
                            t -> (31 * unicode(t) + strlen(t)) % 1000000007)),
           (acc, u) -> (acc * 131 + u) % 1000000007
         ) % 512 AS b
  FROM tok, LATERAL (SELECT unnest(range(1, len(toks))) AS i) u
  WHERE len(toks) >= 2
), tgt AS (
  SELECT b, count(*) AS ct FROM gram WHERE lang = 'en' GROUP BY b
), rawc AS (
  SELECT b, count(*) AS cr FROM gram GROUP BY b
), tot AS (
  SELECT (SELECT coalesce(sum(ct), 0) FROM tgt) AS tt,
         (SELECT coalesce(sum(cr), 0) FROM rawc) AS tr
), lr AS (
  SELECT r.b,
         ln((coalesce(t.ct, 0) + 1.0) / (tot.tt + 512.0))
         - ln((r.cr + 1.0) / (tot.tr + 512.0)) AS lr
  FROM rawc r LEFT JOIN tgt t USING (b) CROSS JOIN tot
), w AS (
  SELECT g.doc_id, sum(lr.lr) AS lw FROM gram g JOIN lr USING (b) GROUP BY g.doc_id
), keyed AS (
  SELECT d.doc_id, coalesce(w.lw, 0.0) AS lw,
         coalesce(w.lw, 0.0)
         - ln(-ln(
             ((((((doc_id % 2147483647) * 48271 + 7) % 2147483647)
                * 48271 % 2147483647) * 48271 % 2147483647) + 1.0) / 2147483648.0
           )) AS gk
  FROM documents d LEFT JOIN w USING (doc_id)
)
SELECT doc_id, round(lw, 6) AS log_weight, round(gk, 6) AS gumbel_key
FROM keyed ORDER BY gk DESC, doc_id LIMIT 100
"""


def q_training_mixture(spark, sf_dir):
    """Training-mix assembly (sample.weighted_mixture): en docs at 60%, the
    rest at 20%, per-source salted so overlapping keys draw independent coin
    flips. Oracle recomputes both per-source predicates and unions them."""
    docs = _t(spark, sf_dir, "documents")
    mix = sample_ops.weighted_mixture(
        [
            ("en", docs.filter(F.col("lang") == "en"), 0.6),
            ("rest", docs.filter(F.col("lang") != "en"), 0.2),
        ],
        salt=5,
    )
    return mix.select("doc_id", "lang", "mix_source")


_ORACLE_TRAINING_MIXTURE = """
SELECT doc_id, lang, 'en' AS mix_source FROM documents
WHERE lang = 'en'
  AND (((((doc_id % 2147483647) * 48271 + 5) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) < 1288490188
UNION ALL
SELECT doc_id, lang, 'rest' AS mix_source FROM documents
WHERE lang <> 'en'
  AND (((((doc_id % 2147483647) * 48271 + 1000008) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) < 429496729
"""


def q_error_rates_events(spark, sf_dir):
    """A3 shape: per-minute countIf over the event stream."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("minute", "ts").alias("minute")).agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("error_count"),
        F.count(F.when(F.col("event_type") == "signup", 1)).alias("signup_count"),
        F.count(F.lit(1)).alias("total_count"),
    )


_ORACLE_ERROR_RATES_EVENTS = """
SELECT date_trunc('minute', ts) AS minute,
       count(*) FILTER (WHERE event_type = 'error')::BIGINT AS error_count,
       count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS signup_count,
       count(*)::BIGINT AS total_count
FROM events GROUP BY 1
"""


def q_topk_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


_ORACLE_TOPK_USERS = """
SELECT user_id, count(*)::BIGINT AS n FROM events
GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10
"""


def q_two_stage_rollup(spark, sf_dir):
    """A5 — rollup of the hourly rollup."""
    hourly = q_hourly_rollup_events(spark, sf_dir)
    return hourly.groupBy("event_type").agg(
        F.sum("n").alias("total_n"),
        F.count(F.lit(1)).alias("active_hours"),
    )


_ORACLE_TWO_STAGE_ROLLUP = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, cast(sum(n) AS BIGINT) AS total_n, count(*)::BIGINT AS active_hours
FROM hourly GROUP BY event_type
"""


def q_baselines(spark, sf_dir):
    """A8 — mean/stddev_pop baselines per key with the σ=0→1 guard."""
    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        F.col("event_type").alias("key"), F.date_trunc("day", "ts").alias("ts")
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))
    b = agg.baselines(series)
    return b.select(
        "key", F.round("mean", 6).alias("mean"), F.round("stddev", 6).alias("stddev"),
        F.col("n_points").alias("n_points"),
    )


_ORACLE_BASELINES = """
WITH series AS (
  SELECT event_type AS key, date_trunc('day', ts) AS ts, count(*)::DOUBLE AS value
  FROM events GROUP BY 1, 2
)
SELECT key, round(avg(value), 6) AS mean,
       round(CASE WHEN coalesce(stddev_pop(value), 0) = 0 THEN 1.0 ELSE stddev_pop(value) END, 6) AS stddev,
       count(*)::BIGINT AS n_points
FROM series GROUP BY key
"""


def q_recent_window(spark, sf_dir):
    """A9 — trailing window sum per key relative to a fixed 'now'."""
    ev = _t(spark, sf_dir, "events")
    now = "2024-01-30 00:00:00"
    return (
        ev.filter(F.col("ts") > F.expr(f"timestamp'{now}' - interval 24 hours"))
        .filter(F.col("ts") <= F.lit(now).cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("recent_n"), F.round(F.sum("value"), 6).alias("recent_sum"))
    )


_ORACLE_RECENT_WINDOW = """
SELECT event_type, count(*)::BIGINT AS recent_n, round(sum(value), 6) AS recent_sum
FROM events
WHERE ts > TIMESTAMP '2024-01-30 00:00:00' - INTERVAL 24 HOURS
  AND ts <= TIMESTAMP '2024-01-30 00:00:00'
GROUP BY event_type
"""


def q_conditional_agg(spark, sf_dir):
    """A10 — COUNT(*)/AVG(...) FILTER (WHERE …)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(F.col("value") > 50, 1)).alias("big"),
        F.round(F.avg(F.when(F.col("value") > 50, F.col("value"))), 6).alias("avg_big"),
    )


_ORACLE_CONDITIONAL_AGG = """
SELECT event_type, count(*)::BIGINT AS total,
       count(*) FILTER (WHERE value > 50)::BIGINT AS big,
       round(avg(value) FILTER (WHERE value > 50), 6) AS avg_big
FROM events GROUP BY event_type
"""


def q_zscore_severity(spark, sf_dir):
    """F10/F11 — z-score of daily volumes vs per-type baseline + severity."""
    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("value")
    )
    w = Window.partitionBy("event_type")
    sd_raw = F.stddev_pop("value").over(w)
    sd = F.when(sd_raw == 0, F.lit(1.0)).otherwise(sd_raw)
    z = (F.col("value") - F.avg("value").over(w)) / sd
    return (
        series.withColumn("zscore", F.round(z, 6))
        .withColumn(
            "severity",
            F.when(F.abs(z) > 5, "critical")
            .when(F.abs(z) > 4, "high")
            .when(F.abs(z) > 3, "medium")
            .otherwise("low"),
        )
        .filter(F.abs(F.col("zscore")) > 1)
        .select("event_type", "day", "zscore", "severity")
    )


_ORACLE_ZSCORE_SEVERITY = """
WITH series AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*)::DOUBLE AS value
  FROM events GROUP BY 1, 2
), z AS (
  SELECT event_type, day,
         (value - avg(value) OVER (PARTITION BY event_type))
         / (CASE WHEN stddev_pop(value) OVER (PARTITION BY event_type) = 0 THEN 1.0
                 ELSE stddev_pop(value) OVER (PARTITION BY event_type) END) AS zr
  FROM series
)
SELECT event_type, day, round(zr, 6) AS zscore,
       CASE WHEN abs(zr) > 5 THEN 'critical' WHEN abs(zr) > 4 THEN 'high'
            WHEN abs(zr) > 3 THEN 'medium' ELSE 'low' END AS severity
FROM z WHERE abs(round(zr, 6)) > 1
"""


# ---------------------------------------------------------------------------
# Joins (J1-J5 shapes) + set ops (U1-U3) + sorts (O1-O5) + windows (W1-W4)
# ---------------------------------------------------------------------------


def q_broadcast_enrich(spark, sf_dir):
    """J1 — fact ⟕ broadcast dim chain: revenue per region."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        )
    )


_ORACLE_BROADCAST_ENRICH = """
SELECT r_name, count(*)::BIGINT AS n_orders, round(sum(o_totalprice), 4) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_order_limit_offset(spark, sf_dir):
    """O1 — ORDER BY ts DESC LIMIT 100 OFFSET 50 with deterministic tiebreak."""
    orders = _t(spark, sf_dir, "orders")
    return agg.order_limit_offset(
        orders.select("o_orderkey", "o_orderdate", "o_totalprice"),
        [F.desc("o_orderdate"), F.desc("o_orderkey")],
        limit=100,
        offset=50,
    )


_ORACLE_ORDER_LIMIT_OFFSET = """
SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 100 OFFSET 50
"""


def q_latest_per_key(spark, sf_dir):
    """U1 — ReplacingMergeTree semantics: newest order per customer."""
    orders = _t(spark, sf_dir, "orders")
    return agg.latest_per_key(orders, "o_custkey", "o_orderdate", "o_orderkey").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )


_ORACLE_LATEST_PER_KEY = """
SELECT o_custkey, o_orderkey, o_orderdate FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
"""


def q_anti_join(spark, sf_dir):
    """U3 — ON CONFLICT DO NOTHING shape: customers with no orders."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def q_semi_join(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 100000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


_ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
"""


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape — general multi-aggregate coverage."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_running_window(spark, sf_dir):
    """W2 — running per-key cumulative sum in event-time order."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ev.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 6).alias("running_value")
    )


_ORACLE_RUNNING_WINDOW = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
FROM events WHERE user_id < 30
"""


def q_turn_ordering(spark, sf_dir):
    """W3 — stable per-key ordering via row_number (LIMIT/OFFSET emulation)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", F.row_number().over(w).cast("long").alias("turn_rank")
    )


_ORACLE_TURN_ORDERING = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS turn_rank
FROM events
"""


def q_top_rank_per_group(spark, sf_dir):
    """W4 — ranked-by-confidence shape: top order per customer."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    )


_ORACLE_TOP_RANK_PER_GROUP = """
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
FROM orders
QUALIFY rank = 1
"""


# ---------------------------------------------------------------------------
# X4 — agent analysis stage with deterministic mock client
# ---------------------------------------------------------------------------


def q_agent_analyze(spark, sf_dir):
    """X4 (internal/agent/prompts/templates.go:17-43 + llm/client.go:179-283):
    prompt render (native format_string) → injectable-client mapInPandas →
    strip fences + JSON extraction (JVM). The mock client is a pure function
    of the prompt, so the whole stage is DuckDB-replicable."""
    from log_parser_mind_spark.operators import agent

    events = _t(spark, sf_dir, "events")
    req = agent.build_analyze_requests(events)
    resp = agent.llm_stage(req, agent.deterministic_mock_client)
    return agent.parse_analysis(resp).select(
        "source", "summary", "severity", F.round("confidence", 6).alias("confidence")
    )


def q_agent_fix(spark, sf_dir):
    """X4 fix flow (templates.go:48-89 generate_fix + client.go:60-158): the
    conditional {{if}} blocks render natively (fix_block_exprs), the mock
    derives risk from whether past experiences were attached — both template
    branches exercised across the event types."""
    from log_parser_mind_spark.operators import agent

    events = _t(spark, sf_dir, "events")
    req = (
        events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("event_type").alias("issue"),
            F.format_string("%s occurred %d times", F.col("event_type"), F.col("cnt")).alias(
                "issue_context"
            ),
            F.when(
                F.col("event_type").contains("e"),
                F.format_string("previously resolved %s by restart", F.col("event_type")),
            )
            .otherwise(F.lit(""))
            .alias("similar"),
        )
        .withColumn(
            "prompt",
            agent.fix_prompt_expr(F.col("issue_context"), F.col("similar"), F.lit("")),
        )
    )
    resp = agent.llm_stage(req, agent.deterministic_mock_fix_client)
    return agent.parse_fix(resp).select("issue", "root_cause", "risk", "prompt_chars")


def _oracle_agent_fix() -> str:
    from log_parser_mind_spark.operators import agent

    base = len(
        agent.render_template(
            "generate_fix", issue_context="", similar_experiences="", system_context=""
        )
    )
    exp_const = (
        len(
            agent.render_template(
                "generate_fix", issue_context="", similar_experiences="Z", system_context=""
            )
        )
        - base
        - 1
    )
    return f"""
WITH req AS (
  SELECT event_type AS issue,
         event_type || ' occurred ' || count(*) || ' times' AS issue_context,
         CASE WHEN event_type LIKE '%e%'
              THEN 'previously resolved ' || event_type || ' by restart'
              ELSE '' END AS similar_exp
  FROM events GROUP BY event_type
)
SELECT issue,
       'root cause of ' || issue_context AS root_cause,
       CASE WHEN similar_exp <> '' THEN 'low' ELSE 'medium' END AS risk,
       ({base} + length(issue_context)
         + CASE WHEN similar_exp <> '' THEN {exp_const} + length(similar_exp) ELSE 0 END)::BIGINT
         AS prompt_chars
FROM req
"""


def _oracle_agent_analyze() -> str:
    from log_parser_mind_spark.operators import agent

    fixed = len(agent.render_template("analyze_logs", log_patterns="", time_range="", source=""))
    return f"""
WITH req AS (
  SELECT event_type AS source,
         event_type || ': ' || count(*) AS log_patterns,
         '2024-01-01/2024-01-31' AS time_range
  FROM events GROUP BY event_type
)
SELECT source,
       'analysis of ' || source || ' (' ||
         ({fixed} + length(log_patterns) + length(time_range) + length(source)) ||
         ' chars)' AS summary,
       CASE WHEN lower(source) LIKE '%error%' THEN 'high' ELSE 'low' END AS severity,
       round(0.9, 6) AS confidence
FROM req
"""


# ---------------------------------------------------------------------------
# Training-data preparation (operators/prep.py) + semantic dedup
# ---------------------------------------------------------------------------


def q_tfidf_keywords(spark, sf_dir):
    """Per-doc top-5 keywords by tf·idf (prep.tfidf_keywords): explode →
    doc-term counts (map-side combine) → vocabulary df table → term join →
    per-doc window. Oracle recomputes tf, df, N, ln-idf, and the (score
    DESC, term ASC) ranking relationally."""
    from log_parser_mind_spark.operators.prep import tfidf_keywords

    return tfidf_keywords(_t(spark, sf_dir, "documents"), k=5)


_ORACLE_TFIDF_KEYWORDS = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text,'')), '\s+'),
                            t -> t <> '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
), dft AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dft.df,
         round(tf.tf * ln(n.n_docs / CAST(dft.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dft USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
  FROM scored
) WHERE rank <= 5
"""


_CHUNK_C, _CHUNK_S = 32, 24


def q_doc_chunks(spark, sf_dir):
    """Sliding-window token chunking (prep.chunk_documents): zero-shuffle
    per-row explode; chunk i = original-case tokens [i*S, i*S+C). Oracle
    replicates the minimal-cover window count and DuckDB's 1-based inclusive
    list slicing mirrors F.slice."""
    from log_parser_mind_spark.operators.prep import chunk_documents

    return chunk_documents(_t(spark, sf_dir, "documents"), _CHUNK_C, _CHUNK_S)


_ORACLE_DOC_CHUNKS = rf"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(coalesce(text,''), '\s+'), t -> t <> '') AS toks
  FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n FROM tok WHERE len(toks) > 0
), idx AS (
  SELECT doc_id, toks, n,
         unnest(range(0, CASE WHEN n <= {_CHUNK_C} THEN 1
                            ELSE 1 + (n - {_CHUNK_C} + {_CHUNK_S} - 1) // {_CHUNK_S} END)) AS chunk_idx
  FROM sized
)
SELECT doc_id, chunk_idx,
       len(toks[chunk_idx*{_CHUNK_S}+1 : chunk_idx*{_CHUNK_S}+{_CHUNK_C}])::BIGINT AS n_tokens,
       array_to_string(toks[chunk_idx*{_CHUNK_S}+1 : chunk_idx*{_CHUNK_S}+{_CHUNK_C}], ' ') AS chunk_text
FROM idx
"""


def q_sft_examples(spark, sf_dir):
    """Chat-transcript → SFT-row reshape (prep.sft_examples): one example
    per assistant turn, context = the maximal whole-turn suffix of preceding
    turns within an 8-token budget, rendered 'role: text' newline-joined.
    Conversations are derived deterministically from events (conv=user_id,
    order=event_id, role by event_id%3, text from event_type+props with an
    event_id%5 tail so turn token counts VARY and the clip boundary is
    data-dependent); the oracle recomputes the same prefix-sum inclusion
    rule relationally (include s iff P(t-1) - P(s-1) <= budget) with
    string_agg ORDER BY for the rendering."""
    from log_parser_mind_spark.operators.prep import sft_examples

    return sft_examples(_events_as_turns(spark, sf_dir), context_budget_tokens=8)


def _turns_from_events(ev, conv=None):
    """events DataFrame → multi-turn conversation shape (conv=user_id,
    order=event_id, role by event_id%3, text from event_type+props with an
    event_id%5 tail so token counts and quality scores vary). The ONE
    Spark-side definition of the derivation — bench.py and the notch
    scripts import it too, so a change here reaches every consumer; the
    oracle SQL mirror is ``_SQL_EVENTS_AS_TURNS``. ``conv`` overrides the
    conversation-id expression (notch scripts re-key replicas)."""
    return ev.select(
        (F.col("user_id") if conv is None else conv).alias("conv_id"),
        F.col("event_id").alias("turn_idx"),
        F.when(F.col("event_id") % 3 == 0, F.lit("assistant"))
        .otherwise(F.lit("user"))
        .alias("role"),
        F.concat_ws(
            " ",
            F.col("event_type"),
            F.col("props"),
            F.when(F.col("event_id") % 5 == 0, F.lit("extra tail tokens")),
        ).alias("text"),
    )


def _events_as_turns(spark, sf_dir):
    """Adapter shared by q_sft_examples and q_preference_pairs — reads the
    events table and applies ``_turns_from_events``."""
    return _turns_from_events(_t(spark, sf_dir, "events"))


# The SQL mirror of _events_as_turns — spliced into every oracle that reads
# the derived conversation table, so the derivation exists once per engine.
_SQL_EVENTS_AS_TURNS = """
  SELECT user_id AS conv_id, event_id AS turn_idx,
         CASE WHEN event_id % 3 = 0 THEN 'assistant' ELSE 'user' END AS role,
         concat_ws(' ', event_type, props,
                   CASE WHEN event_id % 5 = 0 THEN 'extra tail tokens' END) AS text
  FROM events
"""

_ORACLE_SFT_EXAMPLES = rf"""
WITH turns AS ({_SQL_EVENTS_AS_TURNS}), t AS (
  SELECT *, CAST(len(list_filter(regexp_split_to_array(lower(coalesce(text,'')), '\s+'),
                                 x -> x <> '')) AS BIGINT) AS ntok
  FROM turns
), p AS (
  SELECT *, sum(ntok) OVER (PARTITION BY conv_id ORDER BY turn_idx
                            ROWS UNBOUNDED PRECEDING) AS pre
  FROM t
)
SELECT a.conv_id, a.turn_idx AS target_turn_idx,
       coalesce(string_agg(c.role || ': ' || coalesce(c.text, ''), chr(10)
                           ORDER BY c.turn_idx), '') AS context,
       a.text AS target,
       CAST(count(c.turn_idx) AS BIGINT) AS n_context_turns,
       CAST(coalesce(sum(c.ntok), 0) AS BIGINT) AS n_context_tokens
FROM p a
LEFT JOIN p c
  ON c.conv_id = a.conv_id AND c.turn_idx < a.turn_idx
 AND (a.pre - a.ntok) - (c.pre - c.ntok) <= 8
WHERE a.role = 'assistant'
GROUP BY a.conv_id, a.turn_idx, a.text
"""


def q_preference_pairs(spark, sf_dir):
    """DPO/RLHF preference-pair construction (prep.preference_pairs):
    assistant responses grouped ACROSS conversations by the masked template
    of the immediately preceding user turn (the drain masking pass), scored
    with the composite quality score, one (chosen, rejected) pair per
    prompt group under the total (score, conv, turn) order, strict-gap
    groups only. Spark side is a skew-safe min/max-of-struct groupBy (hot
    prompt templates combine map-side); the oracle recomputes selection via
    two row_number() windows over the identical rounded score."""
    from log_parser_mind_spark.operators.prep import preference_pairs

    return preference_pairs(_events_as_turns(spark, sf_dir))


def _sql_scored_candidates() -> str:
    """The shared CTE chain (turns → lag → masked-prompt candidates →
    rounded quality score) behind BOTH selection oracles
    (preference_pairs, best_responses) — one SQL definition mirroring the
    ONE Spark definition (prep._scored_response_candidates), so the two
    oracles cannot drift on what a candidate or its score is."""
    stop = ", ".join(repr(w) for w in tx.LANG_STOPWORDS["en"])
    return rf"""
turns AS ({_SQL_EVENTS_AS_TURNS}),
lagged AS (
  SELECT *, lag(role) OVER w AS prev_role, lag(text) OVER w AS prev_text
  FROM turns WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
cand AS (
  SELECT conv_id, turn_idx, text,
         array_to_string(
           list_transform(string_split_regex(trim(prev_text), '\s+'),
                          t -> CASE WHEN regexp_matches(t, '{masking.IS_VARIABLE_PATTERN}')
                                    THEN '<*>' ELSE t END),
           ' ') AS prompt_sig
  FROM lagged WHERE role = 'assistant' AND prev_role = 'user'
),
s AS (
  -- n_tok filters '' like Spark's lower_tokens (blank text -> 0 tokens,
  -- not ['']) — the same convention _ORACLE_SFT_EXAMPLES' ntok pins.
  SELECT conv_id, turn_idx, text, prompt_sig,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         x -> x <> '')) AS n_tok,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS punct,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t IN ({stop}))) AS stop
  FROM cand
),
scored AS (
  SELECT conv_id, turn_idx, text, prompt_sig,
         round(0.4 * least(n_tok / 64.0, 1.0)
             + 0.3 * least(CASE WHEN n_tok > 0 THEN stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END * 4, 1.0)
             + 0.3 * (1 - least(CASE WHEN n_chars > 0 THEN punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)),
             6) AS score
  FROM s
)"""


def _oracle_preference_pairs() -> str:
    return f"""
WITH {_sql_scored_candidates()},
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY prompt_sig ORDER BY score DESC, conv_id DESC, turn_idx DESC) AS rc,
         row_number() OVER (PARTITION BY prompt_sig ORDER BY score ASC, conv_id ASC, turn_idx ASC) AS rr,
         count(*) OVER (PARTITION BY prompt_sig) AS n_candidates
  FROM scored
)
SELECT c.prompt_sig, CAST(c.n_candidates AS BIGINT) AS n_candidates,
       c.conv_id AS chosen_conv, c.turn_idx AS chosen_turn,
       c.text AS chosen_text, c.score AS chosen_score,
       r.conv_id AS rejected_conv, r.turn_idx AS rejected_turn,
       r.text AS rejected_text, r.score AS rejected_score
FROM ranked c
JOIN ranked r ON r.prompt_sig = c.prompt_sig AND r.rr = 1
WHERE c.rc = 1 AND c.n_candidates >= 2 AND c.score > r.score
"""


def q_best_responses(spark, sf_dir):
    """Rejection sampling / best-of-n (prep.best_of_n): top-3 assistant
    responses per masked prompt template by quality score, rank by
    (score DESC, conv ASC, turn ASC) — the ascending tiebreak
    top_per_group's window-free selection implements (bounded local prune
    + bounded global aggregate; only the ≤3 winners per group enter the
    ranking window). Shares preference_pairs' candidate/score definitions
    on both engines (_scored_response_candidates / _sql_scored_candidates)."""
    from log_parser_mind_spark.operators.prep import best_of_n

    return best_of_n(_events_as_turns(spark, sf_dir), n=3)


def _oracle_best_responses() -> str:
    return f"""
WITH {_sql_scored_candidates()}
SELECT prompt_sig,
       row_number() OVER (PARTITION BY prompt_sig
                          ORDER BY score DESC, conv_id ASC, turn_idx ASC) AS rank,
       conv_id AS conv, turn_idx AS turn, text, score
FROM scored
QUALIFY rank <= 3
"""


def q_budget_selected(spark, sf_dir):
    """Quality-greedy selection under a global token budget
    (sample.select_within_token_budget): keep the maximal
    (quality DESC, doc_id ASC) prefix whose inclusive running token sum
    fits 12,000 tokens. The ORACLE is the textbook global running-sum
    window; the operator never runs one — per-quality-value mass histogram
    (constant-bounded by the 6dp domain), two driver scalars, a pure
    per-row predicate for every non-boundary doc, and an id-ordered window
    over ONLY the single boundary value's slice. Equality proves the
    decomposition."""
    from log_parser_mind_spark.operators.sample import select_within_token_budget

    docs = tx.with_tokens(_t(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        tx.quality_score_from(F.col("tokens"), F.col("text")).alias("quality"),
        F.size("tokens").cast("long").alias("n_tokens"),
    )
    return select_within_token_budget(scored, budget_tokens=12_000)


def _oracle_budget_selected() -> str:
    stop = ", ".join(repr(w) for w in tx.LANG_STOPWORDS["en"])
    return rf"""
WITH s AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS n_tok,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS punct,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t IN ({stop}))) AS stop
  FROM documents
),
q AS (
  SELECT doc_id,
         round(0.4 * least(n_tok / 64.0, 1.0)
             + 0.3 * least(CASE WHEN n_tok > 0 THEN stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END * 4, 1.0)
             + 0.3 * (1 - least(CASE WHEN n_chars > 0 THEN punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)),
             6) AS quality,
         CAST(n_tok AS BIGINT) AS tokens
  FROM s
)
SELECT doc_id, quality, tokens,
       sum(tokens) OVER (ORDER BY quality DESC, doc_id ASC
                         ROWS UNBOUNDED PRECEDING) <= 12000 AS kept
FROM q
"""


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware near-dup survivor selection (curate.near_dup_keep_best):
    the provably-exhaustive verified pair set clustered into components,
    each component keeping its BEST doc by the composite quality score
    (ties: min id) — the SlimPajama refinement of the funnel's
    keep-smallest rule. Winner selection via top_per_group (window-free);
    oracle = closure CTE + quality CTE + row_number (sf0.01 device;
    --py-oracles swaps the union-find at sf0.1)."""
    from log_parser_mind_spark.operators.curate import near_dup_keep_best

    docs = tx.with_tokens(_t(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id",
        tx.quality_score_from(F.col("tokens"), F.col("text")).alias("quality"),
    )
    pairs = _exhaustive_verified_pairs(_t(spark, sf_dir, "documents"))
    return near_dup_keep_best(scored, pairs, "quality")


def _oracle_quality_filtered() -> str:
    """(doc_id, quality) over documents with the EMPTY-TOKEN-FILTERED
    count (mirrors lower_tokens on blank text) — shared by the keep-best
    SQL oracle below AND check_oracle's union-find py-oracle, so the two
    verification paths cannot disagree on a score."""
    stop = ", ".join(repr(w) for w in tx.LANG_STOPWORDS["en"])
    return rf"""
SELECT doc_id,
       round(0.4 * least(n_tok / 64.0, 1.0)
           + 0.3 * least(CASE WHEN n_tok > 0 THEN stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END * 4, 1.0)
           + 0.3 * (1 - least(CASE WHEN n_chars > 0 THEN punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)),
           6) AS quality
FROM (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS n_tok,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS punct,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                         t -> t IN ({stop}))) AS stop
  FROM documents
)
"""


def _oracle_dedup_keep_best() -> str:
    return f"""
WITH comp_map AS ({_oracle_near_dup_components()}),
q AS ({_oracle_quality_filtered()}),
ranked AS (
  SELECT c.doc_id, c.component_id, q.quality AS score,
         row_number() OVER (PARTITION BY c.component_id
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn
  FROM comp_map c JOIN q ON q.doc_id = c.doc_id
)
SELECT doc_id, component_id, score, rn = 1 AS kept FROM ranked
"""


def q_temperature_mix(spark, sf_dir):
    """Temperature-weighted source sampling (sample.temperature_mixture):
    per-source keep fraction ∝ token-mass^0.5 scaled to an 8,000-token
    budget (clamped at 1, rounded 6dp), decided per row by the suite's
    MINSTD draw. Oracle re-derives masses, the √-share, fractions, and
    every draw in SQL."""
    from log_parser_mind_spark.operators.sample import temperature_mixture

    docs = tx.with_tokens(_t(spark, sf_dir, "documents"))
    scored = docs.select(
        "doc_id", "source", F.size("tokens").cast("long").alias("n_tokens")
    )
    out = temperature_mixture(scored, alpha=0.5, target_tokens=8_000, salt=3)
    return out.select("doc_id", "keep_fraction", "kept")


_ORACLE_TEMPERATURE_MIX = r"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tok
  FROM documents
),
m AS (SELECT source, sum(n_tok) AS mass FROM t GROUP BY source),
d AS (SELECT sum(pow(CAST(mass AS DOUBLE), 0.5)) AS denom FROM m),
f AS (
  SELECT source,
         round(least(1.0,
               8000 * pow(CAST(mass AS DOUBLE), 0.5) / denom / mass), 6) AS keep_fraction
  FROM m, d
)
SELECT t.doc_id, f.keep_fraction,
       (((((t.doc_id % 2147483647) * 48271 + 3) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647)
         < floor(f.keep_fraction * 2147483647.0) AS kept
FROM t JOIN f USING (source)
"""


def q_snapshot_diff(spark, sf_dir):
    """Dataset versioning audit (curate.corpus_diff): old = documents,
    new = a deterministic edit (every 13th doc removed, every remaining
    10th doc's text revised, every 17th re-added under a new id). The
    Spark side joins 16-byte (id, xxhash64) pairs; the oracle compares
    text equality directly — identical up to a 2⁻⁶⁴ hash collision, the
    trust every hash-keyed dedup pass here already places in xxhash64."""
    from log_parser_mind_spark.operators.curate import corpus_diff

    docs = _t(spark, sf_dir, "documents")
    new = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 900_000).alias("doc_id"), "text"
            )
        )
    )
    return corpus_diff(docs, new)


_ORACLE_SNAPSHOT_DIFF = r"""
WITH newt AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0 THEN text || ' [v2]' ELSE text END AS text
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 900000 AS doc_id, text FROM documents WHERE doc_id % 17 = 0
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM documents o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
"""


def q_corpus_datacard(spark, sf_dir):
    """ROLLUP corpus datacard (prep.corpus_datacard): per-(lang, source)
    doc/token/char mass + mean quality, with lang subtotals and a grand
    total; GROUPING() labels ('ALL') so NULL data can't collide with
    subtotal rows. Quality averages via exact integer micro-units — see the
    operator docstring for why a plain avg(double) is not cross-engine
    deterministic at round-half boundaries."""
    from log_parser_mind_spark.operators.prep import corpus_datacard

    return corpus_datacard(_t(spark, sf_dir, "documents"))


def _oracle_corpus_datacard() -> str:
    stop = ", ".join(repr(w) for w in tx.LANG_STOPWORDS["en"])
    return f"""
WITH s AS (
  SELECT lang, source,
         len(list_filter(string_split_regex(lower(coalesce(text,'')), '\\s+'),
                         t -> t <> '')) AS n_tok,
         length(coalesce(text,'')) AS n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]')) AS punct,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t IN ({stop}))) AS stop
  FROM documents
), q AS (
  SELECT lang, source, n_tok, n_chars,
         round(round(0.4 * least(n_tok / 64.0, 1.0)
             + 0.3 * least(CASE WHEN n_tok > 0 THEN stop / CAST(n_tok AS DOUBLE) ELSE 0.0 END * 4, 1.0)
             + 0.3 * (1 - least(CASE WHEN n_chars > 0 THEN punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)),
             6) * 1000000)::BIGINT AS qm
  FROM s
)
SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE coalesce(lang, '(null)') END AS lang,
       CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE coalesce(source, '(null)') END AS source,
       count(*) AS n_docs,
       sum(n_tok)::BIGINT AS total_tokens,
       round(avg(n_tok), 6) AS avg_tokens,
       sum(n_chars)::BIGINT AS total_chars,
       round(sum(qm) / count(*) / 1000000.0, 6) AS avg_quality
FROM q GROUP BY ROLLUP(lang, source)
"""


_CLF_B, _CLF_IT, _CLF_LR = 128, 15, 4.0


def q_quality_classifier(spark, sf_dir):
    """Hashing-trick logistic regression (operators/classifier.py) trained
    through DataFrame aggs on a derived is-English label: crc32 token
    buckets → ℓ1-normalized sparse features → full-batch GD, one B-bounded
    shuffle + B+1-scalar collect per iteration, margins as JVM folds with
    the weight vector inlined (no join, no UDF). Training is iterative
    driver-state (same class as k-means), so the oracle is a golden — but
    an INDEPENDENT one: make_goldens retrains from raw parquet with a pure
    Python mirror (zlib.crc32, dict-of-pairs GD) and asserts double-entry
    equality before writing. AUC vs the lang label is ~0.63 at sf0.01 —
    a weak-but-real signal through hash collisions; the golden pins the
    exact trajectory, the pytest suite pins learning on separable data."""
    from log_parser_mind_spark.operators.classifier import (
        score_logreg,
        token_bucket_features,
        train_logreg,
    )

    docs = _t(spark, sf_dir, "documents")
    # coalesce: a NULL lang must train as y=0 (matching the Python mirror),
    # not as a NULL label (train_logreg rejects those loudly).
    feats = token_bucket_features(
        docs, _CLF_B, label=F.coalesce(F.col("lang") == "en", F.lit(False))
    ).persist()
    # Persisting HERE (caller-owned) means train_logreg reuses the cache
    # and leaves it in place, so scoring reads the cached features instead
    # of re-running the corpus pass. The small (|docs| × O(B)) cache
    # outlives the query in multi-query sessions — the documented
    # connected_components/tfidf_keywords contract.
    w, b = train_logreg(feats, _CLF_B, _CLF_IT, _CLF_LR)
    return score_logreg(feats, w, b).select("doc_id", "y", "score")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup (dedup.semantic_dedup): k-means
    blocking + within-cluster exact cosine, keep min id. The embeddings
    table has no natural near-dups (max pairwise cosine 0.51), so the query
    PLANTS them: every vector gets a deterministically perturbed copy
    (+0.02 per dim; the table is unit-norm, so copy cosine ≈ 0.987 — min
    0.9871 at sf0.01) under id + 2^40 — at threshold 0.98 the copies drop,
    originals survive, and natural pairs (≤ 0.51) are nowhere near the
    boundary. k-means blocking has recall < 1 BY DESIGN: at sf0.01, 53 of
    500 planted copies land in a different cluster than their original and
    survive (89.4% recall with 8 clusters; the seeded init keys on
    xxhash64(id), so the planted-id offset participates in the fit) — the
    golden records exactly that, pinning the honest blocking behavior, not
    an idealized all-dropped outcome. k-means is iterative driver-state
    (same class as IVF), so the oracle is a locked deterministic golden."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # 1<<40 offset: planted ids must NEVER collide with real vec_ids at any
    # scale factor (a collision would put two different vectors under one
    # id and silently corrupt the keep-min-id semantics); 2^40 is beyond
    # any plausible corpus while still exact in a long AND in the golden's
    # parquet doubles.
    planted = emb.select(
        (F.col("vec_id") + F.lit(1 << 40)).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x.cast("double") + F.lit(0.02)).cast("float")
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    kept = dedup.semantic_dedup(
        corpus, threshold=0.98, n_centroids=8, iterations=3, dim=64
    )
    return kept.select("vec_id", F.col("centroid_id").cast("long").alias("centroid_id"))


# ---------------------------------------------------------------------------
# Golden oracles (data/golden/, produced by tools/make_goldens.py at sf0.01)
#
# drain_* goldens are INDEPENDENT: the pandas oracle (lpms/oracle.py, a
# separate single-threaded reimplementation of the reference semantics)
# computed them, and make_goldens.py asserts engine == oracle before writing.
# simhash_groups / minhash_candidates / multimodal_features goldens are
# LOCKED ENGINE OUTPUT (xxhash64 has no DuckDB equivalent): they verify
# determinism and parallelism-invariance, not independent derivation.
# ---------------------------------------------------------------------------

_GOLDEN_DIR = "/root/repo/data/golden"


def _golden_sql(name: str, cols: str) -> str:
    return f"SELECT {cols} FROM read_parquet('{_GOLDEN_DIR}/{name}.parquet/*.parquet')"


# ---------------------------------------------------------------------------
# Contract surface
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # drain pipeline family (rows-only)
        "drain_top_templates": q_drain_top_templates,
        "drain_templates": q_drain_templates,
        "drain_parsed_turns": q_drain_parsed_turns,
        "drain_global_stats": q_drain_global_stats,
        "template_stats": q_template_stats,
        "worker_metrics": q_worker_metrics,
        "minhash_candidates": q_minhash_candidates,
        "simhash_groups": q_simhash_groups,
        "simhash_hamming_dups": q_simhash_hamming_dups,
        "streaming_templates": q_streaming_templates,
        "stateful_templates": q_stateful_templates,
        "streaming_parsed": q_streaming_parsed,
        "streaming_dedup": q_streaming_dedup,
        "streaming_contamination": q_streaming_contamination,
        "multimodal_features": q_multimodal_features,
        "multimodal_real_decode": q_multimodal_real_decode,
        # grok/parse layer (oracle-checked)
        "mask_documents": q_mask_documents,
        "redact_documents": q_redact_documents,
        "detect_pii": q_detect_pii,
        "custom_redaction": q_custom_redaction,
        "map_sizes": q_map_sizes,
        "mask_partial": q_mask_partial,
        "doc_sizes": q_doc_sizes,
        "strip_fences": q_strip_fences,
        "sustainability": q_sustainability,
        # text analysis
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "quality_scores": q_quality_scores,
        "fingerprints": q_fingerprints,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_verified_dups": q_minhash_verified_dups,
        "embedding_near_dups": q_embedding_near_dups,
        "cosine_topk": q_cosine_topk,
        "lsh_ann_topk": q_lsh_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "ivf_ann_topk_scaled": q_ivf_ann_topk_scaled,
        "bpe_merges": q_bpe_merges,
        "bpe_token_stats": q_bpe_token_stats,
        "embed_ann_topk": q_embed_ann_topk,
        "curated_corpus": q_curated_corpus,
        "search_similar": q_search_similar,
        "agent_analyze": q_agent_analyze,
        "agent_fix": q_agent_fix,
        # filters / predicates / json
        "filter_project": q_filter_project,
        "text_search": q_text_search,
        "like_predicate": q_like_predicate,
        "validation": q_validation,
        "json_extract": q_json_extract,
        # aggregates
        "global_stats_events": q_global_stats_events,
        "hourly_rollup_events": q_hourly_rollup_events,
        "user_sessions": q_user_sessions,
        "session_window_rollup": q_session_window_rollup,
        "stratified_sample": q_stratified_sample,
        "asof_enrich": q_asof_enrich,
        "decontaminated_corpus": q_decontaminated_corpus,
        "incremental_dedup": q_incremental_dedup,
        "streaming_incremental_dedup": q_streaming_incremental_dedup,
        "exact_contamination": q_exact_contamination,
        "source_capped": q_source_capped,
        "boilerplate_stripped": q_boilerplate_stripped,
        "repetition_scores": q_repetition_scores,
        "paragraph_dedup": q_paragraph_dedup,
        "global_shuffle": q_global_shuffle,
        "corpus_split": q_corpus_split,
        "leakage_safe_split": q_leakage_safe_split,
        "length_profile": q_length_profile,
        "near_dup_components": q_near_dup_components,
        "top_ngrams": q_top_ngrams,
        "ngram_span_dedup": q_ngram_span_dedup,
        "lm_quality": q_lm_quality,
        "dsir_selected": q_dsir_selected,
        "training_mixture": q_training_mixture,
        "events_in_sessions": q_events_in_sessions,
        "packed_corpus": q_packed_corpus,
        "tfidf_keywords": q_tfidf_keywords,
        "doc_chunks": q_doc_chunks,
        "sft_examples": q_sft_examples,
        "preference_pairs": q_preference_pairs,
        "best_responses": q_best_responses,
        "budget_selected": q_budget_selected,
        "dedup_keep_best": q_dedup_keep_best,
        "temperature_mix": q_temperature_mix,
        "snapshot_diff": q_snapshot_diff,
        "corpus_datacard": q_corpus_datacard,
        "semantic_dedup": q_semantic_dedup,
        "quality_classifier": q_quality_classifier,
        "error_rates_events": q_error_rates_events,
        "topk_users": q_topk_users,
        "two_stage_rollup": q_two_stage_rollup,
        "baselines": q_baselines,
        "recent_window": q_recent_window,
        "conditional_agg": q_conditional_agg,
        "zscore_severity": q_zscore_severity,
        # joins / set ops / sorts / windows
        "broadcast_enrich": q_broadcast_enrich,
        "order_limit_offset": q_order_limit_offset,
        "latest_per_key": q_latest_per_key,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "pricing_summary": q_pricing_summary,
        "running_window": q_running_window,
        "turn_ordering": q_turn_ordering,
        "top_rank_per_group": q_top_rank_per_group,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mask_documents": _ORACLE_MASK,
        "redact_documents": _oracle_redact(),
        "detect_pii": _oracle_detect_pii(),
        "custom_redaction": _oracle_custom_redaction(),
        "map_sizes": _ORACLE_MAP_SIZES,
        "mask_partial": _ORACLE_MASK_PARTIAL,
        "doc_sizes": _ORACLE_DOC_SIZES,
        "strip_fences": _ORACLE_STRIP_FENCES,
        "sustainability": _ORACLE_SUSTAINABILITY,
        "token_counts": _ORACLE_TOKEN_COUNTS,
        "lang_id": _oracle_lang_id(),
        "quality_scores": _oracle_quality(),
        "fingerprints": _ORACLE_FINGERPRINT,
        "exact_dedup": _ORACLE_EXACT_DEDUP,
        "ngram_jaccard": _ORACLE_NGRAM_JACCARD,
        "minhash_verified_dups": _ORACLE_MINHASH_VERIFIED,
        "embedding_near_dups": _oracle_embedding_near_dups(),
        "cosine_topk": _ORACLE_COSINE_TOPK,
        "lsh_ann_topk": _oracle_lsh_ann_topk(),
        "search_similar": _ORACLE_SEARCH_SIMILAR,
        "agent_analyze": _oracle_agent_analyze(),
        "agent_fix": _oracle_agent_fix(),
        # golden-backed (see the Golden oracles section header for provenance)
        "drain_top_templates": _golden_sql("drain_top_templates", "template_id, cnt"),
        "drain_templates": _golden_sql("drain_templates", "template_id, pattern, log_count"),
        # the streaming path must converge EXACTLY to the batch mine — same golden
        "streaming_templates": _golden_sql(
            "drain_templates", "template_id, pattern, log_count"
        ),
        # state-store path, same exact-convergence contract as foreachBatch
        "stateful_templates": _golden_sql(
            "drain_templates", "template_id, pattern, log_count"
        ),
        "streaming_dedup": _ORACLE_STREAMING_DEDUP,
        "streaming_contamination": _ORACLE_STREAMING_CONTAMINATION,
        # pure-streaming per-turn parse must equal the batch parse golden
        "streaming_parsed": _golden_sql(
            "drain_parsed_turns",
            "conv_id, turn_idx, template_id, is_new, original_size, compressed_size",
        ),
        "drain_parsed_turns": _golden_sql(
            "drain_parsed_turns",
            "conv_id, turn_idx, template_id, is_new, original_size, compressed_size",
        ),
        "drain_global_stats": _golden_sql(
            "drain_global_stats",
            "total_logs, unique_templates, total_original_size, total_compressed_size, compression_ratio",
        ),
        # A6/A13 aggregate OVER the independently-derived drain goldens, so
        # DuckDB recomputes the statistic rather than echoing locked output.
        "template_stats": (
            "SELECT CAST(count(*) AS BIGINT) AS total_clusters, "
            "CAST(sum(log_count) AS BIGINT) AS total_logs, "
            "round(avg(log_count), 6) AS average_size "
            f"FROM read_parquet('{_GOLDEN_DIR}/drain_templates.parquet/*.parquet')"
        ),
        "worker_metrics": (
            "SELECT CAST(count(*) AS BIGINT) AS processed, "
            "CAST(count(*) FILTER (WHERE template_id IS NULL) AS BIGINT) AS errors "
            f"FROM read_parquet('{_GOLDEN_DIR}/drain_parsed_turns.parquet/*.parquet')"
        ),
        "simhash_groups": _golden_sql("simhash_groups", "simhash, n"),
        "simhash_hamming_dups": _golden_sql("simhash_hamming_dups", "id_a, id_b, hamming"),
        "minhash_candidates": _golden_sql("minhash_candidates", "id_a, id_b"),
        "multimodal_features": _golden_sql("multimodal_features", "asset_id, media_type, n_bytes"),
        "multimodal_real_decode": _golden_sql(
            "multimodal_real_decode",
            "asset_id, media_type, n_bytes, feat_idx, feat_value",
        ),
        "embed_ann_topk": _golden_sql("embed_ann_topk", "query_id, neighbor_id, cosine, rank"),
        "ivf_ann_topk": _golden_sql("ivf_ann_topk", "query_id, neighbor_id, cosine, rank"),
        "bpe_merges": _golden_sql("bpe_merges", "merge_rank, lhs, rhs, token"),
        "bpe_token_stats": _golden_sql(
            "bpe_token_stats",
            "lang, n_docs, total_bpe_tokens, distinct_bpe_tokens, avg_bpe_tokens_per_doc",
        ),
        "ivf_ann_topk_scaled": _golden_sql(
            "ivf_ann_topk_scaled", "query_id, neighbor_id, cosine, rank"
        ),
        "curated_corpus": _oracle_curated_corpus(),
        "filter_project": _ORACLE_FILTER_PROJECT,
        "text_search": _ORACLE_TEXT_SEARCH,
        "like_predicate": _ORACLE_LIKE_PREDICATE,
        "validation": _ORACLE_VALIDATION,
        "json_extract": _ORACLE_JSON_EXTRACT,
        "global_stats_events": _ORACLE_GLOBAL_STATS_EVENTS,
        "hourly_rollup_events": _ORACLE_HOURLY_ROLLUP_EVENTS,
        "user_sessions": _ORACLE_USER_SESSIONS,
        "session_window_rollup": _ORACLE_USER_SESSIONS,
        "stratified_sample": _ORACLE_STRATIFIED_SAMPLE,
        "asof_enrich": _ORACLE_ASOF_ENRICH,
        "decontaminated_corpus": _ORACLE_DECONTAMINATED,
        "incremental_dedup": _ORACLE_INCREMENTAL_DEDUP,
        "streaming_incremental_dedup": _ORACLE_INCREMENTAL_DEDUP,
        "exact_contamination": _ORACLE_EXACT_CONTAMINATION,
        "source_capped": _ORACLE_SOURCE_CAPPED,
        "boilerplate_stripped": _ORACLE_BOILERPLATE,
        "repetition_scores": _ORACLE_REPETITION,
        "paragraph_dedup": _ORACLE_PARAGRAPH_DEDUP,
        "ngram_span_dedup": _ORACLE_NGRAM_SPAN_DEDUP,
        "lm_quality": _ORACLE_LM_QUALITY,
        "dsir_selected": _ORACLE_DSIR_SELECTED,
        "global_shuffle": _ORACLE_GLOBAL_SHUFFLE,
        "corpus_split": _ORACLE_CORPUS_SPLIT,
        "leakage_safe_split": _oracle_leakage_safe_split(),
        "length_profile": _ORACLE_LENGTH_PROFILE,
        "near_dup_components": _oracle_near_dup_components(),
        "top_ngrams": _ORACLE_TOP_NGRAMS,
        "training_mixture": _ORACLE_TRAINING_MIXTURE,
        "events_in_sessions": _ORACLE_EVENTS_IN_SESSIONS,
        "packed_corpus": _ORACLE_PACKED_CORPUS,
        "tfidf_keywords": _ORACLE_TFIDF_KEYWORDS,
        "doc_chunks": _ORACLE_DOC_CHUNKS,
        "sft_examples": _ORACLE_SFT_EXAMPLES,
        "preference_pairs": _oracle_preference_pairs(),
        "best_responses": _oracle_best_responses(),
        "budget_selected": _oracle_budget_selected(),
        "dedup_keep_best": _oracle_dedup_keep_best(),
        "temperature_mix": _ORACLE_TEMPERATURE_MIX,
        "snapshot_diff": _ORACLE_SNAPSHOT_DIFF,
        "corpus_datacard": _oracle_corpus_datacard(),
        "semantic_dedup": _golden_sql("semantic_dedup", "vec_id, centroid_id"),
        "quality_classifier": _golden_sql("quality_classifier", "doc_id, y, score"),
        "error_rates_events": _ORACLE_ERROR_RATES_EVENTS,
        "topk_users": _ORACLE_TOPK_USERS,
        "two_stage_rollup": _ORACLE_TWO_STAGE_ROLLUP,
        "baselines": _ORACLE_BASELINES,
        "recent_window": _ORACLE_RECENT_WINDOW,
        "conditional_agg": _ORACLE_CONDITIONAL_AGG,
        "zscore_severity": _ORACLE_ZSCORE_SEVERITY,
        "broadcast_enrich": _ORACLE_BROADCAST_ENRICH,
        "order_limit_offset": _ORACLE_ORDER_LIMIT_OFFSET,
        "latest_per_key": _ORACLE_LATEST_PER_KEY,
        "anti_join": _ORACLE_ANTI_JOIN,
        "semi_join": _ORACLE_SEMI_JOIN,
        "pricing_summary": _ORACLE_PRICING_SUMMARY,
        "running_window": _ORACLE_RUNNING_WINDOW,
        "turn_ordering": _ORACLE_TURN_ORDERING,
        "top_rank_per_group": _ORACLE_TOP_RANK_PER_GROUP,
    }

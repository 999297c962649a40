"""log_parser_mind_spark — a PySpark-native rebuild of genosis18m/log-parser-mind.

A from-scratch log/telemetry parse → enrich → route → aggregate engine with
the same query and data-processing capabilities as the reference Go
microservice stack (Drain template mining, PII redaction, ClickHouse-style
rollups, z-score anomaly detection), re-expressed as pure DataFrame batch
stages over a partitioned transcripts table.

Layout (SURVEY.md §7.1):
  config.py      — Drain / redactor / pipeline configuration dataclasses
  session.py     — SparkSession builder with scale-appropriate defaults
  schemas.py     — every fixed StructType (transcripts, parsed, templates, sinks)
  synth.py       — deterministic synthetic transcripts generator
  functions/     — scalar expression builders (masking, redaction, text, vectors)
  operators/     — drain miner, enrich, route, aggregate, anomaly, dedup, similarity
  sources/       — readers/writers, manifest/lineage, multimodal plumbing
  plans/         — end-to-end job wiring (stage graph + resume)
  streaming/     — structured-streaming analogs of the batch stages
"""

__version__ = "0.1.0"

"""Operators: the Drain miner, enrichment joins, routing fan-out, aggregates,
anomaly detection, dedup, similarity search, and the query API."""

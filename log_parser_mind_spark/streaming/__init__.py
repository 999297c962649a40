"""Structured Streaming analogs of the batch stages (SURVEY §2.9).

The north rule mandates pure batch stages; these exist for capability parity
with the reference's push-streaming surface (gRPC StreamLogs, WebSocket live
stats, per-record anomaly evaluation) and are exercised by smoke tests only.
"""

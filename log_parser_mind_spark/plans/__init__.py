"""End-to-end job plans: stage wiring, checkpointed commits, resume."""

"""Structured Streaming jobs (the reference's SSE/delta streaming analogue,
transport-level streaming re-expressed as micro-batch dataflow)."""

"""HTTP API surface (reference §3.2/3.3: the OpenAI-compatible server)."""

"""Deterministic synthetic fixtures (corpus + goldens), seed=42 everywhere."""

"""Physical-plan inspection helpers (pushdown/pruning/codegen assertions)."""

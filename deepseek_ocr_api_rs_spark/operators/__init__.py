"""Spark DataFrame operators: extraction stage, partitioning, checkpointing,
top-k/window family, dedup family."""

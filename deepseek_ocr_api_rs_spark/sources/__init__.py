"""Sources & sinks: parquet now, Iceberg-shaped (gated) for production."""

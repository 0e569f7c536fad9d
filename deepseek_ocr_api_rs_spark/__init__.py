"""deepseek_ocr_api_rs_spark — a PySpark-native main-content extraction engine.

From-scratch rebuild of the *capability* of waveman800/Deepseek-OCR-API.rs
(/root/reference, a Rust document→text inference engine) as an idiomatic
Spark pipeline over Common-Crawl-style page tables:

- ``extraction``  — deterministic per-document kernels (HTML boilerplate
  strip, PDF reading-order reconstruction, text normalization). Two code
  paths: a scalar single-process *reference* extractor (the golden oracle,
  analogue of the reference repo's ``scripts/capture_baseline.py`` pipeline)
  and a numpy-vectorized batch kernel used by the Spark path. Parity between
  them is byte-exact and pytest-enforced (analogue of
  ``crates/infer-deepseek/tests/baseline.rs``).
- ``operators``   — Spark DataFrame operators: the Arrow-UDF extraction
  stage, url-hash partitioning + hot-host salting, per-partition checkpoint
  manifests + resume, top-k / cumulative-share windows, dedup family
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup).
- ``functions``   — column-level text analysis (lang-id, quality score,
  token counts, fingerprints) and similarity search, all built on
  ``pyspark.sql.functions`` (JVM-side) wherever expressible.
- ``fixtures``    — deterministic synthetic corpus generator + golden
  capture (analogue of ``baselines/`` in the reference).
- ``sources``     — parquet/Iceberg-shaped IO plus the ``_metrics`` /
  ``_checkpoints`` side tables.
- ``streaming``   — Structured Streaming ingestion with watermarked
  windowed aggregation.
"""

__version__ = "0.1.0"

SCHEMA_VERSION = 2

"""Column-level functions: hashing, text analysis, similarity.

Everything here compiles to JVM-side Catalyst expressions
(pyspark.sql.functions / SQL expression strings) — zero Python in the hot
path. Where an operator must be correctness-checked against DuckDB, the
module provides BOTH the Spark expression and the equivalent DuckDB SQL
fragment built from the same pinned constants.
"""

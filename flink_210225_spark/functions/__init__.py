"""Scalar/vector/text helper functions (all built on pyspark.sql.functions)."""

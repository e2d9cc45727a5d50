"""Scalar/array helper expressions — all JVM-side (`pyspark.sql.functions`
compositions), no Python UDFs on hot paths."""

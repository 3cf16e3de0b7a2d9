"""Scalar/vector/text function library (all JVM-side Catalyst expressions
unless noted — the reference's per-row transformer families re-expressed as
built-in pyspark.sql.functions compositions)."""

"""Column-level helper expressions (pyspark.sql.functions only — JVM-side,
whole-stage-codegen friendly; no Python UDFs)."""

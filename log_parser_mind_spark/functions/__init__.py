"""Scalar expression builders — all JVM-side `pyspark.sql.functions`
compositions (whole-stage-codegen friendly); no per-row Python anywhere.
"""

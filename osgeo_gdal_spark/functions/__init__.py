"""Spark-side column expressions and vectorized UDFs."""

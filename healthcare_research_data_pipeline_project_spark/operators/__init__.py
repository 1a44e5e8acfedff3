"""Reusable Spark-first operator implementations."""

"""Spark operators: one module per pipeline stage / operator family."""

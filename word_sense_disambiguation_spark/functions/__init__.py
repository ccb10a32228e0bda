"""Scalar / vectorized function library (text, similarity, hashing)."""

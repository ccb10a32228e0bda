"""Logical pipelines: end-to-end DAG wiring + checkpoint/metrics/resume."""

"""Composed pipelines and iteration checkpoint/resume."""

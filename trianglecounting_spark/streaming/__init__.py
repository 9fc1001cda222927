"""Structured Streaming variants of the engine's ingestion operators."""

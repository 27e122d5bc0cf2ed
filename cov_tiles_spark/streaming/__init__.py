"""Structured Streaming surface: incremental tile materialization."""

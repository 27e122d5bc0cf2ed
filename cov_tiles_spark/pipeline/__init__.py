"""Pipelines: tile materialization, skew handling, lineage/checkpointing."""

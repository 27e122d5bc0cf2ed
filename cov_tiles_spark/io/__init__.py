"""Sources/sinks: deterministic synthetic corpora + IcebergLite tables."""

"""Table format, change-log source, and deterministic data generators."""

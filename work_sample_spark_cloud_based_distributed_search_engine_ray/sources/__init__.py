"""Sources: deterministic synthetic pages corpus + parquet table readers."""

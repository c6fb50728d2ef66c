"""End-to-end pipelines: index build, query engine, brute-force oracle."""

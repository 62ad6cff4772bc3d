"""External sources feeding the engine (beyond the native Parquet tables)."""

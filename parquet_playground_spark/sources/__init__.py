"""Sources and sinks: parquet corpus readers, gated Avro, write paths."""

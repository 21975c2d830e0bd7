"""Sources and sinks: Singer message ingestion + Parquet writing."""

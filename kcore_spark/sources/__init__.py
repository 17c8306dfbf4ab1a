"""Sources/sinks: the topic log (Kafka data model on partitioned parquet)."""

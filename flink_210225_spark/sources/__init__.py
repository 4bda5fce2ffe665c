"""Source connectors (SURVEY §2.1): CDC envelope ingestion and Kafka/socket
stream builders."""

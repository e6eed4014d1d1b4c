from ecommerce_analytics_spark.sources.kafka import (  # noqa: F401
    kafka_available, read_kafka_stream, write_kafka_stream,
)

"""Structured Streaming layer (SURVEY.md §2.6, T1-T7).

Re-binds the batch expressions to ``readStream``: watermarked tumbling
windows (the event-time semantics the reference's processing-time-only
Flink job lacks), per-key arbitrary state for the running LTV, drop-
duplicates idempotence, corrupt-record routing, and Kafka source/sink
config builders. Tests drive everything with file-source micro-batches
— no broker required; the Kafka wiring is config-only until jars are
on the classpath.
"""

from ecommerce_analytics_spark.streaming.windows import (  # noqa: F401
    streaming_events, streaming_hourly_revenue,
)
from ecommerce_analytics_spark.streaming.ltv_state import (  # noqa: F401
    streaming_ltv,
)

from ecommerce_analytics_spark.multimodal.blobs import (  # noqa: F401
    decode_features, with_blob,
)

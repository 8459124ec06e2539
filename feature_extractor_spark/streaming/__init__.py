from feature_extractor_spark.streaming.stream_ops import (  # noqa: F401
    stream_ema,
    stream_sessionize,
    stream_windowed_encode,
    stream_windowed_stats,
)

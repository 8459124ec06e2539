from feature_extractor_spark.streaming.stream_ops import (  # noqa: F401
    stream_ema,
    stream_sessionize,
    stream_windowed_encode,
    stream_windowed_stats,
)
from feature_extractor_spark.streaming.incremental_dedup import (  # noqa: F401
    compact_index,
    flag_against_index,
    ingest_batch,
    ingest_lines_batch,
    stream_dedup_ingest,
    stream_line_dedup_ingest,
)
from feature_extractor_spark.streaming.incremental_semantic import (  # noqa: F401
    ann_semantic_ingest_batch,
    flag_against_ann_index,
    stream_semantic_ingest,
)

from feature_extractor_spark.encoder.forward import (  # noqa: F401
    init_weights,
    encoder_forward,
)
from feature_extractor_spark.encoder.stage import encode_stage  # noqa: F401

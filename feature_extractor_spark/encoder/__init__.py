from feature_extractor_spark.encoder.forward import (  # noqa: F401
    decoder_forward,
    encoder_forward,
    init_decoder_weights,
    init_weights,
)
from feature_extractor_spark.encoder.stage import (  # noqa: F401
    decode_stage,
    encode_stage,
)

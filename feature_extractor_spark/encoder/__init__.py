from feature_extractor_spark.encoder.forward import (  # noqa: F401
    decoder_forward,
    encoder_forward,
    init_decoder_weights,
    init_weights,
)
from feature_extractor_spark.encoder.plugins import (  # noqa: F401
    ENCODERS,
    get_encoder,
    init_vae_small,
    init_vae_small_decoder,
    out_shape,
    vae_small_decode,
    vae_small_forward,
    vae_small_seq,
)
from feature_extractor_spark.encoder.stage import (  # noqa: F401
    decode_stage,
    encode_stage,
)

from feature_extractor_spark.functions.conditions import (  # noqa: F401
    cyclical_datetime_features,
    positional_encoding,
    weekday_filter,
    zero_context,
)
from feature_extractor_spark.functions.normalize import (  # noqa: F401
    fit_minmax,
    normalize_minmax,
    denormalize_minmax,
)
from feature_extractor_spark.functions.transforms import returns  # noqa: F401
from feature_extractor_spark.functions.text import (  # noqa: F401
    c4_clean,
    language_id,
    quality_score,
    redact_pii,
    repetition_signals,
    token_counts,
)
from feature_extractor_spark.functions.lm import lm_score, train_char_lm  # noqa: F401
from feature_extractor_spark.functions.profile import profile_columns  # noqa: F401
from feature_extractor_spark.functions.decompose import (  # noqa: F401
    haar_wavelet_features,
    seasonal_decompose,
)
from feature_extractor_spark.functions.text import compression_ratio  # noqa: F401
from feature_extractor_spark.functions.decompose import spectral_features  # noqa: F401
from feature_extractor_spark.functions.text import top_ngrams  # noqa: F401
from feature_extractor_spark.functions.classifier import (  # noqa: F401
    quality_sample,
    resolve_classifier,
    score_quality,
    train_quality_classifier,
)
from feature_extractor_spark.functions.lm import lm_buckets  # noqa: F401
from feature_extractor_spark.functions.text import (  # noqa: F401
    normalize_unicode,
    token_freq_topk,
    vocab_coverage,
)
from feature_extractor_spark.functions.text import (  # noqa: F401
    build_word_vocab,
    decode_bpe,
    decode_words,
    encode_bpe,
    encode_words,
    learn_bpe,
    load_tokenizer,
    save_tokenizer,
)

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

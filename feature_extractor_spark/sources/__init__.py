from feature_extractor_spark.sources.loaders import (  # noqa: F401
    load_csv,
    load_table,
    write_csv,
)
from feature_extractor_spark.sources.tokens import synth_tokens  # noqa: F401

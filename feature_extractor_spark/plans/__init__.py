from feature_extractor_spark.plans.entry_queries import (  # noqa: F401
    ENTRY_QUERIES,
    ORACLE_SQL,
    flagship_entry,
)

"""Query surface: every operator exposed as a named (Spark, oracle-SQL) pair.

Import order registers all queries into the registry; __spark_entry__.py
re-exports them to the verification driver.
"""

from station_data_ingestion_spark.queries import (  # noqa: F401
    events,
    llm_dedup,
    llm_similarity,
    llm_text,
    merge_q,
    multimodal,
    relational,
    relational_ext,
    relational_ext2,
    scalars,
    setops,
    temporal_q,
    windows,
)
from station_data_ingestion_spark.queries.registry import QUERIES  # noqa: F401
